package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.writer.BlockWriter

/** INCREMENTAL maintenance of a JOINED aggregate view — the
  * enrichment MV every warehouse keeps (fact ⋈ dimension → grouped
  * rollup) maintained by the DELTA-JOIN law instead of recomputation:
  *
  *   Δ(F ⋈ D) = ΔF ⋈ D₀  ∪  F₁ ⋈ ΔD
  *
  * with every change row SIGNED (+1 insert / −1 delete, the counting
  * algorithm of classic IVM — Gupta & Mumick's multiset semantics),
  * signs multiplying across the join. Both deltas come from the
  * lake's own CHANGE DATA FEED ([[LakeTable.changelogRead]]) and both
  * "old"/"new" sides are SNAPSHOT READS (time travel) — the algebra's
  * four frames are exactly what a snapshot lake serves for free.
  *
  * Cost shape at 100 TB:
  *  - fact-only refresh (ΔD empty — the overwhelmingly common case):
  *    ΔF ⋈ D₀ with the DIMENSION BROADCAST — O(Δ fact), the fact
  *    table is NEVER scanned (spec-pinned);
  *  - dimension-changing refresh: adds F₁ ⋈ ΔD — one fact pass
  *    semi-joined against the (broadcast) changed dimension keys,
  *    the price every engine pays when a dimension rewires history;
  *  - the fold touches |MV| + |Δ groups| rows, never the base.
  *
  * Only SIGNED-distributive aggregates participate (COUNT via
  * sum-of-signs, SUM via sign-weighted sum); groups whose count
  * reaches zero leave the view. The (fact, dim) basis pair rides the
  * MV's commit note (`jmv-basis-<f>-<d>`), so state and basis are
  * atomic — the [[IncrementalMv]] convention, extended to two bases.
  */
object IncrementalJoinMv {

  /** A signed-distributive aggregate: `delta` evaluates over joined
    * change rows (may reference `__sign`), `fold` merges partials.
    * These are EXTRA measures — the signed row count `n` is always
    * maintained structurally (it is the group-liveness criterion), so
    * no calling convention can silently drop live groups.
    */
  final case class Agg(name: String, delta: Column, fold: Column => Column)

  /** SUM(expr) in signed form. */
  def sumAgg(name: String, expr: Column): Agg =
    Agg(name, sum(col("__sign") * expr).cast("bigint"), c => sum(c).cast("bigint"))

  /** The structural signed row count — reserved column name. */
  val CountCol = "n"

  private val noteRe = "^jmv-basis-(\\d+)-(\\d+)$".r

  /** The (factSnap, dimSnap) basis the MV head reflects. The MoR
    * fold accrues delete-mask debt whose remedy is compaction — a
    * content-PRESERVING commit whose note is not a basis — so the
    * basis is the newest `jmv-basis` note the head's CONTENT
    * reflects, not strictly the head's (maintenance between
    * refreshes is normal; retention holes below the keep-point are
    * tolerated). The walk is [[LakeTable.findContentNote]]: a
    * rollback of the MV table jumps to the RESTORED snapshot, so the
    * basis rolls back with the data instead of resolving to an
    * abandoned newer note that would skip the in-between changes.
    */
  def basis(mvRoot: String): (Int, Int) = {
    require(LakeTable.currentSnapshot(mvRoot) > 0, s"$mvRoot has no MV state")
    LakeTable.findContentNote(mvRoot) {
      case noteRe(f, d) => Some((f.toInt, d.toInt))
      case _ => None
    }.getOrElse(sys.error(
      s"$mvRoot carries no jmv-basis note in its live chain — " +
        "not a join MV (or its basis commits were expired)"))
  }

  private def joined(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key))

  private def state(df: DataFrame, group: Seq[String], aggs: Seq[Agg]): DataFrame = {
    require(!aggs.exists(_.name == CountCol),
      s"'$CountCol' is the structural signed count — name extra aggregates differently")
    df.groupBy(group.map(col): _*)
      .agg(sum(col("__sign")).cast("bigint").as(CountCol),
        aggs.map(a => a.delta.as(a.name)): _*)
  }

  /** Signed change rows of `root` over (from, head]: the CDF frame
    * with `__sign` = +1 for inserts, −1 for delete pre-images.
    */
  private def signedDelta(s: SparkSession, root: String, from: Int,
      head: Int): DataFrame =
    LakeTable.changelogRead(s, root, from, head)
      .withColumn("__sign",
        when(col("_change_type") === "insert", 1L).otherwise(-1L))
      .drop("_change_type", "_change_snap")

  /** Materialize the view from both heads; returns the MV snapshot. */
  def create(s: SparkSession, factRoot: String, dimRoot: String,
      mvRoot: String, key: String, group: Seq[String], aggs: Seq[Agg],
      cfg: BlockWriter.Config): Int = {
    val f = LakeTable.currentSnapshot(factRoot)
    val d = LakeTable.currentSnapshot(dimRoot)
    val full = joined(LakeTable.read(s, factRoot, Some(f)),
      LakeTable.read(s, dimRoot, Some(d)), key).withColumn("__sign", lit(1L))
    val st = state(full, group, aggs).filter(col(CountCol) > 0).persist()
    try {
      // fail at CREATE, not first refresh: the MoR fold can't
      // maintain a NULL leading group key (see refresh)
      require(st.filter(col(group.head).isNull).isEmpty,
        s"join-MV: NULL in leading group column '${group.head}' cannot be " +
          "incrementally maintained (equality-keyed delete mask) — " +
          "coalesce it upstream")
      LakeTable.commit(s, mvRoot, st, cfg, group, note = s"jmv-basis-$f-$d")
    } finally { st.unpersist(); () }
  }

  /** Fold both tables' changes since the recorded basis into the MV
    * as ONE MoR MERGE commit touching only changed groups; returns
    * the new (fact, dim) basis.
    *
    * The fold is O(Δ groups) in WRITE amplification too: changed
    * groups (keyed by the LEADING group column — the MERGE's
    * equality-delete key) re-land as new data files, groups whose
    * count reaches zero retire through the same commit's delete mask,
    * and data files of untouched groups are never rewritten
    * (spec-pinned byte-identical). When `group` has more than one
    * column, every MV row SHARING a changed leading-column value is
    * folded alongside (the eq-delete masks by that column) — still
    * bounded by the touched leading partitions, never |MV|. MoR debt
    * folds back at the next compaction, like every other merge.
    */
  def refresh(s: SparkSession, factRoot: String, dimRoot: String,
      mvRoot: String, key: String, group: Seq[String], aggs: Seq[Agg],
      cfg: BlockWriter.Config): (Int, Int) = {
    val (f0, d0) = basis(mvRoot)
    val f1 = LakeTable.currentSnapshot(factRoot)
    val d1 = LakeTable.currentSnapshot(dimRoot)
    if (f0 == f1 && d0 == d1) return (f0, d0)
    // Δ(F⋈D) = ΔF⋈D₀ ∪ F₁⋈ΔD, signs multiplying. The dim side is
    // broadcast in BOTH terms; the fact table is only read when the
    // dimension actually changed.
    val parts = Seq.newBuilder[DataFrame]
    if (f1 > f0) {
      val dF = signedDelta(s, factRoot, f0, f1)
      parts += joined(dF, LakeTable.read(s, dimRoot, Some(d0)), key)
    }
    if (d1 > d0) {
      val dD = signedDelta(s, dimRoot, d0, d1)
        .withColumnRenamed("__sign", "__dsign")
      parts += LakeTable.read(s, factRoot, Some(f1))
        .join(broadcast(dD), Seq(key))
        .withColumn("__sign", col("__dsign")).drop("__dsign")
    }
    val delta = parts.result().reduce(_ unionByName _)
    val deltaState = state(delta, group, aggs)
    val gk = group.head
    val changedKeys = deltaState.select(col(gk)).distinct().persist()
    try {
      // the eq-delete mask and the semi-join fold both key on
      // EQUALITY over gk — a NULL lead-group value can neither be
      // retired nor re-folded, so it fails HERE, pointedly, instead
      // of silently duplicating the group
      require(changedKeys.filter(col(gk).isNull).isEmpty,
        s"join-MV fold: NULL in leading group column '$gk' cannot ride " +
          "the equality-delete mask — coalesce the dimension attribute " +
          "upstream (e.g. to a sentinel) before maintaining it as an MV key")
      val note = s"jmv-basis-$f1-$d1"
      val mvCur = LakeTable.read(s, mvRoot)
      // fold current values of exactly the touched lead-key rows with
      // the delta; everything else stays on disk untouched
      val folded = mvCur.join(broadcast(changedKeys), Seq(gk), "left_semi")
        .unionByName(deltaState)
        .groupBy(group.map(col): _*)
        .agg(sum(col(CountCol)).cast("bigint").as(CountCol),
          aggs.map(a => a.fold(col(a.name)).as(a.name)): _*)
      val live = folded.filter(col(CountCol) > 0).to(mvCur.schema).persist()
      try {
        if (live.isEmpty)
          // every touched group died: the commit is pure retirement
          LakeTable.deleteWhere(s, mvRoot, gk, changedKeys, note = note): Unit
        else
          LakeTable.merge(s, mvRoot, gk, live, cfg, group, note = note,
            extraDeleteKeys = Some(changedKeys)): Unit
      } finally { live.unpersist(); () }
    } finally { changedKeys.unpersist(); () }
    (f1, d1)
  }
}
