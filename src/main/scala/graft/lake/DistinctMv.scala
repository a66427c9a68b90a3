package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.writer.BlockWriter

/** DISTINCT-COUNT materialized views — exact `COUNT(DISTINCT x)`
  * rollups maintained incrementally: arguably THE most common
  * warehouse view ("daily unique users per dimension") and the one
  * aggregate the other MV kinds must reject (no signed fold exists
  * over the *visible* state: per-group distinct counts can neither
  * add under inserts of possibly-seen keys nor subtract under
  * deletes of possibly-duplicated keys).
  *
  * The law: keep HIDDEN state at (group, key) grain — one row per
  * live (g, x) pair with the signed multiplicity `cnt` of fact rows
  * carrying it (plus one signed SUM partial per extra measure). That
  * state IS signed-distributive: the lake's own change feed
  * ([[LakeTable.changelogRead]] — inserts +1, delete pre-images -1,
  * MERGEs as delete+insert pairs) folds per (g, x) with one
  * hash-shuffle on the state grain; a key retires exactly when its
  * multiplicity reaches 0. The VISIBLE view then derives:
  *
  *  - `COUNT(DISTINCT x)` = the group's live non-null key count,
  *  - `COUNT(*)`          = the group's summed multiplicities,
  *  - `SUM(e)`            = the group's summed signed partials,
  *
  * each exact at every basis — including across MoR deletes and
  * merges, where the single kind must fall back to a full recompute.
  * Refresh cost: O(changed rows) to read the feed, one shuffle at
  * (g, x) grain to fold, one at (g) grain to re-derive — never a
  * fact scan (mode `signed`). Only a retention-expired changelog
  * range forces the `full` fallback.
  *
  * LAYOUT: the state lives as its own lake table NESTED INSIDE the
  * MV directory (`<mv>/_dstate`) — invisible to the catalog (tables
  * list one level), dropped/cloned/moved with its MV, and excluded
  * from the MV root's own orphan sweeps (those walk `<mv>/data`
  * only). Crash safety between the two commits: the state commits
  * FIRST, stamping its own basis note; a crash before the MV commit
  * leaves state-basis > mv-basis, and the next refresh skips the
  * fold and just re-derives the visible rows from the state head —
  * both commits are idempotent re-derivations of the state.
  *
  * At 100 TB: the state table is |group domain × key domain| rows —
  * the exact-COUNT(DISTINCT) floor; the per-refresh shuffles are
  * state-sized, not fact-sized. (An approximate kind — per-group
  * HLL/bitmap sketches, OR-distributive under appends — is the
  * documented scale path when the key domain itself is too large;
  * the exact kind is what the oracle can gate.)
  */
object DistinctMv {

  private val noteRe = "^dmv-basis-(\\d+)-(signed|full)$".r
  private val stateNoteRe = "^dmvs-basis-(\\d+)-(signed|full)$".r

  /** Multiplicity column of the hidden state table. */
  val CntCol = "_cnt"

  /** The hidden state table's root, nested inside the MV dir. */
  def stateRoot(mvRoot: String): String =
    java.nio.file.Paths.get(mvRoot, "_dstate").toString

  /** The fact snapshot the VISIBLE MV head reflects. */
  def basis(mvRoot: String): Int = {
    require(LakeTable.currentSnapshot(mvRoot) > 0, s"$mvRoot has no MV state")
    LakeTable.findContentNote(mvRoot) {
      case noteRe(f, _) => Some(f.toInt)
      case _ => None
    }.getOrElse(sys.error(
      s"$mvRoot carries no dmv-basis note in its live chain — " +
        "not a distinct-count MV (or its basis commits were expired)"))
  }

  /** Maintenance mode of the newest refresh the head reflects
    * (`signed` — the change-feed fold — or `full`, the CREATE /
    * expired-range recompute).
    */
  def mode(mvRoot: String): String =
    LakeTable.findContentNote(mvRoot) {
      case noteRe(_, m) => Some(m)
      case _ => None
    }.getOrElse("?")

  private def stateBasis(stRoot: String): (Int, String) =
    LakeTable.findContentNote(stRoot) {
      case stateNoteRe(f, m) => Some((f.toInt, m))
      case _ => None
    }.getOrElse(sys.error(s"$stRoot carries no dmvs-basis note"))

  /** The fact snapshot the HIDDEN state table reflects — the rewrite
    * rule's state-rollup tier serves from the state only when this
    * equals the scanned snapshot exactly (a crash between the two
    * refresh commits leaves the state AHEAD of the visible view;
    * serving it then would leak newer data into a pinned read).
    */
  def stateBasisOf(mvRoot: String): Int = stateBasis(stateRoot(mvRoot))._1

  /** The (group, key) state of a base read: multiplicity + one
    * signed SUM partial per extra measure. A partial is NULL exactly
    * when every contributing value is NULL — matching SUM's
    * NULL-ignoring semantics through the fold.
    */
  private def stateOf(base: DataFrame, group: Seq[String], keyCol: String,
      sums: Seq[(String, String)], signed: Boolean): DataFrame = {
    val sign: Column =
      if (!signed) lit(1L)
      else when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    base.groupBy((group :+ keyCol).map(col): _*)
      .agg(sum(sign).cast("bigint").as(CntCol),
        sums.map { case (nm, e) =>
          sum(sign * expr(e)).cast("bigint").as(nm) }: _*)
  }

  /** Derive the VISIBLE MV rows from a state frame: n = summed
    * multiplicities, the distinct measure = live non-null key count,
    * extra SUMs = summed partials, AVGs = sum / n read-time sugar.
    */
  private def derive(st: DataFrame, group: Seq[String], keyCol: String,
      distinctName: String, sums: Seq[(String, String)],
      derived: Seq[(String, Column)]): DataFrame = {
    val out = st.groupBy(group.map(col): _*)
      .agg(sum(col(CntCol)).cast("bigint").as(IncrementalJoinMv.CountCol),
        count(col(keyCol)).cast("bigint").as(distinctName) +:
          sums.map { case (nm, _) => sum(col(nm)).cast("bigint").as(nm) }: _*)
    derived.foldLeft(out) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  private def stateCfg(group: Seq[String]): BlockWriter.Config =
    BlockWriter.Config(group.head, group.head, maxRecordsPerFile = 1 << 20)

  /** Materialize state + view from the fact head; returns the MV
    * snapshot. `keyCol` is the COUNT(DISTINCT) argument (a plain fact
    * column), `sums` the extra signed-foldable measures, `derived`
    * the read-time AVG sugar over stored SUMs.
    */
  def create(s: SparkSession, factRoot: String, mvRoot: String,
      group: Seq[String], keyCol: String, distinctName: String,
      cfg: BlockWriter.Config, sums: Seq[(String, String)] = Nil,
      derived: Seq[(String, Column)] = Nil,
      prep: DataFrame => DataFrame = identity): Int = {
    val f = LakeTable.currentSnapshot(factRoot)
    val st = stateOf(prep(LakeTable.read(s, factRoot, Some(f))), group, keyCol,
      sums, signed = false)
    LakeTable.commit(s, stateRoot(mvRoot), st, stateCfg(group), group,
      note = s"dmvs-basis-$f-full")
    LakeTable.commit(s, mvRoot,
      derive(LakeTable.read(s, stateRoot(mvRoot)), group, keyCol,
        distinctName, sums, derived),
      cfg, group, note = s"dmv-basis-$f-full")
  }

  /** Fold fact changes since the basis through the (g, x) state and
    * re-derive the visible rows; returns the new fact basis. SIGNED
    * mode folds the change feed (appends, MoR deletes and merges all
    * included — content-preserving maintenance emits zero change
    * rows); an expired changelog range falls back to one full state
    * recompute. Both commits re-derive from durable state, so a crash
    * between them completes on the next call.
    */
  def refresh(s: SparkSession, factRoot: String, mvRoot: String,
      group: Seq[String], keyCol: String, distinctName: String,
      cfg: BlockWriter.Config, sums: Seq[(String, String)] = Nil,
      derived: Seq[(String, Column)] = Nil,
      prep: DataFrame => DataFrame = identity): Int = {
    val f0 = basis(mvRoot)
    val f1 = LakeTable.currentSnapshot(factRoot)
    val stRoot = stateRoot(mvRoot)
    val (sb, sbMode) = stateBasis(stRoot)
    if (f0 == f1 && sb == f0) return f0
    // fold the state forward when it is behind the fact head (sb may
    // already be at f1 if a prior refresh crashed after the state
    // commit — then only the visible derivation below is owed)
    var mode = sbMode
    if (sb < f1) {
      var cached: Option[DataFrame] = None
      try {
        val next = try {
          val changes = LakeTable.changelogRead(s, factRoot, sb, f1)
          // prep derives expression group columns (time buckets) over
          // the change rows — insert and delete pre-images of a row
          // derive the same bucket, so signed folds cancel exactly
          val delta = stateOf(prep(changes), group, keyCol, sums, signed = true)
            .persist()
          cached = Some(delta)
          // a pure-maintenance range (compaction, rewrite_manifests)
          // emits zero change rows: skip both rewrites, leave the
          // basis put — the next content refresh folds across it for
          // free (only when the VISIBLE view is already at the state
          // basis; a crash-interrupted refresh still owes the
          // derivation below)
          if (delta.isEmpty && sb == f0) return f0
          mode = "signed"
          LakeTable.read(s, stRoot)
            .select((group :+ keyCol :+ CntCol).map(col) ++
              sums.map(x => col(x._1)): _*)
            .unionByName(delta)
            .groupBy((group :+ keyCol).map(col): _*)
            .agg(sum(col(CntCol)).cast("bigint").as(CntCol),
              sums.map { case (nm, _) =>
                sum(col(nm)).cast("bigint").as(nm) }: _*)
            .filter(col(CntCol) =!= 0L)
        } catch {
          case _: IllegalStateException =>
            // retention expired part of the changelog range: recompute
            // the state from the fact head, once (the `full` mode)
            mode = "full"
            stateOf(prep(LakeTable.read(s, factRoot, Some(f1))), group, keyCol,
              sums, signed = false)
        }
        LakeTable.rewrite(s, stRoot, next, stateCfg(group), group,
          note = s"dmvs-basis-$f1-$mode"): Unit
      } finally { cached.foreach(_.unpersist()); () }
    }
    LakeTable.rewrite(s, mvRoot,
      derive(LakeTable.read(s, stRoot), group, keyCol, distinctName,
        sums, derived),
      cfg, group, note = s"dmv-basis-$f1-$mode"): Unit
    f1
  }
}
