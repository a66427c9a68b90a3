package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.writer.BlockWriter

/** MIN/MAX materialized views — incremental maintenance BEYOND the
  * signed-distributive family. COUNT/SUM fold algebraically under
  * deletes ([[IncrementalJoinMv]]'s counting algorithm); MIN/MAX do
  * NOT: deleting a group's current minimum needs the group's other
  * rows to answer "what's the new min" — no signed delta can say.
  * The classic warehouse answer (and this one) is GROUP-TARGETED
  * RECOMPUTE:
  *
  *  1. the lake's change feed names exactly the groups a refresh
  *     touched (insert rows AND delete pre-images carry the group
  *     key) — |Δ groups| values, collected driver-side like every
  *     other metadata-scale set;
  *  2. those groups recompute FROM THE FACT HEAD through the DSv2
  *     scan with an IN filter — manifest stat pruning keeps the read
  *     to files whose [min, max] group extents intersect the touched
  *     set, so a fact table clustered by the group key reads ONLY
  *     the touched groups' files (spec-pinned by physically hiding
  *     every untouched-group file during a refresh);
  *  3. the fold lands as ONE MoR MERGE commit — recomputed groups
  *     re-land, groups that vanished retire via the same commit's
  *     equality-delete mask, untouched groups' MV files stay
  *     byte-identical ([[LakeTable.merge]]'s extraDeleteKeys shape).
  *
  * Cost at 100 TB: O(Δ groups × files-per-group) read, O(Δ groups)
  * write — against the O(|fact|) full recompute a non-distributive
  * aggregate otherwise forces. The (fact) basis rides the MV head
  * commit's note (`mmv-basis-<f>`), atomic with the data.
  */
object MinMaxMv {

  private val noteRe = "^mmv-basis-(\\d+)$".r

  /** The fact snapshot the MV head reflects — the newest `mmv-basis`
    * note the head's CONTENT reflects (compaction and other content-
    * preserving maintenance stamp their own notes above it; retention
    * holes below the keep-point are tolerated). The walk is
    * [[LakeTable.findContentNote]]: a rollback of the MV table jumps
    * to the RESTORED snapshot so the basis rolls back with the data.
    */
  def basis(mvRoot: String): Int = {
    require(LakeTable.currentSnapshot(mvRoot) > 0, s"$mvRoot has no MV state")
    LakeTable.findContentNote(mvRoot) {
      case noteRe(f) => Some(f.toInt)
      case _ => None
    }.getOrElse(sys.error(
      s"$mvRoot carries no mmv-basis note in its live chain — " +
        "not a min/max MV (or its basis commits were expired)"))
  }

  private def state(df: DataFrame, group: String, valueCol: String,
      minName: String, maxName: String): DataFrame =
    df.groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as(minName),
        max(col(valueCol)).as(maxName))

  /** Materialize from the fact head; returns the MV snapshot. */
  def create(s: SparkSession, factRoot: String, mvRoot: String,
      group: String, valueCol: String, cfg: BlockWriter.Config,
      minName: String = null, maxName: String = null): Int = {
    val f = LakeTable.currentSnapshot(factRoot)
    val st = state(LakeTable.read(s, factRoot, Some(f)), group, valueCol,
      Option(minName).getOrElse(s"min_$valueCol"),
      Option(maxName).getOrElse(s"max_$valueCol"))
      .persist()
    try {
      // fail at CREATE, not first refresh (see refresh's NULL guard)
      require(st.filter(col(group).isNull).isEmpty,
        s"min/max MV: NULL in group column '$group' cannot be " +
          "incrementally maintained — coalesce it upstream")
      LakeTable.commit(s, mvRoot, st, cfg, Seq(group), note = s"mmv-basis-$f")
    } finally { st.unpersist(); () }
  }

  /** Fold fact changes since the basis: recompute exactly the touched
    * groups from fact snapshot `f1` (IN-filtered DSv2 scan → manifest
    * pruning), one MoR MERGE commit. Returns the new FACT basis the
    * MV reflects (f1 after a fold; the old basis on a no-op).
    */
  def refresh(s: SparkSession, factRoot: String, mvRoot: String,
      group: String, valueCol: String, cfg: BlockWriter.Config,
      minName: String = null, maxName: String = null): Int = {
    val f0 = basis(mvRoot)
    val f1 = LakeTable.currentSnapshot(factRoot)
    if (f0 == f1) return f0
    // Δ group keys: every group any change row names — insert or
    // delete pre-image. |Δ groups|-sized, the metadata-scale collect.
    val touched = LakeTable.changelogRead(s, factRoot, f0, f1)
      .select(col(group)).distinct().collect().map(_.get(0)).toSeq
    // content-preserving commits only (compaction emits zero change
    // rows): nothing to fold — leave the basis where it is, the next
    // real refresh folds across the maintenance commits for free
    if (touched.isEmpty) return f0
    // the IN filter and the eq-delete mask are equality-keyed: a NULL
    // group can neither be recomputed nor retired — fail pointedly
    require(!touched.contains(null),
      s"min/max MV: NULL in group column '$group' cannot be " +
        "incrementally maintained (equality-keyed recompute + delete " +
        "mask) — coalesce it upstream")
    // targeted recompute THROUGH THE PRUNED SCAN, PINNED at the basis
    // snapshot f1 the commit note will claim (a concurrent fact
    // commit mid-refresh must not leak into this basis): the IN
    // filter reaches the manifest, untouched groups' fact files are
    // never opened (a fact clustered by `group` reads |Δ groups|)
    val cur = state(
      s.read.format("graft-lake").option("snapshot", f1).load(factRoot)
        .filter(col(group).isin(touched: _*)),
      group, valueCol,
      Option(minName).getOrElse(s"min_$valueCol"),
      Option(maxName).getOrElse(s"max_$valueCol"))
    // align to the MANIFEST schema exactly (merge's unmapped-table
    // gate compares full schema JSON; a mask-applied read's column
    // order is join-shaped)
    val stored = LakeTable.storedSchemaOf(mvRoot).get
    import s.implicits._
    val touchedDf = touched.map(String.valueOf)
      .toDF(group).select(col(group).cast(stored(group).dataType))
    // createDataFrame re-stamps the frame with the EXACT stored
    // schema (merge's unmapped gate compares full JSON incl.
    // nullability; .to() will not relax a non-null column to the
    // table's nullable one)
    val live = s.createDataFrame(
      cur.select(stored.fieldNames.toIndexedSeq.map(col): _*).rdd, stored)
      .persist()
    try {
      if (live.isEmpty)
        // every touched group vanished: pure retirement commit
        LakeTable.deleteWhere(s, mvRoot, group, touchedDf,
          note = s"mmv-basis-$f1"): Unit
      else
        LakeTable.merge(s, mvRoot, group, live, cfg, Seq(group),
          note = s"mmv-basis-$f1", extraDeleteKeys = Some(touchedDf)): Unit
    } finally { live.unpersist(); () }
    f1
  }
}
