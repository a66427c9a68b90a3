package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.writer.BlockWriter

/** CDC CONSUMPTION — apply change-feed batches to a downstream
  * MIRROR lake table. The consumer half of the change-data-feed pair
  * ([[graft.sources.GraftCdfSource]] produces the batches): a mirror
  * maintained purely from attributed change rows, never by
  * re-reading the upstream table, with write amplification
  * O(changed rows) per upstream commit.
  *
  * Apply rule, per upstream snapshot IN ORDER within the batch:
  *  1. pure-delete keys (delete pre-image keys MINUS the snapshot's
  *     insert keys) → one MoR equality-delete commit;
  *  2. insert rows → one atomic MERGE (adds + eq-delete of their own
  *     keys) — the upsert fold of the delete+insert changelog
  *     encoding, so an upstream MERGE becomes a mirror MERGE.
  *
  * Exactly-once: foreachBatch is at-least-once under driver crash,
  * so every mirror commit stamps `cdc:<snap>:<verb>` in its manifest
  * note and the loop SKIPS snapshots already stamped — checkpoint
  * offsets dedupe across drains, note markers dedupe within a
  * replayed batch. Both sides are metadata-sized reads.
  */
object CdcApply {

  private val CT = "_change_type"
  private val CS = "_change_snap"

  private def appliedMarks(mirrorRoot: String): Set[String] = {
    val head = LakeTable.currentSnapshot(mirrorRoot)
    (1 to head).map(i => LakeTable.manifest(mirrorRoot, i).note).toSet
  }

  /** Apply one change-feed micro-batch (columns: the table's schema
    * plus `_change_type`/`_change_snap`) to the mirror at
    * `mirrorRoot`. Idempotent: re-applying a batch (or any prefix of
    * one) is a no-op. Returns the number of mirror commits made.
    */
  def applyBatch(s: SparkSession, mirrorRoot: String, batch: DataFrame,
      keyCol: String, cfg: BlockWriter.Config, statCols: Seq[String]): Int = {
    val b = batch.persist()
    try {
      val snaps = b.select(col(CS)).distinct().collect().map(_.getInt(0)).sorted
      var commits = 0
      snaps.foreach { sn =>
        val seen = appliedMarks(mirrorRoot)
        val delMark = s"cdc:$sn:delete"; val upsMark = s"cdc:$sn:upsert"
        val cur = b.filter(col(CS) === sn)
        val ins = cur.filter(col(CT) === "insert").drop(CT, CS)
        val delOnly = cur.filter(col(CT) === "delete")
          .select(col(keyCol))
          .exceptAll(ins.select(col(keyCol))).distinct()
        if (!seen.contains(delMark) && LakeTable.currentSnapshot(mirrorRoot) > 0 &&
            !delOnly.isEmpty) {
          LakeTable.deleteWhere(s, mirrorRoot, keyCol, delOnly, note = delMark)
          commits += 1
        }
        if (!seen.contains(upsMark) && !ins.isEmpty) {
          if (LakeTable.currentSnapshot(mirrorRoot) == 0)
            LakeTable.commit(s, mirrorRoot, ins, cfg, statCols, note = upsMark)
          else {
            // merge's schema gate is strict on nullability — align
            // the changelog frame to the mirror's read schema
            val aligned = ins.to(LakeTable.read(s, mirrorRoot).schema)
            LakeTable.merge(s, mirrorRoot, keyCol, aligned, cfg, statCols,
              note = upsMark)
          }
          commits += 1
        }
      }
      commits
    } finally { b.unpersist(); () }
  }
}
