package graft.writer

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance half of a block-based lake
  * writer: streaming flushes (reference MaxAge, main.go:77) produce
  * many sub-MaxSize files per partition; compaction rewrites each
  * partition's files into the fewest key-sorted files.
  *
  * Scale: the rewrite is the same one-shuffle BlockWriter plan, so
  * compaction cost is O(bytes rewritten) with no driver-side file
  * listing loops — Spark's parquet source lists in parallel.
  */
object Compactor {

  /** Rewrite `inPath` (a BlockWriter layout) into `outPath` with a
    * larger per-file row bound. Callers verify by reading `outPath`;
    * no extra verification scan here.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      cfg: BlockWriter.Config): Unit = {
    val df = spark.read.format(cfg.format).load(inPath)
    BlockWriter.write(df, outPath, cfg)
  }
}
