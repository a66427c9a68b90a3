package graft

import org.apache.spark.sql.SparkSession

/** Canonical tuned session builder for the engine.
  *
  * Every conf the engine depends on is set HERE, at construction —
  * not as a side effect of some loader call — so any code path
  * (batch, streaming, tests) sees the same session semantics
  * regardless of call order:
  *
  *  - `nanosAsLong`: the driver's events.parquet carries
  *    TIMESTAMP(NANOS), which Spark's vectorized reader rejects;
  *    reading nanos as long lets [[graft.sources.Tables]] restore
  *    microsecond timestamps deterministically (DuckDB-equivalent
  *    ns→µs truncation).
  *  - UTC session timezone: oracle parity for all date/ts functions.
  *  - shuffle.partitions = cores (local mode); AQE coalesces further
  *    at runtime, and on a real cluster this would be set to
  *    2-3× total executor cores.
  */
object GraftSession {

  /** Apply graft's required confs to any builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Parquet TIMESTAMP with isAdjustedToUTC=false (the driver's
    // events.parquet as of round 8) must read as TimestampType, not
    // TIMESTAMP_NTZ: the engine's temporal operators use unix_micros
    // and with a UTC session the stored micros are the epoch micros —
    // exactly DuckDB's reading of a naive timestamp.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.parquet.compression.codec", "snappy")
    // INT64 micros (not INT96) so commit-time stats collection can
    // read timestamp min/max straight from parquet footers
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // Local-FS write-path tuning (file-count-heavy lake layouts):
    // RawLocalFileSystem skips the client-side .crc shadow file per
    // output file (halves file ops; parquet has its own page CRCs),
    // and commit algorithm v2 moves task outputs to the final
    // location at task commit instead of a serial driver-side rename
    // pass at job commit. On a real cluster the equivalents are the
    // S3A/ABFS zero-rename committers.
    .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.sql.parquet.output.committer.class",
      "org.apache.parquet.hadoop.ParquetOutputCommitter")
    .config("spark.hadoop.parquet.summary.metadata.level", "NONE")

  /** A tuned local[n] session (bench / verify / tests). */
  def local(cpus: String): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
