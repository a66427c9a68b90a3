package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table loader over a driver-generated scale-factor directory
  * (TESTDATA.md). One parquet file/dir per table.
  *
  * Scale note: `spark.read.parquet` yields splittable columnar scans;
  * filters/projections push down to the parquet reader, so the same
  * call pattern works unchanged on a 100 TB multi-file table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet carries TIMESTAMP(NANOS) which the vectorized
    * reader rejects; read nanos as long and restore micros precision
    * (floor ns→us, matching DuckDB's ns→us truncation). The conf is
    * also set at session construction by [[graft.GraftSession]]; it is
    * (re)set here immediately before the raw read so `load` stays
    * correct on a caller-supplied session too.
    */
  def ensureParquetConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Driver testdata now writes TIMESTAMP(MICROS, isAdjustedToUTC=false);
    // read it as TimestampType (UTC session ⇒ stored micros = epoch
    // micros, DuckDB-equivalent) rather than TIMESTAMP_NTZ.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // graft's native SQL functions ride along on any session that
    // reads the source tables (idempotent).
    graft.plans.GraftExtensions.register(spark)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    ensureParquetConfs(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      // Defensive: if a caller-supplied session already read the file
      // with NTZ inference on, normalize to TimestampType (UTC session
      // ⇒ value-preserving on the underlying micros).
      case (d, f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        d.withColumn(f.name, org.apache.spark.sql.functions.col(f.name)
          .cast(org.apache.spark.sql.types.TimestampType))
      case (d, _) => d
    }
  }

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
