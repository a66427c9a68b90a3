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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
