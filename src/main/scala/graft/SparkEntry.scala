package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Geo, Lake, LlmPipeline, Relational, StreamingQ, WritePath}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) / §7 (plan). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The end-to-end training-data pipeline exercises the
    * whole engine: text quality scoring, MinHash+LSH dedup,
    * stratified sampling, chunking, sequence packing.
    */
  def entry(spark: SparkSession): DataFrame =
    LlmPipeline.pipelineE2e(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ WritePath.all ++ LlmPipeline.all ++ StreamingQ.all ++
      Advanced.all ++ Lake.all ++ Geo.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ WritePath.oracles ++ LlmPipeline.oracles ++
      StreamingQ.oracles ++ Advanced.oracles ++ Lake.oracles ++ Geo.oracles
}
