package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.Row

/** Bridge to Spark's `private[sql]` streaming-frame constructor.
  *
  * A v1 `Source.getBatch` must return a DataFrame whose logical plan
  * is tagged `isStreaming = true` (MicroBatchExecution asserts it),
  * and the only constructor for such a frame from an arbitrary batch
  * plan is `SparkSession.internalCreateDataFrame(..., isStreaming)`.
  * Spark's own external connectors solve this the same way — the
  * Kafka source lives in `org.apache.spark.sql.kafka010` and calls
  * `internalCreateDataFrame` directly — so this object sits in an
  * `org.apache.spark.sql.*` subpackage purely to satisfy the
  * `private[sql]` scope. Nothing else in the repo touches Spark
  * internals.
  */
object StreamShim {

  /** Re-tag a batch DataFrame as a streaming micro-batch result.
    * The batch plan (with its parquet pushdown/codegen intact) runs
    * as the RDD feeding the streaming frame.
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The inverse re-wrap, for a v1 `Sink.addBatch`: the micro-batch
    * frame Spark hands the sink is tagged streaming (so `.write` on
    * it is rejected); re-planting its executed RDD in a BATCH frame
    * lets the lake's ordinary commit path consume it —
    * `ForeachBatchSink` does exactly this re-wrap.
    */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
