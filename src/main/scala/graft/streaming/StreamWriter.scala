package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.writer.BlockWriter

/** Streaming analog of the reference pipeline (main.go:62-87):
  * FileStreamAdapter → BlockManager(MaxAge, MaxSize) →
  * FilesystemStorageAdapter, as Structured Streaming:
  *
  *   readStream(files) → writeStream.partitionBy(partitionCol)
  *     .option(maxRecordsPerFile = MaxSize)
  *     .trigger(ProcessingTime = MaxAge)
  *
  * The trigger interval IS the MaxAge bound — a block (file) is
  * flushed at the latest one trigger after its first row arrived;
  * `maxRecordsPerFile` is the MaxSize bound. Checkpointing gives the
  * exactly-once file commit the reference approximates with its
  * Finished channel. At scale the sink commits via the file-sink
  * metadata log — no coordinator bottleneck beyond the driver commit.
  */
object StreamWriter {

  /** Stream every file under `inGlob` into a partitioned lake layout
    * at `outPath`, synchronously (AvailableNow = drain everything,
    * then stop — deterministic for verification; swap the trigger for
    * `ProcessingTime(maxAgeMs)` in a live deployment).
    */
  def runOnce(
      spark: SparkSession,
      inGlob: String,
      outPath: String,
      checkpoint: String,
      cfg: BlockWriter.Config,
      maxAgeMs: Long = 60000L): Unit = {
    // schema must be known up front for a streaming file source; probe
    // it with a batch read (cheap: footer only).
    val schema = spark.read.parquet(inGlob).schema
    val in = spark.readStream.schema(schema).parquet(inGlob)
    val restored = // same ns→µs restore as Tables.load
      if (schema.fieldNames.contains("ts") &&
          schema("ts").dataType == org.apache.spark.sql.types.LongType)
        in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val q = restored
      .repartition(col(cfg.partitionCol))
      .writeStream
      .format(cfg.format)
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .option("maxRecordsPerFile", cfg.maxRecordsPerFile.toLong)
      .option("compression", cfg.compression)
      .partitionBy(cfg.partitionCol)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
