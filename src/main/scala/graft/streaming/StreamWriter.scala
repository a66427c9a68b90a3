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

  /** Stream every file under `inDir` (a DIRECTORY — the streaming
    * file source requires one; stage single files into a dir first,
    * see [[stageDir]]) into a partitioned lake layout at `outPath`,
    * synchronously (AvailableNow = drain everything, then stop —
    * deterministic for verification; swap the trigger for
    * `ProcessingTime(maxAgeMs)` in a live deployment).
    */
  def runOnce(
      spark: SparkSession,
      inDir: String,
      outPath: String,
      checkpoint: String,
      cfg: BlockWriter.Config,
      maxAgeMs: Long = 60000L): Unit = {
    // source tables may carry TIMESTAMP(NANOS); this conf must be live
    // BEFORE the schema probe below — do not rely on an earlier
    // Tables.load having set it on this session.
    graft.sources.Tables.ensureParquetConfs(spark)
    // schema must be known up front for a streaming file source; probe
    // it with a batch read (cheap: footer only).
    val schema = spark.read.parquet(inDir).schema
    val in = spark.readStream.schema(schema).parquet(inDir)
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

  /** Stage a single parquet file under a fresh directory so it is a
    * valid streaming-file-source basePath. Cheap (one local copy);
    * in a real deployment the ingest path is already a directory of
    * arriving files, exactly like the reference's input stream.
    */
  def stageDir(file: String): String = {
    val dir = graft.util.Scratch.dir("graft_stream_in_")
    val src = java.nio.file.Paths.get(file)
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(dir).resolve(src.getFileName))
    dir
  }
}
