package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.lake.LakeTable
import graft.operators.MinhashIndex
import graft.writer.BlockWriter

/** STREAMING NEAR-DUP INGEST — the production composition of the
  * engine's three artifacts: each arriving micro-batch of documents
  * probes the PERSISTED MinHash band index (a [[LakeTable]]), drops
  * docs that LSH-collide with anything already indexed, commits the
  * survivors to a results lake table, and appends the survivors'
  * bands to the index — each step one atomic commit, idempotent by
  * batch id. This is the continuous-crawl dedup service the
  * reference's streaming pipeline (main.go:62-115) feeds at 100 TB:
  * per batch the work is O(batch · bands + collisions); the corpus
  * is only ever touched through the index artifact, and because the
  * index append is itself a lake commit, a restart resumes from a
  * consistent (results, index) pair.
  *
  * Candidate semantics: a band-key collision drops the doc (the
  * recall-oriented gate a crawler wants); the exact-Jaccard verify
  * tier on top of candidates is the batch path's job
  * (dedup_incremental / dedup_minhash, both oracle-gated).
  */
object DedupStream {

  /** Drain `inDir` (arriving document files) through the near-dup
    * gate into `resultsRoot`, maintaining `bandsRoot` as batches
    * land; returns (results commits, index commits).
    */
  def runOnceDedupToLake(
      spark: SparkSession,
      inDir: String,
      resultsRoot: String,
      bandsRoot: String,
      cfg: BlockWriter.Config,
      maxFilesPerTrigger: Int = 1,
      checkpoint: String = null): (Int, Int) = {
    val schema = spark.read.parquet(inDir).schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(inDir)
    val q = in.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val head = LakeTable.currentSnapshot(resultsRoot)
        val done = head > 0 &&
          LakeTable.manifest(resultsRoot, head).note == s"batch-$id"
        if (!done && !batch.isEmpty) {
          val df = batch.toDF()
          val bands = graft.util.QueryScratch.cached(
            MinhashIndex.bandsOf(MinhashIndex.baseOf(df)))
          val dupIds = bands
            .join(LakeTable.read(spark, bandsRoot), Seq("band", "bk"), "left_semi")
            .select("doc_id").distinct()
          val keep = graft.util.QueryScratch.cached(
            df.join(dupIds, Seq("doc_id"), "left_anti"))
          if (!keep.isEmpty) {
            LakeTable.commit(spark, resultsRoot, keep, cfg,
              Seq("doc_id"), note = s"batch-$id")
            // index maintenance: survivors' bands join the corpus so
            // LATER batches dedup against them too
            LakeTable.commit(spark, bandsRoot,
              bands.join(keep.select("doc_id"), Seq("doc_id"), "left_semi"),
              cfg, Seq("doc_id"), note = s"batch-$id"): Unit
          }
          graft.util.QueryScratch.release(spark)
        }
      }
      .option("checkpointLocation",
        Option(checkpoint).getOrElse(graft.util.Scratch.dir("graft_ddst_ck_")))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (LakeTable.currentSnapshot(resultsRoot), LakeTable.currentSnapshot(bandsRoot))
  }

  /** The batch-mode twin: fold the same files in the same order —
    * the spec's equivalence oracle for the streaming path.
    */
  def batchFold(spark: SparkSession, files: Seq[String],
      corpusBands: DataFrame): Seq[Long] = {
    var index = corpusBands
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    files.foreach { f =>
      val df = spark.read.parquet(f)
      val bands = MinhashIndex.bandsOf(MinhashIndex.baseOf(df)).cache()
      val dupIds = bands.join(index, Seq("band", "bk"), "left_semi")
        .select("doc_id").distinct()
      val keep = df.join(dupIds, Seq("doc_id"), "left_anti")
      kept ++= keep.select("doc_id").collect().map(_.getLong(0))
      index = index.unionByName(
        bands.join(keep.select("doc_id"), Seq("doc_id"), "left_semi"))
    }
    kept.toSeq.sorted
  }
}
