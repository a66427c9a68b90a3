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

  /** Has `root`'s HEAD commit already recorded this batch? Batches
    * are sequential (one foreachBatch at a time), so the head note is
    * a complete replay ledger for the table it sits on — but ONLY for
    * that table: results and bands are separate commits, and a crash
    * between them must leave the un-committed one still due.
    */
  private def hasBatch(root: String, id: Long): Boolean = {
    val head = LakeTable.currentSnapshot(root)
    head > 0 && LakeTable.manifest(root, head).note == s"batch-$id"
  }

  /** ASYMMETRIC INDEX PROBE — which of this batch's docs LSH-collide
    * with anything already indexed? The corpus-scale side is the
    * persisted band index, so it must be the STREAMED side of the
    * join: inner-join it against the broadcast micro-batch bands and
    * project the batch doc_ids that collided. A left-semi with the
    * corpus on the right would force Spark to broadcast or shuffle
    * the whole index per micro-batch (only the RIGHT side of a semi
    * can broadcast); this shape plans the corpus as scan →
    * broadcast-hash-join probe, zero Exchange on the index side at
    * any index size (StreamingSpec pins the plan — the only shuffle
    * is the batch-sized distinct on the probe output). Same shape as
    * the oracle-gated batch twin, `dedup_incremental`.
    */
  def probeDupIds(spark: SparkSession, bandsRoot: String,
      bands: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    LakeTable.read(spark, bandsRoot)
      .join(broadcast(bands.select("band", "bk", "doc_id")
        .withColumnRenamed("doc_id", "probe_doc_id")), Seq("band", "bk"))
      .select(col("probe_doc_id").as("doc_id")).distinct()
  }

  /** Drain `inDir` (arriving document files) through the near-dup
    * gate into `resultsRoot`, maintaining `bandsRoot` as batches
    * land; returns (results commits, index commits).
    *
    * The default checkpoint is DERIVED from (inDir, resultsRoot), so
    * a re-invocation of the same pipeline resumes from the file-source
    * offset instead of replaying every input file from batch 0 (and
    * spuriously matching a stale `batch-0` head note).
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
        // per-TABLE idempotence: a replay after a crash between the
        // two commits repairs exactly the missing one — the dedup
        // result is reproducible because the bands table does not yet
        // contain this batch's bands while either commit is due
        val resultsDone = hasBatch(resultsRoot, id)
        val bandsDone = hasBatch(bandsRoot, id)
        if (!(resultsDone && bandsDone) && !batch.isEmpty) {
          val df = batch.toDF()
          val bands = graft.util.QueryScratch.cached(
            MinhashIndex.bandsOf(MinhashIndex.baseOf(df)))
          val dupIds = probeDupIds(spark, bandsRoot, bands)
          val keep = graft.util.QueryScratch.cached(
            df.join(dupIds, Seq("doc_id"), "left_anti"))
          if (!keep.isEmpty) {
            if (!resultsDone)
              LakeTable.commit(spark, resultsRoot, keep, cfg,
                Seq("doc_id"), note = s"batch-$id"): Unit
            // index maintenance: survivors' bands join the corpus so
            // LATER batches dedup against them too
            if (!bandsDone)
              LakeTable.commit(spark, bandsRoot,
                bands.join(keep.select("doc_id"), Seq("doc_id"), "left_semi"),
                cfg, Seq("doc_id"), note = s"batch-$id"): Unit
          }
          graft.util.QueryScratch.release(spark)
        }
      }
      .option("checkpointLocation",
        Option(checkpoint).getOrElse {
          val key = java.lang.Integer.toHexString(
            (inDir + "\u0000" + resultsRoot + "\u0000" + bandsRoot).hashCode)
          s"$resultsRoot/_ingest_checkpoint-$key"
        })
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
