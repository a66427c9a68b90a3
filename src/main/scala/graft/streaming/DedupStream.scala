package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.lake.LakeTable
import graft.operators.{Dedup, MinhashIndex}
import graft.writer.BlockWriter

/** STREAMING NEAR-DUP INGEST — the production composition of the
  * engine's index artifacts: each arriving micro-batch of documents
  * probes the PERSISTED MinHash band index (a [[LakeTable]]),
  * EXACT-VERIFIES every band collision against the persisted shingle
  * sets (Jaccard ≥ τ — the same tier the batch paths dedup_minhash /
  * dedup_incremental gate), drops only verified near-dups, commits
  * the survivors to a results lake table, and appends the survivors'
  * shingle sets + bands to the index — each step one atomic commit,
  * idempotent by batch id. This is the continuous-crawl dedup service
  * the reference's streaming pipeline (main.go:62-115) feeds at
  * 100 TB: per batch the work is O(batch · bands + collisions); the
  * corpus is only ever touched through the index artifacts, and
  * because the index appends are themselves lake commits, a restart
  * resumes from a consistent (results, index) pair.
  *
  * Candidate semantics: a band-key collision is a CANDIDATE, not a
  * verdict — two genuinely distinct documents sharing one LSH band
  * (p ≈ s^rows per band even at low similarity s) must BOTH survive.
  * The verify tier costs O(collisions) per batch: the collision pair
  * set is tiny, the corpus shingle sets arrive through a broadcast
  * probe of the base table keyed by exactly the colliding ids.
  */
object DedupStream {

  /** Exact-verify threshold, basis points (0.5 Jaccard — the batch
    * paths' τ).
    */
  val TauBp = 5000

  /** Has `root`'s HEAD commit already recorded this batch? Batches
    * are sequential (one foreachBatch at a time), so the head note is
    * a complete replay ledger for the table it sits on — but ONLY for
    * that table: results, base and bands are separate commits, and a
    * crash between them must leave the un-committed ones still due.
    */
  private def hasBatch(root: String, id: Long): Boolean = {
    val head = LakeTable.currentSnapshot(root)
    head > 0 && LakeTable.manifest(root, head).note == s"batch-$id"
  }

  /** ASYMMETRIC INDEX PROBE — which of this batch's docs LSH-collide
    * with anything already indexed, and with WHAT? The corpus-scale
    * side is the persisted band index, so it must be the STREAMED
    * side of the join: inner-join it against the broadcast
    * micro-batch bands and project the colliding (batch doc, corpus
    * doc) pairs. A left-semi with the corpus on the right would force
    * Spark to broadcast or shuffle the whole index per micro-batch
    * (only the RIGHT side of a semi can broadcast); this shape plans
    * the corpus as scan → broadcast-hash-join probe, zero Exchange on
    * the index side at any index size (StreamingSpec pins the plan —
    * the only shuffle is the collision-sized distinct on the probe
    * output). Same shape as the oracle-gated batch twin,
    * `dedup_incremental`.
    */
  def probeCandidates(spark: SparkSession, bandsRoot: String,
      bands: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    LakeTable.read(spark, bandsRoot)
      .join(broadcast(bands.select("band", "bk", "doc_id")
        .withColumnRenamed("doc_id", "probe_doc_id")), Seq("band", "bk"))
      .select(col("probe_doc_id"), col("doc_id").as("corpus_doc_id"))
      .distinct()
  }

  /** Band-collision probe WITHOUT the verify tier (the raw candidate
    * gate) — kept for plan pinning and as the recall-oriented shape.
    */
  def probeDupIds(spark: SparkSession, bandsRoot: String,
      bands: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    probeCandidates(spark, bandsRoot, bands)
      .select(col("probe_doc_id").as("doc_id")).distinct()
  }

  /** The VERIFIED drop set: batch doc ids whose band collision is
    * confirmed by exact Jaccard ≥ τ over the persisted shingle sets.
    * Cost shape: the candidate pair set is O(collisions); the corpus
    * base table is PROBED with the broadcast colliding-id set (scan →
    * broadcast-hash-join, zero Exchange on the base side), the batch
    * side's shingle sets are broadcast — nothing corpus-sized ever
    * shuffles, and false-positive band collisions survive the gate.
    */
  def verifiedDupIds(spark: SparkSession, bandsRoot: String,
      baseRoot: String, bands: DataFrame, base: DataFrame,
      tauBp: Int = TauBp): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val cand = graft.util.QueryScratch.cached(
      probeCandidates(spark, bandsRoot, bands))
    val corpusWhs = LakeTable.read(spark, baseRoot)
      .join(broadcast(cand.select(col("corpus_doc_id").as("doc_id")).distinct()),
        Seq("doc_id"))
      .select(col("doc_id").as("corpus_doc_id"), col("whs").as("shb"))
    cand.join(corpusWhs, "corpus_doc_id")
      .join(broadcast(base.select(col("doc_id").as("probe_doc_id"),
        col("whs").as("sha"))), "probe_doc_id")
      .filter(Dedup.jaccardBp(col("sha"), col("shb")) >= tauBp)
      .select(col("probe_doc_id").as("doc_id")).distinct()
  }

  /** Drain `inDir` (arriving document files) through the verified
    * near-dup gate into `resultsRoot`, maintaining the two index
    * tables (`baseRoot`: (doc_id, whs) shingle sets, `bandsRoot`:
    * (doc_id, band, bk)) as batches land; returns (results commits,
    * index commits).
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
      baseRoot: String,
      cfg: BlockWriter.Config,
      maxFilesPerTrigger: Int = 1,
      checkpoint: String = null): (Int, Int) = {
    val schema = spark.read.parquet(inDir).schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(inDir)
    val q = in.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // per-TABLE idempotence: a replay after a crash between the
        // commits repairs exactly the missing ones — the dedup result
        // is reproducible because the index tables do not yet contain
        // this batch's entries while any commit is due
        val resultsDone = hasBatch(resultsRoot, id)
        val baseDone = hasBatch(baseRoot, id)
        val bandsDone = hasBatch(bandsRoot, id)
        if (!(resultsDone && baseDone && bandsDone) && !batch.isEmpty) {
          val df = batch.toDF()
          val base = graft.util.QueryScratch.cached(MinhashIndex.baseOf(df))
          val bands = graft.util.QueryScratch.cached(MinhashIndex.bandsOf(base))
          val dupIds = verifiedDupIds(spark, bandsRoot, baseRoot, bands, base)
          val keep = graft.util.QueryScratch.cached(
            df.join(dupIds, Seq("doc_id"), "left_anti"))
          if (!keep.isEmpty) {
            if (!resultsDone)
              LakeTable.commit(spark, resultsRoot, keep, cfg,
                Seq("doc_id"), note = s"batch-$id"): Unit
            // index maintenance: survivors' shingle sets + bands join
            // the corpus so LATER batches dedup against them too
            if (!baseDone)
              LakeTable.commit(spark, baseRoot,
                base.join(keep.select("doc_id"), Seq("doc_id"), "left_semi"),
                cfg, Seq("doc_id"), note = s"batch-$id"): Unit
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

  /** The batch-mode twin: fold the same files in the same order
    * through the same VERIFIED gate — the spec's equivalence oracle
    * for the streaming path.
    */
  def batchFold(spark: SparkSession, files: Seq[String],
      corpusBands: DataFrame, corpusBase: DataFrame): Seq[Long] = {
    import org.apache.spark.sql.functions.col
    var bandsIdx = corpusBands
    var baseIdx = corpusBase
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    files.foreach { f =>
      val df = spark.read.parquet(f)
      val base = MinhashIndex.baseOf(df).cache()
      val bands = MinhashIndex.bandsOf(base).cache()
      val cand = bands.join(bandsIdx
          .select(col("band"), col("bk"), col("doc_id").as("corpus_doc_id")),
          Seq("band", "bk"))
        .select(col("doc_id"), col("corpus_doc_id")).distinct()
      val dupIds = cand
        .join(baseIdx.select(col("doc_id").as("corpus_doc_id"),
          col("whs").as("shb")), "corpus_doc_id")
        .join(base.select(col("doc_id"), col("whs").as("sha")), "doc_id")
        .filter(Dedup.jaccardBp(col("sha"), col("shb")) >= TauBp)
        .select("doc_id").distinct()
      val keep = df.join(dupIds, Seq("doc_id"), "left_anti")
      kept ++= keep.select("doc_id").collect().map(_.getLong(0))
      baseIdx = baseIdx.unionByName(
        base.join(keep.select("doc_id"), Seq("doc_id"), "left_semi"))
      bandsIdx = bandsIdx.unionByName(
        bands.join(keep.select("doc_id"), Seq("doc_id"), "left_semi"))
    }
    kept.toSeq.sorted
  }
}
