package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.writer.BlockWriter

/** The MATERIALIZED IVF index — the production shape of inverted-file
  * ANN, persisted as two manifest-tracked [[LakeTable]]s instead of
  * retrained inside every consumer query (the [[MinhashIndex]]
  * lifecycle, applied to the embedding space):
  *
  *  - `<root>/codebook` : (cid, ci) — the trained K-cell integer
  *    k-means codebook ([[graft.queries.Advanced.kmCentroids]], one
  *    Lloyd update from the first-K seed);
  *  - `<root>/cells`    : (vec_id, cid, d2) — every corpus vector's
  *    nearest-cell assignment (the inverted lists), with its integer
  *    squared distance (dedup_semantic's keep-policy input).
  *
  * An offline job trains ONCE and commits both; every probe query
  * (ann_ivf, dedup_semantic, kmeans_embed's reporting) then reads
  * 8 codebook rows + the assignment table — zero k-means jobs in the
  * probe path. At 100 TB this is exactly the artifact a production
  * vector-search service maintains: codebook training is amortized
  * over every query ever issued, and re-training is an explicit
  * offline refresh, not a per-query tax.
  *
  * Determinism: training is all-integer (scaled ×1e6, floor), so the
  * DuckDB oracles replay the identical arithmetic from the raw
  * embeddings table — materialization changes WHERE the codebook is
  * computed, never its values.
  */
object IvfIndex {

  final case class Ref(root: String) {
    def codebookPath: String = s"$root/codebook"
    def cellsPath: String = s"$root/cells"
  }

  private val refs = new java.util.concurrent.ConcurrentHashMap[String, Ref]()
  private val buildLock = new Object

  private def refFor(dir: String): Ref =
    refs.computeIfAbsent(dir, _ => Ref(graft.util.Scratch.dir("graft_ivfidx_")))

  /** Assignment write fan-out derived from the input volume (same
    * rule as [[MinhashIndex]]): one partition per ~8 MB of source
    * embeddings, floored at 4, capped at session parallelism.
    */
  private def idxParallelism(s: SparkSession, dir: String): Int = {
    val bytes =
      try java.nio.file.Files.size(java.nio.file.Paths.get(dir, "embeddings.parquet"))
      catch { case _: Exception => Long.MaxValue }
    val cap = s.sessionState.conf.numShufflePartitions
    math.min(cap.toLong, math.max(4L, bytes / (8L << 20))).toInt
  }

  /** Ensure the trained artifact exists — the "offline training job".
    * Idempotent, session-memoized; `base` is only evaluated on the
    * first call per corpus.
    */
  def ensure(s: SparkSession, dir: String, base: => DataFrame,
      cacheKey: String = null): Ref =
    buildLock.synchronized {
      // a non-null cacheKey gives the caller a PRIVATE artifact (e.g.
      // the delete-lifecycle fixture must not mask rows out of the
      // shared corpus index other probes read)
      val ref = refFor(Option(cacheKey).getOrElse(dir))
      if (LakeTable.currentSnapshot(ref.codebookPath) < 1) {
        val b = base
        LakeTable.commit(s, ref.codebookPath,
          graft.queries.Advanced.kmCentroids(b, graft.queries.Advanced.KM_K, 1),
          BlockWriter.Config("cid", "cid", maxRecordsPerFile = 1 << 20,
            parallelism = Some(1)),
          Seq("cid"))
        // inverted lists assign against the PERSISTED codebook —
        // training is not repeated
        LakeTable.commit(s, ref.cellsPath,
          graft.queries.Advanced.kmAssign(b, codebook(s, ref)),
          BlockWriter.Config("cid", "vec_id", maxRecordsPerFile = 1 << 20,
            parallelism = Some(idxParallelism(s, dir))),
          Seq("vec_id", "cid"))
      }
      ref
    }

  /** RETIRE vectors from the inverted lists — the day-2 lifecycle
    * event (revoked licenses, takedowns) every production vector
    * store must handle: ONE MoR equality-delete commit on the cells
    * table, O(|retired|) write, untouched list files stay
    * byte-identical; every later probe reads the masked table — no
    * index rebuild, no tombstone filter bolted onto the query path.
    */
  def retire(s: SparkSession, ref: Ref, keys: DataFrame): Unit =
    LakeTable.deleteWhere(s, ref.cellsPath, "vec_id", keys,
      note = "ivf-retire"): Unit

  /** The K-row trained codebook (cid, ci) — broadcast-sized. */
  def codebook(s: SparkSession, ref: Ref): DataFrame =
    LakeTable.read(s, ref.codebookPath)

  /** The corpus inverted lists (vec_id, cid, d2). */
  def cells(s: SparkSession, ref: Ref): DataFrame =
    LakeTable.read(s, ref.cellsPath)

  // ---------------- incremental maintenance ----------------
  //
  // The lifecycle a production vector service actually runs: the
  // codebook trains ONCE on the standing corpus and then FREEZES;
  // every arriving batch is assigned against the frozen codebook (one
  // broadcast cross join + map-side argmin — ZERO k-means jobs) and
  // appended to the inverted-list table as one atomic commit. Because
  // per-vector assignment is independent, the post-append index is
  // EXACTLY the index a from-scratch re-assignment of the full corpus
  // against the same codebook would build — the law the
  // ann_ivf_append oracle replays. Re-TRAINING stays an explicit
  // offline decision (codebook drift policy), never an append tax.

  /** Corpus/batch split for the incremental lifecycle (same
    * convention as [[MinhashIndex.batchPred]]).
    */
  def batchPred: org.apache.spark.sql.Column = col("vec_id") % 10 === 0

  private val incrRefs = new java.util.concurrent.ConcurrentHashMap[String, Ref]()

  private def incrRefFor(dir: String): Ref =
    incrRefs.computeIfAbsent(dir, _ => Ref(graft.util.Scratch.dir("graft_ivfincr_")))

  /** Train-and-freeze on the CORPUS partition only (`base` is the
    * full int-vector frame; the batch rows are excluded from
    * training AND from the initial lists). Seed ids < K+1: the
    * corpus partition excludes vec_id 0, so the first [[graft.queries.Advanced.KM_K]]
    * corpus vectors seed the codebook. Idempotent.
    */
  def ensureCorpusIvf(s: SparkSession, dir: String, base: => DataFrame): Ref =
    buildLock.synchronized {
      val ref = incrRefFor(dir)
      if (LakeTable.currentSnapshot(ref.codebookPath) < 1) {
        val corpus = graft.util.QueryScratch.cached(base.filter(!batchPred))
        LakeTable.commit(s, ref.codebookPath,
          graft.queries.Advanced.kmCentroids(corpus,
            graft.queries.Advanced.KM_K + 1, 1),
          BlockWriter.Config("cid", "cid", maxRecordsPerFile = 1 << 20,
            parallelism = Some(1)),
          Seq("cid"))
        LakeTable.commit(s, ref.cellsPath,
          graft.queries.Advanced.kmAssign(corpus, codebook(s, ref)),
          BlockWriter.Config("cid", "vec_id", maxRecordsPerFile = 1 << 20,
            parallelism = Some(idxParallelism(s, dir))),
          Seq("vec_id", "cid"))
      }
      ref
    }

  /** Append a batch to the frozen-codebook index: assign against the
    * PERSISTED codebook, commit the assignments as one append. The
    * codebook table is never touched (its snapshot stays 1 — the
    * spec's no-retraining pin). IDEMPOTENT per `batchId` (the commit
    * note carries it, like the streaming sink's epoch idempotence):
    * re-invoking with an already-landed id — a bench rerun, a retried
    * job — is a no-op, not a duplicate append. Returns the
    * cells-table head snapshot.
    */
  def appendBatch(s: SparkSession, dir: String, batch: DataFrame,
      batchId: String = "batch"): Int =
    buildLock.synchronized {
      val ref = incrRefFor(dir)
      require(LakeTable.currentSnapshot(ref.codebookPath) >= 1,
        s"ivf append: no frozen codebook for $dir — run ensureCorpusIvf first")
      val note = s"ivf-append-$batchId"
      val head = LakeTable.currentSnapshot(ref.cellsPath)
      // O(delta) replay ledger: the incrementally-cached note set,
      // never a per-append walk of the commit history
      val landed = LakeTable.manifestNotes(ref.cellsPath).contains(note)
      if (landed) head
      else LakeTable.commit(s, ref.cellsPath,
        graft.queries.Advanced.kmAssign(batch, codebook(s, ref)),
        BlockWriter.Config("cid", "vec_id", maxRecordsPerFile = 1 << 20,
          parallelism = Some(4)),
        Seq("vec_id", "cid"), note = note)
    }

  // ---------------- codebook drift policy ----------------

  /** THE REFRESH TRIGGER the frozen-codebook lifecycle needs: measure
    * recall@K of the index AS IT STANDS (frozen codebook + every
    * appended batch's assignments) against the exact ranking on the
    * post-append corpus, and report `retrain` / `keep`. Run after
    * appends, it is the drift gate that decides when "re-training is
    * an explicit offline refresh" actually fires: arriving data the
    * stale cells no longer separate (mass between old centroids, new
    * modes) degrades probe recall, and the verdict flips once the
    * corpus-level recall falls below `retrainBp`.
    *
    * Scale shape: truth is ONE exact scan (the ann_topk plan — query
    * side broadcast, no corpus shuffle); the probe reads `nprobe`
    * cells' lists; the comparison joins two K-row-per-query sets —
    * metadata-sized at any corpus. Every score is integer basis
    * points, so the DuckDB oracle replays the gate exactly.
    *
    * @param e  (vec_id, v: array<double>) — the post-append corpus
    * @param vi (vec_id, vi: array<bigint>) — its integer vectors
    * @param nQueries queries are `vec_id < nQueries` (the standard
    *   query convention of the ann_* family)
    */
  def recallGate(s: SparkSession, ref: Ref, e: DataFrame, vi: DataFrame,
      nQueries: Int, nprobe: Int, k: Int, retrainBp: Long): DataFrame = {
    import graft.functions.VectorFns
    import org.apache.spark.sql.expressions.Window
    val cents = codebook(s, ref)
    val cls = cells(s, ref).select(col("vec_id"), col("cid").as("cell"))
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("cid").asc)
    val qProbe = vi.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        graft.queries.Advanced.kmD2(col("vi"), col("ci")).as("d2"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("cid").as("cell"))
    val cand = cls.join(broadcast(qProbe), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id")).distinct()
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_bp").desc, col("n_id").asc)
    val got = cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("v").as("nv")), "n_id")
      .select(col("q_id"), col("n_id"),
        VectorFns.cosineBpNative(col("qv"), col("nv")).as("cos_bp"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val truth = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        VectorFns.cosineBpNative(col("qv"), col("v")).as("cos_bp"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"))
    val perQ = truth
      .join(got.withColumn("hit", lit(1L)), Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).cast("bigint").as("n_hits"))
      .withColumn("recall_bp", (col("n_hits") * 10000L / k).cast("bigint"))
    val overall = perQ.agg(
      (sum(col("n_hits")) * 10000L / (count(lit(1)) * k))
        .cast("bigint").as("corpus_recall_bp"))
    perQ.crossJoin(broadcast(overall))
      .withColumn("verdict",
        when(col("corpus_recall_bp") < retrainBp, "retrain").otherwise("keep"))
      .select(col("q_id"), col("n_hits"), col("recall_bp"),
        col("corpus_recall_bp"), col("verdict"))
      .orderBy(col("q_id"))
  }
}
