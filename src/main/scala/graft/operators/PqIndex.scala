package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.writer.BlockWriter

/** The MATERIALIZED IVF-PQ index — [[IvfIndex]]'s economics applied to
  * the composed FAISS-IVFADC artifact (coarse inverted lists + PQ
  * codes of residuals), persisted as manifest-tracked lake tables:
  *
  *  - a dedicated incremental [[IvfIndex]] instance (coarse codebook
  *    frozen on the standing corpus + inverted lists);
  *  - `<root>/pqbooks` : (sub, cid, ci) — the two per-subspace
  *    residual codebooks, trained ONCE on corpus residuals, frozen;
  *  - `<root>/codes`   : (vec_id, cid, code1, code2) — every vector's
  *    coarse cell and residual PQ codes (the bytes-per-vector payload
  *    an ADC scan reads).
  *
  * Incremental lifecycle, same law as the other three artifacts (band
  * index, IVF lists, cluster labels): every arriving batch assigns
  * against the FROZEN coarse + PQ codebooks (broadcast, map-side
  * argmin — zero training jobs) and lands as ONE idempotent append
  * commit; because per-vector encoding is independent, the post-append
  * codes table EQUALS a from-scratch re-encode of the full corpus
  * against the same frozen codebooks — the oracle's replay. Re-training
  * (coarse or PQ) stays an explicit offline refresh decision, gated by
  * [[IvfIndex.recallGate]]'s drift verdict.
  */
object PqIndex {

  final case class Ref(ivfKey: String, root: String) {
    def pqBooksPath: String = s"$root/pqbooks"
    def codesPath: String = s"$root/codes"
  }

  val SubDim = 32 // 64 dims → 2 subspaces of 32

  private val refs = new java.util.concurrent.ConcurrentHashMap[String, Ref]()
  private val buildLock = new Object

  private def refFor(dir: String): Ref =
    refs.computeIfAbsent(dir,
      _ => Ref(s"$dir#pq-coarse", graft.util.Scratch.dir("graft_pqidx_")))

  private def residualsOf(s: SparkSession, ivf: IvfIndex.Ref,
      vi: DataFrame): DataFrame =
    vi.join(IvfIndex.cells(s, ivf).select(col("vec_id"), col("cid")), "vec_id")
      .join(broadcast(IvfIndex.codebook(s, ivf)), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("vi"), col("ci"), (a, b) => a - b).as("ri"))

  private def encode(resid: DataFrame, books: DataFrame): DataFrame = {
    val cb1 = books.filter(col("sub") === 1).select(col("cid"), col("ci"))
    val cb2 = books.filter(col("sub") === 2).select(col("cid"), col("ci"))
    val s1 = resid.select(col("vec_id"), slice(col("ri"), 1, SubDim).as("vi"))
    val s2 = resid.select(col("vec_id"), slice(col("ri"), SubDim + 1, SubDim).as("vi"))
    graft.queries.Advanced.kmAssign(s1, cb1)
      .select(col("vec_id"), col("cid").as("code1"))
      .join(graft.queries.Advanced.kmAssign(s2, cb2)
        .select(col("vec_id"), col("cid").as("code2")), "vec_id")
      .join(resid.select(col("vec_id"), col("cid")), "vec_id")
      .select(col("vec_id"), col("cid"), col("code1"), col("code2"))
  }

  /** Train-and-freeze on the CORPUS partition ([[IvfIndex.batchPred]]
    * excluded from coarse AND PQ training and from the initial
    * artifacts). Idempotent, session-memoized.
    */
  def ensureCorpusPq(s: SparkSession, dir: String, base: => DataFrame): Ref =
    buildLock.synchronized {
      val ref = refFor(dir)
      val ivf = IvfIndex.ensureCorpusIvf(s, ref.ivfKey, base)
      // each artifact's init is gated on ITS OWN head: a failure (or
      // retried bench query) between the two commits leaves books
      // committed but codes absent, and the retry must land the codes
      // instead of silently serving a codes-less "built" index
      val needBooks = LakeTable.currentSnapshot(ref.pqBooksPath) < 1
      val needCodes = LakeTable.currentSnapshot(ref.codesPath) < 1
      if (needBooks || needCodes) {
        val corpusResid = graft.util.QueryScratch.cached(
          residualsOf(s, ivf, base.filter(!IvfIndex.batchPred)))
        if (needBooks) {
          val books = (1 to 2).map { sub =>
            val lo = (sub - 1) * SubDim + 1
            graft.queries.Advanced.kmCentroids(
              corpusResid.select(col("vec_id"), slice(col("ri"), lo, SubDim).as("vi")),
              graft.queries.Advanced.KM_K, 1).withColumn("sub", lit(sub))
          }.reduce(_ unionByName _)
          LakeTable.commit(s, ref.pqBooksPath, books,
            BlockWriter.Config("sub", "cid", maxRecordsPerFile = 1 << 20,
              parallelism = Some(1)), Seq("sub", "cid")): Unit
        }
        if (needCodes)
          LakeTable.commit(s, ref.codesPath,
            encode(corpusResid, LakeTable.read(s, ref.pqBooksPath)),
            BlockWriter.Config("cid", "vec_id", maxRecordsPerFile = 1 << 20,
              parallelism = Some(4)), Seq("vec_id", "cid")): Unit
      }
      ref
    }

  /** Append a batch: coarse-assign against the frozen coarse codebook
    * (one IVF append commit on the dedicated instance), residual-encode
    * against the frozen PQ books, land the codes as ONE idempotent
    * append commit. Returns the codes-table head snapshot.
    */
  def appendBatch(s: SparkSession, dir: String, batch: DataFrame,
      batchId: String = "batch"): Int =
    buildLock.synchronized {
      val ref = refFor(dir)
      require(LakeTable.currentSnapshot(ref.pqBooksPath) >= 1,
        s"pq append: no frozen codebooks for $dir — run ensureCorpusPq first")
      IvfIndex.appendBatch(s, ref.ivfKey, batch, batchId)
      val note = s"pq-append-$batchId"
      val head = LakeTable.currentSnapshot(ref.codesPath)
      // O(delta) replay ledger via the incrementally-cached note set
      val landed = LakeTable.manifestNotes(ref.codesPath).contains(note)
      if (landed) head
      else {
        val ivf = IvfIndex.ensureCorpusIvf(s, ref.ivfKey, batch /* unused */)
        LakeTable.commit(s, ref.codesPath,
          encode(residualsOf(s, ivf, batch), LakeTable.read(s, ref.pqBooksPath)),
          BlockWriter.Config("cid", "vec_id", maxRecordsPerFile = 1 << 20,
            parallelism = Some(4)), Seq("vec_id", "cid"), note = note)
      }
    }

  def codes(s: SparkSession, dir: String): DataFrame =
    LakeTable.read(s, refFor(dir).codesPath)
}
