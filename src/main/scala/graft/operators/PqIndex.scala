package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.writer.BlockWriter

/** The MATERIALIZED IVF-PQ index — [[IvfIndex]]'s economics applied to
  * the composed FAISS-IVFADC artifact (coarse inverted lists + PQ
  * codes of residuals), persisted as manifest-tracked lake tables:
  *
  *  - a dedicated incremental [[IvfIndex]] instance (coarse codebook
  *    frozen on the standing corpus + inverted lists);
  *  - `<root>/pqbooks` : (sub, cid, ci) — the M per-subspace residual
  *    codebooks, trained ONCE on corpus residuals, frozen;
  *  - `<root>/codes`   : (vec_id, cid, codes) — every vector's coarse
  *    cell and its M residual PQ codes as an ARRAY column (the
  *    bytes-per-vector payload an ADC scan reads).
  *
  * GEOMETRY IS A PARAMETER: `m` subspaces of 64/m dims each — the
  * production recall/memory dial (FAISS runs M=8-16 on real
  * embeddings; the sf corpus gates M=2 and M=4). Each M value is its
  * own frozen artifact (codes are meaningless across geometries), so
  * the session registry keys on (dir, m).
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

  final case class Ref(ivfKey: String, root: String, m: Int) {
    def pqBooksPath: String = s"$root/pqbooks"
    def codesPath: String = s"$root/codes"
    def subDim: Int = Dim / m
  }

  /** Embedding dimensionality (the testdata's). */
  val Dim = 64

  /** Default geometry: 2 subspaces of 32. */
  val DefaultM = 2

  private val refs = new java.util.concurrent.ConcurrentHashMap[String, Ref]()
  private val buildLock = new Object

  private def refFor(dir: String, m: Int): Ref = {
    require(m > 0 && Dim % m == 0, s"PQ geometry: M=$m must divide $Dim")
    // the coarse quantizer is M-INDEPENDENT (M only partitions the
    // residual), so every geometry shares ONE frozen coarse index —
    // training it per M would duplicate the corpus-sized artifact
    // and its per-batch append work for identical results
    refs.computeIfAbsent(s"$dir#m$m",
      _ => Ref(s"$dir#pq-coarse", graft.util.Scratch.dir("graft_pqidx_"), m))
  }

  private def residualsOf(s: SparkSession, ivf: IvfIndex.Ref,
      vi: DataFrame): DataFrame =
    vi.join(IvfIndex.cells(s, ivf).select(col("vec_id"), col("cid")), "vec_id")
      .join(broadcast(IvfIndex.codebook(s, ivf)), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("vi"), col("ci"), (a, b) => a - b).as("ri"))

  /** Residual-encode against the M frozen sub-books: per subspace a
    * broadcast argmin ([[graft.queries.Advanced.kmAssign]]), the M
    * codes collected into ONE array column — at scale the codes table
    * carries m small ints per vector, nothing else.
    */
  private def encode(resid: DataFrame, books: DataFrame, m: Int,
      subDim: Int): DataFrame = {
    val subCodes: Seq[DataFrame] = (1 to m).map { sub =>
      val cb = books.filter(col("sub") === sub).select(col("cid"), col("ci"))
      val sl = resid.select(col("vec_id"),
        slice(col("ri"), (sub - 1) * subDim + 1, subDim).as("vi"))
      graft.queries.Advanced.kmAssign(sl, cb)
        .select(col("vec_id"), col("cid").as(s"c$sub"))
    }
    subCodes.reduce(_.join(_, "vec_id"))
      .join(resid.select(col("vec_id"), col("cid")), "vec_id")
      .select(col("vec_id"), col("cid"),
        array((1 to m).map(sub => col(s"c$sub")): _*).as("codes"))
  }

  /** Train-and-freeze on the CORPUS partition ([[IvfIndex.batchPred]]
    * excluded from coarse AND PQ training and from the initial
    * artifacts). Idempotent, session-memoized; each artifact's init
    * is gated on ITS OWN table head, so a failure between the two
    * commits re-lands exactly the missing one.
    */
  def ensureCorpusPq(s: SparkSession, dir: String, base: => DataFrame,
      m: Int = DefaultM): Ref =
    buildLock.synchronized {
      val ref = refFor(dir, m)
      val ivf = IvfIndex.ensureCorpusIvf(s, ref.ivfKey, base)
      val needBooks = LakeTable.currentSnapshot(ref.pqBooksPath) < 1
      val needCodes = LakeTable.currentSnapshot(ref.codesPath) < 1
      if (needBooks || needCodes) {
        val corpusResid = graft.util.QueryScratch.cached(
          residualsOf(s, ivf, base.filter(!IvfIndex.batchPred)))
        if (needBooks) {
          val books = (1 to m).map { sub =>
            val lo = (sub - 1) * ref.subDim + 1
            graft.queries.Advanced.kmCentroids(
              corpusResid.select(col("vec_id"),
                slice(col("ri"), lo, ref.subDim).as("vi")),
              graft.queries.Advanced.KM_K, 1).withColumn("sub", lit(sub))
          }.reduce(_ unionByName _)
          LakeTable.commit(s, ref.pqBooksPath, books,
            BlockWriter.Config("sub", "cid", maxRecordsPerFile = 1 << 20,
              parallelism = Some(1)), Seq("sub", "cid")): Unit
        }
        if (needCodes)
          LakeTable.commit(s, ref.codesPath,
            encode(corpusResid, LakeTable.read(s, ref.pqBooksPath), m, ref.subDim),
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
      batchId: String = "batch", m: Int = DefaultM): Int =
    buildLock.synchronized {
      val ref = refFor(dir, m)
      require(LakeTable.currentSnapshot(ref.pqBooksPath) >= 1,
        s"pq append: no frozen codebooks for $dir (M=$m) — run ensureCorpusPq first")
      IvfIndex.appendBatch(s, ref.ivfKey, batch, batchId)
      val note = s"pq-append-$batchId"
      val head = LakeTable.currentSnapshot(ref.codesPath)
      // O(delta) replay ledger via the incrementally-cached note set
      val landed = LakeTable.manifestNotes(ref.codesPath).contains(note)
      if (landed) head
      else {
        val ivf = IvfIndex.ensureCorpusIvf(s, ref.ivfKey, batch /* unused */)
        LakeTable.commit(s, ref.codesPath,
          encode(residualsOf(s, ivf, batch),
            LakeTable.read(s, ref.pqBooksPath), m, ref.subDim),
          BlockWriter.Config("cid", "vec_id", maxRecordsPerFile = 1 << 20,
            parallelism = Some(4)), Seq("vec_id", "cid"), note = note)
      }
    }

  /** The persisted codes: (vec_id, cid, codes[1..m]). */
  def codes(s: SparkSession, dir: String, m: Int = DefaultM): DataFrame =
    LakeTable.read(s, refFor(dir, m).codesPath)

  /** Code of subspace `sub` (1-based) from the array column. */
  def codeOf(sub: Int): Column = element_at(col("codes"), sub)
}
