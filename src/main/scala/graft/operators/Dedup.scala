package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Document deduplication primitives: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard. All candidate generation is shuffle-on-bucket
  * (band key / posting list) so cost is O(N·bands + collisions) at
  * 100 TB — never an O(N²) cross join. Signatures are md5-derived
  * (SURVEY.md §5) so DuckDB oracles replay identical arithmetic.
  */
object Dedup {

  /** Word k-shingles, in document order (with multiplicity).
    *
    * PERF: `ws` must be a BOUND column (materialized via a prior
    * `withColumn`), not an inline expression tree. The lambda
    * references `ws` per shingle element; an inline tree (e.g.
    * `TextFns.words(col("text"))`) would be re-evaluated on every
    * `element_at` access — O(words²) per document (measured 10×
    * slowdown on the sf0.1 corpus).
    */
  def shingleSeq(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - lit(k)),
        i => concat_ws(" ", (1 to k).map(j => element_at(ws, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct word k-shingles (the shingle SET for Jaccard). */
  def shingleSet(ws: Column, k: Int): Column = array_distinct(shingleSeq(ws, k))

  /** documents-style frame → (idCol, shingle column), words
    * materialized first (see shingleSeq perf note).
    *
    * The k-word minimum is enforced BELOW the shingle projection, on
    * the cheap word count: a `size(sh) > 0` filter above it would be
    * pushed down with the whole shingle expression substituted into
    * the predicate and re-evaluated per row (measured 50× slower).
    * Rows that survive the gate always yield ≥1 shingle.
    */
  def withShingles(df: DataFrame, textCol: String, k: Int, distinct: Boolean,
      idCols: Seq[String], outCol: String): DataFrame = {
    val sh = if (distinct) shingleSet(col("__ws"), k) else shingleSeq(col("__ws"), k)
    df.withColumn("__ws", graft.functions.TextFns.words(col(textCol)))
      .filter(size(col("__ws")) >= k)
      .select(idCols.map(col) :+ sh.as(outCol): _*)
  }

  /** Modulus for affine minhash rehashing (prime, < 2^31 so the
    * product a·(h mod P) stays well inside 63 bits). */
  val MH_P = 1000000007L

  private def md5Long(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Affine rehash multiplier a_i ∈ [1, P) — md5-derived so the
    * DuckDB oracle embeds the identical literal. */
  def mhA(i: Int): Long = 1L + md5Long(s"mha|$i") % (MH_P - 1)

  /** Affine rehash offset b_i ∈ [0, P). */
  def mhB(i: Int): Long = md5Long(s"mhb|$i") % MH_P

  /** MinHash signature element i over PRE-HASHED shingles (a
    * materialized `hash60` array): min over the per-gram affine
    * rehash (a_i·(h mod P) + b_i) mod P. The universal-hash-family
    * form costs ONE md5 per gram total (the base hash) instead of one
    * per (gram, signature-row) — at 12 rows that is 12× less hashing
    * in the dominant map-side pass of every MinHash dedup.
    */
  def minhashSig(whs: Column, i: Int): Column =
    array_min(transform(whs,
      h => (lit(mhA(i)) * (h % lit(MH_P)) + lit(mhB(i))) % lit(MH_P)))

  /** LSH band key: md5 over `r` consecutive signature values
    * (sig columns named s0..s{n-1}, band b covers s[b*r..b*r+r-1]).
    */
  def bandKey(b: Int, r: Int): Column =
    md5(concat_ws(",", (0 until r).map(j => col(s"s${b * r + j}").cast("string")): _*))

  /** `bits`-wide SimHash over a (multiplicity-preserving) feature
    * hash array: bit b is set iff more feature hashes have bit b set
    * than unset. Evaluated per static bit with codegen'd shifts; the
    * hash array is materialized once per row (non-cheap expression —
    * Catalyst keeps the projection boundary, no 48× md5 recompute).
    */
  def simhash(featureHashes: Column, bits: Int): Column =
    call_function("graft_simhash", featureHashes, lit(bits))

  /** The composed-functions SimHash (spec-checked equal to [[simhash]];
    * the native expression is one fused pass instead of `bits` filter
    * passes each materializing an array). Bit test uses LOGICAL shift
    * + mask, matching the native expression's `(h >>> b) & 1` for any
    * long input — an arithmetic `shiftright` with `% 2` diverges on
    * negative hashes (Spark's % yields -1 there).
    */
  def simhashComposed(featureHashes: Column, bits: Int): Column =
    (0 until bits).map { b =>
      when(lit(2) * size(filter(featureHashes,
        h => shiftrightunsigned(h, b).bitwiseAND(lit(1L)) === lit(1L))) - size(featureHashes) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact Jaccard (basis points, integer-exact) of two array sets. */
  def jaccardBp(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("bigint")
    val uni = size(array_union(a, b)).cast("bigint")
    ((inter * lit(10000L) - ((inter * lit(10000L)) % uni)) / uni).cast("bigint")
  }

  /** Candidate pairs from an exploded (doc_id, bucket-cols) table:
    * docs sharing a bucket, each unordered pair once. The self-join
    * shuffles on the bucket key only — embarrassingly parallel.
    */
  def candidatePairs(buckets: DataFrame, docCol: String, bucketCols: Seq[String]): DataFrame = {
    val a = buckets.as("a")
    val b = buckets.as("b")
    val cond = bucketCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
      col(s"a.$docCol") < col(s"b.$docCol")
    a.join(b, cond)
      .select(col(s"a.$docCol").as("doc_a"), col(s"b.$docCol").as("doc_b"))
      .distinct()
  }
}
