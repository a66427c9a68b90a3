package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector algebra over `array<float>` embedding columns, in double
  * precision, via `zip_with`/`aggregate` — pure Catalyst expressions
  * (no UDF, no driver collect). Pseudo-random hyperplanes derive from
  * md5 so LSH signatures are reproducible bit-for-bit in the DuckDB
  * oracle (SURVEY.md §5).
  */
object VectorFns {

  /** float[] → double[] (float→double widening is exact). */
  def toD(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product — same accumulation order as the
    * oracle's list_reduce, so doubles match bit-for-bit.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** cosine(a, b) given precomputed norms (avoid recomputing). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Cosine in integer basis points (floor) — cross-engine-stable
    * output representation for compares and thresholds.
    */
  def cosineBp(a: Column, b: Column, normA: Column, normB: Column): Column =
    floor(cosine(a, b, normA, normB) * lit(10000)).cast("bigint")

  /** Same value via the native [[CosineSim]] expression (fused
    * single-pass codegen loop — the pair-scoring hot path). Bit-equal
    * to the composed form: identical IEEE op order. Requires
    * [[graft.plans.GraftExtensions]] registration.
    */
  def cosineBpNative(a: Column, b: Column): Column =
    floor(call_function("graft_cosine", a, b) * lit(10000)).cast("bigint")

  /** Deterministic pseudo-random hyperplane component numerators
    * (denominator 1000): md5-derived integers in [-1000, 1000],
    * identical formula on the oracle side. Computed in Scala (they
    * parameterize literal plan constants).
    */
  def hyperplaneInts(j: Int, dim: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { d =>
      val hex = md.digest(s"$j,$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
  }

  def hyperplane(j: Int, dim: Int): Seq[Double] =
    hyperplaneInts(j, dim).map(_ / 1000.0)

  /** Sign-bit LSH signature: bit j = (v · hyperplane_j) > 0. Returns
    * an integer signature with `nBits` bits — one map-side pass, the
    * standard random-hyperplane sketch for angular distance.
    */
  def lshSignature(v: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { j =>
      val hp = array(hyperplane(j, dim).map(lit): _*)
      when(dot(v, hp) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
