package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** DECLARED z-order clustering — the write-side kernel behind
  * `CREATE TABLE … PARTITIONED BY (zorder(a, b))`: each batch is
  * range-clustered on the bit-interleave of the two columns'
  * QUANTILE buckets, so every file's (a, b) extents are tight in
  * BOTH dimensions and a 2-D predicate prunes by manifest min/max
  * stats alone — the Delta `OPTIMIZE ZORDER BY` layout, declared
  * once as DDL and honored by every append and `CALL compact`.
  *
  * Quantile (rank) bucketing, not uniform width: cut points come
  * from one `approxQuantile` pass over the batch being written, so
  * a skewed column still spreads across all 256 buckets — uniform
  * buckets would collapse a heavy-tailed dimension into one bucket
  * and z-values would degenerate to the other dimension. The pass
  * is one aggregate over data already being shuffled for the write;
  * at 100 TB per-append that is the same one-scan analysis cost
  * every production z-order writer pays.
  *
  * The z VALUE is transport, not data: it rides the reserved
  * [[graft.writer.BlockWriter.ClusterTmp]] column through the range
  * shuffle + sort and is dropped before the save.
  */
object ZOrder {

  /** Buckets per dimension (2^8 = 256; z-values span 16 bits). */
  val Bits = 8

  private def asDouble(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c)).cast("double")
      case DateType => datediff(col(c), to_date(lit("1970-01-01"))).cast("double")
      case _ => col(c).cast("double")
    }

  /** Quantile bucket of `c` against fixed cut points, as a depth-8
    * `when` tree (codegen-friendly binary search; a higher-order
    * `aggregate` over 255 literals would evaluate interpreted).
    * Nulls land in bucket 0.
    */
  private def bucketExpr(c: Column, cuts: Array[Double]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo.toLong)
      else {
        val mid = (lo + hi) / 2
        when(c < lit(cuts(mid)), go(lo, mid)).otherwise(go(mid + 1, hi))
      }
    when(c.isNull, lit(0L)).otherwise(go(0, cuts.length))
  }

  /** Morton bit-spread of an 8-bit bucket value at stride `d`
    * (bit i → bit d·i), precomputed driver-side as a 256-entry
    * table. `element_at(table, bucket + 1)` references each dim's
    * bucket expression EXACTLY ONCE — the generic interleave
    * ([[graft.queries.Advanced.zInterleaveN]]) references each dim
    * [[Bits]] times, which with the 511-node quantile `when`-tree per
    * dim built a ~12k-node z expression whose analysis + codegen
    * (and per-row evaluation through the range-partitioner's sampling
    * AND the write's sort) dominated every declared-z-order append.
    */
  private def spreadTable(d: Int): Array[Long] =
    Array.tabulate(1 << Bits) { v =>
      (0 until Bits).map(i => ((v.toLong >> i) & 1L) << (d * i)).sum
    }

  /** The batch's z-value column for 2..4 dims: ONE approxQuantile
    * action over the batch derives 255 cut points per dim; the
    * returned expression is pure map-side arithmetic (each dim's
    * quantile bucket evaluated once, spread through the lookup
    * table, OR-combined — same z value as the bitwise interleave,
    * linear-sized expression tree).
    */
  def zColumn(batch: DataFrame, cols: Seq[String]): Column = {
    require(cols.length >= 2, s"zorder needs >= 2 columns, got $cols")
    val probes = (1 until (1 << Bits)).map(_.toDouble / (1 << Bits)).toArray
    val names = cols.indices.map(i => s"_z$i")
    val proj = batch.select(cols.zip(names).map { case (c, n) =>
      asDouble(batch, c).as(n) }: _*)
    val cuts = proj.stat.approxQuantile(names.toArray, probes, 0.001)
    val table = lit(spreadTable(cols.length))
    cols.zipWithIndex.map { case (c, j) =>
      shiftleft(element_at(table,
        (bucketExpr(asDouble(batch, c), cuts(j)) + lit(1L)).cast("int")), j)
    }.reduce(_.bitwiseOR(_)).cast("bigint")
  }

  def zColumn(batch: DataFrame, a: String, b: String): Column =
    zColumn(batch, Seq(a, b))
}
