package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (point-in-time join): for each left row, attach the
  * payload of the right row with the greatest `timeCol` ≤ the left
  * row's `timeCol`, within the same `partitionKeys` group (inclusive
  * semantics, like DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`).
  *
  * Implementation is the union+window plan rather than a range join:
  * tag both sides, union, and carry the last right row's payload
  * forward as a SINGLE `struct(rightPayload*)` column with one
  * `last(_, ignoreNulls)` over a (ts, side, tieBreak) ordering —
  * row-atomic (payload fields can never be stitched from different
  * right rows, even when some payload columns are null), and a
  * matched-but-null payload is preserved as null rather than being
  * replaced by a stale older value; "no match" is a null struct.
  * This costs exactly ONE shuffle on the partition keys and
  * a linear per-partition pass — no range explosion, no per-key
  * buffering beyond the sort — so it scales to arbitrarily many rows
  * per key (vs. a naive windowed range join which is O(matches)).
  * Equal timestamps order the right row first (inclusive as-of); ties
  * among right rows resolve by `rightTieBreak` ascending, so the
  * LARGEST tie-break value wins (matches a `row_number ... DESC`
  * keep-one dedup on the build side).
  *
  * Left and right payload column names must be disjoint (rename
  * before calling); `partitionKeys` and `timeCol` must exist on both.
  */
object AsOfJoin {
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      partitionKeys: Seq[String],
      timeCol: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val shared = partitionKeys :+ timeCol
    val leftPayload = left.columns.toSeq.filterNot(shared.contains)
    val rightPayload = right.columns.toSeq.filterNot(shared.contains)
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"payload columns overlap: ${leftPayload.intersect(rightPayload).mkString(",")}")

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    // Right payload rides as ONE struct column: null for left rows
    // (so last(ignoreNulls) skips them), non-null for every right row
    // (even if all its payload fields are null) — one carried value,
    // atomically the latest right row's payload.
    val rightStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val taggedLeft = left.select(
      shared.map(col) ++ Seq(lit(1).as("__side")) ++ leftPayload.map(col) :+
        lit(null).cast(rightStructType).as("__rp"): _*)
    val taggedRight = right.select(
      shared.map(col) ++ Seq(lit(0).as("__side")) ++ leftPayload.map(nullOf(left, _)) :+
        struct(rightPayload.map(col): _*).as("__rp"): _*)

    val ordering: Seq[Column] =
      Seq(col(timeCol).asc, col("__side").asc) ++
        rightTieBreak.map(c => col("__rp").getField(c).asc_nulls_first)
    val w = Window.partitionBy(partitionKeys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached = taggedLeft.unionByName(taggedRight)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    rightPayload.foldLeft(attached) {
      (df, c) => df.withColumn(c, col("__rp").getField(c))
    }.drop("__side", "__rp")
  }
}
