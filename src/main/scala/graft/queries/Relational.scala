package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational operator coverage (SURVEY.md §2, relational block).
  *
  * Every query is a declarative DataFrame plan — Catalyst handles
  * pushdown/pruning/join selection; comments note the scale-relevant
  * physical shape we expect (verified via .explain in specs/bench).
  *
  * Oracle parity rules (SURVEY.md §5): aggregates over doubles are
  * rounded identically on both sides; every computed column is
  * aliased identically in the SQL twin in [[Relational.oracles]].
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** round(x, 2) helper matching DuckDB ROUND(x, 2) on doubles. */
  private def r2(c: Column): Column = round(c, 2)

  // --- q1_pricing: TPC-H Q1-style scan + groupBy multi-agg.
  // Scale: single shuffle on (returnflag, linestatus) — 6 groups —
  // with map-side partial aggregation; scan reads only 7 columns.
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        r2(avg(col("l_quantity"))).as("avg_qty"),
        r2(avg(col("l_extendedprice"))).as("avg_price"),
        r2(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  ROUND(AVG(l_quantity), 2) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 2) AS avg_price,
      |  ROUND(AVG(l_discount), 2) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> q1Pricing)

  val oracles: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql)
}
