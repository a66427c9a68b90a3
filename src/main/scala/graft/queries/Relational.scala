package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.AsOfJoin

/** Relational operator coverage (SURVEY.md §2, relational block).
  *
  * Every query is a declarative DataFrame plan — Catalyst handles
  * pushdown/pruning/join selection; comments note the scale-relevant
  * physical shape (verified via .explain in specs/bench).
  *
  * Oracle parity rules (SURVEY.md §5): double aggregates rounded
  * identically on both sides; identical aliases; deterministic total
  * ordering on every result.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def r2(c: Column): Column = round(c, 2)

  // --- q1_pricing: TPC-H Q1-style scan + groupBy multi-agg.
  // Scale: one shuffle onto 6 groups with map-side partial agg; the
  // scan reads only the 7 referenced columns (column pruning).
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

  // --- q3_priority: TPC-H Q3-style 3-way join + agg + top-k.
  // Scale: customer filter first (selective), join orders then
  // lineitem on keys (shuffle joins on orderkey — the natural
  // co-partitioning); final top-10 is TakeOrderedAndProject (per-
  // partition heap + driver merge of k, no global sort).
  def q3Priority(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-03-15").cast("timestamp")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < cut)
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3PrioritySql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // --- q5_region_rev: TPC-H Q5-style 6-way star join.
  // Scale: region/nation/supplier/customer are dims → broadcast;
  // only the orders⨝lineitem fact join shuffles, keyed on orderkey.
  def q5RegionRev(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val r = t(s, dir, "region")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val o = t(s, dir, "orders").filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = t(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q5RegionRevSql: String =
    """SELECT r_name, n_name,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // --- q_pushdown: selective filter + narrow projection; the whole
  // predicate and the 4-column read-schema must reach the parquet
  // scan (PushedFilters / ReadSchema in .explain).
  def qPushdown(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 49 &&
        col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2000-02-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), r2(col("l_extendedprice")).as("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val qPushdownSql: String =
    """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
      |FROM lineitem
      |WHERE l_quantity > 49
      |  AND l_shipdate >= TIMESTAMP '2000-01-01'
      |  AND l_shipdate < TIMESTAMP '2000-02-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --- q_topk: ORDER BY + LIMIT → TakeOrderedAndProject (bounded
  // per-partition heaps, no global sort — survives any scale).
  def qTopk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), r2(col("o_totalprice")).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(15)

  val qTopkSql: String =
    """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
      |FROM orders
      |ORDER BY price DESC, o_orderkey
      |LIMIT 15""".stripMargin

  // --- q_distinct: exact distinct aggregates (expand + two-phase agg).
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val qDistinctSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- q_window: rank + running sum per customer. One shuffle on
  // o_custkey serves both window functions (same partitioning);
  // total order inside the frame via (o_orderdate, o_orderkey).
  def qWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("running_spend", r2(sum(col("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("running_spend"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val qWindowSql: String =
    """SELECT o_custkey, o_orderkey, rn, running_spend FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |    ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
      |  FROM orders) x
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // --- q_semi_anti: left-semi (EXISTS) + left-anti (NOT EXISTS),
  // aggregated per market segment. Both sides of the distinct-custkey
  // build are small relative to the fact table → broadcastable.
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val any = o.select(col("o_custkey")).distinct()
    val withUrgent = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_urgent"))
    val noOrders = c.join(any, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_no_orders"))
    val total = c.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
    total
      .join(withUrgent, Seq("c_mktsegment"), "left")
      .join(noOrders, Seq("c_mktsegment"), "left")
      .na.fill(0, Seq("n_with_urgent", "n_no_orders"))
      .select(col("c_mktsegment"), col("n_with_urgent"), col("n_no_orders"), col("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val qSemiAntiSql: String =
    """SELECT c_mktsegment,
      |  COUNT(u.o_custkey) AS n_with_urgent,
      |  COUNT(*) - COUNT(a.o_custkey) AS n_no_orders,
      |  COUNT(*) AS n_customers
      |FROM customer
      |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') u
      |  ON c_custkey = u.o_custkey
      |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) a
      |  ON c_custkey = a.o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // --- q_rollup: hierarchical aggregate (year → priority) via ROLLUP
  // (Expand + single agg shuffle; grouping-set NULLs ordered first).
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .rollup(col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice"))).as("total"))
      .orderBy(asc_nulls_first("o_year"), asc_nulls_first("o_orderpriority"))

  val qRollupSql: String =
    """SELECT EXTRACT(YEAR FROM o_orderdate)::INT AS o_year, o_orderpriority,
      |  COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_year, o_orderpriority)
      |ORDER BY o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // --- q_pivot: conditional aggregation / pivot with explicit pivot
  // values (no extra pass to discover them — required at scale).
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy(col("o_year"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .withColumnRenamed("1-URGENT", "p_urgent")
      .withColumnRenamed("2-HIGH", "p_high")
      .withColumnRenamed("3-MEDIUM", "p_medium")
      .withColumnRenamed("4-NOT SPECIFIED", "p_notspec")
      .withColumnRenamed("5-LOW", "p_low")
      .orderBy(col("o_year"))

  val qPivotSql: String =
    """SELECT EXTRACT(YEAR FROM o_orderdate)::INT AS o_year,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
      |FROM orders
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // --- q_subquery: orders 1.5× above their customer's average
  // (correlated scalar subquery ≡ self-join against a groupBy —
  // expressed as the join, which is what Catalyst decorrelates to).
  def qSubquery(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val avgPer = o.groupBy(col("o_custkey").as("k"))
      .agg(avg(col("o_totalprice")).as("avg_price"))
    o.join(avgPer, col("o_custkey") === col("k"))
      .filter(col("o_totalprice") > col("avg_price") * 1.5)
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_big_orders"), r2(sum(col("o_totalprice"))).as("big_total"))
      .orderBy(col("c_mktsegment"))
  }

  val qSubquerySql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_big_orders,
      |  ROUND(SUM(o_totalprice), 2) AS big_total
      |FROM orders o
      |JOIN (SELECT o_custkey AS k, AVG(o_totalprice) AS avg_price
      |      FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.k
      |JOIN customer ON o.o_custkey = c_custkey
      |WHERE o_totalprice > avg_price * 1.5
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // --- q_setops: INTERSECT / EXCEPT / UNION over user-id sets
  // (hash-partitioned set ops; each is one shuffle on user_id).
  def qSetops(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def users(tpe: String) = e.filter(col("event_type") === tpe).select(col("user_id"))
    users("click").intersect(users("purchase"))
      .except(users("error"))
      .union(users("signup").filter(col("user_id") < 5)).distinct()
      .orderBy(col("user_id"))
  }

  val qSetopsSql: String =
    """SELECT DISTINCT user_id FROM (
      |  (SELECT user_id FROM events WHERE event_type = 'click'
      |   INTERSECT
      |   SELECT user_id FROM events WHERE event_type = 'purchase')
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'error'
      |  UNION
      |  SELECT user_id FROM events WHERE event_type = 'signup' AND user_id < 5
      |) ORDER BY user_id""".stripMargin

  // --- q_asof_join: for each purchase, the most recent click at or
  // before it by the same user. DuckDB oracle uses native ASOF JOIN;
  // our implementation is the scalable union+window plan (one shuffle
  // on user_id, no range-explosion) — see operators/AsOfJoin.scala.
  // --- q_skew_agg: two-phase SALTED aggregation over a pathological
  // key (event_type: 5 values × 100k rows → 5 hot reducers). Phase 1
  // aggregates on (key, salt) — 16× the parallelism — phase 2 merges
  // the 16 partials per key. Identical semantics to a plain groupBy
  // (the oracle IS the plain groupBy); the pattern is what survives a
  // 100× scale-up where one hot key would OOM a reducer. (AQE skew
  // handling covers joins; skewed aggregation needs this manual form.)
  // salt fan-out follows the session's reducer parallelism (floored
  // at 16): a compile-time constant would freeze the hot key's
  // aggregation parallelism regardless of cluster size. The salt is
  // re-aggregated away in the second stage, so the derivation never
  // touches the result (or the oracle).
  private def saltBuckets(s: SparkSession): Int =
    math.max(16, s.sessionState.conf.numShufflePartitions)

  def qSkewAgg(s: SparkSession, dir: String): DataFrame = {
    val salted = t(s, dir, "events")
      .withColumn("salt", pmod(hash(col("event_id")), lit(saltBuckets(s))))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("n_p"), sum(col("value")).as("sum_p"),
        min(col("value")).as("min_p"), max(col("value")).as("max_p"))
    salted
      .groupBy(col("event_type"))
      .agg(sum(col("n_p")).as("n"),
        r2(sum(col("sum_p"))).as("sum_value"),
        r2(min(col("min_p"))).as("min_value"),
        r2(max(col("max_p"))).as("max_value"))
      .orderBy(col("event_type"))
  }

  val qSkewAggSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  ROUND(SUM(value), 2) AS sum_value,
      |  ROUND(MIN(value), 2) AS min_value,
      |  ROUND(MAX(value), 2) AS max_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- q_bucket_join: co-located join via bucketed tables — both
  // sides written bucketBy(8, orderkey) + sortBy, so the join reads
  // bucket-aligned files and needs NO shuffle exchange (spec asserts
  // it). This is the pre-partitioning strategy for repeated fact-fact
  // joins at 100 TB: pay the layout once, join shuffle-free forever.
  // External-table paths keep the warehouse out of the working dir.
  def qBucketJoin(s: SparkSession, dir: String): DataFrame = {
    val li = tmpDir("graft_bli_")
    val ord = tmpDir("graft_bord_")
    s.sql("DROP TABLE IF EXISTS graft_li_b")
    s.sql("DROP TABLE IF EXISTS graft_ord_b")
    // repartition on the bucket column with numPartitions a MULTIPLE
    // of the bucket count (same murmur3 hash, so hash%32=p implies
    // hash%8=p%8): every task holds rows of exactly one bucket —
    // one file per task instead of tasks×buckets — at full
    // parallelism (multiple files per bucket are fine for bucketed
    // reads).
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .repartition(32, col("l_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", li).saveAsTable("graft_li_b")
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .repartition(32, col("o_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", ord).saveAsTable("graft_ord_b")
    s.table("graft_li_b")
      .join(s.table("graft_ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private def tmpDir(prefix: String): String = graft.util.Scratch.dir(prefix)

  val qBucketJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- q_window_range: RANGE-framed window — trailing 7-day sum /
  // count per user over event time (the feature-engineering moving
  // aggregate). The frame is on the integer µs timestamp so both
  // engines bound it identically; one shuffle on user_id.
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val sevenDaysUs = 7L * 86400L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-sevenDaysUs, 0)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("sum_7d", r2(sum(col("value")).over(w)))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("n_7d"), col("sum_7d"))
      .orderBy(col("event_id"))
  }

  val qWindowRangeSql: String =
    """SELECT event_id, user_id, EPOCH_US(ts) AS ts_us,
      |  COUNT(*) OVER w AS n_7d,
      |  ROUND(SUM(value) OVER w, 2) AS sum_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
      |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // --- q_percentile: exact quantiles (linear interpolation — the
  // deterministic complement to q_approx's sketches). Exact
  // percentile is a per-group sort; at scale you reach for the
  // sketch, which is why both live in the inventory.
  def qPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val qPercentileSql: String =
    """SELECT event_type,
      |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(value, 0.9), 4) AS p90,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- q_cube: CUBE hierarchy agg (all grouping-set combinations)
  // with grouping_id disambiguation — complements q_rollup. Same
  // single-shuffle partial-agg shape; the cube expansion is map-side.
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("bigint").as("gid"),
        count(lit(1)).as("n"),
        r2(sum(col("l_quantity"))).as("sum_qty"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("rf"), col("ls"))

  val qCubeSql: String =
    """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  COALESCE(l_returnflag, '<all>') AS rf,
      |  COALESCE(l_linestatus, '<all>') AS ls,
      |  COUNT(*) AS n,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, rf, ls""".stripMargin

  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
        col("value").as("click_value"))
    AsOfJoin.leftAsOf(purchases, clicks,
        partitionKeys = Seq("user_id"), timeCol = "ts",
        rightTieBreak = Seq("click_id"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("click_id"), r2(col("click_value")).as("click_value"))
      .filter(col("click_id").isNotNull)
      .orderBy(col("event_id"))
  }

  val qAsofJoinSql: String =
    """SELECT p.event_id, p.user_id, EPOCH_US(p.ts) AS ts_us,
      |  c.event_id AS click_id, ROUND(c.value, 2) AS click_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'click') WHERE rn = 1) c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  // --- q_range_join: click→purchase conversion pairs within 10
  // minutes, same user. Equi-key on user_id keeps this a hash/SMJ
  // join with a residual range predicate — never a cross product.
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val a = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    a.join(b, Seq("user_id"))
      .filter(col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        r2(avg(unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))) / 1000000L)
          .as("avg_gap_sec"))
      .orderBy(col("user_id"))
  }

  val qRangeJoinSql: String =
    """SELECT a.user_id, COUNT(*) AS n_pairs,
      |  ROUND(AVG(EPOCH_US(b.ts) - EPOCH_US(a.ts)) / 1000000, 2) AS avg_gap_sec
      |FROM (SELECT * FROM events WHERE event_type = 'click') a
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  // --- q_dates: calendar extraction + day bucketing.
  def qDates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        r2(sum(col("value"))).as("total_value"))
      .withColumn("dom", dayofmonth(to_date(col("day"))))
      .select(col("day"), col("dom"), col("n_events"), col("n_users"), col("total_value"))
      .orderBy(col("day"))

  val qDatesSql: String =
    """SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
      |  EXTRACT(DAY FROM ts)::INT AS dom,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  ROUND(SUM(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day""".stripMargin

  // --- q_strings: string/regex functions over documents.
  // --- q_sql_api: the SQL front door — the engine's tables registered
  // as views and queried through spark.sql TEXT (TPC-H Q6 shape:
  // selective scan + single aggregate). Proves a reference user can
  // bring plain SQL, with the same Catalyst plan (pushdown, pruning,
  // partial agg) as the DataFrame API; graft's native functions are
  // SQL-callable through the same session extension.
  def qSqlApi(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_x100,
        |  COUNT(*) AS n,
        |  CAST(SUM(graft_hash60(CAST(l_orderkey AS STRING)) % 1000003) AS BIGINT) AS key_ck
        |FROM lineitem_v
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  val qSqlApiSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_x100,
      |  COUNT(*) AS n,
      |  CAST(SUM(('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT % 1000003) AS BIGINT) AS key_ck
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- q_decorr: CORRELATED scalar subqueries (the TPC-H Q17 shape:
  // "lineitems below a fraction of their part's average quantity")
  // written as actual correlated SQL so CATALYST'S DECORRELATION does
  // the rewrite — both per-part aggregates plan as one shuffled agg
  // joined back on l_partkey, never a per-row re-execution (a
  // correlated subquery naively evaluated at 100 TB is a full scan
  // PER ROW; decorrelated it is one extra agg + join on the
  // correlation key). The threshold is integer-exact
  // (2·qty·cnt < sum ⟺ qty < 0.5·avg for integral quantities), so no
  // cross-engine float-average hazard. Oracle replays the identical
  // correlated SQL on DuckDB, which decorrelates the same way.
  def qDecorr(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_dc")
    Tables.load(s, dir, "part").createOrReplaceTempView("part_dc")
    s.sql(
      """SELECT p_brand, COUNT(*) AS n_small,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS small_rev_x100
        |FROM lineitem_dc JOIN part_dc ON p_partkey = l_partkey
        |WHERE 2 * CAST(l_quantity AS BIGINT) *
        |    (SELECT COUNT(*) FROM lineitem_dc l2 WHERE l2.l_partkey = p_partkey)
        |  < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem_dc l2
        |     WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  val qDecorrSql: String =
    """SELECT p_brand, COUNT(*) AS n_small,
      |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS small_rev_x100
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE 2 * CAST(l_quantity AS BIGINT) *
      |    (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |  < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem l2
      |     WHERE l2.l_partkey = p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  def qStrings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_tokens", regexp_count(col("text"), lit("[a-z]+")))
      .withColumn("has_spark", col("text").contains("spark").cast("int"))
      .groupBy(upper(col("source")).as("src"))
      .agg(count(lit(1)).as("n_docs"),
        r2(avg(col("n_tokens"))).as("avg_tokens"),
        sum(col("has_spark")).as("n_spark"),
        max(length(col("text"))).cast("bigint").as("max_len"))
      .orderBy(col("src"))

  val qStringsSql: String =
    """SELECT UPPER(source) AS src, COUNT(*) AS n_docs,
      |  ROUND(AVG(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+'))), 2) AS avg_tokens,
      |  CAST(SUM(CASE WHEN CONTAINS(text, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS n_spark,
      |  MAX(LENGTH(text)) AS max_len
      |FROM documents
      |GROUP BY UPPER(source)
      |ORDER BY src""".stripMargin

  // --- q_props_extract: semi-structured extraction from the JSON
  // props column (get_json_object — codegen'd JSON path eval).
  def qPropsExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), r2(avg(col("k"))).as("avg_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  // Oracle regex is anchored on the "k" key (structurally equivalent
  // to the Spark side's $.k JSON path) — robust to extra numeric
  // fields appearing in props.
  val qPropsExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  ROUND(AVG(CAST(REGEXP_EXTRACT(props, '"k":\s*([0-9]+)', 1) AS INT)), 2) AS avg_k,
      |  MIN(CAST(REGEXP_EXTRACT(props, '"k":\s*([0-9]+)', 1) AS INT)) AS min_k,
      |  MAX(CAST(REGEXP_EXTRACT(props, '"k":\s*([0-9]+)', 1) AS INT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- q_approx: sketch aggregates (HLL++, approximate quantiles).
  // Sketch internals can't hash-match a different engine, so the
  // TOLERANCE CHECK runs inside the query: each group carries the
  // exact answers plus booleans asserting the sketches landed within
  // their error bounds (HLL++ rsd=0.01 → 5%; percentile_approx
  // accuracy=1000 → 2% of the value range). The DuckDB oracle replays
  // the exact columns and pins the booleans TRUE — a drifting sketch
  // flips a flag and fails the hash compare. Sketches stay in the
  // plan (partial-aggregated, mergeable — the 100 TB shape); the
  // exact twins exist to judge them.
  def qApprox(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
        countDistinct(col("l_partkey")).as("parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50a"),
        expr("percentile(l_extendedprice, 0.5)").as("p50e"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .select(col("l_returnflag"), col("parts"),
        (abs(col("ap") - col("parts")) <=
          greatest(lit(1L), (col("parts") * 5 - (col("parts") * 5) % 100) / 100)).as("cd_ok"),
        (abs(col("p50a") - col("p50e")) <= (col("hi") - col("lo")) * 0.02).as("p50_ok"))
      .orderBy(col("l_returnflag"))

  val qApproxSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS parts,
      |  TRUE AS cd_ok, TRUE AS p50_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- q_unpivot: wide→long melt (UNPIVOT). The four lineitem
  // measures become (metric, val) rows — Catalyst's Expand node emits
  // 4 rows per input INSIDE the scan stage (no shuffle to melt; the
  // only shuffle is the 8-group aggregate that follows). At 100 TB
  // the melt is map-side and the agg exchanges 8 rows per partition.
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "val")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(count(lit(1)).as("n"), r2(sum(col("val"))).as("total"))
      .orderBy(col("l_returnflag"), col("metric"))

  val qUnpivotSql: String =
    """SELECT l_returnflag, metric, COUNT(*) AS n, ROUND(SUM(val), 2) AS total
      |FROM (UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax
      |               FROM lineitem)
      |      ON l_quantity, l_extendedprice, l_discount, l_tax
      |      INTO NAME metric VALUE val)
      |GROUP BY l_returnflag, metric
      |ORDER BY l_returnflag, metric""".stripMargin

  // --- q_grouping_sets: explicit GROUPING SETS (the general form
  // rollup/cube are sugar for) with GROUPING() disambiguating real
  // NULLs from subtotal rows. One Expand + ONE agg shuffle serves all
  // four groupings — at scale this is 4 aggregates for the price of
  // one pass over the data.
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT CAST(GROUPING(o_year) AS BIGINT) AS g_year,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  o_year, o_orderpriority,
        |  COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
        |FROM (SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year, o_orderpriority, o_totalprice
        |      FROM orders_gs)
        |GROUP BY GROUPING SETS ((o_year, o_orderpriority), (o_year), (o_orderpriority), ())
        |ORDER BY g_year, g_prio, o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT CAST(GROUPING(o_year) AS BIGINT) AS g_year,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      |  o_year, o_orderpriority,
      |  COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
      |FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year, o_orderpriority, o_totalprice
      |      FROM orders)
      |GROUP BY GROUPING SETS ((o_year, o_orderpriority), (o_year), (o_orderpriority), ())
      |ORDER BY g_year, g_prio, o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // --- q_lateral: LATERAL correlated subquery in FROM — per-nation
  // top-2 customers by balance. Catalyst rewrites the correlated
  // LIMIT into a window rank over ONE shuffled join (DecorrelateInnerQuery),
  // never a per-outer-row re-execution — the same decorrelation
  // contract q_decorr pins for scalar subqueries, here for lateral
  // relations. 100 TB shape: one hash partition on the correlation
  // key + a bounded per-key sort.
  def qLateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("nation_lt")
    t(s, dir, "customer").createOrReplaceTempView("customer_lt")
    s.sql(
      """SELECT n_name, c_name,
        |  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_x100
        |FROM nation_lt,
        |  LATERAL (SELECT c_name, c_acctbal FROM customer_lt
        |           WHERE c_nationkey = n_nationkey
        |           ORDER BY c_acctbal DESC, c_name LIMIT 2)
        |ORDER BY n_name, bal_x100 DESC, c_name""".stripMargin)
  }

  val qLateralSql: String =
    """SELECT n_name, c_name,
      |  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_x100
      |FROM nation,
      |  LATERAL (SELECT c_name, c_acctbal FROM customer
      |           WHERE c_nationkey = n_nationkey
      |           ORDER BY c_acctbal DESC, c_name LIMIT 2)
      |ORDER BY n_name, bal_x100 DESC, c_name""".stripMargin

  // --- q_recursive: WITH RECURSIVE (Spark 4's UnionLoop) generating
  // the month axis, LEFT-joined to per-month order totals so
  // zero-order months surface — the gap-filling calendar pattern.
  // The recursion is AXIS-scale (80 single-row iterations), never
  // data-scale; the data-side is one groupBy onto ~80 keys, and the
  // join broadcasts the 80-row axis. Recursion depth is bounded and
  // independent of corpus size.
  def qRecursive(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_rc")
    s.sql(
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1995-01-01' AS m
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months WHERE m < DATE '2001-08-01'
        |)
        |SELECT months.m AS month_start,
        |  COALESCE(o.n, 0) AS n_orders,
        |  ROUND(COALESCE(o.total, 0.0), 2) AS total
        |FROM months LEFT JOIN
        |  (SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m,
        |          COUNT(*) AS n, SUM(o_totalprice) AS total
        |   FROM orders_rc GROUP BY 1) o
        |ON months.m = o.m
        |ORDER BY month_start""".stripMargin)
  }

  val qRecursiveSql: String =
    """WITH RECURSIVE months(m) AS (
      |  SELECT DATE '1995-01-01' AS m
      |  UNION ALL
      |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months WHERE m < DATE '2001-08-01'
      |)
      |SELECT months.m AS month_start,
      |  COALESCE(o.n, 0) AS n_orders,
      |  ROUND(COALESCE(o.total, 0.0), 2) AS total
      |FROM months LEFT JOIN
      |  (SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m,
      |          COUNT(*) AS n, SUM(o_totalprice) AS total
      |   FROM orders GROUP BY 1) o
      |ON months.m = o.m
      |ORDER BY month_start""".stripMargin

  // --- q_array_ops: ARRAY analytics with higher-order functions —
  // per-order quantity vectors built ONCE (one shuffle onto the
  // order key; arrays bounded by lines-per-order), then
  // aggregate/filter/zip_with evaluate MAP-SIDE over the arrays (no
  // re-explode, no second shuffle until the 7-group rollup).
  // collect_list is order-nondeterministic, so array_sort pins the
  // layout before any position-sensitive op (the weighted sum) —
  // the rule that makes array pipelines replayable cross-engine.
  def qArrayOps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("l_quantity").cast("bigint"))).as("arr"))
      .select(
        size(col("arr")).cast("bigint").as("n_items"),
        expr("aggregate(arr, 0L, (a, x) -> a + x)").as("tot"),
        expr("CAST(size(filter(arr, x -> x >= 25L)) AS BIGINT)").as("big"),
        expr("aggregate(zip_with(arr, sequence(1L, CAST(size(arr) AS BIGINT)), (x, i) -> x * i), 0L, (a, x) -> a + x)").as("wsum"))
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("tot")).cast("bigint").as("qty_total"),
        sum(col("big")).cast("bigint").as("n_big"),
        sum(col("wsum")).cast("bigint").as("wsum_total"))
      .orderBy(col("n_items"))

  val qArrayOpsSql: String =
    """WITH o AS (
      |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) AS arr
      |  FROM lineitem GROUP BY l_orderkey),
      |s AS (
      |  SELECT CAST(len(arr) AS BIGINT) AS n_items,
      |    CAST(list_sum(arr) AS BIGINT) AS tot,
      |    CAST(len(list_filter(arr, x -> x >= 25)) AS BIGINT) AS big,
      |    CAST(list_sum(list_transform(generate_series(1, len(arr)), i -> arr[i] * i)) AS BIGINT) AS wsum
      |  FROM o)
      |SELECT n_items, COUNT(*) AS n_orders,
      |  CAST(SUM(tot) AS BIGINT) AS qty_total,
      |  CAST(SUM(big) AS BIGINT) AS n_big,
      |  CAST(SUM(wsum) AS BIGINT) AS wsum_total
      |FROM s GROUP BY n_items ORDER BY n_items""".stripMargin

  // --- q_funnel: FUNNEL ANALYSIS — the canonical event-stream
  // conversion question: of the users who ever VIEWED, how many went
  // on to CLICK after that first view, and then PURCHASE after that
  // first qualifying click? Each stage anchors on the PREVIOUS
  // stage's first-event time (a user's pre-view clicks don't count —
  // the ordering is the analysis), computed as three chained
  // per-user aggregations that all shuffle on user_id: with the
  // first stage's exchange reused by AQE/partitioning the funnel is
  // O(events) + K user-keyed aggregations at any scale — no
  // self-join explosion, no per-user event sorting. Timestamps
  // compare as exact integer micros.
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    // each stage feeds the next AND the final rollup — cache the
    // per-user stage frames so the chain costs one pass per stage
    val v = graft.util.QueryScratch.cached(
      ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("tv")))
    val c = graft.util.QueryScratch.cached(
      ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts_us") >= col("tv"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("tc")))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_us") >= col("tc"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("tp"))
    val staged = v.select(lit("1_view").as("stage"), col("user_id"))
      .unionByName(c.select(lit("2_click").as("stage"), col("user_id")))
      .unionByName(p.select(lit("3_purchase").as("stage"), col("user_id")))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
    val top = v.agg(count(lit(1)).as("n_top"))
    // an EMPTY stage must still report its zero row (the oracle's
    // static stage list does) — left-join a literal stage frame;
    // greatest(,1) keeps the rate defined when even stage 1 is empty
    import s.implicits._
    Seq("1_view", "2_click", "3_purchase").toDF("stage")
      .join(staged, Seq("stage"), "left")
      .na.fill(0L, Seq("n_users"))
      .crossJoin(broadcast(top))
      .select(col("stage"), col("n_users"),
        expr("n_users * 10000 div greatest(n_top, 1)").as("pct_of_top"))
      .orderBy(col("stage"))
  }

  val qFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, EPOCH_US(ts) AS ts_us FROM events),
      |v AS (SELECT user_id, MIN(ts_us) AS tv FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(ts_us) AS tc FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts_us >= tv GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(ts_us) AS tp FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts_us >= tc GROUP BY e.user_id),
      |s AS (
      |  SELECT '1_view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
      |  UNION ALL SELECT '2_click', (SELECT COUNT(*) FROM c)
      |  UNION ALL SELECT '3_purchase', (SELECT COUNT(*) FROM p))
      |SELECT stage, n_users,
      |  n_users * 10000 // greatest((SELECT COUNT(*) FROM v), 1) AS pct_of_top
      |FROM s ORDER BY stage""".stripMargin

  // --- q_cohort: COHORT RETENTION — the other canonical event
  // rollup: users grouped by FIRST-ACTIVITY week, each cohort's
  // active-user count tracked at week offsets 0..3. Two user-keyed
  // aggregations (first week, then distinct active weeks) and one
  // (cohort, offset) rollup — the matrix is weeks × offsets =
  // metadata-sized however many users flow through; all arithmetic
  // is integer epoch-week division.
  def qCohort(s: SparkSession, dir: String): DataFrame = {
    val WeekUs = 7L * 86400L * 1000000L
    val ev = t(s, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) / WeekUs).cast("bigint").as("wk"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val active = ev.select(col("user_id"), col("wk")).distinct()
    active.join(first, "user_id")
      .withColumn("offset", col("wk") - col("cohort_wk"))
      .filter(col("offset") <= 3)
      .groupBy(col("cohort_wk"), col("offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_wk"), col("offset"))
  }

  val qCohortSql: String =
    """WITH e AS (
      |  SELECT user_id, EPOCH_US(ts) // 604800000000 AS wk FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, wk FROM e)
      |SELECT cohort_wk, wk - cohort_wk AS "offset",
      |  COUNT(DISTINCT user_id) AS n_active
      |FROM a JOIN f USING (user_id)
      |WHERE wk - cohort_wk <= 3
      |GROUP BY cohort_wk, wk - cohort_wk
      |ORDER BY cohort_wk, "offset"""".stripMargin

  // --- q_paths: PATH / TRANSITION ANALYSIS — the Markov view of the
  // event stream ("what do users do next after a view?"): per user,
  // consecutive event-type bigrams in event-time order (ties broken
  // by event_id so the sequence is total and replayable), rolled up
  // to a transition matrix with integer per-source basis points.
  // One shuffle on user_id (the lag window), one matrix-sized rollup
  // — 25 cells at any event volume; per-user cost proportional to
  // the user's events.
  def qPaths(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val trans = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTot = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("f_tot"))
    trans.join(fromTot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 10000 div f_tot").as("bp_of_from"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val qPathsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, EPOCH_US(ts) AS ts_us FROM events),
      |seq AS (
      |  SELECT event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_type
      |  FROM e),
      |tr AS (
      |  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      |  FROM seq WHERE next_type IS NOT NULL
      |  GROUP BY 1, 2),
      |ft AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS f_tot FROM tr GROUP BY from_type)
      |SELECT from_type, to_type, n,
      |  n * 10000 // f_tot AS bp_of_from
      |FROM tr JOIN ft USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // --- q_rfm: RFM SEGMENTATION — the classic user-value rollup:
  // per user, Recency (last event time), Frequency (event count),
  // Monetary (scaled-integer value sum); each dimension buckets into
  // quartiles OF ITS RANGE against a broadcast 1-row min/max frame —
  // `(v−min)·4 div (max−min+1)`, all-integer, and crucially NOT a
  // population ntile: an unpartitioned ntile window plans Exchange
  // SinglePartition (every user through one task), while the range
  // rule is one per-user shuffle + a metadata-sized broadcast at any
  // user count. The 4×4×4 segment matrix is the report.
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("r"),
        count(lit(1)).as("f"),
        sum(floor(col("value") * 100 + 0.5)).cast("bigint").as("m"))
    val bounds = per.agg(
      min(col("r")).as("r_lo"), max(col("r")).as("r_hi"),
      min(col("f")).as("f_lo"), max(col("f")).as("f_hi"),
      min(col("m")).as("m_lo"), max(col("m")).as("m_hi"))
    per.crossJoin(broadcast(bounds))
      .select(
        expr("(r - r_lo) * 4 div (r_hi - r_lo + 1)").as("rb"),
        expr("(f - f_lo) * 4 div (f_hi - f_lo + 1)").as("fb"),
        expr("(m - m_lo) * 4 div (m_hi - m_lo + 1)").as("mb"))
      .groupBy(col("rb"), col("fb"), col("mb"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("rb"), col("fb"), col("mb"))
  }

  val qRfmSql: String =
    """WITH per AS (
      |  SELECT user_id, MAX(EPOCH_US(ts)) AS r, COUNT(*) AS f,
      |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m
      |  FROM events GROUP BY user_id),
      |b AS (
      |  SELECT MIN(r) AS r_lo, MAX(r) AS r_hi, MIN(f) AS f_lo, MAX(f) AS f_hi,
      |    MIN(m) AS m_lo, MAX(m) AS m_hi FROM per)
      |SELECT (r - r_lo) * 4 // (r_hi - r_lo + 1) AS rb,
      |  (f - f_lo) * 4 // (f_hi - f_lo + 1) AS fb,
      |  (m - m_lo) * 4 // (m_hi - m_lo + 1) AS mb,
      |  COUNT(*) AS n_users
      |FROM per, b
      |GROUP BY 1, 2, 3
      |ORDER BY rb, fb, mb""".stripMargin

  // --- q_salted_join: SKEW-JOIN SALTING — the manual remedy for a
  // hot key that AQE can't always save (AQE skew handling splits
  // oversized SMJ partitions, but not a stateful/streaming join, and
  // not a skewed AGGREGATION feeding the join). 70% of the fact rows
  // hash to one dim key (event_id%10<7 ⇒ key 0); unsalted, one task
  // owns 70% of the shuffle. The fix: fact rows carry a
  // deterministic salt (event_id % 8), the dim side EXPLODES ×8, and
  // the join key becomes (key, salt) — the hot key's rows spread
  // over 8 tasks at the cost of 8× the (tiny) dim. The dim is
  // hint("merge")-pinned because at fixture scale Spark would
  // broadcast it — and a broadcast join never skews; salting is the
  // tool for when the dim is too big to broadcast. Oracle replays
  // the unsalted join: salting must be invisible in the result.
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val NS = 8
    val fact = t(s, dir, "events")
      .withColumn("k",
        when(col("event_id") % 10 < 7, 0L).otherwise(col("event_id") % 25))
      .withColumn("salt", (col("event_id") % NS).cast("int"))
    val dim = t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
      .withColumn("salt", explode(array((0 until NS).map(i => lit(i)): _*)))
    fact.join(dim.hint("merge"), Seq("k", "salt"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5)).cast("bigint").as("sum_value_x100"))
      .orderBy(col("n_name"))
  }

  val qSaltedJoinSql: String =
    """WITH fact AS (
      |  SELECT CASE WHEN event_id % 10 < 7 THEN 0 ELSE event_id % 25 END AS k,
      |    value
      |  FROM events)
      |SELECT n_name, COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_x100
      |FROM fact JOIN nation ON fact.k = nation.n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // --- q_gapfill: TIME-SERIES GAP FILL + FORWARD FILL — the
  // regularization step every downstream model/monitor needs over an
  // irregular event stream: each user's hourly series densified to a
  // contiguous hour grid (sequence + explode, bounded by the user's
  // own span — never a global calendar cross join) and holes
  // forward-filled with last(ignoreNulls) in one ordered window per
  // user. Shuffle shape: the hourly rollup partial-aggs map-side then
  // shuffles on (user_id, hour); the span/grid and the fill window
  // re-key onto user_id — per-user work stays proportional to the
  // user's own span, and no stage ever materializes a global
  // calendar. Integer hour keys and x100 sums keep the series
  // replayable cross-engine. The grid's first row is always an
  // observed hour (the span starts at the user's min), so the fill
  // never reads before the series starts.
  def qGapfill(s: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val hourly = t(s, dir, "events")
      .select(col("user_id"), floor(unix_micros(col("ts")) / HourUs).as("hour"),
        col("value"))
      .groupBy(col("user_id"), col("hour"))
      .agg(sum(floor(col("value") * 100 + 0.5)).cast("bigint").as("obs_x100"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("filled_x100", last(col("obs_x100"), ignoreNulls = true).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"),
        count(col("obs_x100")).as("n_observed"),
        (count(lit(1)) - count(col("obs_x100"))).as("n_filled"),
        sum(col("filled_x100")).cast("bigint").as("series_sum_x100"))
      .orderBy(col("user_id"))
  }

  val qGapfillSql: String =
    """WITH hourly AS (
      |  SELECT user_id, EPOCH_US(ts) // 3600000000 AS hour,
      |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS obs_x100
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1),
      |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM span),
      |filled AS (
      |  SELECT g.user_id, g.hour, h.obs_x100,
      |    last_value(h.obs_x100 IGNORE NULLS) OVER (
      |      PARTITION BY g.user_id ORDER BY g.hour) AS filled_x100
      |  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour)
      |SELECT user_id, COUNT(*) AS n_hours, COUNT(obs_x100) AS n_observed,
      |  COUNT(*) - COUNT(obs_x100) AS n_filled,
      |  CAST(SUM(filled_x100) AS BIGINT) AS series_sum_x100
      |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_join" -> qSaltedJoin,
    "q_gapfill" -> qGapfill,
    "q_funnel" -> qFunnel,
    "q_cohort" -> qCohort,
    "q_paths" -> qPaths,
    "q_rfm" -> qRfm,
    "q1_pricing" -> q1Pricing,
    "q3_priority" -> q3Priority,
    "q5_region_rev" -> q5RegionRev,
    "q_pushdown" -> qPushdown,
    "q_topk" -> qTopk,
    "q_distinct" -> qDistinct,
    "q_window" -> qWindow,
    "q_semi_anti" -> qSemiAnti,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_window_range" -> qWindowRange,
    "q_percentile" -> qPercentile,
    "q_skew_agg" -> qSkewAgg,
    "q_bucket_join" -> qBucketJoin,
    "q_pivot" -> qPivot,
    "q_subquery" -> qSubquery,
    "q_decorr" -> qDecorr,
    "q_setops" -> qSetops,
    "q_asof_join" -> qAsofJoin,
    "q_range_join" -> qRangeJoin,
    "q_dates" -> qDates,
    "q_strings" -> qStrings,
    "q_sql_api" -> qSqlApi,
    "q_props_extract" -> qPropsExtract,
    "q_unpivot" -> qUnpivot,
    "q_grouping_sets" -> qGroupingSets,
    "q_lateral" -> qLateral,
    "q_recursive" -> qRecursive,
    "q_array_ops" -> qArrayOps,
    "q_approx" -> qApprox)

  val oracles: Map[String, String] = Map(
    "q_salted_join" -> qSaltedJoinSql,
    "q_gapfill" -> qGapfillSql,
    "q_funnel" -> qFunnelSql,
    "q_cohort" -> qCohortSql,
    "q_paths" -> qPathsSql,
    "q_rfm" -> qRfmSql,
    "q1_pricing" -> q1PricingSql,
    "q3_priority" -> q3PrioritySql,
    "q5_region_rev" -> q5RegionRevSql,
    "q_pushdown" -> qPushdownSql,
    "q_topk" -> qTopkSql,
    "q_distinct" -> qDistinctSql,
    "q_window" -> qWindowSql,
    "q_semi_anti" -> qSemiAntiSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_window_range" -> qWindowRangeSql,
    "q_percentile" -> qPercentileSql,
    "q_skew_agg" -> qSkewAggSql,
    "q_bucket_join" -> qBucketJoinSql,
    "q_pivot" -> qPivotSql,
    "q_subquery" -> qSubquerySql,
    "q_decorr" -> qDecorrSql,
    "q_setops" -> qSetopsSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_range_join" -> qRangeJoinSql,
    "q_dates" -> qDatesSql,
    "q_strings" -> qStringsSql,
    "q_sql_api" -> qSqlApiSql,
    "q_props_extract" -> qPropsExtractSql,
    "q_unpivot" -> qUnpivotSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_lateral" -> qLateralSql,
    "q_recursive" -> qRecursiveSql,
    "q_array_ops" -> qArrayOpsSql,
    "q_approx" -> qApproxSql)
}
