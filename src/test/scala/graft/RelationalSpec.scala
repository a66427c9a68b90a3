package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = GraftSession.tune(SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** The LIVE root of the pinned `graft` catalog instance. Spark
    * caches catalog plugins per session at first use, so a later
    * `spark.sql.catalog.graft.root` conf change is ignored — suites
    * run concurrently in one shared session and race to pin it.
    * Path assertions must therefore ask the instance, not the conf.
    */
  def graftCatRoot: java.nio.file.Path = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.sources.GraftCatalog]
    java.nio.file.Paths.get(cat.rootDir)
  }
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query runs and yields rows at sf0.001") {
    spark.sparkContext.setLogLevel("ERROR")
    val empties = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    // q_pushdown's selective filter may legitimately return 0 at the
    // smallest sf; everything else must produce rows.
    assert(empties.toSet.subsetOf(Set("q_pushdown")), s"empty results: $empties")
  }

  test("q_funnel stages are monotone; q_cohort offset-0 counts the whole cohort") {
    val f = SparkEntry.queries("q_funnel")(spark, sf).collect()
    assert(f.length === 3)
    val byStage = f.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("1_view") >= byStage("2_click") &&
      byStage("2_click") >= byStage("3_purchase"),
      s"funnel must be monotone: $byStage")
    assert(f.find(_.getString(0) == "1_view").get.getLong(2) === 10000L)
    val c = SparkEntry.queries("q_cohort")(spark, sf).collect()
    assert(c.nonEmpty)
    // offset 0 = every user of the cohort (first activity defines it)
    val zero = c.filter(_.getLong(1) == 0L).map(r => r.getLong(0) -> r.getLong(2)).toMap
    import org.apache.spark.sql.functions._
    val WeekUs = 7L * 86400L * 1000000L
    val want = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg((min(unix_micros(col("ts"))) / WeekUs).cast("bigint").as("cw"))
      .groupBy(col("cw")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero === want, "offset-0 retention must equal cohort sizes")
    // retention never exceeds the cohort
    c.foreach(r => assert(r.getLong(2) <= zero(r.getLong(0))))
  }

  test("q_paths: transition counts conserve (events - users) and per-source bps close") {
    val rows = SparkEntry.queries("q_paths")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user contributes exactly (events - 1) transitions
    assert(rows.map(_.getLong(2)).sum === nEvents - nUsers)
    rows.groupBy(_.getString(0)).foreach { case (ft, rs) =>
      val bps = rs.map(_.getLong(3)).sum
      assert(bps > 10000L - rs.length && bps <= 10000L,
        s"$ft basis points don't close: $bps")
    }
  }

  test("q_rfm: buckets in [0,3], users conserve, no single-partition stage") {
    val df = SparkEntry.queries("q_rfm")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the range-quartile rule exists to avoid the unpartitioned-ntile
    // shape; the only single-partition work allowed is the 1-row
    // bounds aggregate that broadcasts
    assert(!plan.contains("Window"), "bucketing must not use a window")
    val rows = df.collect()
    val nUsers = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(3)).sum === nUsers, "every user lands in one segment")
    rows.foreach { r =>
      Seq(r.getLong(0), r.getLong(1), r.getLong(2)).foreach(b =>
        assert(b >= 0L && b <= 3L, s"bucket out of range: $r"))
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val rowsOnly = Set.empty[String] // every query is oracle-checked
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries missing oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("q1 pushes filter and prunes columns at the parquet scan") {
    val plan = SparkEntry.queries("q1_pricing")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("l_orderkey"), "read schema not pruned (l_orderkey present)")
  }

  test("q5 broadcasts the dimension tables") {
    val plan = SparkEntry.queries("q5_region_rev")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q_bucket_join joins bucket-aligned tables without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q_bucket_join")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      // the join itself must consume bucketed scans directly — the only
      // hash exchange allowed is the one feeding the final aggregation.
      val joinSection = plan.split("SortMergeJoin").last
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle its inputs:\n${plan.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_approx sketches land within tolerance of exact answers") {
    // q_approx carries its own tolerance booleans (driver-gated); the
    // spec re-asserts them here and additionally bounds the p99
    // sketch, which the query doesn't flag.
    val rows = SparkEntry.queries("q_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"approx_count_distinct out of 5% tolerance: $r")
      assert(r.getBoolean(3), s"p50 sketch out of 2%-of-range tolerance: $r")
    }
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val p99 = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("a"),
        expr("percentile(l_extendedprice, 0.99)").as("e"),
        (max(col("l_extendedprice")) - min(col("l_extendedprice"))).as("range"))
      .collect()
    p99.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= r.getDouble(3) * 0.02,
        s"p99 sketch out of tolerance: $r")
    }
  }

  test("q_topk plans as TakeOrderedAndProject (no global sort)") {
    val plan = SparkEntry.queries("q_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not heap-based:\n$plan")
  }

  test("q_lateral decorrelates: window-group-limit + keyed join, never a per-row loop") {
    val plan = SparkEntry.queries("q_lateral")(spark, sf)
      .queryExecution.executedPlan.toString
    // the correlated ORDER BY … LIMIT 2 must compile to a per-key
    // group limit (map-side partial top-2 before the shuffle) joined
    // once on the correlation key — a CartesianProduct or nested-loop
    // re-execution would be the 100 TB scan-per-row failure mode
    assert(plan.contains("WindowGroupLimit"), s"no group-limit:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), s"lateral cross-joined:\n${plan.take(2000)}")
  }

  test("q_unpivot and q_grouping_sets melt/expand in ONE Expand, one agg shuffle") {
    for (q <- Seq("q_unpivot", "q_grouping_sets")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      val expands = "Expand".r.findAllIn(plan).size
      assert(expands === 1, s"$q: expected exactly one Expand, got $expands")
      val aggExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(aggExchanges === 1,
        s"$q: the melt must be map-side — one agg exchange only, got $aggExchanges")
    }
  }

  test("q_salted_join: shuffled join on (k, salt), result equals the unsalted join") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_salted_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the whole point is spreading the hot key across tasks — the
    // join must be a shuffled SMJ keyed on BOTH key and salt, not a
    // broadcast (which would make salting moot)
    assert(plan.contains("SortMergeJoin [k#") || plan.contains("SortMergeJoin ["),
      s"expected SMJ:\n${plan.take(1200)}")
    val joinLine = plan.linesIterator.find(_.contains("SortMergeJoin")).get
    assert(joinLine.contains("salt"), s"join keys must include salt: $joinLine")
    // salting is invisible in the result: equal to the plain join
    val want = graft.sources.Tables.load(spark, sf, "events")
      .withColumn("k",
        when(col("event_id") % 10 < 7, 0L).otherwise(col("event_id") % 25))
      .join(graft.sources.Tables.load(spark, sf, "nation")
        .select(col("n_nationkey").cast("long").as("k"), col("n_name")), Seq("k"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5)).cast("bigint").as("sum_value_x100"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("q_gapfill: grids are contiguous per user, observed + filled = span") {
    val rows = SparkEntry.queries("q_gapfill")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nHours, nObs, nFilled) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nObs + nFilled === nHours, s"fill accounting broken: $r")
      assert(nObs >= 1L, s"span must start at an observed hour: $r")
    }
    // global sanity: hours filled dominate at sparse fixture scale,
    // and every user's span covers at least their observed hours
    assert(rows.map(_.getLong(3)).sum > 0L, "no gaps filled — fixture not sparse?")
  }
}

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.AsOfJoin

  test("leftAsOf picks the latest right row at-or-before, per key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      ("u1", 100L, "L1"), ("u1", 205L, "L2"), ("u2", 50L, "L3"),
      ("u3", 10L, "L4") // no right rows for u3 → null payload
    ).toDF("k", "t", "lval")
    val right = Seq(
      ("u1", 100L, "R@100"), ("u1", 90L, "R@90"), ("u1", 200L, "R@200"),
      ("u2", 50L, "R@50a"), ("u2", 50L, "R@50b")
    ).toDF("k", "t", "rval")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", Seq("rval"))
      .select("k", "t", "lval", "rval").as[(String, Long, String, String)]
      .collect().toSet
    assert(out === Set(
      ("u1", 100L, "L1", "R@100"),  // inclusive: equal ts matches
      ("u1", 205L, "L2", "R@200"),  // latest ≤ 205
      ("u2", 50L, "L3", "R@50b"),   // tie at same ts → largest tiebreak
      ("u3", 10L, "L4", null)))     // no match → null
  }

  test("leftAsOf carries right payload atomically (no cross-row stitching)") {
    val s = spark
    import s.implicits._
    // Right rows with complementary nulls: naive per-column carry
    // would stitch p1 from t=100 with p2 from t=200.
    val left = Seq(("u1", 250L, "L")).toDF("k", "t", "lval")
    val right = Seq(
      ("u1", 100L, Option("a1"), Option.empty[String]),
      ("u1", 200L, Option.empty[String], Option("b2"))
    ).toDF("k", "t", "p1", "p2")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "t")
      .select("p1", "p2").as[(Option[String], Option[String])].collect().toSeq
    assert(out === Seq((None, Some("b2"))),
      "payload must come from the single latest right row")
  }

  test("leftAsOf costs a single shuffle on the partition keys") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 1L, "x")).toDF("k", "t", "lv")
    val right = Seq(("a", 1L, "y")).toDF("k", "t", "rv")
    val plan = AsOfJoin.leftAsOf(left, right, Seq("k"), "t")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 1, s"expected ≤1 shuffle, got $shuffles:\n$plan")
  }

  test("geo_radius_join: cell-bucketed broadcast join, never all-pairs") {
    val df = graft.queries.Geo.geoRadiusJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the station side (25 stations × 15 neighbor cells) broadcasts;
    // the point side joins on the exact cell key — a CartesianProduct
    // or BroadcastNestedLoopJoin here would be the all-pairs plan that
    // cannot survive 100 TB of points
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast cell join:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"radius join fell back to all-pairs:\n${plan.take(2000)}")
    // the cell neighborhood must be a superset bound: every pair the
    // naive all-pairs haversine join finds is found through the cells
    import org.apache.spark.sql.functions._
    import graft.functions.GeoFns._
    val pts = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"))
      .withColumn("lat_e6", latE6(col("event_id")))
      .withColumn("lon_e6", lonE6(col("event_id")))
    val st = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_name"))
      .withColumn("s_lat_e6", latE6(col("n_name")))
      .withColumn("s_lon_e6", lonE6(col("n_name")))
    val naive = pts.crossJoin(st)
      .withColumn("d_m", haversineMeters(
        deg(col("lat_e6")), deg(col("lon_e6")),
        deg(col("s_lat_e6")), deg(col("s_lon_e6"))))
      .filter(col("d_m") <= lit(600000.0))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_points"),
        countDistinct(col("event_type")).as("n_types"),
        floor(min(col("d_m")) / 1000).cast("bigint").as("km_min"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = naive.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want, "cell-bucketed radius join must equal the all-pairs answer")
  }

  test("geo_knn: cell-bounded nearest-facility equals the all-pairs argmin") {
    val df = graft.queries.Geo.geoKnn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // same plan contract as the radius join: broadcast cell join, no
    // all-pairs fallback; the argmin is a hash aggregate (map-side
    // partial min(struct)) — a window sort over all candidates would
    // be the 100 TB-hostile shape
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast cell join:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"knn fell back to all-pairs:\n${plan.take(2000)}")
    assert(!plan.contains("Window"), "argmin must be an aggregate, not a window sort")
    // exactness law: the cell neighborhood covers the full 600 km
    // reach, so the cell-bounded nearest-in-radius equals the naive
    // all-pairs nearest-in-radius
    import org.apache.spark.sql.functions._
    import graft.functions.GeoFns._
    val pts = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id"))
      .withColumn("lat_e6", latE6(col("event_id")))
      .withColumn("lon_e6", lonE6(col("event_id")))
    val st = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_name"))
      .withColumn("s_lat_e6", latE6(col("n_name")))
      .withColumn("s_lon_e6", lonE6(col("n_name")))
    val naive = pts.crossJoin(st)
      .withColumn("d_m", haversineMeters(
        deg(col("lat_e6")), deg(col("lon_e6")),
        deg(col("s_lat_e6")), deg(col("s_lon_e6"))))
      .filter(col("d_m") <= lit(600000.0))
      .groupBy(col("event_id"))
      .agg(min(struct(col("d_m"), col("n_name"))).as("best"))
      .select(col("event_id"), col("best.d_m").as("d_m"), col("best.n_name").as("n_name"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_pts"),
        sum(floor(col("d_m") / 1000).cast("bigint")).as("sum_km"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val want = naive.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === want, "cell-bounded knn must equal the all-pairs argmin")
  }

  test("geo_cluster: clusters are maximal — no two distinct clusters share a cell edge") {
    val out = graft.queries.Geo.geoCluster(spark, sf).collect()
    assert(out.nonEmpty)
    // conservation: every dense cell is in exactly one cluster
    val nCells = out.map(_.getLong(1)).sum
    assert(out.map(_.getLong(1)).forall(_ >= 1))
    // rebuild the dense-cell → cluster map (deterministic), then
    // check MAXIMALITY: edge-adjacent dense cells always carry the
    // same cluster id — a cross-cluster edge would mean propagation
    // stopped early
    val labeled = graft.queries.Geo.geoClusterCells(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (key, cluster, cnt)
    assert(labeled.length.toLong === nCells)
    val byKey = labeled.map { case (k, c, _) => k -> c }.toMap
    def lonWrap(c: Long): Long = ((c % 60) + 60) % 60
    var crossEdges = 0
    byKey.keys.foreach { k =>
      val (clat, clon) = (k / 60 - 10, k % 60 - 30)
      Seq((-1L, 0L), (1L, 0L), (0L, -1L), (0L, 1L)).foreach { case (a, b) =>
        val nk = (clat + a + 10) * 60 + lonWrap(clon + b + 30)
        byKey.get(nk).foreach { nc => if (nc != byKey(k)) crossEdges += 1 }
      }
    }
    assert(crossEdges === 0, s"$crossEdges cross-cluster adjacent cell pairs")
    graft.util.QueryScratch.release(spark)
    spark.catalog.clearCache()
  }

  test("ann_recall: structural laws — 10 queries per method, hits bounded by K") {
    val rows = SparkEntry.queries("ann_recall")(spark, sf).collect()
    assert(rows.length === 20)
    val byMethod = rows.groupBy(_.getString(0))
    assert(byMethod.keySet === Set("ivf", "lsh"))
    byMethod.values.foreach(g => assert(g.map(_.getLong(1)).toSet.size === 10))
    rows.foreach { r =>
      val hits = r.getLong(2); val bp = r.getLong(3)
      assert(hits >= 0 && hits <= 10)
      assert(bp === hits * 1000)
    }
    graft.util.QueryScratch.release(spark)
    spark.catalog.clearCache()
  }
}
