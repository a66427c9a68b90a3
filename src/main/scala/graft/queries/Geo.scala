package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFns._
import graft.sources.Tables

/** Geospatial operators over the reference's own domain — the
  * reference ingests GPS fixes (required `latitude`/`longitude`
  * doubles, /root/reference/main.go:34-35), so a location lake's
  * first queries are a bounding-box probe and a radius search. Both
  * queries synthesize deterministic md5-derived points from the
  * testdata (SURVEY §5 convention — DuckDB replays the derivation
  * bit-exactly), carry coordinates as scaled-integer MICRODEGREES
  * (exact manifest stats, exact cell arithmetic), and convert to
  * degrees only inside the shared haversine formula
  * ([[graft.functions.GeoFns]] — built-in trig, whole-stage codegen,
  * no UDF).
  */
object Geo {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Synthetic GPS fixes keyed by event id (lat clamped to ±60°, lon
    * full-range — see [[graft.functions.GeoFns.latE6]]).
    */
  private def points(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("lat_e6", latE6(col("event_id")))
      .withColumn("lon_e6", lonE6(col("event_id")))

  /** The station × 15-cell 600 km-reach neighborhood frame — the ONE
    * definition of the cell geometry every geo consumer broadcasts
    * (`geo_radius_join`, `geo_knn`, `stream_geofence`): each
    * nation-derived station explodes into every grid cell a 600 km
    * radius can touch under the ±60° lat clamp, longitude wrapping
    * the antimeridian. Changing the reach or the clamp here changes
    * all three consumers together — the exactness laws stay in sync.
    */
  private[queries] def stationCells(s: SparkSession, dir: String): DataFrame = {
    val offsets = RadiusNeighborhood.map { case (a, b) =>
      struct(lit(a).as("dlat"), lit(b).as("dlon")) }
    t(s, dir, "nation")
      .select(col("n_name"))
      .withColumn("s_lat_e6", latE6(col("n_name")))
      .withColumn("s_lon_e6", lonE6(col("n_name")))
      .withColumn("o", explode(array(offsets: _*)))
      .withColumn("clat", latCell(col("s_lat_e6")) + col("o.dlat"))
      .withColumn("clon", wrapLonCell(lonCell(col("s_lon_e6")) + col("o.dlon")))
      .drop("o")
  }

  // --- geo_bbox: BOUNDING-BOX probe over a DECLARED 2-D geo layout —
  // `PARTITIONED BY (zorder(lat_e6, lon_e6))` range-clusters every
  // append on the lat/lon morton interleave, so the manifest's
  // per-file min/max stats are tight in BOTH dims and a bbox
  // predicate prunes files before IO (DsV2Spec pins ≤ total/4 files
  // touched) — at 100 TB of GPS fixes, the difference between a city
  // query reading the city and reading the planet. Microdegree
  // bigints (not doubles) are what make the stats exact.
  def geoBbox(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("sqlcat").toString)
    val tbl = s"graft.q.geo_${System.nanoTime()}"
    points(s, dir).createOrReplaceTempView("geo_pts")
    s.sql(s"""CREATE TABLE $tbl (event_id BIGINT, event_type STRING,
             |  value DOUBLE, lat_e6 BIGINT, lon_e6 BIGINT)
             |PARTITIONED BY (zorder(lat_e6, lon_e6))""".stripMargin)
    s.sql(s"INSERT INTO $tbl SELECT event_id, event_type, value, lat_e6, lon_e6 FROM geo_pts")
    s.sql(s"""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_x100,
             |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
             |FROM $tbl
             |WHERE lat_e6 >= -20000000 AND lat_e6 < 10000000
             |  AND lon_e6 >= 40000000 AND lon_e6 < 100000000
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val geoBboxSql: String =
    """WITH pts AS (
      |  SELECT event_id, event_type, value,
      |    ('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lat'),1,15))::BIGINT % 120000000 - 60000000 AS lat_e6,
      |    ('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lon'),1,15))::BIGINT % 360000000 - 180000000 AS lon_e6
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_x100,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM pts
      |WHERE lat_e6 >= -20000000 AND lat_e6 < 10000000
      |  AND lon_e6 >= 40000000 AND lon_e6 < 100000000
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- geo_radius_join: RADIUS SEARCH as a CELL-BUCKETED join —
  // never all-pairs. Points carry their 6° grid cell map-side;
  // each station (25 nation-derived sites) explodes into the 15-cell
  // neighborhood a 600 km radius can reach under the ±60° lat clamp
  // (3 lat × 5 lon, longitude wrapping the antimeridian modulo 60),
  // and the BROADCAST of that ~375-row frame joins points on the
  // exact cell key — the big side never shuffles, candidates are
  // cell-bounded, and only candidates pay the haversine. The exact
  // distance then filters to the true radius (cells only bound IO).
  // At 100 TB the same plan holds: station-side explode is
  // stations×15 rows, point-side work is one map-side cell key.
  // Oracle = DuckDB's naive cross join with the identical formula.
  def geoRadiusJoin(s: SparkSession, dir: String): DataFrame = {
    val R = 600000.0 // meters
    val pts = points(s, dir)
      .withColumn("clat", latCell(col("lat_e6")))
      .withColumn("clon", lonCell(col("lon_e6")))
    val stations = stationCells(s, dir)
    // a point's cell is unique and a station's 15 neighbor cells are
    // distinct, so each (point, station) pair joins AT MOST ONCE — no
    // post-join dedup needed
    pts.join(broadcast(stations), Seq("clat", "clon"))
      .withColumn("d_m", haversineMeters(
        deg(col("lat_e6")), deg(col("lon_e6")),
        deg(col("s_lat_e6")), deg(col("s_lon_e6"))))
      .filter(col("d_m") <= lit(R))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_points"),
        countDistinct(col("event_type")).as("n_types"),
        floor(min(col("d_m")) / 1000).cast("bigint").as("km_min"))
      .orderBy(col("n_name"))
  }

  val geoRadiusJoinSql: String =
    """WITH pts AS (
      |  SELECT event_id, event_type,
      |    (('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lat'),1,15))::BIGINT % 120000000 - 60000000) / 1000000.0 AS lat,
      |    (('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lon'),1,15))::BIGINT % 360000000 - 180000000) / 1000000.0 AS lon
      |  FROM events),
      |st AS (
      |  SELECT n_name,
      |    (('0x'||substr(md5(n_name||':lat'),1,15))::BIGINT % 120000000 - 60000000) / 1000000.0 AS lat,
      |    (('0x'||substr(md5(n_name||':lon'),1,15))::BIGINT % 360000000 - 180000000) / 1000000.0 AS lon
      |  FROM nation),
      |pairs AS (
      |  SELECT st.n_name, pts.event_type,
      |    2 * 6371000.0 * ASIN(SQRT(
      |      POW(SIN(RADIANS(st.lat - pts.lat) / 2), 2) +
      |      COS(RADIANS(pts.lat)) * COS(RADIANS(st.lat)) *
      |      POW(SIN(RADIANS(st.lon - pts.lon) / 2), 2))) AS d_m
      |  FROM pts, st)
      |SELECT n_name, COUNT(*) AS n_points,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  CAST(FLOOR(MIN(d_m) / 1000) AS BIGINT) AS km_min
      |FROM pairs
      |WHERE d_m <= 600000.0
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --- geo_trips: TRAJECTORY SEGMENTATION — the canonical GPS-lake
  // rollup: each user's fixes split into TRIPS at >12 h gaps
  // (event-time sessionization by lag), per-leg haversine distance
  // summed per trip as integer meters (each leg rounds to a meter
  // BEFORE summing, so the sums are exact integer arithmetic
  // cross-engine; only a leg landing within an ulp of a .5 m boundary
  // could ever flip, and the gap rule itself is exact integer-micros
  // comparison). One shuffle on user_id; lag/running-sum/leg math all
  // inside the same window pass, then two partial-agg rollups — at
  // 100 TB of fixes this is the shape: no self-join, no driver state,
  // per-user work proportional to the user's fixes.
  def geoTrips(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val GapUs = 12L * 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val legs = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("lat_e6", latE6(col("event_id")))
      .withColumn("lon_e6", lonE6(col("event_id")))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("p_us", lag(col("us"), 1).over(w))
      .withColumn("p_lat", lag(col("lat_e6"), 1).over(w))
      .withColumn("p_lon", lag(col("lon_e6"), 1).over(w))
      .withColumn("new_trip",
        when(col("p_us").isNull || col("us") - col("p_us") > GapUs, 1L).otherwise(0L))
      .withColumn("trip", sum(col("new_trip"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("leg_m", when(col("new_trip") === 1, 0L)
        .otherwise(floor(haversineMeters(
          deg(col("p_lat")), deg(col("p_lon")),
          deg(col("lat_e6")), deg(col("lon_e6"))) + lit(0.5)).cast("bigint")))
    val trips = legs.groupBy(col("user_id"), col("trip"))
      .agg(count(lit(1)).as("fixes"), sum(col("leg_m")).as("trip_m"))
    trips.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_trips"),
        sum(col("fixes")).as("n_fixes"),
        sum(col("trip_m")).as("m_total"),
        max(col("trip_m")).as("m_longest"))
      .orderBy(col("user_id"))
  }

  val geoTripsSql: String =
    """WITH pts AS (
      |  SELECT event_id, user_id, ts, epoch_us(ts) AS us,
      |    (('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lat'),1,15))::BIGINT % 120000000 - 60000000) / 1000000.0 AS lat,
      |    (('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lon'),1,15))::BIGINT % 360000000 - 180000000) / 1000000.0 AS lon
      |  FROM events),
      |legs AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 43200000000::BIGINT
      |      THEN 1 ELSE 0 END AS new_trip,
      |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 43200000000::BIGINT
      |      THEN 0
      |      ELSE CAST(FLOOR(2 * 6371000.0 * ASIN(SQRT(
      |        POW(SIN(RADIANS(lat - lag(lat) OVER w) / 2), 2) +
      |        COS(RADIANS(lag(lat) OVER w)) * COS(RADIANS(lat)) *
      |        POW(SIN(RADIANS(lon - lag(lon) OVER w) / 2), 2))) + 0.5) AS BIGINT)
      |    END AS leg_m
      |  FROM pts
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, leg_m,
      |    SUM(new_trip) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip
      |  FROM legs),
      |trips AS (
      |  SELECT user_id, trip, COUNT(*) AS fixes, SUM(leg_m) AS trip_m
      |  FROM numbered GROUP BY user_id, trip)
      |SELECT user_id, COUNT(*) AS n_trips,
      |  CAST(SUM(fixes) AS BIGINT) AS n_fixes,
      |  CAST(SUM(trip_m) AS BIGINT) AS m_total,
      |  CAST(MAX(trip_m) AS BIGINT) AS m_longest
      |FROM trips
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // --- geo_cluster: HOTSPOT DETECTION — grid-density clustering (the
  // DBSCAN shape made distributed-friendly): fixes clump around 200
  // md5-derived VENUES (venue center ±0.5° jitter — the synthetic
  // stand-in for real GPS clumping), cells are the 6° grid, a cell is
  // DENSE when its count reaches 2× the global mean (exact integer
  // rule: cnt·600 ≥ total), and dense cells sharing an EDGE
  // (4-neighborhood, longitude wrapping) merge into clusters via the
  // same min-label propagation kernel the near-dup graph uses
  // ([[graft.operators.ClusterIndex.propagate]] — reuse, not
  // reimplementation). Scale: one count shuffle on the cell key
  // (map-side partial), a 1-row total broadcast, and propagation over
  // the DENSE-CELL graph only — grid-bounded metadata, never
  // point-proportional. The oracle unrolls 12 propagation rounds
  // (4-neighborhood keeps dense-cell components far below the Moore
  // percolation regime, so diameters stay single-digit; the Spark
  // side iterates to true fixpoint regardless).
  def geoCluster(s: SparkSession, dir: String): DataFrame =
    geoClusterCells(s, dir)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cells"), sum(col("cnt")).cast("bigint").as("n_points"))
      .orderBy(col("cluster_id"))

  /** The per-cell view of [[geoCluster]] — (key, cluster_id, cnt) for
    * every dense cell (spec introspection: the maximality law checks
    * edge-adjacent cells share a cluster).
    */
  def geoClusterCells(s: SparkSession, dir: String): DataFrame = {
    val NVenues = 200L
    val ev = t(s, dir, "events").select(col("event_id"))
    val venue = h60(concat(col("event_id").cast("string"), lit(":v"))) % NVenues
    val pts = ev
      .withColumn("v", venue)
      .withColumn("vlat",
        h60(concat(lit("v"), col("v").cast("string"), lit(":lat"))) % 110000000L - 55000000L)
      .withColumn("vlon",
        h60(concat(lit("v"), col("v").cast("string"), lit(":lon"))) % 360000000L - 180000000L)
      .withColumn("lat_e6", col("vlat") +
        h60(concat(col("event_id").cast("string"), lit(":jlat"))) % 1000000L - 500000L)
      .withColumn("lon_e6", pmod(col("vlon") +
        h60(concat(col("event_id").cast("string"), lit(":jlon"))) % 1000000L - 500000L
        + lit(180000000L), lit(360000000L)) - lit(180000000L))
      .withColumn("clat", floor(col("lat_e6").cast("double") / lit(6000000.0)).cast("bigint"))
      .withColumn("clon", floor(col("lon_e6").cast("double") / lit(6000000.0)).cast("bigint"))
      .withColumn("key", (col("clat") + 10) * 60 + (col("clon") + 30))
    val counts = pts.groupBy(col("key"), col("clat"), col("clon"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val dense = counts.crossJoin(broadcast(total))
      .filter(col("cnt") * 600 >= col("total"))
      .select(col("key"), col("clat"), col("clon"), col("cnt"))
    // Component labeling runs ON THE DRIVER: the dense-cell set is
    // GRID-bounded (≤ 20×60 = 1200 cells at ANY corpus size — the one
    // distributed pass above already reduced points to cells), so
    // this is metadata-scale work exactly like manifest resolution —
    // a union-find over ≤1200 nodes beats ~10 fixpoint-iteration
    // Spark jobs whose per-action overhead dwarfs the data. (The
    // near-dup document graph takes the opposite choice for the same
    // reason: its node count is corpus-bounded, so it propagates
    // distributed — operators/ClusterIndex.)
    val cells = dense.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val idx = cells.iterator.map(_._1).zipWithIndex.toMap
    val parent = Array.tabulate(cells.length)(identity)
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    cells.foreach { case (_, clat, clon, _) =>
      val kIdx = idx((clat + 10) * 60 + (clon + 30))
      Seq((-1L, 0L), (1L, 0L), (0L, -1L), (0L, 1L)).foreach { case (a, b) =>
        val nk = (clat + a + 10) * 60 +
          (((clon + b + 30) % 60 + 60) % 60)
        idx.get(nk).foreach { nIdx =>
          val (ra, rb) = (find(kIdx), find(nIdx))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
    }
    // canonical cluster id = MIN cell key in the component (exactly
    // the min-label fixpoint the SQL oracle unrolls)
    val minKey = scala.collection.mutable.Map.empty[Int, Long]
    cells.iterator.zipWithIndex.foreach { case ((k, _, _, _), i) =>
      val r = find(i)
      minKey(r) = math.min(minKey.getOrElse(r, Long.MaxValue), k)
    }
    val rows = cells.iterator.zipWithIndex.map { case ((k, _, _, cnt), i) =>
      (k, minKey(find(i)), cnt)
    }.toSeq
    import s.implicits._
    rows.toDF("key", "cluster_id", "cnt")
  }

  val geoClusterSql: String = {
    val rounds = (1 to 12).map { r =>
      s"l$r AS (SELECT adj.node, min(l${r - 1}.label) AS label FROM adj JOIN l${r - 1} ON l${r - 1}.node = adj.nbr GROUP BY adj.node)"
    }.mkString(",\n")
    def h(x: String) = s"('0x'||substr(md5($x),1,15))::BIGINT"
    s"""WITH pts AS (
       |  SELECT
       |    ${h(s"'v'||CAST(${h("CAST(event_id AS VARCHAR)||':v'")} % 200 AS VARCHAR)||':lat'")} % 110000000 - 55000000
       |      + ${h("CAST(event_id AS VARCHAR)||':jlat'")} % 1000000 - 500000 AS lat_e6,
       |    ((${h(s"'v'||CAST(${h("CAST(event_id AS VARCHAR)||':v'")} % 200 AS VARCHAR)||':lon'")} % 360000000 - 180000000
       |      + ${h("CAST(event_id AS VARCHAR)||':jlon'")} % 1000000 - 500000
       |      + 180000000) % 360000000 + 360000000) % 360000000 - 180000000 AS lon_e6
       |  FROM events),
       |cells AS (
       |  SELECT CAST(FLOOR(lat_e6 / 6000000.0) AS BIGINT) AS clat,
       |         CAST(FLOOR(lon_e6 / 6000000.0) AS BIGINT) AS clon, COUNT(*) AS cnt
       |  FROM pts GROUP BY 1, 2),
       |keyed AS (
       |  SELECT (clat + 10) * 60 + (clon + 30) AS key, clat, clon, cnt FROM cells),
       |tot AS (SELECT SUM(cnt) AS total FROM keyed),
       |dense AS (SELECT key, clat, clon, cnt FROM keyed, tot WHERE cnt * 600 >= total),
       |e AS (
       |  SELECT a.key AS doc_a, b.key AS doc_b
       |  FROM dense a, (VALUES (-1, 0), (1, 0), (0, -1), (0, 1)) o(dlat, dlon)
       |  JOIN dense b
       |    ON b.key = (a.clat + o.dlat + 10) * 60 +
       |       (((a.clon + o.dlon + 30) % 60 + 60) % 60 - 30 + 30)),
       |adj AS (
       |  SELECT doc_a AS node, doc_b AS nbr FROM e
       |  UNION SELECT doc_b, doc_a FROM e
       |  UNION SELECT doc_a, doc_a FROM e
       |  UNION SELECT doc_b, doc_b FROM e),
       |l0 AS (SELECT node, min(nbr) AS label FROM adj GROUP BY node),
       |$rounds
       |SELECT COALESCE(l12.label, dense.key) AS cluster_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_cells,
       |  CAST(SUM(dense.cnt) AS BIGINT) AS n_points
       |FROM dense LEFT JOIN l12 ON l12.node = dense.key
       |GROUP BY 1
       |ORDER BY cluster_id""".stripMargin
  }

  // --- geo_knn: NEAREST FACILITY per point — "which station serves
  // this fix", the reverse of geo_radius_join's "which fixes does
  // this station see" and the other half of a location lake's query
  // pair. Same cell-bucketed broadcast frame (station × 15-cell
  // 600 km neighborhood) joined on the point's map-side cell key, so
  // the candidate set per point is CELL-BOUNDED and the big side
  // never shuffles; the neighborhood covers every cell a 600 km
  // reach can touch, so "nearest within 600 km" is EXACT — a point's
  // true nearest station inside the radius is always a candidate.
  // The argmin is one groupBy(point) of min(struct(d_m, n_name)) —
  // map-side partial aggregation, no window sort; ties break on
  // station name (md5-scattered coordinates make real ties
  // ulp-improbable, the name is belt-and-braces determinism). Points
  // with no station in range drop out (bounded-radius kNN — the
  // honest distributed semantics; unbounded argmin would need
  // expanding-ring re-probes).
  def geoKnn(s: SparkSession, dir: String): DataFrame = {
    val R = 600000.0 // meters
    val pts = points(s, dir)
      .withColumn("clat", latCell(col("lat_e6")))
      .withColumn("clon", lonCell(col("lon_e6")))
    val stations = stationCells(s, dir)
    pts.join(broadcast(stations), Seq("clat", "clon"))
      .withColumn("d_m", haversineMeters(
        deg(col("lat_e6")), deg(col("lon_e6")),
        deg(col("s_lat_e6")), deg(col("s_lon_e6"))))
      .filter(col("d_m") <= lit(R))
      .groupBy(col("event_id"))
      .agg(min(struct(col("d_m"), col("n_name"))).as("best"))
      .select(col("event_id"), col("best.d_m").as("d_m"),
        col("best.n_name").as("n_name"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_pts"),
        sum(floor(col("d_m") / 1000).cast("bigint")).as("sum_km"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("n_name"))
  }

  val geoKnnSql: String =
    """WITH pts AS (
      |  SELECT event_id,
      |    (('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lat'),1,15))::BIGINT % 120000000 - 60000000) / 1000000.0 AS lat,
      |    (('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lon'),1,15))::BIGINT % 360000000 - 180000000) / 1000000.0 AS lon
      |  FROM events),
      |st AS (
      |  SELECT n_name,
      |    (('0x'||substr(md5(n_name||':lat'),1,15))::BIGINT % 120000000 - 60000000) / 1000000.0 AS lat,
      |    (('0x'||substr(md5(n_name||':lon'),1,15))::BIGINT % 360000000 - 180000000) / 1000000.0 AS lon
      |  FROM nation),
      |pairs AS (
      |  SELECT pts.event_id, st.n_name,
      |    2 * 6371000.0 * ASIN(SQRT(
      |      POW(SIN(RADIANS(st.lat - pts.lat) / 2), 2) +
      |      COS(RADIANS(pts.lat)) * COS(RADIANS(st.lat)) *
      |      POW(SIN(RADIANS(st.lon - pts.lon) / 2), 2))) AS d_m
      |  FROM pts, st),
      |near AS (
      |  SELECT event_id, n_name, d_m,
      |    ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY d_m, n_name) AS rn
      |  FROM pairs WHERE d_m <= 600000.0)
      |SELECT n_name, COUNT(*) AS n_pts,
      |  CAST(SUM(CAST(FLOOR(d_m / 1000) AS BIGINT)) AS BIGINT) AS sum_km,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM near WHERE rn = 1
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --- geo_polygon: POINT-IN-POLYGON containment — the third shape a
  // location lake serves after bbox and radius (geofence polygons:
  // "which fixes fall inside this delivery zone / county / campus").
  // Five region-derived octagons (vertices at 8 fixed compass
  // bearings, md5-derived per-vertex radii ⇒ irregular but SIMPLE —
  // vertices at strictly increasing angles around an interior point
  // never self-intersect). Containment is the ray-crossing rule
  // evaluated in EXACT INT64 microdegree arithmetic: an eastward ray
  // from the point crosses edge (x1,y1)→(x2,y2) iff the edge
  // straddles the point's latitude and the sign-adjusted cross
  // product places the intersection east of the point — no division,
  // no floats, so DuckDB replays the identical integer comparisons
  // bit-exactly (max |product| ≈ 3.6e8·9e6 ≈ 3e15, well inside
  // int64). Plan shape at 100 TB: the 5-polygon frame BROADCASTS
  // (bbox nested-loop join bounds candidates), the crossing parity
  // folds map-side via `aggregate` over the 8-edge array inside
  // whole-stage codegen — the point side never shuffles until the
  // final 5-group rollup, and a zorder-declared layout prunes files
  // to the polygons' bboxes before any IO (DsV2Spec pins it).
  private[graft] def polygonFrame(s: SparkSession, dir: String): DataFrame = {
    // 8 compass-bearing unit offsets (ulat, ulon), clockwise from N
    val U = Seq((2L, 0L), (1L, 1L), (0L, 2L), (-1L, 1L),
      (-2L, 0L), (-1L, -1L), (0L, -2L), (1L, -1L))
    def rK(k: Int) =
      h60(concat(col("r_name"), lit(s":r$k"))) % 1500000L + 1500000L
    def vy(k: Int) = col("clat") + lit(U(k)._1) * rK(k)
    def vx(k: Int) = col("clon") + lit(U(k)._2) * rK(k)
    val edges = array((0 until 8).map { k =>
      val j = (k + 1) % 8
      struct(vy(k).as("y1"), vx(k).as("x1"), vy(j).as("y2"), vx(j).as("x2"))
    }: _*)
    t(s, dir, "region").select(col("r_name"))
      .withColumn("clat", latE6(col("r_name")))
      .withColumn("clon", lonE6(col("r_name")))
      .withColumn("edges", edges)
      .withColumn("lat_min", least((0 until 8).map(vy): _*))
      .withColumn("lat_max", greatest((0 until 8).map(vy): _*))
      .withColumn("lon_min", least((0 until 8).map(vx): _*))
      .withColumn("lon_max", greatest((0 until 8).map(vx): _*))
      .drop("clat", "clon")
  }

  /** Ray-crossing parity of (latE6, lonE6) against an `edges` array
    * column — exact int64, zero UDFs, codegen-friendly.
    */
  private[graft] def crossings(latE6: Column, lonE6: Column): Column =
    aggregate(col("edges"), lit(0L), (acc: Column, e: Column) => {
      val y1 = e.getField("y1"); val x1 = e.getField("x1")
      val y2 = e.getField("y2"); val x2 = e.getField("x2")
      val straddles = (y1 > latE6) =!= (y2 > latE6)
      val lhs = (lonE6 - x1) * (y2 - y1)
      val rhs = (x2 - x1) * (latE6 - y1)
      val crosses = when(y2 > y1, lhs < rhs).otherwise(lhs > rhs)
      acc + when(straddles && crosses, lit(1L)).otherwise(lit(0L))
    })

  def geoPolygon(s: SparkSession, dir: String): DataFrame = {
    val pts = points(s, dir)
    pts.join(broadcast(polygonFrame(s, dir)),
        col("lat_e6") >= col("lat_min") && col("lat_e6") <= col("lat_max") &&
          col("lon_e6") >= col("lon_min") && col("lon_e6") <= col("lon_max"))
      .filter(crossings(col("lat_e6"), col("lon_e6")) % 2 === 1)
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_pts"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy(col("r_name"))
  }

  val geoPolygonSql: String =
    """WITH pts AS (
      |  SELECT event_id, event_type,
      |    ('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lat'),1,15))::BIGINT % 120000000 - 60000000 AS lat_e6,
      |    ('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lon'),1,15))::BIGINT % 360000000 - 180000000 AS lon_e6
      |  FROM events),
      |ks AS (SELECT * FROM (VALUES (0,2,0),(1,1,1),(2,0,2),(3,-1,1),
      |  (4,-2,0),(5,-1,-1),(6,0,-2),(7,1,-1)) AS t(k, ulat, ulon)),
      |vtx AS (
      |  SELECT r_name, k,
      |    (('0x'||substr(md5(r_name||':lat'),1,15))::BIGINT % 120000000 - 60000000)
      |      + ulat * (('0x'||substr(md5(r_name||':r'||CAST(k AS VARCHAR)),1,15))::BIGINT % 1500000 + 1500000) AS y,
      |    (('0x'||substr(md5(r_name||':lon'),1,15))::BIGINT % 360000000 - 180000000)
      |      + ulon * (('0x'||substr(md5(r_name||':r'||CAST(k AS VARCHAR)),1,15))::BIGINT % 1500000 + 1500000) AS x
      |  FROM region, ks),
      |edges AS (
      |  SELECT a.r_name, a.y AS y1, a.x AS x1, b.y AS y2, b.x AS x2
      |  FROM vtx a JOIN vtx b ON a.r_name = b.r_name AND b.k = (a.k + 1) % 8),
      |cr AS (
      |  SELECT p.event_id, p.event_type, e.r_name,
      |    SUM(CASE WHEN (e.y1 > p.lat_e6) <> (e.y2 > p.lat_e6) AND
      |      CASE WHEN e.y2 > e.y1
      |        THEN (p.lon_e6 - e.x1) * (e.y2 - e.y1) < (e.x2 - e.x1) * (p.lat_e6 - e.y1)
      |        ELSE (p.lon_e6 - e.x1) * (e.y2 - e.y1) > (e.x2 - e.x1) * (p.lat_e6 - e.y1)
      |      END THEN 1 ELSE 0 END) AS crossings
      |  FROM pts p, edges e
      |  GROUP BY 1, 2, 3)
      |SELECT r_name, COUNT(*) AS n_pts,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM cr WHERE crossings % 2 = 1
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // --- geo_dwell: STOP/DWELL DETECTION — the other canonical
  // trajectory rollup next to geo_trips' distance: where did each
  // user STAY? Fixes carry a per-(user, day) derived location (the
  // "home of the day" — md5-derived like every §5 fixture, so DuckDB
  // replays it), cells are the shared 6° integer grid, and a DWELL
  // is a maximal run of consecutive same-cell fixes spanning ≥ 2 h
  // (gap/island by lag-compare + running sum — the same one-window
  // shape as geo_trips, one shuffle on user_id, no self-join).
  // Cell-run semantics (not point-distance semantics) is what scales:
  // run detection is a lag compare, not a pairwise radius probe.
  // Midnight hand-off works unaided: a new day usually moves the
  // home cell (run breaks); when two days' homes share a cell the
  // run legitimately spans midnight — the oracle replays exactly
  // that rule.
  def geoDwell(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val DwellUs = 2L * 3600L * 1000000L
    val DayUs = 86400000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val fixes = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("day", floor(unix_micros(col("ts")) / DayUs).cast("bigint"))
      .withColumn("hk",
        concat(col("user_id").cast("string"), lit(":d"), col("day").cast("string")))
      .withColumn("clat", latCell(latE6(col("hk"))))
      .withColumn("clon", lonCell(lonE6(col("hk"))))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_seg",
        when(lag(col("clat"), 1).over(w).isNull ||
          col("clat") =!= lag(col("clat"), 1).over(w) ||
          col("clon") =!= lag(col("clon"), 1).over(w), 1L).otherwise(0L))
      .withColumn("seg", sum(col("new_seg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    fixes.groupBy(col("user_id"), col("seg"))
      .agg(min(col("us")).as("s0"), max(col("us")).as("s1"),
        count(lit(1)).as("n_fixes"))
      .filter(col("s1") - col("s0") >= DwellUs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_dwells"),
        sum(col("s1") - col("s0")).as("dwell_us_total"),
        max(col("s1") - col("s0")).as("dwell_us_max"),
        sum(col("n_fixes")).as("n_fixes_dwelling"))
      .orderBy(col("user_id"))
  }

  val geoDwellSql: String =
    """WITH fixes AS (
      |  SELECT event_id, user_id, EPOCH_US(ts) AS us,
      |    CAST(FLOOR((('0x'||substr(md5(CAST(user_id AS VARCHAR)||':d'||CAST(EPOCH_US(ts) // 86400000000 AS VARCHAR)||':lat'),1,15))::BIGINT % 120000000 - 60000000) / 6000000.0) AS BIGINT) AS clat,
      |    CAST(FLOOR((('0x'||substr(md5(CAST(user_id AS VARCHAR)||':d'||CAST(EPOCH_US(ts) // 86400000000 AS VARCHAR)||':lon'),1,15))::BIGINT % 360000000 - 180000000) / 6000000.0) AS BIGINT) AS clon
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_id, us, clat, clon,
      |    CASE WHEN lag(clat) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
      |      OR clat <> lag(clat) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      OR clon <> lag(clon) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |    THEN 1 ELSE 0 END AS new_seg
      |  FROM fixes),
      |runs AS (
      |  SELECT user_id, us,
      |    SUM(new_seg) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
      |  FROM marked),
      |segs AS (
      |  SELECT user_id, seg, MIN(us) AS s0, MAX(us) AS s1, COUNT(*) AS n_fixes
      |  FROM runs GROUP BY user_id, seg)
      |SELECT user_id, COUNT(*) AS n_dwells,
      |  CAST(SUM(s1 - s0) AS BIGINT) AS dwell_us_total,
      |  MAX(s1 - s0) AS dwell_us_max,
      |  CAST(SUM(n_fixes) AS BIGINT) AS n_fixes_dwelling
      |FROM segs
      |WHERE s1 - s0 >= 7200000000
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_dwell" -> geoDwell,
    "geo_polygon" -> geoPolygon,
    "geo_bbox" -> geoBbox,
    "geo_radius_join" -> geoRadiusJoin,
    "geo_knn" -> geoKnn,
    "geo_trips" -> geoTrips,
    "geo_cluster" -> geoCluster)

  val oracles: Map[String, String] = Map(
    "geo_dwell" -> geoDwellSql,
    "geo_polygon" -> geoPolygonSql,
    "geo_bbox" -> geoBboxSql,
    "geo_radius_join" -> geoRadiusJoinSql,
    "geo_knn" -> geoKnnSql,
    "geo_trips" -> geoTripsSql,
    "geo_cluster" -> geoClusterSql)
}
