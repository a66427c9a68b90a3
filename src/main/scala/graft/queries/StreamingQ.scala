package graft.queries

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables
import graft.streaming.{Sessionize, StreamWriter}

/** Streaming analytics over the events table (SURVEY.md §2):
  * watermarked tumbling-window aggregation through a REAL
  * Structured Streaming query (file source → memory sink, drained
  * with AvailableNow for determinism), and gap sessionization via the
  * native session_window operator.
  */
object StreamingQ {

  private val memId = new AtomicInteger(0)

  // --- stream_window_agg: tumbling 1-hour windows per event_type,
  // computed by an actual streaming query with a watermark. Complete
  // output mode + AvailableNow = deterministic full drain; the oracle
  // replays the same bucketing in batch SQL. In production the sink
  // is a partitioned parquet/Kafka sink in append mode; the agg state
  // and shuffle shape are identical.
  def streamWindowAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val schema = s.read.parquet(staged).schema
    val in = s.readStream.schema(schema).parquet(staged)
    val restored =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val name = s"graft_swa_${memId.incrementAndGet()}"
    val q = restored
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_swa_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("win_us"), col("event_type"))
  }

  val streamWindowAggSql: String =
    """SELECT (EPOCH_US(ts) // 3600000000) * 3600000000 AS win_us,
      |  event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_us, event_type""".stripMargin

  // --- stream_dedup: stateful streaming deduplication — the
  // exactly-once ingest guard (at-least-once sources replay rows;
  // dropDuplicates keyed on event_id with a watermark bounds the
  // dedup state instead of letting it grow forever). Oracle = batch
  // DISTINCT ON the same key.
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val schema = s.read.parquet(staged).schema
    val in = s.readStream.schema(schema).parquet(staged)
    val restored =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val name = s"graft_sdd_${memId.incrementAndGet()}"
    // Two stateful operators (dedup state + agg state) open and
    // commit a state store per shuffle partition per micro-batch —
    // the same state-volume-not-core-count rule as stream_join:
    // partitions vastly outnumbering state rows is pure store
    // open/commit overhead. Pinned into this query's fresh
    // checkpoint; restored for the batch remainder of the session.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q = restored
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), // (distinct aggs unsupported in streaming)
          min(col("user_id")).as("min_user"),
          max(col("user_id")).as("max_user"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_sdd_"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.table(name)
      .select(col("event_type"), col("n"), col("min_user"), col("max_user"))
      .orderBy(col("event_type"))
  }

  val streamDedupSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  MIN(user_id) AS min_user, MAX(user_id) AS max_user
      |FROM (SELECT DISTINCT ON (event_id) event_id, event_type, user_id FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- stream_enrich: stream-static enrichment join — the streaming
  // ingest pattern that decorates an event stream with a broadcast
  // dimension (here nation, keyed by a deterministic user_id mapping)
  // before aggregating. The static side is planned per micro-batch as
  // a broadcast hash join: no state, no stream-side shuffle for the
  // join itself. Oracle = the identical batch join.
  def streamEnrich(s: SparkSession, dir: String): DataFrame = {
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val schema = s.read.parquet(staged).schema
    val in = s.readStream.schema(schema).parquet(staged)
    val restored =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val nation = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("bigint").as("nkey"), col("n_name"))
    val name = s"graft_sen_${memId.incrementAndGet()}"
    val q = restored
      .withColumn("nkey", pmod(col("user_id"), lit(25L)))
      .join(broadcast(nation), "nkey")
      .groupBy(col("n_name"))
      // scaled-int sum (SURVEY §5): per-row floor(x*100+.5) then an
      // integer SUM is accumulation-order-independent, unlike
      // ROUND(SUM(double)) at a .005 boundary.
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5)).cast("bigint").as("sum_value_x100"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_sen_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
      .select(col("n_name"), col("n"), col("sum_value_x100"))
      .orderBy(col("n_name"))
  }

  val streamEnrichSql: String =
    """SELECT n_name, COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_x100
      |FROM events
      |JOIN nation ON n_nationkey = user_id % 25
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // --- stream_join: watermarked stream-stream interval join — the
  // attribution pattern (each purchase joined to the same user's
  // clicks in the preceding 24 h). Both sides carry watermarks and
  // the join condition carries an event-time range, so the state
  // store retains only a bounded 24h+delay window per side — the
  // shape that lets two infinite streams join with finite memory.
  // Inner-join matches emit as found (append mode). Oracle = the
  // identical batch interval join at µs precision.
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val schema = s.read.parquet(staged).schema
    val in = s.readStream.schema(schema).parquet(staged)
    val restored =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val clicks = restored.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = restored.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val name = s"graft_ssj_${memId.incrementAndGet()}"
    // State parallelism tracks STATE VOLUME, not core count: a
    // stream-stream join keeps 4 state stores per shuffle partition,
    // and store open/commit overhead dominates when partitions vastly
    // outnumber state rows (measured 1.7× at 32 vs 8 partitions on
    // this state size). The conf is pinned into the checkpoint at
    // first run; restored for the batch remainder of the session.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
          col("c_ts") <= col("p_ts"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_ssj_"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.table(name)
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  val streamJoinSql: String =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
      |  EPOCH_US(p.ts) - EPOCH_US(c.ts) AS gap_us
      |FROM events p JOIN events c
      |  ON c.user_id = p.user_id
      |  AND p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND EPOCH_US(c.ts) >= EPOCH_US(p.ts) - 86400000000
      |  AND EPOCH_US(c.ts) <= EPOCH_US(p.ts)
      |ORDER BY purchase_id, click_id""".stripMargin

  // --- stream_join_outer: stream-stream LEFT OUTER interval join —
  // purchases with NO qualifying prior click (the attribution
  // question the inner join can't answer) emit with null click
  // columns once the watermark passes their match window. Unmatched
  // emission is WATERMARK-DRIVEN: a left row leaves state (and emits
  // null-extended) only when no future right row could still match,
  // so state on both sides stays bounded by the interval width — the
  // 100 TB-stream shape. Two sentinel rows 26 h past the max event
  // time drive the final watermark past every real row's window so
  // the AvailableNow drain flushes ALL unmatched purchases (without
  // them, rows near the stream's end would sit in state forever and
  // the drain would under-report); the sentinels are excluded from
  // the result by their negative user_id. Oracle = the same interval
  // predicate as a batch LEFT JOIN.
  def streamJoinOuter(s: SparkSession, dir: String): DataFrame = {
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val batch = s.read.parquet(staged)
    val schema = batch.schema
    val tsIsLong = schema("ts").dataType == org.apache.spark.sql.types.LongType
    // sentinel ts = max + 26h in the STAGED unit (26h > the 24h
    // interval + 1h watermark delay, so every real window closes)
    val bump: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (tsIsLong) mx => mx + lit(26L * 3600L * 1000L * 1000L * 1000L)
      else mx => mx + expr("INTERVAL 26 HOURS")
    val mkSentinel = (etype: String, id: Long) => struct(
      lit(id).as("event_id"), bump(col("mx")).as("ts"),
      lit(-1L).as("user_id"), lit(etype).as("event_type"),
      lit(0.0).as("value"), lit(null).cast("string").as("props"))
    batch.agg(max(col("ts")).as("mx"))
      .select(explode(array(
        mkSentinel("click", -1L), mkSentinel("purchase", -2L))).as("r"))
      .select(schema.fieldNames.map(f => col(s"r.$f")).toIndexedSeq: _*)
      .coalesce(1).write.mode("append").parquet(staged)
    val in = s.readStream.schema(schema).parquet(staged)
    val restored =
      if (tsIsLong) in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val clicks = restored.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = restored.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val name = s"graft_ssjo_${memId.incrementAndGet()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
          col("c_ts") <= col("p_ts"),
        "leftOuter")
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_ssjo_"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.table(name)
      .filter(col("user_id") >= 0)
      .select(col("purchase_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"), col("user_id"),
        coalesce(unix_micros(col("p_ts")) - unix_micros(col("c_ts")),
          lit(-1L)).as("gap_us"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  val streamJoinOuterSql: String =
    """SELECT p.event_id AS purchase_id,
      |  COALESCE(c.event_id, -1) AS click_id, p.user_id,
      |  COALESCE(EPOCH_US(p.ts) - EPOCH_US(c.ts), -1) AS gap_us
      |FROM events p LEFT JOIN events c
      |  ON c.user_id = p.user_id AND c.event_type = 'click'
      |  AND EPOCH_US(c.ts) >= EPOCH_US(p.ts) - 86400000000
      |  AND EPOCH_US(c.ts) <= EPOCH_US(p.ts)
      |WHERE p.event_type = 'purchase'
      |ORDER BY purchase_id, click_id""".stripMargin

  // --- stream_join_full: the FULL OUTER completion of the interval
  // join matrix — one pass answers BOTH attribution complements:
  // purchases with no prior click AND clicks that never converted.
  // Same watermark-driven state eviction as the left-outer case
  // (each side's unmatched rows emit null-extended exactly once when
  // the global watermark passes their window), same two-sided drain
  // sentinels; state stays interval-bounded on both sides.
  def streamJoinFull(s: SparkSession, dir: String): DataFrame = {
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val batch = s.read.parquet(staged)
    val schema = batch.schema
    val tsIsLong = schema("ts").dataType == org.apache.spark.sql.types.LongType
    val bump: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (tsIsLong) mx => mx + lit(26L * 3600L * 1000L * 1000L * 1000L)
      else mx => mx + expr("INTERVAL 26 HOURS")
    val mkSentinel = (etype: String, id: Long) => struct(
      lit(id).as("event_id"), bump(col("mx")).as("ts"),
      lit(-1L).as("user_id"), lit(etype).as("event_type"),
      lit(0.0).as("value"), lit(null).cast("string").as("props"))
    batch.agg(max(col("ts")).as("mx"))
      .select(explode(array(
        mkSentinel("click", -1L), mkSentinel("purchase", -2L))).as("r"))
      .select(schema.fieldNames.map(f => col(s"r.$f")).toIndexedSeq: _*)
      .coalesce(1).write.mode("append").parquet(staged)
    val in = s.readStream.schema(schema).parquet(staged)
    val restored =
      if (tsIsLong) in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val clicks = restored.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = restored.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val name = s"graft_ssjf_${memId.incrementAndGet()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
          col("c_ts") <= col("p_ts"),
        "fullOuter")
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_ssjf_"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.table(name)
      .filter(coalesce(col("user_id"), col("c_user")) >= 0)
      .select(coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("user_id"), col("c_user")).as("user_id"),
        coalesce(unix_micros(col("p_ts")) - unix_micros(col("c_ts")),
          lit(-1L)).as("gap_us"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  val streamJoinFullSql: String =
    """SELECT COALESCE(p.event_id, -1) AS purchase_id,
      |  COALESCE(c.event_id, -1) AS click_id,
      |  COALESCE(p.user_id, c.user_id) AS user_id,
      |  COALESCE(EPOCH_US(p.ts) - EPOCH_US(c.ts), -1) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON c.user_id = p.user_id
      |  AND EPOCH_US(c.ts) >= EPOCH_US(p.ts) - 86400000000
      |  AND EPOCH_US(c.ts) <= EPOCH_US(p.ts)
      |ORDER BY purchase_id, click_id""".stripMargin

  // --- sessionize: 24h-gap sessions per user via the native
  // session_window operator (one shuffle on user_id; identical
  // operator serves streaming). Oracle = classic SQL gap/island.
  def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Tables.load(s, dir, "events"), "24 hours")
      .orderBy(col("user_id"), col("start_us"))

  val sessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, EPOCH_US(ts) AS ts_us, value,
      |    CASE WHEN EPOCH_US(ts) - lag(EPOCH_US(ts))
      |        OVER (PARTITION BY user_id ORDER BY ts) > 86400000000
      |      OR lag(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |), numbered AS (
      |  SELECT user_id, ts_us, value,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked
      |)
      |SELECT user_id, MIN(ts_us) AS start_us,
      |  MAX(ts_us) + 86400000000 AS end_us,
      |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
      |FROM numbered
      |GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  // --- stream_geofence: GEOFENCE ALERTING — the reference's
  // streaming GPS pipeline meeting its query-side geo domain: a
  // stream of fixes joins the BROADCAST station×15-cell 600 km
  // neighborhood frame on a map-side cell key (stream-STATIC join —
  // stateless, no watermark state on the fence side; the stream side
  // never shuffles before candidates exist), exact haversine applies
  // the true radius, and arrivals roll up in watermarked 1-hour
  // tumbling windows per station — the "how many fixes near station X
  // this hour" alert feed. Cost at 100 TB/day of fixes: per-row cell
  // key + broadcast lookup + windowed partial agg; the only shuffle
  // is the (window, station) aggregation.
  def streamGeofence(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFns._
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val schema = s.read.parquet(staged).schema
    val in = s.readStream.schema(schema).parquet(staged)
    val restored =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val stations = Geo.stationCells(s, dir)
    val name = s"graft_sgf_${memId.incrementAndGet()}"
    val q = restored
      .withColumn("lat_e6", latE6(col("event_id")))
      .withColumn("lon_e6", lonE6(col("event_id")))
      .withColumn("clat", latCell(col("lat_e6")))
      .withColumn("clon", lonCell(col("lon_e6")))
      .join(broadcast(stations), Seq("clat", "clon"))
      .withColumn("d_m", haversineMeters(
        deg(col("lat_e6")), deg(col("lon_e6")),
        deg(col("s_lat_e6")), deg(col("s_lon_e6"))))
      .filter(col("d_m") <= lit(600000.0))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("n_name"))
      .agg(count(lit(1)).as("n_fixes"),
        sum(floor(col("d_m") / 1000).cast("bigint")).as("sum_km"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_sgf_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
      .select(unix_micros(col("w.start")).as("win_us"), col("n_name"),
        col("n_fixes"), col("sum_km"))
      .orderBy(col("win_us"), col("n_name"))
  }

  val streamGeofenceSql: String =
    """WITH pts AS (
      |  SELECT event_id, ts,
      |    (('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lat'),1,15))::BIGINT % 120000000 - 60000000) / 1000000.0 AS lat,
      |    (('0x'||substr(md5(CAST(event_id AS VARCHAR)||':lon'),1,15))::BIGINT % 360000000 - 180000000) / 1000000.0 AS lon
      |  FROM events),
      |st AS (
      |  SELECT n_name,
      |    (('0x'||substr(md5(n_name||':lat'),1,15))::BIGINT % 120000000 - 60000000) / 1000000.0 AS lat,
      |    (('0x'||substr(md5(n_name||':lon'),1,15))::BIGINT % 360000000 - 180000000) / 1000000.0 AS lon
      |  FROM nation),
      |hits AS (
      |  SELECT pts.ts, st.n_name,
      |    2 * 6371000.0 * ASIN(SQRT(
      |      POW(SIN(RADIANS(st.lat - pts.lat) / 2), 2) +
      |      COS(RADIANS(pts.lat)) * COS(RADIANS(st.lat)) *
      |      POW(SIN(RADIANS(st.lon - pts.lon) / 2), 2))) AS d_m
      |  FROM pts, st)
      |SELECT (EPOCH_US(ts) // 3600000000) * 3600000000 AS win_us, n_name,
      |  COUNT(*) AS n_fixes,
      |  CAST(SUM(CAST(FLOOR(d_m / 1000) AS BIGINT)) AS BIGINT) AS sum_km
      |FROM hits
      |WHERE d_m <= 600000.0
      |GROUP BY 1, 2
      |ORDER BY win_us, n_name""".stripMargin

  // --- stream_drift: CONTINUOUS mixture-drift monitoring — the
  // streaming half of stats_drift: each event-time hour's type
  // mixture is compared to the corpus baseline profile ("did this
  // hour's traffic composition shift?"), the alert a continuously-
  // ingesting pipeline watches between full-corpus drift audits. The
  // STREAM does the data-proportional work (watermarked tumbling
  // windowed counts — the only shuffle); the drift arithmetic then
  // runs batch-side on the drained (windows × types) matrix, which
  // is metadata-sized at any event volume, against a broadcast
  // baseline profile (in production: yesterday's profile served from
  // the lake's stats plane). All-integer ppm shares (`div`), so the
  // alert threshold replays hash-exactly.
  def streamDrift(s: SparkSession, dir: String): DataFrame = {
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val schema = s.read.parquet(staged).schema
    val in = s.readStream.schema(schema).parquet(staged)
    val restored =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else in
    val name = s"graft_sdr_${memId.incrementAndGet()}"
    val q = restored
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_sdr_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wins = s.table(name)
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"), col("n"))
    val winTot = wins.groupBy(col("win_us")).agg(sum(col("n")).as("w_tot"))
    val base = Tables.load(s, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("b_n"))
    val baseTot = base.agg(sum(col("b_n")).as("b_tot"))
    wins.join(winTot, "win_us")
      .join(broadcast(base.crossJoin(broadcast(baseTot))), "event_type")
      .select(col("win_us"), col("event_type"), col("n"),
        expr("n * 1000000 div w_tot").as("ppm_win"),
        expr("b_n * 1000000 div b_tot").as("ppm_base"),
        abs(expr("n * 1000000 div w_tot") - expr("b_n * 1000000 div b_tot"))
          .as("ppm_shift"))
      .withColumn("alert", (col("ppm_shift") > 100000L).cast("int"))
      .orderBy(col("win_us"), col("event_type"))
  }

  val streamDriftSql: String =
    """WITH w AS (
      |  SELECT (EPOCH_US(ts) // 3600000000) * 3600000000 AS win_us,
      |    event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |wt AS (SELECT win_us, CAST(SUM(n) AS BIGINT) AS w_tot FROM w GROUP BY win_us),
      |b AS (SELECT event_type, COUNT(*) AS b_n FROM events GROUP BY event_type),
      |bt AS (SELECT CAST(SUM(b_n) AS BIGINT) AS b_tot FROM b)
      |SELECT win_us, event_type, n,
      |  n * 1000000 // w_tot AS ppm_win,
      |  b_n * 1000000 // b_tot AS ppm_base,
      |  abs(n * 1000000 // w_tot - b_n * 1000000 // b_tot) AS ppm_shift,
      |  CAST(abs(n * 1000000 // w_tot - b_n * 1000000 // b_tot) > 100000 AS INT) AS alert
      |FROM w JOIN wt USING (win_us) JOIN b USING (event_type), bt
      |ORDER BY win_us, event_type""".stripMargin

  // --- stream_topk: STATEFUL BOUNDED TOP-K per key — the streaming
  // leaderboard: mapGroupsWithState keeps, per event_type, only the
  // current top-5 (value DESC, event_id ASC tiebreak) plus a
  // seen-counter; each micro-batch folds its rows into the bounded
  // state and emits the refreshed board. State is O(K) per key — the
  // reason this is a mapGroupsWithState op and not a windowed agg:
  // the all-time leaderboard over an unbounded stream would
  // otherwise hold every row. Selection by a TOTAL order
  // (value, unique id) makes state order-independent across batch
  // boundaries and partitions — any arrival order converges to the
  // same board. The update-mode memory sink appends one board per
  // (key, batch); the final read keeps each key's last emission (max
  // seen). The gate reduces the board to scalars (top-1 id, id-sum,
  // per-element-floored value-sum) — SURVEY §5's no-arrays rule.
  def streamTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    Tables.ensureParquetConfs(s)
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    val schema = s.read.parquet(staged).schema
    val in = s.readStream.schema(schema).parquet(staged)
    val name = s"graft_stk_${memId.incrementAndGet()}"
    import s.implicits._
    val typed = in.select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
    val boards = typed.groupByKey(_._1)
      .mapGroupsWithState[(Seq[(Double, Long)], Long),
        (String, Long, Long, Long, Long)](GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val (prev, seen0) = state.getOption.getOrElse((Seq.empty[(Double, Long)], 0L))
          var seen = seen0
          val buf = scala.collection.mutable.ArrayBuffer[(Double, Long)](prev: _*)
          rows.foreach { r => seen += 1; buf += ((r._2, r._3)) }
          val top = buf.sortBy { case (v, id) => (-v, id) }.take(5).toSeq
          state.update((top, seen))
          (key, seen, top.head._2,
            top.map(_._2).sum,
            top.map { case (v, _) => math.floor(v * 100 + 0.5).toLong }.sum)
      }
      .toDF("event_type", "seen", "top1_id", "topk_id_sum", "topk_val_x100")
    val q = boards.writeStream
      .format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", graft.util.Scratch.dir("graft_ck_stk_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import org.apache.spark.sql.expressions.Window
    s.table(name)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("seen").desc)))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("event_type"))
  }

  val streamTopkSql: String =
    """WITH ranked AS (
      |  SELECT event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value DESC, event_id) AS rn
      |  FROM events),
      |tot AS (SELECT event_type, COUNT(*) AS seen FROM events GROUP BY event_type)
      |SELECT r.event_type, t.seen,
      |  MAX(CASE WHEN rn = 1 THEN event_id END) AS top1_id,
      |  CAST(SUM(event_id) AS BIGINT) AS topk_id_sum,
      |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS topk_val_x100
      |FROM ranked r JOIN tot t USING (event_type)
      |WHERE rn <= 5
      |GROUP BY r.event_type, t.seen
      |ORDER BY r.event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_topk" -> streamTopk,
    "stream_drift" -> streamDrift,
    "stream_geofence" -> streamGeofence,
    "stream_window_agg" -> streamWindowAgg,
    "stream_dedup" -> streamDedup,
    "stream_enrich" -> streamEnrich,
    "stream_join" -> streamJoin,
    "stream_join_outer" -> streamJoinOuter,
    "stream_join_full" -> streamJoinFull,
    "sessionize" -> sessionize)

  val oracles: Map[String, String] = Map(
    "stream_topk" -> streamTopkSql,
    "stream_drift" -> streamDriftSql,
    "stream_geofence" -> streamGeofenceSql,
    "stream_window_agg" -> streamWindowAggSql,
    "stream_dedup" -> streamDedupSql,
    "stream_enrich" -> streamEnrichSql,
    "stream_join" -> streamJoinSql,
    "stream_join_outer" -> streamJoinOuterSql,
    "stream_join_full" -> streamJoinFullSql,
    "sessionize" -> sessionizeSql)
}
