package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.{AvroSchema, Tables}
import graft.writer.{BlockWriter, Compactor}
import graft.streaming.StreamWriter

/** Reference-derived write/ingest path coverage (SURVEY.md §2).
  *
  * These queries exercise the library's write side (BlockWriter /
  * Compactor / StreamWriter / AvroSchema) end-to-end inside a query:
  * write to a temp lake layout, read back, and reduce to a DataFrame
  * whose oracle is computable directly from the source table —
  * so the DuckDB gate checks layout row-counts, file bounds, and
  * within-file ordering, not just query algebra.
  */
object WritePath {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def r2(c: Column): Column = round(c, 2)

  /** Ephemeral lake layouts live on [[graft.util.Scratch]] (RAM-backed
    * locally, object store on a cluster), deleted at JVM exit.
    */
  private def tmp(prefix: String): String = graft.util.Scratch.dir(prefix)

  /** Eager recursive delete for dirs whose consumers have finished. */
  private def rmNow(path: String): Unit = graft.util.Scratch.rmNow(path)

  // --- ingest_schema: the reference's schema-enforced ingest
  // (goavro codec semantics: null-unions + defaults; main.go:20-42).
  // Events are rendered to JSON lines (absent fields where null),
  // parsed back through the Avro-derived StructType, and defaults
  // filled — all codegen'd expressions, no UDF.
  def ingestSchema(s: SparkSession, dir: String): DataFrame = {
    val payload = to_json(struct(
      col("user_id").cast("string").as("user_id"),
      unix_micros(col("ts")).as("timestamp"),
      r2(col("value")).as("latitude"),
      (-r2(col("value"))).as("longitude"),
      when(col("event_type") === "click", lit("web")).as("source"),
      array(col("event_type")).as("features"),
      when(col("value") > 50, r2(col("value") / 10)).as("speed")))
    val rec = AvroSchema.ingestJson(payload, AvroSchema.locationSchemaJson)
    t(s, dir, "events")
      .select(rec.as("r"))
      .select(col("r.*"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        // scaled-int sum (SURVEY §5): a double AVG is accumulation-
        // order-dependent and can flip at a rounding boundary between
        // Spark's partition-merge order and DuckDB's
        sum(floor(col("latitude") * 100 + 0.5)).cast("bigint").as("sum_lat_x100"),
        count(col("speed")).as("n_speed"),
        min(col("timestamp")).as("min_ts_us"),
        max(col("timestamp")).as("max_ts_us"),
        sum(size(col("features"))).cast("bigint").as("n_features"))
      .orderBy(col("source"))
  }

  val ingestSchemaSql: String =
    """SELECT CASE WHEN event_type = 'click' THEN 'web' ELSE 'device' END AS source,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(ROUND(value, 2) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_lat_x100,
      |  CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_speed,
      |  MIN(EPOCH_US(ts)) AS min_ts_us,
      |  MAX(EPOCH_US(ts)) AS max_ts_us,
      |  COUNT(*) AS n_features
      |FROM events
      |GROUP BY 1
      |ORDER BY source""".stripMargin

  // --- ingest_avro: the reference's BINARY wire format end-to-end —
  // events rendered as minimal producer records, encoded to real Avro
  // binary (writer schema WITHOUT the defaulted fields), decoded
  // against the full Location schema so Avro's own schema resolution
  // fills source="device" and the null-union defaults, then reduced.
  // Encode and decode both run as one-codec-per-partition
  // mapPartitions — distributed, no driver involvement. The oracle
  // replays the payload arithmetic straight from events; the
  // default-filled columns (constant source, all-null accuracy) prove
  // the resolution actually ran.
  def ingestAvro(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.AvroBinary
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val wireEnc: Encoder[AvroBinary.Wire] = Encoders.product[AvroBinary.Wire]
    implicit val locEnc: Encoder[AvroBinary.Loc] = Encoders.product[AvroBinary.Loc]
    implicit val bytesEnc: Encoder[Array[Byte]] = Encoders.BINARY
    val writerJson = AvroBinary.writerSchemaJson
    val readerJson = AvroSchema.locationSchemaJson
    val wire = t(s, dir, "events")
      .select(
        array(col("event_type")).as("features"),
        r2(col("value")).as("latitude"),
        (-r2(col("value"))).as("longitude"),
        when(col("value") > 50, r2(col("value") / 10)).as("speed"),
        unix_micros(col("ts")).as("timestamp"),
        col("user_id").cast("string").as("user_id"))
      .as[AvroBinary.Wire]
    val encoded = wire.mapPartitions(rows =>
      AvroBinary.encodePartition(rows, writerJson))
    val decoded = encoded.mapPartitions(bs =>
      AvroBinary.decodePartition(bs, writerJson, readerJson))
    decoded.toDF()
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        // scaled-int sum — same oracle-parity rule as ingest_schema
        sum(floor(col("latitude") * 100 + 0.5)).cast("bigint").as("sum_lat_x100"),
        count(col("speed")).as("n_speed"),
        count(col("accuracy")).as("n_accuracy"),
        min(col("timestamp")).as("min_ts_us"),
        max(col("timestamp")).as("max_ts_us"),
        sum(size(col("features"))).cast("bigint").as("n_features"))
      .orderBy(col("source"))
  }

  val ingestAvroSql: String =
    """SELECT 'device' AS source,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(ROUND(value, 2) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_lat_x100,
      |  CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_speed,
      |  CAST(0 AS BIGINT) AS n_accuracy,
      |  MIN(EPOCH_US(ts)) AS min_ts_us,
      |  MAX(EPOCH_US(ts)) AS max_ts_us,
      |  COUNT(*) AS n_features
      |FROM events""".stripMargin

  // --- block_assign: BlockManager's block assignment (main.go:73-87):
  // per partition value, key-ordered, ≤16-row blocks. One window
  // shuffle on user_id; the oracle replays it as SQL window algebra.
  def blockAssign(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("block_id",
        BlockWriter.blockId("user_id", Seq(col("ts"), col("event_id")), 16))
      .groupBy(col("user_id"), col("block_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .orderBy(col("user_id"), col("block_id"))

  val blockAssignSql: String =
    """SELECT user_id, CAST(FLOOR((rn - 1) / 16) AS BIGINT) AS block_id,
      |  COUNT(*) AS n_rows, MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
      |FROM (SELECT user_id, EPOCH_US(ts) AS ts_us,
      |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |      FROM events)
      |GROUP BY 1, 2
      |ORDER BY user_id, block_id""".stripMargin

  /** Read back a BlockWriter layout and reduce to per-partition
    * invariants: row count, file count, and within-file key-order
    * violations (must be 0 — files are key-sorted by construction).
    */
  private def readBackStats(s: SparkSession, path: String, maxPerFile: Int): DataFrame = {
    import s.implicits._
    // Two consumers (the split-order audit and the per-user reduce)
    // read the same four columns: cache ONE pruned pass over the
    // file-count-heavy layout instead of paying the per-file open
    // cost twice. The cache preserves intra-partition row order, so
    // the contiguous-split invariant the audit relies on holds.
    val back = graft.util.QueryScratch.cached(s.read.parquet(path)
      .withColumn("f", col("_metadata.file_path"))
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("user_id"), col("f"), col("ts_us"),
        col("_metadata.file_block_start").as("bs")))
    // Within-file physical order, audited WITHOUT a full-table
    // shuffle: rows of one (file, split) arrive contiguously and
    // in file order inside a scan partition, so adjacent-pair
    // inversions are counted in a single streaming pass over two
    // columns (zero shuffle); cross-split order is then checked from
    // the per-split [min,max] ts extents (splits are disjoint byte
    // ranges, ordered by block start — a sorted file has
    // non-overlapping, ascending extents). The split frame is
    // file-count-sized, so the ordering window below is over
    // metadata-scale data. (The previous implementation lag-windowed
    // every ROW — a full-table shuffle just to compute the oracle's
    // zero; at 100 TB the audit cost would have rivaled the write.)
    val splitStats = back
      .select(col("f"), col("bs"), col("ts_us"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, Long)]
        var file: String = null
        var bs = 0L; var inv = 0L; var lo = 0L; var hi = 0L; var prev = 0L
        def flush(): Unit =
          if (file != null) out += ((file, bs, inv, lo, hi))
        for ((f, b, ts) <- it) {
          if (file == null || file != f || bs != b) {
            flush(); file = f; bs = b; inv = 0L; lo = ts; hi = ts; prev = ts
          } else {
            if (ts < prev) inv += 1
            if (ts < lo) lo = ts
            if (ts > hi) hi = ts
            prev = ts
          }
        }
        flush()
        out.iterator
      }.toDF("f", "bs", "inv", "lo", "hi")
    val wf = Window.partitionBy(col("f")).orderBy(col("bs"))
    val perUserViol = splitStats
      .withColumn("prev_hi", lag(col("hi"), 1).over(wf))
      .withColumn("cross", when(col("prev_hi") > col("lo"), 1L).otherwise(0L))
      .withColumn("user_id", regexp_extract(col("f"), "user_id=([^/]+)", 1).cast("bigint"))
      .groupBy(col("user_id"))
      .agg(sum(col("inv") + col("cross")).as("violations"))
    back
      .groupBy(col("user_id").cast("bigint").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("f")).as("n_files"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"))
      .join(perUserViol, Seq("user_id"), "left")
      .withColumn("violations", coalesce(col("violations"), lit(0L)))
      .select(col("user_id"), col("n_rows"), col("n_files"), col("violations"),
        col("min_ts_us"), col("max_ts_us"))
      .orderBy(col("user_id"))
  }

  private def statsOracle(maxPerFileExpr: String, where: String = "TRUE"): String =
    s"""SELECT user_id, COUNT(*) AS n_rows,
       |  $maxPerFileExpr AS n_files,
       |  CAST(0 AS BIGINT) AS violations,
       |  MIN(EPOCH_US(ts)) AS min_ts_us, MAX(EPOCH_US(ts)) AS max_ts_us
       |FROM events
       |WHERE $where
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // --- partitioned_write: full BlockWriter round-trip at the
  // reference's MaxSize=4096 (main.go:78). The oracle pins the
  // file-count law (ceil(rows/maxRecordsPerFile) per partition — one
  // task owns a partition value after the hash repartition) and zero
  // sort violations; fine-grained (multi-file) blocking is exercised
  // by block_assign (the block math) and compaction (16-row scatter).
  def partitionedWrite(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_pw_")
    BlockWriter.write(t(s, dir, "events"), out,
      BlockWriter.Config("user_id", "ts", maxRecordsPerFile = 4096))
    readBackStats(s, out, 4096)
  }

  val partitionedWriteSql: String =
    statsOracle("CAST(CEIL(COUNT(*) / 4096.0) AS BIGINT)")

  // --- compaction: scatter tiny blocks (≤16 rows) for a TARGETED
  // subset of partitions, then Compactor rewrites each to a single
  // key-sorted file. Targeting a subset is the realistic maintenance
  // shape — a compaction job rewrites the partitions whose file
  // counts exceeded threshold, never the whole lake — and keeps the
  // benched work proportional to the partitions compacted rather
  // than table size.
  def compaction(s: SparkSession, dir: String): DataFrame = {
    val small = tmp("graft_small_")
    val compacted = tmp("graft_compacted_")
    BlockWriter.write(
      t(s, dir, "events").filter(col("user_id") % 10 === 0), small,
      BlockWriter.Config("user_id", "ts", maxRecordsPerFile = 16))
    Compactor.compact(s, small, compacted,
      BlockWriter.Config("user_id", "ts", maxRecordsPerFile = 1 << 22))
    rmNow(small) // scatter files are consumed by the (eager) compact
    readBackStats(s, compacted, 1 << 22)
  }

  val compactionSql: String =
    statsOracle("CAST(1 AS BIGINT)", "user_id % 10 = 0")

  // --- stream_write: the reference's streaming pipeline shape
  // (FileStreamAdapter → BlockManager → storage): Structured
  // Streaming file source → partitioned file sink, drained
  // synchronously with AvailableNow. Oracle checks exactly-once
  // delivery (per-user counts and ts bounds match the source).
  def streamWrite(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_stream_out_")
    val ck = tmp("graft_stream_ck_")
    val staged = StreamWriter.stageDir(s"$dir/events.parquet")
    StreamWriter.runOnce(s, staged, out, ck,
      BlockWriter.Config("user_id", "ts", maxRecordsPerFile = 4096))
    s.read.parquet(out)
      .groupBy(col("user_id").cast("bigint").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .orderBy(col("user_id"))
  }

  val streamWriteSql: String =
    """SELECT user_id, COUNT(*) AS n_rows,
      |  MIN(EPOCH_US(ts)) AS min_ts_us, MAX(EPOCH_US(ts)) AS max_ts_us
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // --- upsert_merge: merge-on-read upsert — a base layout plus an
  // updates batch, resolved to latest-version-per-key at read time
  // (union + row_number dedup, one shuffle on the key), then
  // compacted back to a clean layout. The lake-writer companion to
  // CDC ingest; works identically whether the "read" happens at query
  // time (MoR) or in a rewrite job (CoW, as here).
  def upsertMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    // deterministic updates batch: every 7th event gets value+1000, v=1
    val updates = ev.filter(col("event_id") % 7 === 0)
      .withColumn("value", col("value") + 1000.0)
    val merged = ev.withColumn("v", lit(0))
      .unionByName(updates.withColumn("v", lit(1)))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("v").desc)
    val resolved = merged
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "v")
    resolved
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        r2(sum(col("value"))).as("sum_value"),
        sum(when(col("value") > 1000.0, 1L).otherwise(0L)).as("n_updated"))
      .orderBy(col("event_type"))
  }

  val upsertMergeSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  ROUND(SUM(CASE WHEN event_id % 7 = 0 THEN value + 1000 ELSE value END), 2) AS sum_value,
      |  CAST(SUM(CASE WHEN (CASE WHEN event_id % 7 = 0 THEN value + 1000 ELSE value END) > 1000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- schema_evolution: a lake layout written in two generations —
  // the second adds a column — read back with mergeSchema, old files
  // null-filling the new column. The schema-drift behavior every
  // long-lived ingest pipeline depends on.
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_se_")
    val ev = t(s, dir, "events")
    ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("value"))
      .write.mode("overwrite").parquet(s"$out/gen=0")
    ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("user_id"), col("value"),
        upper(col("event_type")).as("etype"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    s.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("gen").cast("bigint").as("gen"))
      .agg(count(lit(1)).as("n"),
        count(col("etype")).as("n_etype"),
        countDistinct(col("etype")).as("etype_card"))
      .orderBy(col("gen"))
  }

  val schemaEvolutionSql: String =
    """SELECT event_id % 2 AS gen, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_etype,
      |  CAST(CASE WHEN event_id % 2 = 1 THEN COUNT(DISTINCT upper(event_type)) ELSE 0 END AS BIGINT) AS etype_card
      |FROM events
      |GROUP BY event_id % 2
      |ORDER BY gen""".stripMargin

  // --- ingest_jsonl: the JSON-LINES interchange format — how raw
  // crawl dumps and LLM corpora actually arrive (one JSON object per
  // line, schema on read). The corpus is rendered to a JSONL layout
  // (distributed text sink, one pass), then ingested back through the
  // SCHEMA-ENFORCED json-lines source: an EXPLICIT StructType, so no
  // inference pass over the data (at 100 TB, inference is a full
  // extra scan) and a drifting producer surfaces as nulls under
  // PERMISSIVE mode instead of poisoning the pipeline. The reduce
  // proves the round trip is lossless, text bytes included
  // (whitespace-token accounting survives JSON string escaping).
  def ingestJsonl(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_jsonl_")
    t(s, dir, "documents")
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("value"))
      .write.mode("overwrite").text(out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    s.read.schema(schema).json(out)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(size(split(col("text"), " +"))).as("n_tokens"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"), col("source"))
  }

  val ingestJsonlSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(len(regexp_split_to_array(text, ' +'))) AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  // --- ingest_csv: schema-enforced CSV ingest round trip — the
  // third wire format next to Avro and JSONL (the reference family's
  // ingest contract: schema declared UP FRONT, not inferred — an
  // inference pass over 100 TB of CSV is a full extra scan, and
  // inferred types drift between shards). Quoting/escaping exercise
  // real CSV parsing (document text carries commas/spaces); the
  // aggregate hash-matches the source table, proving lossless
  // round-trip.
  def ingestCsv(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_csv_")
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    // multiLine: the writer quotes every field, so document text with
    // embedded newlines must parse back as ONE record — without it the
    // reader splits quoted newlines into garbage rows (the ingest
    // contract must hold for arbitrary text, not just the current
    // corpus). Writer and reader share Spark's default quote/escape
    // (`"` / `\`), so no other option may diverge.
    s.read.schema(schema).option("header", "true")
      .option("multiLine", "true").csv(out)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).cast("bigint").as("text_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"), col("source"))
  }

  val ingestCsvSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(LEN(text)) AS BIGINT) AS text_chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_schema" -> ingestSchema,
    "ingest_avro" -> ingestAvro,
    "ingest_jsonl" -> ingestJsonl,
    "ingest_csv" -> ingestCsv,
    "block_assign" -> blockAssign,
    "partitioned_write" -> partitionedWrite,
    "compaction" -> compaction,
    "stream_write" -> streamWrite,
    "upsert_merge" -> upsertMerge,
    "schema_evolution" -> schemaEvolution)

  val oracles: Map[String, String] = Map(
    "ingest_schema" -> ingestSchemaSql,
    "ingest_avro" -> ingestAvroSql,
    "ingest_jsonl" -> ingestJsonlSql,
    "ingest_csv" -> ingestCsvSql,
    "block_assign" -> blockAssignSql,
    "partitioned_write" -> partitionedWriteSql,
    "compaction" -> compactionSql,
    "stream_write" -> streamWriteSql,
    "upsert_merge" -> upsertMergeSql,
    "schema_evolution" -> schemaEvolutionSql)
}
