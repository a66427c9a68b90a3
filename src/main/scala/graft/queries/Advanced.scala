package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns
import graft.sources.Tables

/** Round-3 operator block: lake-layout optimization (Z-order),
  * iterative ML (integer-exact k-means), text relevance (tf-icf),
  * redaction, CDC snapshot diff, collocations, histograms.
  *
  * Determinism rules follow SURVEY.md §5: every pseudo-random or
  * floating step is replaced by md5-derived or integer arithmetic so
  * the DuckDB oracles replay bit-identical values.
  */
object Advanced {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def r2(c: Column): Column = round(c, 2)

  /** Integer floor division on non-negative operands (bigint). */
  private def idiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("bigint")

  // --- zorder_layout: Z-order (Morton) clustering — the data-lake
  // layout optimization for multi-dimensional pruning. Dimension
  // buckets (event day, value/2) interleave bit-by-bit into a 16-bit
  // z-value; files laid out in z order are tight in BOTH dimensions,
  // so min/max file stats prune 2-D predicates. The query reduces the
  // layout to per-z-bucket extents — the tightness the pruning relies
  // on — as pure integer arithmetic (oracle-exact). In production the
  // dimension buckets come from table min/max stats; fixed constants
  // here keep the query stats-free. Scale: map-side z computation +
  // one agg shuffle; the physical write rides BlockWriter with z as
  // the sort key (spec-asserted).
  private val Z_DIM_BITS = 8

  /** Bit-interleave two `Z_DIM_BITS`-bit bigint columns: a's bit b →
    * even position 2b, b's bit → odd position 2b+1.
    */
  def zInterleave(a: Column, b: Column): Column = zInterleaveN(Seq(a, b))

  /** N-dimensional bit interleave: bit i of dim d lands at position
    * D·i + d (for D = 2 this is exactly the classic (a, b) morton
    * pairing above — dim 0 at even bits, dim 1 at odd). Pure bitwise
    * map-side arithmetic, codegen-friendly.
    */
  def zInterleaveN(dims: Seq[Column]): Column = {
    val d = dims.length
    (0 until Z_DIM_BITS).flatMap { i =>
      dims.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), d * i + j)
      }
    }.reduce(_ + _).cast("bigint")
  }

  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val day = expr("(unix_micros(ts) div 86400000000) % 256").cast("bigint")
    val vb = least(lit(255L), floor(col("value") / 2).cast("bigint"))
    t(s, dir, "events")
      .withColumn("day", day)
      .withColumn("vb", vb)
      .withColumn("z", zInterleave(col("day"), col("vb")))
      .withColumn("zbucket", shiftright(col("z"), 6).cast("bigint"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"),
        min(col("vb")).as("min_vb"), max(col("vb")).as("max_vb"))
      .orderBy(col("zbucket"))
  }

  val zorderLayoutSql: String = {
    val terms = (0 until Z_DIM_BITS).map { i =>
      s"(((day >> $i) & 1) << ${2 * i}) + (((vb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH dims AS (
       |  SELECT (EPOCH_US(ts) // 86400000000) % 256 AS day,
       |    least(255, CAST(floor(value / 2) AS BIGINT)) AS vb
       |  FROM events),
       |z AS (SELECT day, vb, ($terms) AS z FROM dims)
       |SELECT z >> 6 AS zbucket, COUNT(*) AS n,
       |  MIN(day) AS min_day, MAX(day) AS max_day,
       |  MIN(vb) AS min_vb, MAX(vb) AS max_vb
       |FROM z
       |GROUP BY zbucket
       |ORDER BY zbucket""".stripMargin
  }

  // --- kmeans_embed: Lloyd's k-means over the embeddings table —
  // 2 iterations from a deterministic seed codebook (first K
  // vectors), squared-Euclidean assignment, centroid update by
  // per-dimension mean. ALL arithmetic is scaled-integer (components
  // ×1e6 → bigint; means via floor division), so iterations are
  // order-independent and the oracle replays them exactly — the
  // standard trick for reproducible distributed k-means (float sums
  // are partial-order-dependent). Scale: assignment is a broadcast
  // cross join (K rows) + map-side argmin; the update is one shuffle
  // on (cluster, dim) — no driver-side state beyond K centroids.
  private[graft] val KM_K = 8
  private val KM_ITERS = 2

  /** Embedding components → scaled-int (×1e6, half-up) bigint array. */
  private[graft] def kmIntVec(emb: Column): Column =
    transform(emb.cast("array<double>"),
      x => floor(x * lit(1000000.0) + lit(0.5)).cast("bigint"))

  /** Integer squared-Euclidean distance of two int-vector columns —
    * the native [[graft.functions.IntL2]] expression (fused codegen
    * loop; the zip_with+aggregate composition is CodegenFallback and
    * evaluates interpreted on the N×K assignment hot path). Requires
    * [[graft.plans.GraftExtensions]] registration (Tables.load does).
    */
  private[graft] def kmD2(vi: Column, ci: Column): Column =
    call_function("graft_d2i", vi, ci)

  /** Nearest-centroid assignment of `base` (vec_id, vi) against a
    * centroid frame (cid, ci) → (vec_id, cid, d2). Argmin via a
    * struct-min AGGREGATE (lexicographic (d2, cid): nearest centroid,
    * ties → lowest cid) — map-side partial aggregation, no shuffle+
    * sort of the N×K scored frame (a `row_number` window would sort).
    */
  private[graft] def kmAssign(base: DataFrame, cents: DataFrame): DataFrame =
    base.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(kmD2(col("vi"), col("ci")).as("d2"), col("cid").as("cid")).as("dc"))
      .groupBy(col("vec_id")).agg(min(col("dc")).as("dc"))
      .select(col("vec_id"), col("dc.cid").as("cid"), col("dc.d2").as("d2"))

  /** Centroids after `updates` Lloyd update steps from the first-K
    * seed codebook — (cid, ci), ci scaled-int. The shared trainer
    * behind kmeans_embed and ann_ivf's codebook; all-integer, so
    * results are partition-order-independent and oracle-exact.
    */
  private[graft] def kmCentroids(base: DataFrame, k: Int, updates: Int): DataFrame = {
    var cents = base.filter(col("vec_id") < k)
      .select(col("vec_id").cast("bigint").as("cid"), col("vi").as("ci"))
    for (_ <- 1 to updates) {
      cents = kmAssign(base, cents).join(base, "vec_id")
        .select(col("cid"), posexplode(col("vi")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("bigint").as("cv"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
          e => e.getField("cv")).as("ci"))
    }
    cents
  }

  def kmeansEmbed(s: SparkSession, dir: String): DataFrame = {
    val base = graft.util.QueryScratch.cached(t(s, dir, "embeddings")
      .select(col("vec_id"), kmIntVec(col("embedding")).as("vi")))
    // the report reads the PERSISTED assignment (operators/IvfIndex —
    // the same trained artifact ann_ivf and dedup_semantic probe);
    // training runs once per corpus, not once per consumer
    val ref = graft.operators.IvfIndex.ensure(s, dir, base)
    graft.operators.IvfIndex.cells(s, ref)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("inertia"))
      .orderBy(col("cid"))
  }

  private[queries] def kmSqlD2(v: String, c: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, 64), i -> ($v[i]-$c[i])*($v[i]-$c[i]))) AS BIGINT)"

  /** CTEs `b` (int base), `c0` (seed), `d1`/`a1` (first assignment),
    * `u`/`c1` (one Lloyd update → trained K=[[KM_K]] centroids) —
    * the SQL replay of [[kmCentroids]](_, KM_K, 1), shared by the
    * kmeans_embed and ann_ivf oracles.
    */
  private[queries] val kmCentroidSqlCtes: String =
    s"""b AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(x::DOUBLE * 1000000 + 0.5) AS BIGINT)) AS vi
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, vi AS ci FROM b WHERE vec_id < $KM_K),
       |d1 AS (SELECT b.vec_id, c0.cid, ${kmSqlD2("b.vi", "c0.ci")} AS d2 FROM b, c0),
       |a1 AS (SELECT vec_id, cid, d2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d1)
       |  WHERE rn = 1),
       |u AS (SELECT a1.cid, t.i AS pos,
       |    CAST(FLOOR(SUM(b.vi[t.i])::DOUBLE / COUNT(*)) AS BIGINT) AS cv
       |  FROM a1 JOIN b USING (vec_id), range(1, 65) t(i)
       |  GROUP BY a1.cid, t.i),
       |c1 AS (SELECT cid, list(cv ORDER BY pos) AS ci FROM u GROUP BY cid)""".stripMargin

  val kmeansEmbedSql: String =
    s"""WITH $kmCentroidSqlCtes,
       |d2r AS (SELECT b.vec_id, c1.cid, ${kmSqlD2("b.vi", "c1.ci")} AS d2 FROM b, c1),
       |a2 AS (SELECT vec_id, cid, d2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d2r)
       |  WHERE rn = 1)
       |SELECT cid, COUNT(*) AS n, CAST(SUM(d2) AS BIGINT) AS inertia
       |FROM a2
       |GROUP BY cid
       |ORDER BY cid""".stripMargin

  // --- tfidf_topk: per-document top terms by tf·icf relevance.
  // The idf factor is the integer rational N·10000/df (an inverse
  // collection frequency) rather than ln(N/df): monotone in df, and
  // integer-exact across engines — a float log's last-ulp differences
  // would poison hash comparison (SURVEY.md §5). Scale: tf is one
  // shuffle on (doc, word); df one on word; the df side of the join
  // is the vocabulary — orders smaller than the corpus.
  private val TFIDF_TOPK = 3

  def tfidfTopk(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // N derived INSIDE the plan (single-row agg broadcast onto the
    // vocabulary-sized score join) — no driver count() pre-pass.
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // cached before the explode (Generate would re-derive the words
    // array per output row otherwise).
    val words = graft.util.QueryScratch.cached(docs
      .select(col("doc_id"), TextFns.words(col("text")).as("ws")))
      .select(col("doc_id"), explode(col("ws")).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.join(df, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", idiv(col("tf") * lit(10000L) * col("n_docs"), col("df")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= TFIDF_TOPK)
      .select(col("doc_id"), col("rank"), col("word"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val tfidfTopkSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0)) AS word
       |  FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
       |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
       |scored AS (
       |  SELECT doc_id, tf.word, tf, df,
       |    (tf * 10000 * (SELECT COUNT(*) FROM documents)) // df AS score
       |  FROM tf JOIN df USING (word))
       |SELECT doc_id, rank, word, tf, CAST(df AS BIGINT) AS df, CAST(score AS BIGINT) AS score FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $TFIDF_TOPK
       |ORDER BY doc_id, rank""".stripMargin

  // --- pii_scrub: pattern redaction — the PII-scrub mechanism every
  // training corpus passes through (emails/phones/ids in production;
  // a term pattern here, since the synthetic corpus has no digits).
  // The checksum over the SCRUBBED text proves the rewrite itself
  // matches across engines, not just the hit counts. Map-side only.
  private val SCRUB_PATTERN = "\\b(customer|user|key)\\b"

  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val scrubbed = regexp_replace(col("text"), SCRUB_PATTERN, "[REDACTED]")
    t(s, dir, "documents")
      .withColumn("n_hits", regexp_count(col("text"), lit(SCRUB_PATTERN)).cast("bigint"))
      .withColumn("ck", TextFns.hash60(scrubbed) % lit(1000000007L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_hits")).as("n_hits"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("docs_hit"),
        sum(col("ck")).as("scrub_checksum"))
      .orderBy(col("source"))
  }

  val piiScrubSql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(len(regexp_extract_all(text, '$SCRUB_PATTERN'))) AS BIGINT) AS n_hits,
       |  CAST(SUM(CASE WHEN len(regexp_extract_all(text, '$SCRUB_PATTERN')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
       |  CAST(SUM(('0x'||substr(md5(regexp_replace(text, '$SCRUB_PATTERN', '[REDACTED]', 'g')),1,15))::BIGINT % 1000000007) AS BIGINT) AS scrub_checksum
       |FROM documents
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // --- cdc_diff: snapshot differencing — classify every key as
  // insert/update/delete/same between two table generations (the
  // read side of CDC; upsert_merge is the write side). One full-outer
  // join on the key; both snapshots derive deterministically from
  // events so the oracle replays them. Scale: single key-shuffle,
  // arbitrarily wide tables diff by comparing a row checksum instead
  // of each column.
  def cdcDiff(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_id"), col("value"))
    val oldSnap = ev.select(col("event_id").as("k"), col("value").as("v_old"))
    val newSnap = ev.filter(col("event_id") % 11 =!= 0)
      .select(col("event_id").as("k"),
        when(col("event_id") % 7 === 0, col("value") + 100).otherwise(col("value")).as("v_new"))
      .unionByName(ev.filter(col("event_id") % 13 === 0)
        .select((col("event_id") + 10000000L).as("k"), (col("value") * 2).as("v_new")))
    oldSnap.join(newSnap, Seq("k"), "full_outer")
      .withColumn("change",
        when(col("v_new").isNull, "delete")
          .when(col("v_old").isNull, "insert")
          .when(col("v_new") =!= col("v_old"), "update")
          .otherwise("same"))
      .groupBy(col("change"))
      // scaled-integer sum (SURVEY §5): a float SUM is
      // accumulation-order-dependent, so ROUND(SUM(double)) could flip
      // at a .005 boundary between engines; per-row floor(x*100+.5)
      // on bit-identical doubles then an integer SUM never does.
      .agg(count(lit(1)).as("n"),
        sum(floor(coalesce(col("v_new"), col("v_old")) * 100 + 0.5))
          .cast("bigint").as("sum_value_x100"))
      .orderBy(col("change"))
  }

  val cdcDiffSql: String =
    """WITH old_snap AS (SELECT event_id AS k, value AS v_old FROM events),
      |new_snap AS (
      |  SELECT event_id AS k,
      |    CASE WHEN event_id % 7 = 0 THEN value + 100 ELSE value END AS v_new
      |  FROM events WHERE event_id % 11 <> 0
      |  UNION ALL
      |  SELECT event_id + 10000000 AS k, value * 2 AS v_new
      |  FROM events WHERE event_id % 13 = 0)
      |SELECT CASE WHEN v_new IS NULL THEN 'delete'
      |            WHEN v_old IS NULL THEN 'insert'
      |            WHEN v_new <> v_old THEN 'update'
      |            ELSE 'same' END AS change,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(COALESCE(v_new, v_old) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_x100
      |FROM old_snap FULL OUTER JOIN new_snap USING (k)
      |GROUP BY 1
      |ORDER BY change""".stripMargin

  // --- colloc_dice: bigram collocation mining by Dice coefficient
  // (2·c_xy / (c_x + c_y)) — integer-exact association scoring for
  // vocabulary/phrase analysis (the integer-stable stand-in for PMI,
  // which needs a log). Scale: unigram + bigram counts are partial-agg
  // shuffles; the score join keys on words (vocabulary-sized).
  private val DICE_MIN_PAIR = 20
  private val DICE_TOPK = 25

  def collocDice(s: SparkSession, dir: String): DataFrame = {
    // cached: explode children must be attributes (Generate inlining).
    val base = graft.util.QueryScratch.cached(t(s, dir, "documents")
      .withColumn("__ws", TextFns.words(col("text")))
      .filter(size(col("__ws")) >= 2)
      .select(col("doc_id"), col("__ws"),
        graft.operators.Dedup.shingleSeq(col("__ws"), 2).as("__g2")))
    val uni = base.select(explode(col("__ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = base.select(explode(col("__g2")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= DICE_MIN_PAIR)
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .withColumn("w2", split(col("g"), " ").getItem(1))
    bi.join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .withColumn("dice_bp", idiv(lit(2L) * col("c_xy") * lit(10000L), col("c_x") + col("c_y")))
      .select(col("g").as("bigram"), col("c_xy"), col("c_x"), col("c_y"), col("dice_bp"))
      .orderBy(col("dice_bp").desc, col("bigram"))
      .limit(DICE_TOPK)
  }

  val collocDiceSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents),
       |f AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 2),
       |uni AS (SELECT unnest(ws) AS word FROM f),
       |uc AS (SELECT word, COUNT(*) AS c FROM uni GROUP BY word),
       |bi AS (SELECT unnest(list_transform(generate_series(1, len(ws)-1), i -> ws[i]||' '||ws[i+1])) AS g FROM f),
       |bc AS (SELECT g, COUNT(*) AS c_xy FROM bi GROUP BY g HAVING COUNT(*) >= $DICE_MIN_PAIR)
       |SELECT g AS bigram, c_xy, x.c AS c_x, y.c AS c_y,
       |  (2 * c_xy * 10000) // (x.c + y.c) AS dice_bp
       |FROM bc
       |JOIN uc x ON x.word = string_split(g, ' ')[1]
       |JOIN uc y ON y.word = string_split(g, ' ')[2]
       |ORDER BY dice_bp DESC, bigram
       |LIMIT $DICE_TOPK""".stripMargin

  // --- q_histogram: fixed-width histogram with share-of-total — the
  // profiling primitive behind data-quality dashboards. Binning is
  // map-side; the share joins the 20-row aggregate against its own
  // window total (post-agg, so the unpartitioned window is over a
  // constant-size frame at any data scale).
  private val HIST_BIN_WIDTH = 25
  private val HIST_MAX_BIN = 19

  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val bin = least(lit(HIST_MAX_BIN.toLong),
      floor(col("value") / HIST_BIN_WIDTH).cast("bigint"))
    val agg = t(s, dir, "events")
      .withColumn("bin", bin)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        r2(min(col("value"))).as("lo"),
        r2(max(col("value"))).as("hi"))
    agg
      .withColumn("share_bp", idiv(col("n") * lit(10000L),
        sum(col("n")).over(Window.partitionBy())))
      .select(col("bin"), col("n"), col("lo"), col("hi"), col("share_bp"))
      .orderBy(col("bin"))
  }

  val qHistogramSql: String =
    s"""WITH b AS (
       |  SELECT least($HIST_MAX_BIN, CAST(floor(value / $HIST_BIN_WIDTH) AS BIGINT)) AS bin, value
       |  FROM events),
       |agg AS (
       |  SELECT bin, COUNT(*) AS n, ROUND(MIN(value), 2) AS lo, ROUND(MAX(value), 2) AS hi
       |  FROM b GROUP BY bin)
       |SELECT bin, n, lo, hi,
       |  CAST((n * 10000) // (SUM(n) OVER ()) AS BIGINT) AS share_bp
       |FROM agg
       |ORDER BY bin""".stripMargin

  // --- domain_mix: training-mixture re-weighting — the step that
  // turns observed per-language token shares into the sampling
  // weights needed to hit a target mixture (uniform here). All
  // integer basis points: share_bp = lang tokens / total (window over
  // the 5-row aggregate — constant-size frame at any data scale),
  // weight_bp = target/actual upsampling factor. One partial-agg
  // shuffle on lang; the token count is a map-side size().
  private val MIX_TARGET_BP = 2000L // uniform over the 5 languages

  def domainMix(s: SparkSession, dir: String): DataFrame = {
    val agg = t(s, dir, "documents")
      .withColumn("n_tok", size(TextFns.words(col("text"))).cast("bigint"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    agg
      .withColumn("share_bp", idiv(col("n_tokens") * lit(10000L),
        sum(col("n_tokens")).over(Window.partitionBy())))
      .withColumn("weight_bp", idiv(lit(MIX_TARGET_BP) * lit(10000L), col("share_bp")))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("share_bp"), col("weight_bp"))
      .orderBy(col("lang"))
  }

  val domainMixSql: String =
    s"""WITH a AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY lang),
       |sh AS (SELECT lang, n_docs, n_tokens,
       |    (n_tokens * 10000) // (SUM(n_tokens) OVER ()) AS share_bp FROM a)
       |SELECT lang, n_docs, n_tokens, CAST(share_bp AS BIGINT) AS share_bp,
       |  CAST(($MIX_TARGET_BP * 10000) // share_bp AS BIGINT) AS weight_bp
       |FROM sh
       |ORDER BY lang""".stripMargin

  // --- sample_temperature: TEMPERATURE-SCALED mixture sampling (the
  // mT5/XLM-R α-sampling shape, α = 1/2): raw per-language token
  // masses are flattened as mass^α before normalizing, boosting
  // low-resource slices without drowning the high-resource ones.
  // Exactness across engines: α = 1/2 is floor(sqrt(bigint)) — IEEE
  // sqrt is correctly rounded on both engines, so the integer result
  // is deterministic; shares and boosts are integer basis points.
  // Same plan shape as domain_mix: one partial-agg shuffle on lang,
  // constant-size window over the 5-row aggregate.
  def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val agg = t(s, dir, "documents")
      .withColumn("n_tok", size(TextFns.words(col("text"))).cast("bigint"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val all = Window.partitionBy()
    agg
      .withColumn("scaled", floor(sqrt(col("n_tokens").cast("double"))).cast("bigint"))
      .withColumn("share_bp", idiv(col("n_tokens") * lit(10000L),
        sum(col("n_tokens")).over(all)))
      .withColumn("samp_bp", idiv(col("scaled") * lit(10000L),
        sum(col("scaled")).over(all)))
      .withColumn("boost_bp", idiv(col("samp_bp") * lit(10000L), col("share_bp")))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("share_bp"), col("samp_bp"), col("boost_bp"))
      .orderBy(col("lang"))
  }

  val sampleTemperatureSql: String =
    """WITH a AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'), w -> len(w) > 0))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |sc AS (SELECT lang, n_docs, n_tokens,
      |    CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS scaled,
      |    (n_tokens * 10000) // (SUM(n_tokens) OVER ()) AS share_bp FROM a),
      |sp AS (SELECT *, (scaled * 10000) // (SUM(scaled) OVER ()) AS samp_bp FROM sc)
      |SELECT lang, n_docs, n_tokens, CAST(share_bp AS BIGINT) AS share_bp,
      |  CAST(samp_bp AS BIGINT) AS samp_bp,
      |  CAST((samp_bp * 10000) // share_bp AS BIGINT) AS boost_bp
      |FROM sp
      |ORDER BY lang""".stripMargin

  // --- stats_profile: dataset PROFILING (the ANALYZE primitive every
  // pipeline runs before training): per-column null count, exact
  // distinct count, lexicographic min/max, and mean value width. The
  // distributed shape matters: rows are MELTED map-side into
  // (column, value-as-string) pairs — ×k width, zero shuffles — then
  // ONE aggregation groups by column name; no per-column distinct
  // expansion, no k passes over the table, and the shuffle carries
  // (column, value) pairs so partial aggregation compresses repeats.
  // At 100 TB this profiles any width in a single scan + shuffle.
  def statsProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val melted = t(s, dir, "documents").select(
      explode(array(cols.map(c =>
        struct(lit(c).as("col"), col(c).cast("string").as("v"))): _*)).as("kv"))
      .select(col("kv.col").as("col"), col("kv.v").as("v"))
    melted.groupBy(col("col"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        idiv(sum(length(col("v"))), count(col("v"))).as("avg_len"))
      .orderBy(col("col"))
  }

  val statsProfileSql: String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val per = cols.map(c =>
      s"""SELECT '$c' AS col, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT(v) AS n_null,
         |  COUNT(DISTINCT v) AS n_distinct,
         |  MIN(v) AS min_v, MAX(v) AS max_v,
         |  CAST(SUM(len(v)) // COUNT(v) AS BIGINT) AS avg_len
         |FROM (SELECT CAST($c AS VARCHAR) AS v FROM documents)""".stripMargin)
    per.mkString("", "\nUNION ALL\n", "\nORDER BY col")
  }

  // --- embed_quality: embedding hygiene gate — per-label counts of
  // vectors whose scaled-int squared norm deviates from the unit
  // sphere beyond a threshold (dead/exploded embeddings are the
  // classic upstream-encoder failure). All integer arithmetic on the
  // ×1e6 components (n2 exact), map-side + one partial-agg shuffle.
  private val EQ_UNIT_N2 = 1000000000000L // (1e6)² — unit norm, scaled
  private val EQ_DEV_MAX = 1000000L

  def embedQuality(s: SparkSession, dir: String): DataFrame = {
    val n2 = aggregate(transform(col("embedding").cast("array<double>"),
      x => floor(x * lit(1000000.0) + lit(0.5)).cast("bigint")),
      lit(0L), (acc, v) => acc + v * v)
    val dev = abs(n2 - lit(EQ_UNIT_N2))
    t(s, dir, "embeddings")
      .select(col("label").cast("bigint").as("label"), dev.as("dev"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > EQ_DEV_MAX, 1L).otherwise(0L)).as("n_outlier"),
        max(col("dev")).as("max_dev"),
        idiv(sum(col("dev")), count(lit(1))).as("avg_dev"))
      .orderBy(col("label"))
  }

  val embedQualitySql: String =
    s"""WITH d AS (
       |  SELECT label,
       |    abs(CAST(list_sum(list_transform(embedding,
       |      x -> CAST(FLOOR(x::DOUBLE * 1000000 + 0.5) AS BIGINT) * CAST(FLOOR(x::DOUBLE * 1000000 + 0.5) AS BIGINT))) AS BIGINT)
       |      - $EQ_UNIT_N2) AS dev
       |  FROM embeddings)
       |SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN dev > $EQ_DEV_MAX THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier,
       |  MAX(dev) AS max_dev,
       |  CAST(SUM(dev) // COUNT(*) AS BIGINT) AS avg_dev
       |FROM d
       |GROUP BY label
       |ORDER BY label""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "domain_mix" -> domainMix,
    "sample_temperature" -> sampleTemperature,
    "stats_profile" -> statsProfile,
    "embed_quality" -> embedQuality,
    "zorder_layout" -> zorderLayout,
    "kmeans_embed" -> kmeansEmbed,
    "tfidf_topk" -> tfidfTopk,
    "pii_scrub" -> piiScrub,
    "cdc_diff" -> cdcDiff,
    "colloc_dice" -> collocDice,
    "q_histogram" -> qHistogram)

  val oracles: Map[String, String] = Map(
    "domain_mix" -> domainMixSql,
    "sample_temperature" -> sampleTemperatureSql,
    "stats_profile" -> statsProfileSql,
    "embed_quality" -> embedQualitySql,
    "zorder_layout" -> zorderLayoutSql,
    "kmeans_embed" -> kmeansEmbedSql,
    "tfidf_topk" -> tfidfTopkSql,
    "pii_scrub" -> piiScrubSql,
    "cdc_diff" -> cdcDiffSql,
    "colloc_dice" -> collocDiceSql,
    "q_histogram" -> qHistogramSql)
}
