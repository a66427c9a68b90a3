package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.sources.Tables

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables (SURVEY.md §2, "LLM-training-data pipeline").
  *
  * Every query is pure `functions._` expression algebra (whole-stage
  * codegen, no UDFs); pseudo-randomness derives from md5 so each
  * DuckDB oracle replays the identical arithmetic (SURVEY.md §5).
  */
object LlmPipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB twins of TextFns building blocks, as SQL fragments. */
  private val wsSql = """list_filter(string_split_regex(trim(text), '\s+'), w -> len(w) > 0)"""
  private def hash60Sql(x: String) = s"('0x'||substr(md5($x),1,15))::BIGINT"
  private def stopArr(lang: String): String =
    TextFns.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  // --- text_tokens: token counting (whitespace + BPE-ish regex),
  // map-side only — at 100 TB this is a single pass with zero
  // shuffles and full predicate/column pruning on the parquet scan.
  def textTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        size(TextFns.words(col("text"))).cast("bigint").as("n_ws"),
        TextFns.bpeTokenCount(col("text")).cast("bigint").as("n_bpe"),
        length(col("text")).cast("bigint").as("n_chars"))
      .orderBy(col("doc_id"))

  val textTokensSql: String =
    s"""SELECT doc_id,
       |  len($wsSql) AS n_ws,
       |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
       |  length(text) AS n_chars
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // --- text_langid: stopword-frequency + CJK-script heuristic with a
  // deterministic argmax. Scoring is vectorized against constant
  // arrays — map-side at any scale.
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val ws = TextFns.words(col("text"))
    val scored = t(s, dir, "documents")
      .withColumn("s_en", TextFns.stopwordHits(ws, "en").cast("bigint"))
      .withColumn("s_de", TextFns.stopwordHits(ws, "de").cast("bigint"))
      .withColumn("s_fr", TextFns.stopwordHits(ws, "fr").cast("bigint"))
      .withColumn("s_es", TextFns.stopwordHits(ws, "es").cast("bigint"))
      .withColumn("s_zh", TextFns.cjkCount(col("text")).cast("bigint"))
    scored.select(
      col("doc_id"), col("lang"),
      TextFns.langPredict(col("s_en"), col("s_de"), col("s_fr"),
        col("s_es"), col("s_zh")).as("pred_lang"),
      col("s_en"), col("s_de"), col("s_fr"), col("s_es"), col("s_zh"))
      .orderBy(col("doc_id"))
  }

  val textLangidSql: String = {
    def hits(lang: String) =
      s"len(list_filter(ws, w -> list_contains(${stopArr(lang)}, lower(w))))"
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    ${hits("en")} AS s_en, ${hits("de")} AS s_de,
       |    ${hits("fr")} AS s_fr, ${hits("es")} AS s_es,
       |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS s_zh
       |  FROM (SELECT doc_id, lang, text, $wsSql AS ws FROM documents)
       |)
       |SELECT doc_id, lang,
       |  CASE WHEN greatest(s_en,s_de,s_fr,s_es,s_zh) = 0 THEN 'und'
       |       WHEN s_zh = greatest(s_en,s_de,s_fr,s_es,s_zh) THEN 'zh'
       |       WHEN s_en = greatest(s_en,s_de,s_fr,s_es,s_zh) THEN 'en'
       |       WHEN s_de = greatest(s_en,s_de,s_fr,s_es,s_zh) THEN 'de'
       |       WHEN s_fr = greatest(s_en,s_de,s_fr,s_es,s_zh) THEN 'fr'
       |       ELSE 'es' END AS pred_lang,
       |  s_en, s_de, s_fr, s_es, s_zh
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  // --- text_quality: length / punctuation / stopword / alpha ratios
  // composed into a bounded quality score — the standard cheap
  // pre-filter before expensive dedup/classification stages.
  // Ratios are INTEGER basis points (x10000) end to end: float
  // rounding at half-point boundaries diverges between engines
  // (BigDecimal-of-shortest-repr vs binary-value rounding), integer
  // arithmetic never does.
  private def idiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("bigint")

  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val ws = TextFns.words(col("text"))
    val nTok = greatest(size(ws), lit(1)).cast("bigint")
    val nChar = greatest(length(col("text")), lit(1)).cast("bigint")
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("bigint")
    val alpha = regexp_count(col("text"), lit("[A-Za-z]")).cast("bigint")
    val stops = TextFns.stopwordHits(ws, "en").cast("bigint")
    val wlenSum = aggregate(ws, lit(0L), (a, w) => a + length(w))
    val punctBp = idiv(punct * lit(10000L), nChar)
    val alphaBp = idiv(alpha * lit(10000L), nChar)
    val stopBp = idiv(stops * lit(10000L), nTok)
    val lenBp = least(lit(10000L), size(ws).cast("bigint") * lit(100L))
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("bigint").as("n_chars"),
        size(ws).cast("bigint").as("n_tokens"),
        idiv(wlenSum * lit(100L), nTok).as("avg_wlen_x100"),
        punctBp.as("punct_bp"),
        alphaBp.as("alpha_bp"),
        stopBp.as("stop_bp"),
        idiv(lit(3L) * alphaBp + lit(3L) * (lit(10000L) - punctBp)
          + lit(2L) * lenBp + lit(2L) * stopBp, lit(10L)).as("quality_bp"))
      .orderBy(col("doc_id"))
  }

  val textQualitySql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text, $wsSql AS ws FROM documents
       |), m AS (
       |  SELECT doc_id,
       |    length(text) AS n_chars,
       |    len(ws) AS n_tokens,
       |    greatest(len(ws), 1) AS n_tok1,
       |    greatest(length(text), 1) AS n_char1,
       |    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS punct,
       |    len(regexp_extract_all(text, '[A-Za-z]')) AS alpha,
       |    len(list_filter(ws, w -> list_contains(${stopArr("en")}, lower(w)))) AS stops,
       |    CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS wlen_sum
       |  FROM base
       |), bp AS (
       |  SELECT doc_id, n_chars, n_tokens,
       |    (wlen_sum * 100) // n_tok1 AS avg_wlen_x100,
       |    (punct * 10000) // n_char1 AS punct_bp,
       |    (alpha * 10000) // n_char1 AS alpha_bp,
       |    (stops * 10000) // n_tok1 AS stop_bp,
       |    least(10000, n_tokens * 100) AS len_bp
       |  FROM m
       |)
       |SELECT doc_id, n_chars, n_tokens, avg_wlen_x100, punct_bp,
       |  alpha_bp, stop_bp,
       |  (3 * alpha_bp + 3 * (10000 - punct_bp) + 2 * len_bp + 2 * stop_bp) // 10 AS quality_bp
       |FROM bp
       |ORDER BY doc_id""".stripMargin

  // --- text_fingerprint: order-sensitive polynomial rolling hash of
  // the word-hash sequence — a compact document identity for
  // shard-local exact dedup and incremental re-crawl detection.
  def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    val ws = TextFns.words(col("text"))
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        TextFns.fingerprint(ws).as("fp"),
        size(ws).cast("bigint").as("n_words"))
      .orderBy(col("doc_id"))
  }

  val textFingerprintSql: String =
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_prepend(0::BIGINT, list_transform($wsSql, w -> ${hash60Sql("w")})),
       |    (a, b) -> (a * 31 + b) % 1000000000000000) AS fp,
       |  len($wsSql) AS n_words
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> textTokens,
    "text_langid" -> textLangid,
    "text_quality" -> textQuality,
    "text_fingerprint" -> textFingerprint)

  val oracles: Map[String, String] = Map(
    "text_tokens" -> textTokensSql,
    "text_langid" -> textLangidSql,
    "text_quality" -> textQualitySql,
    "text_fingerprint" -> textFingerprintSql)
}
