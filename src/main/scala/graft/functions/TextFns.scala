package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for a training-data pipeline
  * (tokenize / language-ID / quality score / fingerprint), expressed
  * entirely with codegen'd `org.apache.spark.sql.functions` — no
  * UDFs, so every operator here runs inside whole-stage codegen and
  * scales map-side with zero shuffles.
  *
  * Determinism rule (SURVEY.md §5): anything pseudo-random derives
  * from md5, which is bit-identical in Spark and DuckDB, so the
  * DuckDB oracles can replay the exact arithmetic.
  */
object TextFns {

  /** 60-bit non-negative hash of a string: first 15 hex digits of
    * md5, as a BIGINT. DuckDB twin: ('0x'||substr(md5(x),1,15))::BIGINT.
    * Uses the native [[Hash60]] expression (digest bytes → long, no
    * hex-string round-trip; ~3× on signature passes). Requires
    * [[graft.plans.GraftExtensions]] registration — Tables.load and
    * GraftSession both ensure it.
    */
  def hash60(c: Column): Column = call_function("graft_hash60", c)

  /** The composed-functions form (spec-checked equal to [[hash60]]). */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Whitespace tokenization of trimmed text (empty-safe). */
  def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => length(w) > 0)

  /** BPE-ish token counting regex: letter runs, digit runs, or a
    * single non-alphanumeric symbol — the shape of a byte-pair
    * pre-tokenizer's word-split. Same pattern runs in DuckDB's
    * regexp_extract_all.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenPattern))

  /** Tiny public stopword lists per language — enough for a
    * frequency heuristic; the point is the *mechanism* (vectorized
    * scoring against constant arrays), which at 100 TB runs map-side.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une", "pour", "avec"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "de", "un", "una", "con"))

  /** # tokens of `ws` that appear in the `lang` stopword list. */
  def stopwordHits(ws: Column, lang: String): Column =
    size(filter(ws, w => array_contains(
      array(stopwords(lang).map(lit): _*), lower(w))))

  /** CJK character count (the zh signal — script beats stopwords). */
  def cjkCount(text: Column): Column =
    regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))

  /** Deterministic argmax language: scores in fixed priority order
    * (first maximum wins) — mirrored verbatim in the SQL oracle.
    */
  def langPredict(sEn: Column, sDe: Column, sFr: Column, sEs: Column, sZh: Column): Column = {
    val m = greatest(sEn, sDe, sFr, sEs, sZh)
    when(m === lit(0), lit("und"))
      .when(sZh === m, lit("zh"))
      .when(sEn === m, lit("en"))
      .when(sDe === m, lit("de"))
      .when(sFr === m, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Polynomial rolling-hash fingerprint over the word sequence:
    * fold (acc*31 + hash60(word)) mod 10^15. Order-sensitive (a true
    * document fingerprint, not a bag hash); one pass, map-side.
    * DuckDB twin: list_reduce(list_prepend(0, hashes), ...).
    */
  def fingerprint(ws: Column): Column =
    aggregate(
      transform(ws, w => hash60(w)),
      lit(0L),
      (acc, h) => (acc * lit(31L) + h) % lit(1000000000000000L))
}
