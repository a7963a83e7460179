package graft.operators

import graft.functions.{Hashing, Text}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2 D1–D4).
  * All are narrow per-row transforms — no shuffle, linear scale-out; the
  * only wide stage is each query's final presentation ORDER BY.
  */
object TextAnalysis {

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "a"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et"))

  /** D1: marker-token language ID — per-language hit counts, arg-max with
    * fixed priority on ties. A classic n-gram-profile heuristic reduced to
    * pure column expressions. */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val hits = langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isInCollection(ms)))
    }
    val Seq(he, hd, hs, hf) = hits.map(_._2)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("tagged_lang"),
        when(he >= hd && he >= hs && he >= hf, "en")
          .when(hd >= hs && hd >= hf, "de")
          .when(hs >= hf, "es")
          .otherwise("fr").as("pred_lang"))
      .orderBy("doc_id")
  }

  val textLangidSql: String = {
    def hit(ms: Seq[String]) =
      s"len(list_filter(list_filter(string_split(text,' '), x -> len(x) > 0), t -> t IN ${ms.map(m => s"'$m'").mkString("(", ", ", ")")}))"
    val Seq(he, hd, hs, hf) = langMarkers.map(m => hit(m._2))
    s"""
    SELECT doc_id, lang AS tagged_lang,
      CASE WHEN $he >= $hd AND $he >= $hs AND $he >= $hf THEN 'en'
           WHEN $hd >= $hs AND $hd >= $hf THEN 'de'
           WHEN $hs >= $hf THEN 'es'
           ELSE 'fr' END AS pred_lang
    FROM documents ORDER BY doc_id"""
  }

  /** D2: quality scoring — length, stopword ratio, mean word length
    * combined into a bounded score. Expression shapes mirror the oracle
    * exactly so the IEEE doubles match bit-for-bit. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks, Text.isStopword(_))).cast("double")
    val meanWl = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val stopRatio = stopHits / nTok
    val score = (least(nTok, lit(100.0)) / lit(100.0) + stopRatio + lit(1.0) / meanWl) / lit(3.0)
    Tables.documents(s, dir)
      .select(col("doc_id"), nTok.cast("long").as("n_tokens"),
        stopRatio.as("stop_ratio"), meanWl.as("mean_word_len"), score.as("score"))
      .orderBy("doc_id")
  }

  val textQualitySql: String = s"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS DOUBLE) AS n_tok,
        CAST(len(list_filter(list_filter(string_split(text,' '), x -> len(x) > 0),
                             t -> t IN ${Text.stopwordsSql})) AS DOUBLE) AS stop_hits,
        CAST(length(replace(text, ' ', '')) AS DOUBLE) AS n_chars
      FROM documents)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
      stop_hits / n_tok AS stop_ratio,
      n_chars / n_tok AS mean_word_len,
      (least(n_tok, 100.0) / 100.0 + stop_hits / n_tok + 1.0 / (n_chars / n_tok)) / 3.0 AS score
    FROM t ORDER BY doc_id"""

  /** D3: token counting — whitespace tokens and a BPE-ish subword regex
    * (letter runs / digit runs / single other-chars). */
  def textTokens(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("subword_tokens"))
      .orderBy("doc_id")
  }

  val textTokensSql: String = """
    SELECT doc_id,
      len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS ws_tokens,
      len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS subword_tokens
    FROM documents ORDER BY doc_id"""

  /** D4: order-sensitive document fingerprint — rolling polynomial hash
    * over md5-derived token hashes, mod P. Near-zero-cost change
    * detection for incremental pipelines. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val hashes = transform(toks, t => Hashing.h60p(t))
    val fp = aggregate(hashes, lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(Hashing.P)))
    Tables.documents(s, dir)
      .select(col("doc_id"), fp.as("fingerprint"))
      .orderBy("doc_id")
  }

  val textFingerprintSql: String = s"""
    SELECT doc_id,
      list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(list_filter(string_split(text,' '), x -> len(x) > 0),
            t -> ${Hashing.h60pSql("t")})),
        (a, x) -> (a * 31 + x) % ${Hashing.P}) AS fingerprint
    FROM documents ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_langid"      -> (textLangid _),
    "text_quality"     -> (textQuality _),
    "text_tokens"      -> (textTokens _),
    "text_fingerprint" -> (textFingerprint _))

  val oracle: Map[String, String] = Map(
    "text_langid"      -> textLangidSql,
    "text_quality"     -> textQualitySql,
    "text_tokens"      -> textTokensSql,
    "text_fingerprint" -> textFingerprintSql)
}
