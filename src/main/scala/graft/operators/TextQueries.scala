package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** Text-analysis operators over the `documents` table (beyond-reference
  * surface: language-ID, quality scoring, token counting, fingerprinting).
  * All per-row, embarrassingly parallel — no shuffle except final ordering;
  * at 100 TB these run at scan speed.
  */
object TextQueries {

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans", "pour", "que"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language ID by stopword-hit argmax with a fixed tie-break order
    * (en > de > es > fr), `und` when no stopword hits. A heuristic n-gram
    * scorer in the spirit of compact langid models; deterministic so it is
    * DuckDB-oracle-checkable. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val withToks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .withColumn("s_en", hits(col("toks"), stopwords("en")))
      .withColumn("s_de", hits(col("toks"), stopwords("de")))
      .withColumn("s_es", hits(col("toks"), stopwords("es")))
      .withColumn("s_fr", hits(col("toks"), stopwords("fr")))
    withToks.select(col("doc_id"),
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
             col("s_en") >= col("s_fr") && col("s_en") > 0, "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") &&
                col("s_de") > 0, "de")
          .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
          .when(col("s_fr") > 0, "fr")
          .otherwise("und").as("pred_lang"),
        col("s_en").cast("long"), col("s_de").cast("long"),
        col("s_es").cast("long"), col("s_fr").cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Quality metrics per document: token count, mean token length,
    * stopword ratio, alpha-char ratio — the length/punct/stopword heuristics
    * of training-data quality filters. All ratios are single double
    * divisions of exact ints (deterministic across engines). */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val allStops = stopwords.values.flatten.toSeq.distinct
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("alpha_chars",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long"))
      .withColumn("stop_hits", hits(col("toks"), allStops).cast("long"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_chars"),
        round(aggregate(col("toks"), lit(0L), (a, t) => a + length(t))
          .cast("double") / col("n_tokens").cast("double"), 6).as("mean_tok_len"),
        round(col("stop_hits").cast("double") / col("n_tokens").cast("double"), 6)
          .as("stopword_ratio"),
        round(col("alpha_chars").cast("double") / col("n_chars").cast("double"), 6)
          .as("alpha_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex token count
    * (alnum runs + single non-alnum-non-space marks). */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long")
          .as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
          .cast("long").as("re_tokens"))
      .orderBy(col("doc_id"))

  /** Document fingerprint: md5 over the normalized token stream (the
    * oracle-checkable twin of the rolling-hash fingerprint; dedupable by
    * equality). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        md5(array_join(Text.tokens(col("text")), " ")).as("fingerprint"))
      .orderBy(col("doc_id"))
}
