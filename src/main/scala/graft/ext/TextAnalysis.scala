package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable.wsTokens

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, n-gram-heuristic language ID, and
  * content fingerprinting. Every operator is a narrow projection over the
  * `text` column — embarrassingly parallel, no shuffle, full whole-stage
  * codegen — so throughput at 100 TB is bounded only by scan bandwidth.
  */
object TextAnalysis {

  /** Stopword sets for the language-ID heuristic (tiny on purpose — the
    * operator is a deterministic scoring rule, not a trained model).
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "und", "ein", "ist"))

  val enStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** Token counts: whitespace tokens and BPE-ish word/symbol pieces. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(wsTokens(col("text"))).cast("long").as("n_tokens_ws"),
      size(regexp_extract_all(col("text"),
        lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_tokens_re"))

  /** Quality scoring: length, punctuation density, stopword density, and
    * average token length, combined into one [0,1] score.
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      (length(regexp_replace(col("text"), "[^a-z0-9\\s]", ""))
        .cast("double") / length(col("text"))).as("alnum_ratio"),
      (countIn(toks, enStopwords).cast("double") / size(toks))
        .as("stopword_ratio"),
      (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
        size(toks)).as("avg_token_len"))
      .withColumn("quality_score",
        lit(0.4) * least(col("n_tokens") / 50.0, lit(1.0)) +
          lit(0.3) * least(col("stopword_ratio") * 5.0, lit(1.0)) +
          lit(0.3) * col("alnum_ratio"))
  }

  /** Language ID: score each language's stopword hits; argmax with a fixed
    * priority order (en > es > fr > de) and 'und' when nothing matches.
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val scored = docs.select(
      col("doc_id") +: langStopwords.map { case (l, ws) =>
        countIn(toks, ws).cast("long").as(s"c_$l")
      }: _*)
    val Seq(en, es, fr, de) = langStopwords.map(l => col(s"c_${l._1}"))
    scored.withColumn("lang_pred",
      when(en + es + fr + de === 0, "und")
        .when(en >= es && en >= fr && en >= de, "en")
        .when(es >= fr && es >= de, "es")
        .when(fr >= de, "fr")
        .otherwise("de"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set — an
    * order-insensitive document signature for exact bag-of-words dedup.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(wsTokens(col("text"))))))
        .as("fp"))
}
