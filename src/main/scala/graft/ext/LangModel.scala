package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Interpolated Kneser–Ney bigram language model in EXACT integer
  * arithmetic — the smoothing used by KenLM-style n-gram models that
  * data pipelines score/filter corpora with.
  *
  * With absolute discount D = 3/4 every probability is the exact
  * rational num/den over corpus counts alone:
  *
  *   P_KN(w|v) = max(c(vw) − D, 0)/c(v) + D·N1+(v·)/c(v) · N1+(·w)/N1+(··)
  *
  * scaled by 4·c(v)·N1+(··):
  *
  *   num = (4·c(vw) − 3)·Npp + 3·N1p(v)·N1r(w)     (observed vw; c ≥ 1
  *                                                  makes the max a no-op)
  *   den = 4·c(v)·Npp
  *
  * where c(v) = Σ_w c(vw) (left-context total), N1p(v) = |{w : c(vw)>0}|,
  * N1r(w) = |{v : c(vw)>0}| (the continuation count — how many distinct
  * contexts w follows, Kneser–Ney's replacement for raw frequency), and
  * Npp = |{(v,w) : c(vw)>0}|. No float ever appears, so both engines
  * derive bit-identical rationals, and the closed-form normalization
  *   Σ_{w ∈ V} num(v, w) = den(v)
  * holds as an exact integer identity (pinned by the property suite).
  *
  * Scale shape: the only corpus-sized operation is the bigram census —
  * one map-side-combinable groupBy collapsing to the bigram TYPE table;
  * c(v), N1p, N1r, Npp are aggregates OF the type table (vocabulary-,
  * not corpus-sized), and the final joins are type-table joins. Nothing
  * is windowed, nothing is quadratic.
  */
object LangModel {

  /** Per-document clean-token bigram pairs (the `^[a-z0-9]+$` alphabet
    * discipline shared with [[TextAnalysis.bpeTrain]]): adjacency is
    * computed AFTER filtering, within each document. Keeps doc_id for
    * the per-document scoring path; [[knBigram]] drops it.
    */
  private def docBigramPairs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), filter(Portable.wsTokens(col("text")),
        x => x.rlike("^[a-z0-9]+$")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(w[i - 1] AS a, w[i] AS b))")).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

  private def bigramPairs(docs: DataFrame): DataFrame =
    docBigramPairs(docs).select("a", "b")

  /** The KN-smoothed probability table for every observed bigram with
    * c(vw) ≥ `minCount`: (a, b, c_vw, num, den) — P_KN(b|a) = num/den
    * exactly.
    */
  def knBigram(docs: DataFrame, minCount: Long = 1L): DataFrame = {
    val bg = bigramPairs(docs)
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val cv = bg.groupBy("a")
      .agg(sum("c").as("cv"), count(lit(1)).as("n1p"))
    val n1r = bg.groupBy("b").agg(count(lit(1)).as("n1r"))
    val npp = bg.agg(count(lit(1)).as("npp"))
    // 64-bit headroom: den = 4·c(v)·Npp pairs the two largest counts in
    // the model — corpus bigram tokens times bigram types — so it
    // approaches 2⁶³ well below the 1B-row decade (cv·npp ≥ 2⁶¹ wraps),
    // and non-ANSI Spark would wrap SILENTLY, skewing every score
    // downstream. Compute both rationals on the exact decimal(38,0)
    // grid (the type table is vocabulary-sized, so the widening is
    // cheap) and fail loud in-row if den no longer fits the published
    // BIGINT schema; num ≤ den exactly (P_KN ≤ 1, pinned by the
    // normalization property), so guarding den guards both.
    val dec = "decimal(38,0)"
    val numDec = (lit(4L) * col("c").cast(dec) - lit(3L)) * col("npp") +
      lit(3L) * col("n1p").cast(dec) * col("n1r")
    val denDec = lit(4L) * col("cv").cast(dec) * col("npp")
    val longMax = lit(Long.MaxValue).cast(dec)
    bg.join(cv, "a").join(n1r, "b").crossJoin(broadcast(npp))
      .filter(col("c") >= minCount)
      .select(col("a"), col("b"), col("c").as("c_vw"),
        when(denDec <= longMax, numDec.cast("long"))
          .otherwise(raise_error(concat(
            lit("knBigram: den = 4*c(v)*Npp exceeds 64-bit for a='"),
            col("a"), lit("' (cv="), col("cv"), lit(", npp="),
            col("npp"), lit("); shard the corpus")))).as("num"),
        when(denDec <= longMax, denDec.cast("long"))
          .otherwise(lit(null).cast("long")).as("den"))
  }

  /** Per-document KN-LM quality score on the integer-bits grid — the
    * CCNet-style LM filter (Wenzek et al. 2020 rank documents by
    * LM perplexity; here the model is the [[knBigram]] table trained
    * on the SAME corpus, so every document bigram is observed and the
    * score needs no backoff case): for each adjacent clean-token
    * bigram occurrence, surprisal = ⌊log₂(den div num)⌋ whole bits
    * (num ≤ den since P ≤ 1, so bits ≥ 0) — the
    * [[TextAnalysis.crossEntropyBits]] integer-division + bit-length
    * log, NO float log, so both engines derive bit-identical scores
    * from their independently-learned models (the re-learning oracle
    * contract). Low mean_bits = the corpus LM finds the document
    * predictable (in-domain prose); high = rare-bigram soup — the
    * ranking CCNet thresholds on. Documents with < 2 clean tokens
    * carry zero bigrams and mean_bits 0 by convention. Returns
    * (doc_id, n_bigrams, bits_total, mean_bits).
    *
    * Scale: the model is the vocabulary-sized bigram TYPE table; the
    * per-doc side is the (doc, bigram-type) census — both combinable
    * aggregates of one corpus pass each; the score join is an equi
    * join on (a, b) whose boilerplate-bigram skew AQE splits. No
    * window, no per-key state, nothing quadratic.
    */
  def knDocScoreBits(docs: DataFrame): DataFrame = {
    val model = knBigram(docs, 1L)
      .select(col("a"), col("b"),
        (length(bin(expr("den div num"))) - 1).cast("long").as("bits"))
    val occ = docBigramPairs(docs)
      .groupBy("doc_id", "a", "b").agg(count(lit(1)).as("cd"))
    val sc = occ.join(model, Seq("a", "b"))
      .groupBy("doc_id")
      .agg(sum(col("cd")).as("n_bigrams"),
        sum(col("cd") * col("bits")).as("bits_total"))
    docs.select("doc_id").join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bits_total"), lit(0L)).as("bits_total"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0L,
          col("bits_total").cast("double") /
            col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)).as("mean_bits"))
  }
}
