package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Portable.wsTokens

/** Sparse lexical similarity: TF-IDF cosine document pairs over the
  * inverted index — the term-space complement of the dense-embedding
  * operators in [[Similarity]] (near-dup detection wants both: embedding
  * cosine catches paraphrase, lexical cosine catches templated/quoted
  * text with different "meaning" vectors).
  *
  * EXACT-ARITHMETIC weighting, so the gate can hash it: the weight is
  * `tf · idf_int` where `idf_int = length(bin(N div df))` — an integer
  * log₂ idf (the [[TextAnalysis.tokenRarity]] bucketing). Dot products
  * and norms are then exact BIGINT sums — order-independent where a
  * float Σ w_a·w_b would be partition-order-dependent — and the only
  * float is the final per-row `dot / sqrt(na² · nb²)` (IEEE sqrt and
  * divide are correctly rounded, hence engine-portable; rounded to 6 dp
  * like the q30 cosine scores).
  *
  * Scale shape: the [[Dedup.jaccardPairs]] inverted-index discipline —
  * candidate pairs come only from terms with df ≤ dfCap (a boilerplate
  * term with df = d would alone emit d²/2 pairs; the cap bounds the
  * blowup and the skipped pairs are ones whose ONLY shared terms are
  * corpus-universal — exactly the pairs lexical similarity should not
  * fire on anyway). The dot product for surviving candidates runs over
  * ALL shared terms (capped terms included), so scores are exact.
  */
object SparseSim {

  /** (doc_a, doc_b, dot, cos) pairs with cosine ≥ threshold. `nDocs`
    * must be the corpus document count (callers typically have it from
    * an upstream count; passing it keeps the operator single-pass).
    */
  def tfidfCosinePairs(docs: DataFrame, nDocs: Long, threshold: Double,
                       dfCap: Long = 1000L): DataFrame = {
    require(nDocs >= 1, s"nDocs must be >= 1, got $nDocs")
    require(threshold > 0.0 && threshold <= 1.0,
      s"cosine threshold must be in (0, 1], got $threshold")
    val tf = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = tf.join(df, "tok")
      .select(col("doc_id"), col("tok"), col("df"),
        (col("tf") * length(bin(expr(s"$nDocs div df"))).cast("long"))
          .as("w"))
    val norm2 = w.groupBy("doc_id")
      .agg(sum(col("w") * col("w")).as("n2"))
    // candidates only from sub-cap terms (the d²/2 guard)
    val rare = w.filter(col("df") <= dfCap).select("doc_id", "tok")
    val cand = rare.as("a").join(rare.as("b"),
      col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact dot over ALL shared terms of each candidate pair
    val wa = w.select(col("doc_id").as("doc_a"), col("tok"),
      col("w").as("wa"))
    val wb = w.select(col("doc_id").as("doc_b"), col("tok"),
      col("w").as("wb"))
    cand.join(wa, Seq("doc_a"))
      .join(wb, Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norm2.select(col("doc_id").as("doc_a"), col("n2").as("n2a")),
        "doc_a")
      .join(norm2.select(col("doc_id").as("doc_b"), col("n2").as("n2b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("dot"),
        round(col("dot").cast("double") /
          sqrt(col("n2a").cast("double") * col("n2b").cast("double")), 6)
          .as("cos"))
      .filter(col("cos") >= threshold)
  }
}
