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
  /** Exact-integer TF-IDF term weights (doc_id, tok, df, w) with
    * `w = tf · length(bin(nDocs div df))` — shared by the pair join and
    * the per-query ranking so the two lexical paths cannot drift.
    */
  private def weights(docs: DataFrame, nDocs: Long): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // pin the tf ⋈ df join: at bench scale the (doc, tok) side and the
    // df-filtered vocab both straddle AQE's runtime broadcast
    // threshold, so the build-side pick races run to run (observed as
    // q140's bench fp flip) — and the losing pick builds on the
    // CORPUS-shaped tf side. Shuffle-hash building on the df table
    // (always the smaller side: one row per distinct token,
    // co-partitioned on tok) is deterministic and stays narrow at any
    // corpus size (the q118 discipline).
    tf.join(df.hint("shuffle_hash"), "tok")
      .select(col("doc_id"), col("tok"), col("df"),
        (col("tf") * length(bin(expr(s"$nDocs div df"))).cast("long"))
          .as("w"))
  }

  def tfidfCosinePairs(docs: DataFrame, nDocs: Long, threshold: Double,
                       dfCap: Long = 1000L): DataFrame = {
    require(nDocs >= 1, s"nDocs must be >= 1, got $nDocs")
    require(threshold > 0.0 && threshold <= 1.0,
      s"cosine threshold must be in (0, 1], got $threshold")
    val w = weights(docs, nDocs)
    val norm2 = w.groupBy("doc_id")
      .agg(sum(col("w") * col("w")).as("n2"))
    // candidates only from sub-cap terms (the d²/2 guard)
    val rare = w.filter(col("df") <= dfCap).select("doc_id", "tok")
    // every pair-path join strategy-pinned sort-merge (the q118
    // discipline): all sides — the inverted-index posting lists, the
    // candidate pairs, the weight and norm tables — are corpus-shaped
    // at scale, so SMJ (spillable) is the 100 TB plan, and leaving the
    // choice to AQE's runtime broadcast conversion made the bench fp
    // race run to run (q140's recurring flip)
    val cand = rare.as("a").hint("merge").join(rare.as("b").hint("merge"),
      col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact dot over ALL shared terms of each candidate pair
    val wa = w.select(col("doc_id").as("doc_a"), col("tok"),
      col("w").as("wa"))
    val wb = w.select(col("doc_id").as("doc_b"), col("tok"),
      col("w").as("wb"))
    cand.hint("merge").join(wa.hint("merge"), Seq("doc_a"))
      .join(wb.hint("merge"), Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norm2.select(col("doc_id").as("doc_a"), col("n2").as("n2a"))
        .hint("merge"), "doc_a")
      .join(norm2.select(col("doc_id").as("doc_b"), col("n2").as("n2b"))
        .hint("merge"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("dot"),
        round(col("dot").cast("double") /
          sqrt(col("n2a").cast("double") * col("n2b").cast("double")), 6)
          .as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Per-QUERY lexical ranking: TF-IDF cosine of each query document
    * (doc_id < nQueries — the ANN family's NQ convention) against every
    * corpus document sharing at least one sub-cap term, top-k by cosine
    * on the exact micro grid (ties to the lower doc id). The lexical
    * half of hybrid retrieval: candidates come from the same
    * rare-term inverted index as [[tfidfCosinePairs]] (a boilerplate
    * term with df = d would alone pair every query with d docs; the cap
    * bounds it and corpus-universal terms carry no ranking signal), the
    * dot for each surviving candidate runs over ALL shared terms, and
    * the per-query top-k is the bounded combinable aggregate — no
    * window over the corpus. Scores: exact BIGINT dot and norms; the
    * one float step (dot / √(n2q·n2c), then ⌊·10⁶+½⌋) is
    * correctly-rounded ops only, so cos_micro is engine-portable.
    */
  def tfidfQueryTopK(docs: DataFrame, nDocs: Long, nQueries: Long, k: Int,
                     dfCap: Long = 1000L): DataFrame = {
    require(nDocs >= 1, s"nDocs must be >= 1, got $nDocs")
    require(nQueries >= 1 && k >= 1,
      s"nQueries and k must be >= 1, got $nQueries/$k")
    val w = weights(docs, nDocs)
    val norm2 = w.groupBy("doc_id")
      .agg(sum(col("w") * col("w")).as("n2"))
    val rare = w.filter(col("df") <= dfCap).select("doc_id", "tok")
    val qRare = rare.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("tok"))
    val cand = qRare.join(rare.withColumnRenamed("doc_id", "id"), Seq("tok"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id")).distinct()
    val qw = w.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("tok"), col("w").as("wq"))
    val dots = cand.hint("shuffle_hash")
      .join(w.select(col("doc_id").as("id"), col("tok"), col("w")),
        Seq("id"))
      .join(broadcast(qw), Seq("query_id", "tok"))
      .groupBy("query_id", "id")
      .agg(sum(col("w") * col("wq")).as("dot"))
    val scored = dots
      .join(broadcast(norm2.filter(col("doc_id") < nQueries)
        .select(col("doc_id").as("query_id"), col("n2").as("n2q"))),
        Seq("query_id"))
      .join(norm2.select(col("doc_id").as("id"), col("n2").as("n2c")),
        Seq("id"))
      .select(col("query_id"), col("id"),
        floor(col("dot").cast("double") /
          sqrt(col("n2q").cast("double") * col("n2c").cast("double")) *
          1e6 + lit(0.5)).cast("long").as("cos_micro"))
    graft.functions.TopKFunctions.topkPerGroup(scored,
        Seq(col("query_id")), col("cos_micro"), col("id"), k)
      .select(col("query_id"), col("rnk"), col("id"),
        col("key").as("cos_micro"))
  }
}
