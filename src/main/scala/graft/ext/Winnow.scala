package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * selection rule): hash every word n-gram, slide a w-wide window over
  * the hash sequence, keep each window's MINIMUM — any match of length
  * ≥ w + n − 1 grams between two documents is GUARANTEED to share a
  * selected fingerprint, while only ~2/(w+1) of grams are kept. The
  * position-robust complement to MinHash (which fingerprints the SET of
  * shingles): winnowing fingerprints survive content reordering and
  * pin down locally-contiguous overlap, which is what plagiarism-style
  * training-data contamination looks like.
  *
  * Scale shape: selection is a pure per-row projection (gram hashing
  * and window minima are in-row array folds over the document's own
  * tokens — no shuffle, no per-key window function), so the corpus is
  * read once and only the selected (doc_id, fp) pairs — a ~2/(w+1)
  * fraction of gram count — ever enter an exchange. Pair detection is
  * the standard inverted-index join with a document-frequency cap: a
  * fingerprint shared by more than `dfCap` documents is boilerplate
  * (the jaccard_hot_df guard) and is excluded from candidate
  * generation before the self-join can square it.
  *
  * Each stage (tokens → gram hashes → window minima) is its own
  * projection, so the expensive arrays are materialized once per row
  * and downstream lambdas slice ATTRIBUTES — nesting the whole chain
  * into one expression makes every consumer re-embed (and the lambda
  * evaluator re-evaluate) the full upstream tree.
  *
  * Documents with fewer grams than the window still emit one
  * fingerprint (the global minimum) — the winnowing guarantee extends
  * to short documents; documents with no grams emit none.
  */
object Winnow {

  /** (doc_id, n_grams, fps): gram count and the DISTINCT selected
    * fingerprints per document. The selection is ONE kernel expression
    * ([[graft.functions.WinnowKernel]]) — the builtin-chain phrasing
    * (gram transform → md5 transform → window minima) costs ~9 s of
    * FIXED plan/codegen overhead per invocation once predicate
    * pushdown copies it into every pre-scan Filter; the kernel call
    * copies as one generated line.
    */
  private def selected(docs: DataFrame, n: Int, w: Int): DataFrame =
    docs
      .select(col("doc_id"), Portable.wsTokens(col("text")).as("__w"))
      .select(col("doc_id"),
        greatest(size(col("__w")) - (n - 1), lit(0)).cast("long")
          .as("n_grams"),
        graft.functions.WinnowFunctions.winnowSelect(col("__w"), n, w)
          .as("fps"))

  /** Per-document fingerprint census: (doc_id, n_grams, n_fps, fp_min,
    * fp_max) for every document with at least one gram. Pure
    * projection — no shuffle.
    */
  def census(docs: DataFrame, n: Int = 3, w: Int = 4): DataFrame =
    selected(docs, n, w)
      .filter(col("n_grams") >= 1)
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fps"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"))

  /** The exploded inverted index: one (fp, doc_id) row per selected
    * fingerprint (already distinct per document).
    */
  def fingerprints(docs: DataFrame, n: Int = 3, w: Int = 4): DataFrame =
    selected(docs, n, w).select(col("doc_id"), explode(col("fps")).as("fp"))

  /** Document pairs sharing ≥ `minShared` selected fingerprints.
    * Fingerprints held by more than `dfCap` documents are dropped
    * before the self-join (boilerplate; candidate-generation guard).
    */
  def overlapPairs(docs: DataFrame, n: Int = 3, w: Int = 4,
                   minShared: Int = 2, dfCap: Int = 50): DataFrame = {
    val fps = fingerprints(docs, n, w)
    // df filter via aggregate + join-back (map-side combinable), not a
    // per-fp window
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap && col("df") >= 2)
      .select("fp")
    val indexed = fps.join(rare, "fp")
    indexed.as("a").join(indexed.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
