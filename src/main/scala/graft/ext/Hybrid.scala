package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine per-query rankings from DIFFERENT
  * systems (lexical TF-IDF, dense ANN, …) without comparing their
  * incomparable scores. Reciprocal-rank fusion (Cormack, Clarke &
  * Buettcher 2009): each system contributes `1/(k0 + rank)` for every
  * item it ranked; items missing from a system contribute nothing from
  * it. k0 = 60 is the paper's constant — it damps the head so one
  * system's #1 cannot outvote consistent mid-list agreement.
  */
object Hybrid {

  /** Fuse rankings — each a (query_id, id, rnk) frame with rnk ≥ 1 —
    * into the per-query top-`k` by RRF score. Exact-integer arithmetic
    * end to end: the contribution is `1e9 DIV (k0 + rnk)` (integer
    * division, identical on any engine), summed per (query, id), ranked
    * (score DESC, id ASC) on the bounded top-k aggregate. Scale shape:
    * the union is |rankings|·|queries|·depth rows — candidate-bounded,
    * never corpus-bounded; one combinable group-by, one bounded top-k,
    * no window.
    */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int, k: Int): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k0 >= 0 && k >= 1, s"k0 >= 0 and k >= 1 required, got $k0/$k")
    val contrib = rankings.map(_.select(col("query_id"), col("id"),
      expr(s"1000000000 DIV ($k0 + CAST(rnk AS BIGINT))").as("__c")))
    val fused = contrib.reduce(_.unionByName(_))
      .groupBy("query_id", "id")
      .agg(sum(col("__c")).as("rrf_micro"))
    graft.functions.TopKFunctions.topkPerGroup(fused,
        Seq(col("query_id")), col("rrf_micro"), col("id"), k)
      .select(col("query_id"), col("rnk"), col("id"),
        col("key").as("rrf_micro"))
  }
}
