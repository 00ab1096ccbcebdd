package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: brute-force top-k is the exact baseline — it broadcasts
  * the (small) query set and scans the corpus once, no shuffle of the
  * corpus at all; per-query results come from a windowed rank over
  * (query × corpus) rows, which AQE coalesces. The LSH variant reduces the
  * scanned candidate set by random-hyperplane bucketing: each vector maps
  * to a single bucket id, the join is bucket-equality, and recall/probe
  * count trades off via `planes` (fewer planes ⇒ bigger buckets ⇒ higher
  * recall, more compute). At 100 TB the bucketed path shuffles only
  * (bucket, vec) pairs and never materializes the full cross product.
  */
object Similarity {

  /** Elementwise cosine similarity of two double-array columns, computed
    * as a left-to-right fold (deterministic accumulation order).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    val na = aggregate(transform(a, x => x * x), lit(0.0), _ + _)
    val nb = aggregate(transform(b, x => x * x), lit(0.0), _ + _)
    dot / sqrt(na * nb)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (self-matches excluded). Scores are rounded to 6dp
    * for cross-engine rank stability; ties break on vec_id.
    */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("score"),
      row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Near-duplicate pairs: all (a < b) with cosine >= threshold. Exact;
    * quadratic candidate set — use [[lshNeardupPairs]] beyond ~1M vectors.
    */
  def neardupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), asDouble(col("embedding")).as("va"))
    val b = emb.select(col("vec_id").as("vec_b"), asDouble(col("embedding")).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 6).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Deterministic ±1 random hyperplanes derived from md5 — reproducible
    * across sessions/engines without shipping a model artifact.
    */
  private[graft] def planeSign(plane: Int, dim: Int): Double = {
    val dgst = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$plane:$dim".getBytes("UTF-8"))
    if ((dgst(0) & 1) == 0) 1.0 else -1.0
  }

  /** Random-hyperplane LSH bucket id (one int from `planes` sign bits). */
  def lshBucket(v: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val plane = array((0 until dim).map(j => lit(planeSign(p, j))): _*)
      val dot = aggregate(zip_with(v, plane, (x, y) => x * y), lit(0.0), _ + _)
      when(dot > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-k via LSH bucketing: candidates are corpus vectors in
    * the query's bucket; rank within candidates only.
    */
  def knnLsh(queries: DataFrame, corpus: DataFrame, k: Int,
             planes: Int = 8, dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes, dim))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("score"),
      row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Approximate near-duplicate pairs via LSH: only intra-bucket pairs are
    * scored. With `planes` sign bits, vectors at cosine >= threshold land
    * in the same bucket with high probability while the bucket count (2^p)
    * keeps each bucket's quadratic term small.
    */
  def lshNeardupPairs(emb: DataFrame, threshold: Double,
                      planes: Int = 8, dim: Int = 64): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dim))
    e.as("a").join(e.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.v"), col("b.v")), 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
