package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 embedding quantization + quantized similarity search.
  *
  * Symmetric per-vector quantization: q_i = round(x_i · 127 / max|x|),
  * clamped to [-127, 127]. An int8 corpus is 4× smaller than float32 —
  * at 100 TB of embeddings that is the difference between an index that
  * fits the cluster's memory and one that doesn't — and integer dot
  * products are EXACT, so quantized scores are engine- and
  * partitioning-independent (no float summation order anywhere).
  *
  * The rounding is spelled `floor(x + 0.5)` (correctly rounded IEEE ops,
  * identical on every engine) rather than `round()` (HALF_UP BigDecimal
  * in Spark vs scale-multiply std::round in DuckDB — diverges at half-ulp
  * boundaries). Zero vectors quantize to zero vectors (no 0/0).
  *
  * The max|x| reduction is materialized as its OWN projection column
  * before the per-element transform: higher-order functions are not
  * subexpression-eliminated, so embedding `array_max(transform(...))`
  * inside the element lambda re-reduces the vector per element — O(dim²)
  * with an O(dim) allocation per element (measured >100× slower at
  * dim 2000). Hence the DataFrame-shaped API.
  */
object Quantize {

  /** Append `out` = the int8 codes (as longs) of array column `v`. */
  def withInt8(df: DataFrame, v: Column, out: String): DataFrame = {
    val vd = v.cast("array<double>")
    df
      .withColumn("__q_maxabs", array_max(transform(vd, x => abs(x))))
      .withColumn(out,
        when(col("__q_maxabs") === 0.0, transform(vd, _ => lit(0L)))
          .otherwise(transform(vd, x =>
            greatest(lit(-127L), least(lit(127L),
              floor(x * (lit(127.0) / col("__q_maxabs")) + lit(0.5))
                .cast("long"))))))
      .drop("__q_maxabs")
  }

  /** Exact integer dot product of two long-array columns (codegen'd
    * primitive loop — the zip_with/aggregate higher-order form allocates
    * a lambda frame per element; integer addition makes order moot).
    */
  def intDot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.intDot(a, b)

  /** Brute-force top-k by QUANTIZED dot product: the small query set is
    * quantized and broadcast, the corpus is quantized on the fly inside
    * its one scan (in production the int8 codes are materialized once and
    * the scan reads 4× fewer bytes). Scores are exact integers — rank
    * order is reproducible bit-for-bit with no rounding step.
    */
  def knnInt8(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withInt8(
      queries.select(col("vec_id").as("query_id"), col("embedding")),
      col("embedding"), "qq").drop("embedding")
    // single-split hazard (see Similarity.knnBrute): the corpus side of a
    // broadcast join inherits the scan's split count — spread it
    val p = corpus.sparkSession.sparkContext.defaultParallelism
    val c = withInt8(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding")),
      col("embedding"), "cq").drop("embedding").repartition(p)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        intDot(col("qq"), col("cq")).as("qdot"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("qdot"), asc("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("qdot"),
      row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Sparse random sign projection (Achlioptas): reduce `dimIn`-dim
    * embeddings to `dimOut` components `p_j = (Σᵢ ±vᵢ) / √dimOut`, with
    * the ±1 sign matrix derived deterministically from MD5 of
    * `(seed, i, j)` — the distance-preserving (JL-lemma) cheap
    * alternative to PCA for clustering/LSH prep, with no training pass
    * at all. The signs are compile-time CONSTANTS folded into one local
    * projection: no shuffle, no state, full codegen; each output
    * component is a fixed-order ±-term sum (deterministic on any
    * engine), and the √dimOut divisor is applied as one multiply.
    *
    * [[signMatrix]] is exposed so an oracle can render the identical
    * literals.
    */
  def signMatrix(seed: String, dimIn: Int, dimOut: Int): Array[Array[Int]] =
    Array.tabulate(dimIn, dimOut) { (i, j) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$i:$j".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1 else -1
    }

  def randomProjection(df: DataFrame, v: Column, dimIn: Int, dimOut: Int,
                       seed: String = "rp",
                       outPrefix: String = "p"): DataFrame = {
    require(dimIn >= 1 && dimOut >= 1, "dims must be >= 1")
    val s = signMatrix(seed, dimIn, dimOut)
    val scale = 1.0 / math.sqrt(dimOut.toDouble)
    val comps = (0 until dimOut).map { j =>
      val terms = (0 until dimIn).map { i =>
        val x = v.getItem(i).cast("double")
        if (s(i)(j) > 0) x else -x
      }
      (terms.reduce(_ + _) * lit(scale)).as(s"$outPrefix$j")
    }
    df.select(col("*") +: comps: _*)
  }
}
