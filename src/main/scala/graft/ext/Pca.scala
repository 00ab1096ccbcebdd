package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal component by power iteration on the exact integer
  * grid — the "all-but-the-top" embedding post-processing step
  * (Mu & Viswanath 2018): embedding sets concentrate along a dominant
  * direction plus the mean; subtracting both measurably improves
  * cosine-similarity retrieval, so a curation pipeline wants the top
  * component as a first-class, reproducible model artifact.
  *
  * Exactness discipline (the q354/q356 re-learning contract): every
  * quantity in the trajectory is an exact integer, so a DuckDB oracle
  * re-derives the identical component with no float drift:
  *  - vectors ride as BIGINT micro coordinates; the mean is the
  *    per-dimension floor(mean) (offset trick);
  *  - one power step is y = X'v (per-row BIGINT — |x'|≤2²¹, |v|≤2²⁰,
  *    d=64 keeps Σ x'_d·v_d under 2⁴⁷), then z = X'ᵀy in
  *    DECIMAL(38,0)/HUGEINT (per-term up to ~10²⁰ overflows BIGINT —
  *    the widening is load-bearing, not defensive);
  *  - renormalization is L∞ on the integer grid:
  *    v' = floor(z·10⁶ / max|z|) via the positive-offset floor-div, so
  *    ‖v'‖∞ = 10⁶ exactly and no square root ever appears;
  *  - v₀ = the lowest vec_id's centered vector (data-dependent, no
  *    RNG). The covariance is PSD so the iterate's sign is stable;
  *    no sign normalization is needed for determinism.
  *
  * Scale shape: each iteration is one in-row projection (y — the
  * current v folds in as a literal) and one map-side-combinable
  * aggregate (z — at most d cells per map partition), so an iteration
  * reads the corpus once and shuffles d rows. Driver traffic per
  * iteration is the d-entry z vector (a bounded model read); the
  * renormalization runs driver-side in BigInt on those d values.
  */
object Pca {

  private val Scale = 1000000L

  /** (mu, v): the per-dimension floor-mean micro vector and the final
    * iterate with ‖v‖∞ = 10⁶, after `iters` exact power steps.
    */
  def topComponent(emb: DataFrame, iters: Int): (Seq[Long], Seq[Long]) = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1, 8], got $iters")
    val spark = emb.sparkSession
    import spark.implicits._
    val m = KMeans.micro(emb).localCheckpoint()
    try {
      val mu: Seq[Long] = m
        .select(posexplode(col("m")))
        .groupBy((col("pos") + 1).as("dim"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .select(col("dim"), (expr(s"(s + n * ${Scale}L) div n") - Scale).as("c"))
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
      val x = m.select(col("vec_id"),
        zip_with(col("m"), typedLit(mu), (a, b) => a - b).as("x"))
      var v: Seq[BigInt] = x.orderBy("vec_id").limit(1)
        .select(col("x")).as[Seq[Long]].collect()
        .headOption.getOrElse(sys.error("topComponent: empty corpus"))
        .map(BigInt(_))
      for (_ <- 1 to iters) {
        val vLong = v.map(_.toLong)
        val y = aggregate(
          zip_with(col("x"), typedLit(vLong), (a, b) => a * b),
          lit(0L), (acc, t) => acc + t)
        // z = X'ᵀ y with decimal(38,0) products: x'·y can reach ~10²⁰
        val z: Seq[BigInt] = x.select(col("x"), y.as("y"))
          .select(posexplode(col("x")), col("y"))
          .groupBy((col("pos") + 1).as("dim"))
          .agg(sum(col("col").cast("decimal(19,0)") *
            col("y").cast("decimal(19,0)")).as("z"))
          .select(col("dim"), col("z").cast("string"))
          .as[(Long, String)].collect().sortBy(_._1)
          .map(r => BigInt(r._2)).toSeq
        val mx = z.map(_.abs).max
        require(mx > 0, "topComponent: zero iterate (degenerate corpus)")
        // exact floor(z·10⁶ / mx) via the positive-offset trick
        v = z.map(zd => (zd * Scale + mx * Scale) / mx - Scale)
      }
      (mu, v.map(_.toLong))
    } finally Checkpoints.release(m)
  }

  /** Component table: (dim, mu_micro, v_micro), dim 1-based. */
  def componentTable(spark: SparkSession, mu: Seq[Long],
                     v: Seq[Long]): DataFrame = {
    import spark.implicits._
    mu.zip(v).zipWithIndex.map { case ((m0, v0), j) =>
      ((j + 1).toLong, m0, v0)
    }.toDF("dim", "mu_micro", "v_micro")
  }

  /** Per-vector projection coefficient y = ⟨x − mu, v⟩ under the final
    * component — exact BIGINT; the quantity "all-but-the-top" subtracts
    * along v. Pure per-row projection.
    */
  def projections(emb: DataFrame, mu: Seq[Long], v: Seq[Long]): DataFrame =
    KMeans.micro(emb).select(col("vec_id"),
      aggregate(
        zip_with(
          zip_with(col("m"), typedLit(mu), (a, b) => a - b),
          typedLit(v), (a, b) => a * b),
        lit(0L), (acc, t) => acc + t).as("y"))
}
