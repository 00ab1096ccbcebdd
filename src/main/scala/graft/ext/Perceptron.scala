package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BATCH perceptron on the exact integer micro grid — the
  * linear quality-classifier trainer (fastText-style gating without the
  * float softmax): per epoch, sum the update y·x over ALL currently
  * misclassified examples and apply once. Unlike the sequential
  * perceptron (whose updates depend on row order — undefined in a
  * distributed scan), the batch variant's epoch update is a pure
  * aggregate: deterministic under any partitioning, and expressible in
  * both engines, so the DuckDB oracle RE-LEARNS the weight trajectory
  * (the q354/q356/q361 contract).
  *
  * Exactness: features are BIGINT micro coordinates, labels ±1, the
  * margin y·⟨w, x⟩ an exact BIGINT (|w_d| ≤ epochs·Σ|x_d| keeps
  * per-term products ≤ ~10¹⁶ and the 64-dim sum ≤ ~10¹⁸ through
  * sf 1 — bound documented, not defensive), misclassified means
  * margin ≤ 0 (epoch 1 updates on everything from w = 0 — the
  * deterministic cold start).
  *
  * Scale shape per epoch: the margin is an in-row fold (w rides as a
  * literal), the update one map-side-combinable (dim) aggregate — d
  * cells per map partition; driver traffic is the d-entry update
  * vector (a bounded model read).
  */
object Perceptron {

  /** ±1 label column from the integer `label`: +1 iff label < `split`. */
  private def sign(split: Int) =
    when(col("label") < split, lit(1L)).otherwise(lit(-1L))

  /** (vec_id, x, y) micro feature table. */
  private def features(emb: DataFrame, split: Int): DataFrame =
    emb.select(col("vec_id"), KMeans.microVec(col("embedding")).as("x"),
      sign(split).as("y"))

  private def margin(w: Seq[Long]) =
    col("y") * aggregate(
      zip_with(col("x"), typedLit(w), (a, b) => a * b),
      lit(0L), (acc, t) => acc + t)

  /** Train `epochs` batch-perceptron epochs from w = 0; returns the
    * weight trajectory: epoch → (weights, misclassified count at the
    * START of the epoch, i.e. the update's support).
    */
  def train(emb: DataFrame, split: Int,
            epochs: Int): Seq[(Int, Seq[Long], Long)] = {
    require(epochs >= 1 && epochs <= 8,
      s"epochs must be in [1, 8], got $epochs")
    val spark = emb.sparkSession
    import spark.implicits._
    val f = features(emb, split).localCheckpoint()
    try {
      var w: Seq[Long] = Seq.fill(64)(0L)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Seq[Long], Long)]
      for (e <- 1 to epochs) {
        val upd = f.filter(margin(w) <= 0)
          .select(col("y"), posexplode(col("x")))
          .groupBy((col("pos") + 1).as("dim"))
          .agg(sum(col("y") * col("col")).as("g"), count(lit(1)).as("n"))
          .as[(Long, Long, Long)].collect()
        val miscl = upd.headOption.map(_._3).getOrElse(0L)
        val g = upd.map(r => r._1 -> r._2).toMap
        w = w.zipWithIndex.map { case (wd, j) =>
          wd + g.getOrElse((j + 1).toLong, 0L)
        }
        // margin = y·⟨w, x⟩ must stay exact in signed 64-bit: with
        // |x_d| ≤ ~1.3·10⁶ micro and 64 dims, that needs
        // |w_d| < 2⁶³/(64·1.3·10⁶) ≈ 1.1·10¹¹. |w_d| grows with the
        // update-support size, so fail loud (Spark would wrap silently
        // in non-ANSI mode) instead of serving a wrong trajectory —
        // checked on the already-collected model, no extra job.
        require(w.forall(wd => math.abs(wd) < 110000000000L),
          s"perceptron epoch $e: |w| exceeds the exact-margin bound " +
            "(corpus too large for 64-bit margins; shard or scale down)")
        out += ((e, w, miscl))
      }
      out.toSeq
    } finally Checkpoints.release(f)
  }

  /** Trajectory table: (epoch, dim, w_micro, n_updates) — the weights
    * AFTER each epoch and the epoch's update support size.
    */
  def trajectoryTable(spark: SparkSession,
                      traj: Seq[(Int, Seq[Long], Long)]): DataFrame = {
    import spark.implicits._
    traj.flatMap { case (e, w, n) =>
      w.zipWithIndex.map { case (wd, j) =>
        (e.toLong, (j + 1).toLong, wd, n)
      }
    }.toDF("epoch", "dim", "w_micro", "n_updates")
  }

  /** Confusion census under final weights: (y, pred, n) where pred is
    * the exact sign of ⟨w, x⟩ (−1, 0, +1). Pure per-row projection +
    * one combinable aggregate.
    */
  def confusion(emb: DataFrame, split: Int, w: Seq[Long]): DataFrame =
    features(emb, split)
      .select(col("y"), signum(aggregate(
        zip_with(col("x"), typedLit(w), (a, b) => a * b),
        lit(0L), (acc, t) => acc + t)).cast("long").as("pred"))
      .groupBy("y", "pred").agg(count(lit(1)).as("n"))
}
