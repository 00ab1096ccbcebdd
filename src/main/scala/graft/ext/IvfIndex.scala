package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dot

/** IVF (inverted-file) approximate nearest-neighbor index — the
  * coarse-quantizer alternative to random-hyperplane LSH
  * ([[Similarity.knnLsh]]):
  *
  *  1. TRAIN: k-means over (a sample of) the corpus learns `nCells`
  *     centroids — O(corpus · nCells) per iteration, done once.
  *  2. ASSIGN: every corpus vector joins its nearest centroid's cell —
  *     one shuffle by cell id; the posting lists are just a partitioned
  *     DataFrame, no driver-side index structure.
  *  3. PROBE: each query ranks centroids (broadcast — there are only
  *     `nCells` of them), keeps the `nProbe` nearest cells, and scores
  *     only vectors in those cells: the scanned fraction is ~nProbe/nCells
  *     of the corpus, the quadratic term gone.
  *
  * At 100 TB the cell assignment is a normal partitioned join and each
  * cell's postings can further be bucketed on disk; recall/probe tradeoff
  * is (nCells, nProbe) — measured against the exact baseline in ExtSuite.
  */
object IvfIndex {

  final case class Model(centroids: DataFrame /* (cell, cv, cv_n2) */,
                         assigned: DataFrame /* corpus + cell */)

  private def asDouble(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Train the coarse quantizer and assign every corpus vector to a cell. */
  def build(spark: SparkSession, corpus: DataFrame, nCells: Int,
            seed: Long = 42L): Model = {
    val vecs = asDouble(corpus)
    val featurized = vecs.withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .fit(featurized)
    val assigned = model.transform(featurized)
      .select(col("vec_id"), col("v"), col("prediction").as("cell"))
      .withColumn("v_n2", dot(col("v"), col("v")))
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "cv")
      .withColumn("cv_n2", dot(col("cv"), col("cv")))
    Model(centroids, assigned)
  }

  /** Approximate top-k: probe the nProbe nearest cells per query, exact
    * cosine within the probed cells only.
    */
  def knn(model: Model, queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val q = asDouble(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .withColumn("qv_n2", dot(col("qv"), col("qv")))
    // rank centroids per query (centroid table is tiny -> broadcast)
    val cellRank = Window.partitionBy("query_id")
      .orderBy(desc("cell_score"), asc("cell"))
    val probed = q.crossJoin(broadcast(model.centroids))
      .withColumn("cell_score",
        dot(col("qv"), col("cv")) / sqrt(col("qv_n2") * col("cv_n2")))
      .withColumn("cell_rnk", row_number().over(cellRank))
      .filter(col("cell_rnk") <= nProbe)
      .select("query_id", "qv", "qv_n2", "cell")
    // score only vectors in probed cells
    val scored = model.assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("v")) / sqrt(col("qv_n2") * col("v_n2")), 6)
          .as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("score"),
      row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= k)
  }
}
