package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 PQ operating-point sweep — the evidence behind the two new
  * gated configurations:
  *
  *  A) ≤ 32-byte/vector codes: m=32 at k ∈ {64, 128, 256}, with and
  *     without the variance-balanced permutation (bytes/vector =
  *     m·log₂(k)/8 → 24 / 28 / 32). The verdict asks for one of these
  *     gated at recall@20 ≥ 0.7 (q339's m=32/k=64+perm landed at
  *     0.76 mean / 0.65 min — under the floor).
  *  B) residual IVFADC probe-coverage curve: m=64/k=64 codes over cell
  *     residuals at nProbe ∈ {4, 6, 8, 12, 16} of 16 cells — the
  *     coverage-vs-cost curve behind the gated nProbe choice (q337
  *     reported 0.35–0.70 floor-free at nProbe 4).
  *
  * Also re-measures the already-gated m=64/k=64 full-scan config, since
  * round 15 made the training sample layout-independent (the model — and
  * with it every recall number — changes once).
  *
  *   sbt -batch "runMain graft.Pq15Sweep /root/testdata/sf0.1"
  */
object Pq15Sweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.dot

    val dim = 64
    val recallK = 20
    val nQueries = 5
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < nQueries)

    val qv = q.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
    val exactD = e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        floor((dot(col("v"), col("v")) -
          lit(2.0) * dot(col("v"), col("qv")) +
          dot(col("qv"), col("qv"))) * 1e6 + lit(0.5)).cast("long")
          .as("d_micro"))
    val exact = graft.functions.TopKFunctions.topkPerGroup(exactD,
        Seq(col("query_id")), -col("d_micro"), col("vec_id"), recallK)
      .select(col("query_id"), col("id").as("neighbor_id"))
      .cache()
    exact.count()

    def recall(adc: DataFrame): (Double, Double) = {
      val r = exact.join(adc.select(col("query_id"), col("neighbor_id"))
            .withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((coalesce(sum(col("__hit")), lit(0L)).cast("double") /
          count(lit(1)).cast("double")).as("recall"))
        .agg(avg("recall").as("mean"), min("recall").as("min"))
        .collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }

    // A) m=32 byte-budget sweep (+ m=64/k=64 re-baseline)
    for ((m, k, opq) <- Seq((64, 64, false), (32, 64, true),
        (32, 128, false), (32, 128, true), (32, 256, false),
        (32, 256, true))) {
      val t0 = System.nanoTime()
      val (ep, qp) = if (!opq) (e, q) else {
        val perm = graft.ext.Pq.varianceBalancedPerm(e, dim, m)
        def p(df: DataFrame) =
          df.select(col("vec_id"), graft.ext.Pq.permuteVec(
            col("embedding").cast("array<double>"), perm).as("embedding"))
        (p(e), p(q))
      }
      val model = graft.ext.Pq.trainCodebooksLocal(spark, ep, dim, m, k)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (mean, min) = recall(graft.ext.Pq.adcKnnPacked(qp,
        graft.ext.Pq.encodePacked(ep, model), model, recallK))
      val tAdc = (System.nanoTime() - t1) / 1e9
      val bytes = m * (32 - Integer.numberOfLeadingZeros(k - 1)) / 8.0
      println(f"""{"family":"adc","m":$m,"k":$k,"opq":$opq,""" +
        f""""bytes_per_vec":$bytes%.1f,"train_sec":$tTrain%.2f,""" +
        f""""adc_sec":$tAdc%.2f,"mean_recall":$mean%.4f,""" +
        f""""min_recall":$min%.4f}""")
    }

    // B) residual IVFADC probe-coverage curve at the gated (m, k)
    val cents = graft.ext.IvfIndex.trainCentroids(spark, e, nCells = 16)
    val model = graft.ext.Pq.trainCodebooksLocal(spark, e, dim, 64, 64)
    for (nProbe <- Seq(4, 6, 8, 12, 16)) {
      val t0 = System.nanoTime()
      val (mean, min) = recall(graft.ext.Pq.ivfAdcResidualKnn(
        e, q, cents, model, recallK, nProbe))
      val tAdc = (System.nanoTime() - t0) / 1e9
      println(f"""{"family":"residual","m":64,"k":64,"nProbe":$nProbe,""" +
        f""""nCells":16,"adc_sec":$tAdc%.2f,"mean_recall":$mean%.4f,""" +
        f""""min_recall":$min%.4f}""")
    }
    spark.stop()
  }
}
