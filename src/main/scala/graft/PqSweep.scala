package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ configuration sweep: recall@20 vs ADC scan cost across (m, k)
  * codebook shapes on the harness embeddings — the evidence behind the
  * gated high-recall configuration (q330 family). Prints one JSON line
  * per config: train time, encode+ADC scan time, mean/min recall@20
  * against the exact-L2 top-20. Run at sf0.01 and sf0.1:
  *
  *   sbt -batch "runMain graft.PqSweep /root/testdata/sf0.1"
  */
object PqSweep {
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

    val dim = 64 // the harness embeddings are 64-dim (measured; the
                 // q315–q319 family quantizes only the first 8 — which
                 // is exactly why its honest recall audit tops out low)
    val recallK = 20
    val nQueries = 5
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < nQueries)

    // exact-L2 top-20 baseline (the q319 oracle shape)
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

    for ((m, k, opq) <- Seq((8, 64, false), (16, 64, false),
        (16, 64, true), (32, 16, false), (32, 64, false), (32, 64, true),
        (64, 64, false))) {
      val t0 = System.nanoTime()
      val (ep, qp) = if (!opq) (e, q) else {
        val perm = graft.ext.Pq.varianceBalancedPerm(e, dim, m)
        def p(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), graft.ext.Pq.permuteVec(
            col("embedding").cast("array<double>"), perm).as("embedding"))
        (p(e), p(q))
      }
      val model = graft.ext.Pq.trainCodebooksLocal(spark, ep, dim, m, k)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val adc = graft.ext.Pq.adcKnnPacked(qp,
          graft.ext.Pq.encodePacked(ep, model), model, recallK)
        .select(col("query_id"), col("neighbor_id"))
      val rec = exact.join(adc.withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((coalesce(sum(col("__hit")), lit(0L)).cast("double") /
          count(lit(1)).cast("double")).as("recall"))
        .agg(avg("recall").as("mean"), min("recall").as("min"))
        .collect()(0)
      val tAdc = (System.nanoTime() - t1) / 1e9
      println(f"""{"m":$m,"k":$k,"opq":$opq,"train_sec":$tTrain%.2f,""" +
        f""""adc_sec":$tAdc%.2f,"mean_recall":${rec.getDouble(0)}%.4f,""" +
        f""""min_recall":${rec.getDouble(1)}%.4f}""")
    }
    spark.stop()
  }
}
