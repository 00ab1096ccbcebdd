package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the per-group cap (round-13 verdict task 5): the hot-key-safe
  * [[graft.ext.Sampling.capPerGroup]] rewrite runs external `Row`
  * comparisons through an encoder boundary per row; for the common
  * (long group, long order) case a [[graft.functions.TopKLongPairs]]
  * aggregate (primitive-long heaps, codegen-friendly combiner) plus a
  * left-semi join-back to fetch the full rows might be faster — or the
  * join-back might eat the win. Both arms are EXACT (kept sets differ
  * only under full (order, tie) collisions, the documented caveat);
  * this main interleaves the arms rep-by-rep so a box-wide stall cannot
  * poison one of them, and prints min-per-arm per shape. Results →
  * docs/PLANS.md; the loser stays available (semantics differ in tie
  * handling), the winner is what `capPerGroup` callers should reach for
  * on (long, long) keys.
  *
  * Usage: runMain graft.queries.CapAB [nRows] [reps]
  */
object CapAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // hot: half of all rows in ONE group (capPerGroupBig's adversary);
    // wide: n/20 groups of ~20 rows (the vocabulary-shaped case)
    def data(shape: String): DataFrame = {
      val grp = shape match {
        case "hot" => when(col("id") % 2 === 0, lit(0L))
          .otherwise(pmod(hash(col("id")), lit(100000)).cast("long"))
        case _ => pmod(hash(col("id")), lit(n / 20)).cast("long")
      }
      spark.range(n).select(grp.as("grp"),
        pmod(hash(col("id"), lit(1)), lit(1000000000)).cast("long")
          .as("ord"),
        col("id").as("uid"),
        concat(lit("payload"), col("id").cast("string")).as("payload"))
    }

    def heapArm(df: DataFrame): Long =
      graft.ext.Sampling.capPerGroup(df, "grp", "ord", 20).count()

    def topkArm(df: DataFrame): Long = {
      val ids = graft.functions.TopKFunctions.topkPerGroup(
          df.select(col("grp"), col("ord"), col("uid")),
          Seq(col("grp")), -col("ord"), col("uid"), 20)
        .select(col("grp"), col("id").as("uid"))
      df.join(ids, Seq("grp", "uid"), "left_semi").count()
    }

    for (shape <- Seq("hot", "wide")) {
      val df = data(shape)
      var heapMin = Double.MaxValue
      var topkMin = Double.MaxValue
      var heapRows = -1L
      var topkRows = -1L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        topkRows = topkArm(df)
        topkMin = math.min(topkMin, (System.nanoTime() - t0) / 1e9)
        val t1 = System.nanoTime()
        heapRows = heapArm(df)
        heapMin = math.min(heapMin, (System.nanoTime() - t1) / 1e9)
      }
      println(f"""{"shape":"$shape","n":$n,"reps":$reps,""" +
        f""""heap_min_sec":$heapMin%.2f,"topk_min_sec":$topkMin%.2f,""" +
        f""""heap_rows":$heapRows,"topk_rows":$topkRows}""")
    }
    spark.stop()
  }
}
