package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q359 (winnow_pairs) sf1-ratio audit (round-16 verdict task 4): the
  * only extension anchor above 2x at the sf0.1→sf1 decade. Two
  * hypotheses: (a) inherent pair-population growth, (b) a join/exchange
  * straddle — overlapPairs' two joins are UNPINNED, so AQE may
  * broadcast the df-filtered fingerprint table at one SF and sort-merge
  * it at the next. This main separates them by measuring, per SF dir:
  * the fingerprint row count, the candidate-pair mass Σ C(df,2) over
  * 2 ≤ df ≤ dfCap (the exact number of join output rows before the
  * minShared filter), the boilerplate mass dropped by the cap, the
  * emitted pair count, and min-of-reps wall time. If candidate mass
  * scales ~linearly while time scales super-linearly, the plan — not
  * the data — is the residual.
  *
  * Usage: runMain graft.WinnowAudit <sfDir> [sfDir ...]
  */
object WinnowAudit {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StallMeter.start()
    // q359's exact parameters (Round15bQueries)
    val (n, w, minShared, dfCap) = (3, 4, 2, 50)
    def d3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    val out = dirs.map { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val fps = graft.ext.Winnow.fingerprints(docs, n, w)
      val df = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      val stats = df.agg(
        sum(lit(1L)).as("n_distinct_fps"),
        sum(col("df")).as("n_fp_rows"),
        sum(when(col("df").between(2, dfCap),
          (col("df") * (col("df") - 1) / 2).cast("long")).otherwise(0L))
          .as("candidate_pairs"),
        sum(when(col("df") > dfCap, col("df")).otherwise(0L))
          .as("boilerplate_rows_dropped"),
        max("df").as("max_df")).collect()(0)
      val emitted = graft.ext.Winnow
        .overlapPairs(docs, n, w, minShared, dfCap).count()
      val secs = (1 to reps).map { _ =>
        StallMeter.mark()
        val t0 = System.nanoTime()
        graft.ext.Winnow.overlapPairs(docs, n, w, minShared, dfCap)
          .queryExecution.toRdd.foreach(_ => ())
        ((System.nanoTime() - t0) / 1e9, StallMeter.gapSec())
      }.minBy(_._1)
      s""""$dir":{"n_fp_rows":${stats.getLong(1)},"n_distinct_fps":${stats.getLong(0)},"candidate_pairs":${stats.getLong(2)},"boilerplate_rows_dropped":${stats.getLong(3)},"max_df":${stats.getLong(4)},"emitted_pairs":$emitted,"sec":${d3(secs._1)},"stall_sec":${d3(secs._2)}}"""
    }
    println(s"""{"metric":"winnow_audit","params":{"n":$n,"w":$w,"minShared":$minShared,"dfCap":$dfCap},"dirs":${out.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
