package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional comma-separated name filter for fast local iteration; the
    // driver sets no filter and always times the full surface.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time JVM/codegen/scan-setup cost outside the timed loop
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq
    // materialize the ALREADY-optimized plan: .count() would re-optimize
    // with a count aggregate on top, pruning every unused projection and
    // dropping sorts — q02's "full export" would time a bare row count
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    // min over 3 INTERLEAVED sweeps (was median of 3 back-to-back runs):
    // host-side stalls on this box freeze the guest for 10-100 s at
    // random points — measured: the SAME query set totals 66 s or 207 s
    // run-to-run, with untouched sub-second queries spiking to 20 s+.
    // Stall noise is strictly one-sided (it only ADDS time), so the
    // minimum estimates the plan's true cost (the timeit rule); and the
    // repetitions of one query are separated by a full sweep, so a
    // single multi-second stall cannot poison all of them the way it
    // poisoned back-to-back medians (observed: a min-of-3 back-to-back
    // run still reported 31.8 s for a 1 s query).
    val times = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 3; (name, fn) <- selected
         if times.getOrElse(name, 0.0) >= 0.0) {
      try {
        val t = once(fn)
        times(name) = math.min(times.getOrElse(name, Double.MaxValue), t)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          // failures are -1, never a (fast-looking) elapsed time
          times(name) = -1.0
      }
    }
    val results = selected.map { case (name, _) => name -> times(name) }
    // The harness captures a bounded stdout tail and r2's full-precision
    // line overflowed it (head truncated -> unparseable artifact): keep the
    // one-liner small with 3-decimal seconds AND short keys — "qNN" is the
    // unique prefix of every query name (77 full names would push the line
    // back toward the observed truncation zone)
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) =>
      s"\"" + k.takeWhile(_ != '_') + "\":" + fmt(v)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Streaming queries run a real bounded micro-batch harness whose
    // fixed overhead (~1-2s each: checkpoint churn, no AQE) dominates
    // their timings and would mask relational plan regressions inside
    // the total — report the split so round-over-round comparison can
    // subtract it.
    val streamingNames = Set("q53_streaming_hourly", "q55_streaming_sessions",
      "q76_streaming_state_totals", "q77_streaming_dedup",
      "q89_streaming_join", "q101_stream_static")
    val streaming = results.collect {
      case (k, v) if streamingNames(k) && v >= 0 => v
    }.sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","streaming_sec":${fmt(streaming)},"relational_sec":${fmt(total - streaming)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
