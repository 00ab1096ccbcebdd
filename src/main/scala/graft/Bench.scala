package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints a one-line JSON artifact per completed sweep (the LAST line is the
  * final cumulative result — earlier lines make a harness kill non-fatal:
  * whatever sweep finished last is still a parseable artifact, which is how
  * round 7's rc-124 timeout loss is prevented).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional comma-separated name filter for fast local iteration; the
    // driver sets no filter and always times the full surface.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Wall-clock budget: do NOT start another sweep past this point. Round 7
    // ran 3 unconditional sweeps of a 129-query surface (~8.5+ min of query
    // time) and the harness killed the process before any line was printed.
    // One sweep is ~170 s here, so 270 s admits sweep 2 only when the box is
    // not stalling, and the worst case (~270 + one sweep) stays far inside
    // the driver timeout.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "270").toDouble
    val maxSweeps = 3
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
    // Streaming queries run a real bounded micro-batch harness whose fixed
    // overhead (~1-2 s each: checkpoint churn, no AQE) dominates their
    // timings. Derive the set from the registry (every streaming query name
    // contains "stream") so new ones can't silently drift into the
    // relational split the way q124 did in round 7.
    def isStreaming(name: String): Boolean = name.contains("stream")
    // materialize the ALREADY-optimized plan: .count() would re-optimize
    // with a count aggregate on top, pruning every unused projection and
    // dropping sorts — q02's "full export" would time a bare row count
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    // min over INTERLEAVED sweeps (was median of 3 back-to-back runs):
    // host-side stalls on this box freeze the guest for 10-100 s at
    // random points — measured: the SAME query set totals 66 s or 207 s
    // run-to-run, with untouched sub-second queries spiking to 20 s+.
    // Stall noise is strictly one-sided (it only ADDS time), so the
    // minimum estimates the plan's true cost (the timeit rule); and the
    // repetitions of one query are separated by a full sweep, so a
    // single multi-second stall cannot poison all of them the way it
    // poisoned back-to-back medians (observed: a min-of-3 back-to-back
    // run still reported 31.8 s for a 1 s query). Streaming queries are
    // timed in sweep 1 only: their cost is fixed harness overhead (already
    // split out as streaming_sec) and doesn't benefit from min-of-N.
    val times = scala.collection.mutable.Map.empty[String, Double]
    val sweepTotals = scala.collection.mutable.ArrayBuffer.empty[Double]
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    // The harness captures a bounded stdout tail and r2's full-precision
    // line overflowed it (head truncated -> unparseable artifact): keep each
    // line small with 3-decimal seconds AND short keys — "qNN" is the
    // unique prefix of every query name (129 full names would push the line
    // back toward the observed truncation zone)
    def emit(): Unit = {
      val results = selected.map { case (name, _) =>
        name -> times.getOrElse(name, -1.0)
      }
      val qs = results.map { case (k, v) =>
        s"\"" + k.takeWhile(_ != '_') + "\":" + fmt(v)
      }.mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      val streaming = results.collect {
        case (k, v) if isStreaming(k) && v >= 0 => v
      }.sum
      val sweeps = sweepTotals.map(fmt).mkString("[", ",", "]")
      println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","streaming_sec":${fmt(streaming)},"relational_sec":${fmt(total - streaming)},"sweeps_completed":${sweepTotals.size},"sweep_sec":$sweeps,"queries":$qs,"sf":"$sfDir"}""")
      System.out.flush()
    }
    val benchT0 = System.nanoTime()
    var sweep = 1
    var go = true
    while (go) {
      val sweepT0 = System.nanoTime()
      var done = 0
      for ((name, fn) <- selected
           if sweep == 1 || !isStreaming(name)
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
        done += 1
        // mid-sweep checkpoints during the FIRST sweep only: if the
        // harness kills the process before any sweep completes, a
        // partial-but-parseable artifact (not-yet-run queries report -1)
        // still beats rc-124-and-nothing
        if (sweep == 1 && done % 30 == 0) emit()
      }
      sweepTotals += (System.nanoTime() - sweepT0) / 1e9
      emit() // cumulative artifact after EVERY sweep — kill-safe
      sweep += 1
      go = sweep <= maxSweeps && (System.nanoTime() - benchT0) / 1e9 < budgetSec
    }
    spark.stop()
  }
}
