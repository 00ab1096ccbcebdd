package graft

import java.util.concurrent.atomic.AtomicLong

/** Stall witness for the benchmark mains.
  *
  * This box freezes the whole guest for 10–100 s at random points (host-
  * side stalls — observed across rounds 6–8: unchanged sub-second queries
  * spiking to 87 s in exactly one measurement). The defenses (min over
  * interleaved sweeps, outlier retry) correct the NUMBERS, but the
  * artifact should also carry EVIDENCE: a daemon thread samples the
  * monotonic clock every ~100 ms, and any gap between consecutive samples
  * far above the nominal period means the JVM (and the measurement running
  * at that moment) was frozen for the difference. Per-measurement readers
  * `mark()` before timing and `gapSec()` after; the max gap observed over
  * the whole run is `runMaxGapSec`. Overhead is one sleeping thread — it
  * cannot perturb a 32-thread Spark workload.
  */
object StallMeter {
  private val PeriodMs = 100L
  private val sinceMark = new AtomicLong(0L) // max inter-sample gap (ns)
  private val sinceStart = new AtomicLong(0L)
  @volatile private var started = false

  private def accumulate(ref: AtomicLong, gap: Long): Unit = {
    var cur = ref.get()
    while (gap > cur && !ref.compareAndSet(cur, gap)) cur = ref.get()
  }

  /** Idempotent; the sampler is a daemon thread and dies with the JVM. */
  def start(): Unit = synchronized {
    if (!started) {
      started = true
      val t = new Thread(() => {
        var prev = System.nanoTime()
        while (true) {
          Thread.sleep(PeriodMs)
          val now = System.nanoTime()
          val gap = now - prev
          prev = now
          accumulate(sinceMark, gap)
          accumulate(sinceStart, gap)
        }
      }, "graft-stall-meter")
      t.setDaemon(true)
      t.start()
    }
  }

  /** Reset the per-measurement window (call right before timing). */
  def mark(): Unit = sinceMark.set(0L)

  /** Largest stall (seconds beyond the nominal sample period) observed
    * since the last [[mark]]. ~0 for a stall-free measurement; a 40 s
    * host freeze during the window reads as ~40.
    */
  def gapSec(): Double =
    math.max(0.0, (sinceMark.get() - PeriodMs * 1e6) / 1e9)

  /** Largest stall observed since the meter started (whole-run witness). */
  def runMaxGapSec(): Double =
    math.max(0.0, (sinceStart.get() - PeriodMs * 1e6) / 1e9)
}
