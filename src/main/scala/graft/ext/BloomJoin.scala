package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.functions.BloomFunctions

/** Bloom-prefiltered join: build a bloom filter over the (smaller) build
  * side's join keys, probe it on the probe side BEFORE the join, then run
  * the exact join on the survivors.
  *
  * This is the manual form of Spark's runtime row-level filtering, as an
  * operator the pipeline can apply deliberately: when the build side is
  * too big to broadcast as a hash table but its KEY SET fits a sketch
  * (1e8 keys at 1% fpp ≈ 110 MB; at 3% ≈ 70 MB), the probe side drops
  * non-matching rows at the SCAN, so the shuffle moves only rows that
  * might join. On a selective dimension filter over a 100 TB fact table
  * that is the difference between shuffling the whole fact table and
  * shuffling a few percent of it.
  *
  * Exactness: bloom filters have false positives but NO false negatives,
  * so the prefilter can only let extra rows through to the exact join,
  * which removes them — the result is row-for-row identical to the plain
  * join (the oracle for q100 IS the plain join). `fpp` trades sketch size
  * against wasted shuffle, never against correctness.
  */
object BloomJoin {

  /** Inner-join `probe` to `build` on long key `key`, prefiltering the
    * probe side with a bloom filter of the build side's keys.
    * `expectedKeys` sizes the filter (pass the build side's approximate
    * distinct-key count; overestimating costs memory, underestimating
    * costs fpp — never correctness).
    */
  def prefilteredJoin(probe: DataFrame, build: DataFrame, key: String,
                      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(key, expectedKeys, fpp)
    probe.filter(BloomFunctions.mightContainLong(col(key), bf))
      .join(build, Seq(key))
  }
}
