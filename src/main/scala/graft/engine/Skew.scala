package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins — the manual fallback when AQE's runtime
  * skew-join splitting isn't available (non-AQE pipelines, or skew on the
  * BUILD side of a broadcast-ineligible join).
  *
  * A join on a key where one value holds, say, 30% of all rows puts 30% of
  * the data in one task. Salting rewrites `L ⋈ R on k` as
  * `salt(L) ⋈ explode(R) on (k, salt)`:
  *  - the large/skewed side gets a DETERMINISTIC salt in [0, f) derived by
  *    hashing the whole row (not `rand()` — deterministic under retries
  *    and speculative execution);
  *  - the other side is replicated f times, one copy per salt value.
  * The hot key's rows now spread over f tasks; replication costs f× the
  * small side, which is the explicit trade.
  */
object Skew {

  /** Deterministic salt in [0, f) from the given columns. */
  def salt(f: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(f))

  /** Heavy-hitter survey: keys whose row count exceeds `threshold` — the
    * cheap pre-flight a pipeline runs to DECIDE whether a join needs
    * [[saltedJoin]] (or a per-key isolate-and-broadcast). One partial-
    * aggregated pass; the result is per-key counts, small by definition
    * of "heavy", so it can be collected or broadcast into the planner's
    * decision.
    */
  def heavyKeys(df: DataFrame, keyCol: String, threshold: Long): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)

  /** Inner-join `large` (skewed on `key`) with `small`, spreading each key
    * over `f` tasks. Both inputs must contain `key`; result columns =
    * large's ++ small's (minus the duplicate key), like a plain join.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 f: Int): DataFrame = {
    // fail at the call site, not as an ANSI REMAINDER_BY_ZERO mid-job
    require(f > 0, s"salt fan-out must be positive, got $f")
    val saltCols = large.columns.map(col).toSeq // whole row -> stable salt
    val l = large.withColumn("__salt", salt(f, saltCols: _*))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(f - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** LEFT ANTI join of `large` (skewed on `key`) against a one-or-more
    * column key set, keeping only rows whose `key` is ABSENT from
    * `keys`. A plain shuffle anti-join sends every probe row with the
    * same key value to one task — a corpus-universal key (the exact
    * shape membership filters meet: one boilerplate hash carried by
    * half the rows) serializes the whole filter. Here the probe side
    * gets a deterministic whole-row salt and `keys` is replicated once
    * per salt value, so the anti-join runs on (key, salt): a row
    * survives iff its key matches NO replica — semantics identical to
    * `large.join(keys, key, "left_anti")` — while any single key's
    * probe rows spread over `f` tasks. Cost: f× the key set, the
    * explicit trade; when most probe rows miss, a bloom prefilter
    * (the q139 `Decontaminate` pattern) composes in front to shrink
    * the joined fraction further.
    */
  def saltedLeftAnti(large: DataFrame, keys: DataFrame, key: String,
                     f: Int): DataFrame = {
    require(f > 0, s"salt fan-out must be positive, got $f")
    val saltCols = large.columns.map(col).toSeq
    val l = large.withColumn("__salt", salt(f, saltCols: _*))
    val r = keys.select(col(key))
      .withColumn("__salt", explode(sequence(lit(0), lit(f - 1))))
    l.join(r, Seq(key, "__salt"), "left_anti").drop("__salt")
  }
}
