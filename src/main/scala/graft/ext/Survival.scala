package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-censored survival analysis over user timelines — the
  * Kaplan–Meier risk table behind "how long until a signup converts,
  * given most users haven't yet". Naive conversion-latency stats
  * (q236's median) silently condition on HAVING converted; the risk
  * table keeps every subject in the denominator until its observation
  * ends, which is the unbiased read when a large share of outcomes is
  * still open.
  *
  * The reference has no survival machinery at all (its models stop at
  * group-by reports, `/root/reference/models/`); this is part of the
  * large-scale training/analytics extension surface.
  *
  * Determinism discipline (the repo-wide gate contract): every count in
  * the table is an exact int64 under any partitioning; the only double
  * is the per-row hazard `d/n_risk` — ONE correctly-rounded IEEE
  * division, bit-identical on any engine.
  */
object Survival {

  /** Kaplan–Meier risk table from one row per SUBJECT: `durCol` the
    * subject's observed duration (LongType, non-negative, in caller's
    * buckets — e.g. whole days), `eventCond` true when the duration ends
    * in the event (false = right-censored there). Returns one row per
    * distinct duration t with activity:
    * (t, n_risk, d, c, hazard = d / n_risk).
    *
    * `n_risk(t)` — subjects still under observation entering t — is
    * N − Σ_{t' < t}(d + c), with the inclusive running total computed by
    * [[GlobalOrder.withRunningTotalPerKey]]'s boundary stitch over the
    * COMPACTED per-duration counts: the stitch scans |distinct t| rows
    * (bounded by the bucket span — days, not subjects), never re-sorts
    * subjects, and the subject table itself is touched once by one
    * combinable groupBy. At 100 TB: one shuffle of per-bucket counts plus
    * a broadcast of the single grand total.
    */
  def kmRiskTable(df: DataFrame, durCol: String,
                  eventCond: Column): DataFrame = {
    GlobalOrder.requireFresh(df, "t", "d", "c", "n_risk", "hazard",
      "__graft_dc", "__graft_run", "__graft_k", "__graft_n")
    val compact = df.groupBy(col(durCol).as("t"))
      .agg(count_if(eventCond).as("d"), count_if(!eventCond).as("c"))
      .withColumn("__graft_dc", col("d") + col("c"))
      .withColumn("__graft_k", lit(0L))
    val run = GlobalOrder.withRunningTotalPerKey(compact, "__graft_k",
      "t", "__graft_dc", Seq.empty, out = "__graft_run")
    val tot = run.agg(sum(col("__graft_dc")).as("__graft_n"))
    run.crossJoin(broadcast(tot))
      .select(col("t"),
        (col("__graft_n") - col("__graft_run") + col("__graft_dc"))
          .as("n_risk"),
        col("d"), col("c"))
      .withColumn("hazard", when(col("n_risk") > 0L,
        col("d").cast("double") / col("n_risk").cast("double")))
  }
}
