package graft.engine.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corporate vertical (LA city payroll) — column programs re-expressed from
  * the reference's `models/corporate/stg_corporate.sql:9-45` and
  * `models/corporate/fct_corporate.sql:6-40` as declarative Spark columns.
  * Every expression here stays inside whole-stage codegen (built-in
  * functions only), so the program fuses into a single projection stage over
  * the scan at any scale.
  */
object Corporate {

  /** P2+P3 — strip currency symbols `[$,]` then cast text to double.
    * Spark's `regexp_replace` replaces globally, matching DuckDB's 'g' flag.
    * `try_cast` (not `cast`) so non-numeric text yields null regardless of
    * the session's ANSI setting — Spark 4 is ANSI-on by default, and the
    * reference's observable behavior is null-fill + COALESCE absorption
    * (SURVEY.md §7.4.1).
    */
  def money(c: Column): Column =
    regexp_replace(c, "[$,]", "").try_cast(DoubleType)

  /** stg_corporate — renames + currency cleaning + zero-fill policy.
    * `now` is injected so tests/oracle comparisons can freeze the audit
    * timestamp (P5 is the only non-deterministic expression in the model).
    */
  def stg(raw: DataFrame, now: Column = current_timestamp()): DataFrame =
    raw.select(
      col("Row ID").as("row_id"),
      col("Year").as("year"), // stays a string dimension — never cast
      col("Department Title").as("department"),
      col("Job Class Title").as("job_title"),
      col("Employment Type").as("employment_type"),
      money(col("Base Pay")).as("base_pay"), // nullable: no COALESCE in ref
      coalesce(money(col("Overtime Pay")), lit(0.0)).as("overtime_pay"),
      coalesce(money(col("Longevity Bonus Pay")), lit(0.0)).as("longevity_bonus"),
      coalesce(money(col("Average Benefit Cost")), lit(0.0)).as("benefit_cost"),
      now.as("processed_at")
    )

  /** P6 — 3-branch overtime risk categorization; branch order matters
    * (High before Regular — `fct_corporate.sql:25-29`).
    */
  def overtimeStatus(overtimePay: Column, basePay: Column): Column =
    when(overtimePay > lit(0.25) * basePay, "High Overtime")
      .when(overtimePay > 0, "Regular Overtime")
      .otherwise("No Overtime")

  /** P8-P11 — loyalty bonus ratio with divide-by-zero safety net:
    * ROUND(bonus / NULLIF(base, 0) * 100, 2), null when base_pay = 0.
    */
  def loyaltyBonusPercentage(bonus: Column, basePay: Column): Column =
    round(bonus / nullif(basePay, lit(0)) * 100, 2)

  /** fct_corporate — TCO + risk flag + loyalty ratio on top of stg. */
  def fct(stg: DataFrame): DataFrame =
    stg.select(
      col("row_id"),
      col("year"),
      col("department"),
      col("job_title"),
      col("base_pay"),
      col("overtime_pay"),
      (col("base_pay") + col("overtime_pay") + col("longevity_bonus") +
        col("benefit_cost")).as("total_amount"),
      overtimeStatus(col("overtime_pay"), col("base_pay")).as("overtime_status"),
      loyaltyBonusPercentage(col("longevity_bonus"), col("base_pay"))
        .as("loyalty_bonus_percentage"),
      col("processed_at")
    )
}
