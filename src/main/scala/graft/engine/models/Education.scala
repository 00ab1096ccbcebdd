package graft.engine.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Education vertical (NJ teacher payroll) — from the reference's
  * `models/education/stg_education.sql:6-34` and
  * `models/education/fct_corporate.sql:6-42` (the file defines MODEL
  * `education.fct_education` — ported by model name, not filename;
  * SURVEY.md §7.4.6).
  */
object Education {

  def stg(raw: DataFrame, now: Column = current_timestamp()): DataFrame =
    raw.select(
      col("last_name"),
      col("first_name"),
      col("district").as("district_name"),
      col("school").as("school_name"),
      col("primary_job").as("job_title"),
      // fte defaults to 1.0 (full time) when missing — NOT 0.0 (stg:17);
      // try_cast: null (not error) on dirty text under ANSI-on Spark 4
      coalesce(col("fte").try_cast(DoubleType), lit(1.0)).as("fte_ratio"),
      coalesce(col("experience_total").try_cast(DoubleType), lit(0.0))
        .as("experience_years"),
      col("certificate").as("certificate_status"),
      coalesce(col("salary").try_cast(DoubleType), lit(0.0)).as("base_salary"),
      now.as("processed_at")
    )

  /** 2-branch FTE categorization (fct:19-22); boundary is >= 1.0. */
  def employmentStatus(fteRatio: Column): Column =
    when(fteRatio >= 1.0, "Full Time").otherwise("Part Time / Adjunct")

  /** 5% seniority bonus strictly above 15 years (fct:27-30); the reference
    * repeats this expression inline inside total_amount (fct:34).
    */
  def seniorityBonus(experienceYears: Column, baseSalary: Column): Column =
    when(experienceYears > 15, baseSalary * 0.05).otherwise(lit(0))

  def fct(stg: DataFrame): DataFrame =
    stg.select(
      col("district_name"),
      col("school_name"),
      col("job_title"),
      col("base_salary"),
      col("fte_ratio"),
      col("experience_years"),
      employmentStatus(col("fte_ratio")).as("employment_status"),
      seniorityBonus(col("experience_years"), col("base_salary"))
        .as("seniority_bonus"),
      (col("base_salary") +
        seniorityBonus(col("experience_years"), col("base_salary")))
        .as("total_amount"),
      round(col("base_salary") / nullif(col("experience_years"), lit(0)), 2)
        .as("cost_per_experience_year"),
      col("processed_at")
    )
}
