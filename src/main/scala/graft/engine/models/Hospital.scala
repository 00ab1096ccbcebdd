package graft.engine.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Hospital vertical (Medicare provider charges) — from the reference's
  * `models/hospital/stg_hospital.sql:6-31` and
  * `models/hospital/fct_hospital.sql:6-18`. Input column names here are the
  * POST-normalization names (the raw CSV's messy headers — e.g.
  * ` Total Discharges ` — are normalized by [[graft.engine.Readers
  * .normalizeColumns]], reproducing DuckDB `normalize_names=True`).
  */
object Hospital {

  def stg(raw: DataFrame, now: Column = current_timestamp()): DataFrame =
    raw.select(
      col("provider_name").as("hospital_name"),
      col("provider_city").as("city"),
      col("provider_state").as("state"),
      col("drg_definition").as("service_description"),
      col("total_discharges").try_cast(IntegerType).as("total_patients"),
      col("average_total_payments").try_cast(DoubleType)
        .as("avg_payment_per_patient"),
      col("average_medicare_payments").try_cast(DoubleType)
        .as("medicare_coverage"),
      now.as("processed_at")
    )

  def fct(stg: DataFrame): DataFrame =
    stg.select(
      col("hospital_name"),
      col("service_description").as("job_title"),
      col("city"),
      col("state"),
      col("total_patients"),
      col("avg_payment_per_patient"),
      // int * double -> double (fct_hospital.sql:15)
      (col("total_patients") * col("avg_payment_per_patient"))
        .as("total_amount"),
      col("processed_at")
    )
}
