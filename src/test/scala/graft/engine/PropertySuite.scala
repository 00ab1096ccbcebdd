package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.engine.models.Corporate

/** Property-based invariants (SURVEY.md §5.4) checked on driver-side
  * samples through the same column programs the cluster runs. Plain
  * ScalaCheck generators with fixed seeds (the scalatest-scalacheck bridge
  * is not in the offline dependency budget).
  */
class PropertySuite extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val money = Gen.chooseNum(0.0, 500000.0).map(v => math.rint(v * 100) / 100)

  it("total_amount equals the 4-component sum for any inputs") {
    val rows = samples(Gen.zip(money, money, money, money), 200)
    val df = rows.zipWithIndex
      .map { case ((b, o, l, c), i) => (i.toString, b, o, l, c) }
      .toDF("row_id", "base_pay", "overtime_pay", "longevity_bonus", "benefit_cost")
      .withColumn("year", lit("2013"))
      .withColumn("department", lit("D"))
      .withColumn("job_title", lit("J"))
      .withColumn("processed_at", current_timestamp())
    val fct = Corporate.fct(df)
    val bad = fct.filter(
      col("total_amount") =!=
        col("base_pay") + col("overtime_pay") + col("longevity_bonus") + col("benefit_cost"))
    assert(bad.isEmpty)
  }

  it("currency stripping is idempotent") {
    val moneyStr = Gen.chooseNum(0L, 99999999L)
      .map(c => f"$$${c / 100}%,d.${c % 100}%02d")
    val vals = samples(moneyStr, 200)
    val df = vals.toDF("s")
    val once = df.select(Corporate.money(col("s")).as("v"))
    val twice = df.select(
      Corporate.money(regexp_replace(col("s"), "[$,]", "")).as("v"))
    assert(once.collect().map(_.getDouble(0)).toSeq ==
      twice.collect().map(_.getDouble(0)).toSeq)
  }

  it("report total budget equals fact-level total") {
    val rows = samples(Gen.zip(Gen.oneOf("a", "b", "c"), money), 300)
    val fct = rows.toDF("job_title", "total_amount")
    val reportSum = Reports.budgetReport(fct)
      .agg(sum("total_budget")).as[Double].collect()(0)
    val factSum = fct.agg(sum("total_amount")).as[Double].collect()(0)
    assert(math.abs(reportSum - factSum) <= 1e-6 * math.max(1.0, math.abs(factSum)))
  }
}
