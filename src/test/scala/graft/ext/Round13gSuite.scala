package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round13gSuite extends SparkSpec {
  import spark.implicits._

  describe("Analytics.markovRemovalEffect") {
    it("solves hand-checkable removal effects and truncates at first conversion") {
      // user 1: A@1, CONV@2, B@3 (B is past conversion -> dropped);
      // user 2: B@1 (never converts).
      // chain: START->A, START->B, A->CONV, B->NULL. P(conv) = 0.5;
      // removing A kills the converting path (RE 1.0); removing B
      // changes nothing (RE 0).
      val (a, b, conv) = (10L, 20L, 99L)
      val ev = Seq(
        (1L, 1L, 0L, a), (1L, 2L, 1L, conv), (1L, 3L, 2L, b),
        (2L, 1L, 3L, b))
        .toDF("u", "t", "eid", "code")
      val got = Analytics.markovRemovalEffect(ev, "u", "t", "code",
          col("eid"), convCode = conv)
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toList
      assert(got == List(
        (a, 1L, 500000L, 1000000L, 1.0),
        (b, 1L, 500000L, 0L, 0.0)))
    }

    it("fails loud when no journey converts") {
      val ev = Seq((1L, 1L, 0L, 10L)).toDF("u", "t", "eid", "code")
      val e = intercept[Exception] {
        Analytics.markovRemovalEffect(ev, "u", "t", "code", col("eid"),
          convCode = 99L)
      }
      assert(e.getMessage.contains("no journey converts"))
    }
  }

  describe("Stats.cupedAdjust") {
    it("removes the pre-period component with the pooled theta") {
      // pooled: var(pre)=500, cov=700 -> theta=1.4, pre mean 25;
      // cohort 0 adj = 25 - 1.4*(15-25) = 39; cohort 1 = 55 - 14 = 41
      val units = Seq((0L, 10L, 20L), (0L, 20L, 30L),
        (1L, 30L, 50L), (1L, 40L, 60L)).toDF("cohort", "pre", "post")
      val got = Stats.cupedAdjust(units, "cohort", col("pre"), col("post"))
        .as[(Long, Long, Double, Option[Double], Double)].collect()
        .sortBy(_._1).toList
      assert(got == List(
        (0L, 2L, 25.0, Some(1.4), 39.0),
        (1L, 2L, 55.0, Some(1.4), 41.0)))
    }

    it("falls back to the raw mean when pre has zero variance") {
      val units = Seq((0L, 5L, 20L), (1L, 5L, 30L))
        .toDF("cohort", "pre", "post")
      val got = Stats.cupedAdjust(units, "cohort", col("pre"), col("post"))
        .as[(Long, Long, Double, Option[Double], Double)].collect()
        .sortBy(_._1).toList
      assert(got.map(r => (r._1, r._4, r._5)) ==
        List((0L, None, 20.0), (1L, None, 30.0)))
    }
  }

  describe("Stats.groupLinFit2") {
    it("recovers an exact linear model in closed form") {
      // y = 2 + 3*x1 + 5*x2, five non-collinear points
      val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 1L))
      val df = pts.map { case (x1, x2) =>
        ("g", x1, x2, 2L + 3L * x1 + 5L * x2) }
        .toDF("g", "x1", "x2", "y")
      val r = Stats.groupLinFit2(df, "g", col("y"), col("x1"), col("x2"))
        .as[(String, Long, Option[Double], Option[Double], Option[Double])]
        .collect().head
      assert(r._2 == 5L)
      assert(r._3.contains(2.0) && r._4.contains(3.0) && r._5.contains(5.0))
    }

    it("yields nulls for collinear features instead of throwing") {
      val df = (1L to 5L).map(i => ("g", i, 2 * i, 3 * i))
        .toDF("g", "x1", "x2", "y")
      val r = Stats.groupLinFit2(df, "g", col("y"), col("x1"), col("x2"))
        .as[(String, Long, Option[Double], Option[Double], Option[Double])]
        .collect().head
      assert(r._3.isEmpty && r._4.isEmpty && r._5.isEmpty)
    }
  }
}
