package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round13hSuite extends SparkSpec {
  import spark.implicits._

  describe("TimeSeries.conformalBacktest") {
    it("picks the exact discrete quantile and reports test coverage") {
      // key "a": y(t) = t for t in 0..9 except y(9) = 100.
      // lag-1 residuals: |y(t)-y(t-1)| = 1 for t=1..8, 92 at t=9.
      // cal window t in [1,8]: 8 residuals all 1 -> q_hat = 1;
      // test t=9: residual 92 -> not covered.
      val rows = (0L to 8L).map(t => ("a", t, t)) :+ (("a", 9L, 100L))
      val df = rows.toDF("k", "i", "y")
      val got = TimeSeries.conformalBacktest(df, "k", "i", "y", lag = 1,
          calLo = 1, calHi = 8, testLo = 9, testHi = 9, pPct = 90)
        .as[(String, Long, Long, Long, Long, Double)].collect().head
      assert(got == (("a", 8L, 1L, 1L, 0L, 0.0)))
    }

    it("rejects a calibration window that overlaps test (leakage)") {
      val df = Seq(("a", 1L, 1L)).toDF("k", "i", "y")
      intercept[IllegalArgumentException] {
        TimeSeries.conformalBacktest(df, "k", "i", "y", 1, 0, 5, 4, 9, 90)
      }
    }
  }

  describe("Analytics.bradleyTerry") {
    it("orders strengths by dominance and normalizes to one") {
      // a beats b 3:1, b beats c 3:1, a beats c 4:0 -> p_a > p_b > p_c
      val w = Seq((1L, 2L, 3L), (2L, 1L, 1L), (2L, 3L, 3L),
        (3L, 2L, 1L), (1L, 3L, 4L)).toDF("a", "b", "w")
      val got = Analytics.bradleyTerry(w, "a", "b", "w")
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toList
      val Seq(a, b, c) = got.map(_._4)
      assert(a > b && b > c)
      // micro masses sum to ~1e6 (rounding slack <= 2)
      assert(math.abs(got.map(_._4).sum - 1000000L) <= 2)
      // win/loss margins: a 7-1, b 4-4, c 1-7
      assert(got.map(r => (r._1, r._2, r._3)) ==
        List((1L, 7L, 1L), (2L, 4L, 4L), (3L, 1L, 7L)))
    }

    it("is reproducible across invocations") {
      val w = Seq((1L, 2L, 5L), (2L, 1L, 2L)).toDF("a", "b", "w")
      val r1 = Analytics.bradleyTerry(w, "a", "b", "w")
        .as[(Long, Long, Long, Long, Double)].collect().toList
      val r2 = Analytics.bradleyTerry(w, "a", "b", "w")
        .as[(Long, Long, Long, Long, Double)].collect().toList
      assert(r1 == r2)
    }
  }
}
