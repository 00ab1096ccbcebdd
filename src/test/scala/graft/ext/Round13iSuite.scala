package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round13iSuite extends SparkSpec {
  import spark.implicits._

  describe("Similarity.kCenterSeeds") {
    it("greedily picks farthest points with exact micro distances") {
      // 1-D line embedded in 2-D: ids 1..4 at x = 0, 1, 10, 11.
      // seed = id 1 (lowest); farthest = id 4 (d2 121); then id 2?
      // dmin to {0,11}: x=1 -> 1, x=10 -> 1: tie at micro 1e6 ->
      // lowest vec_id (2) wins; last pick is 3 (dmin 1).
      val e = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
        (3L, Seq(10.0f, 0.0f)), (4L, Seq(11.0f, 0.0f)))
        .toDF("vec_id", "embedding")
      val got = Similarity.kCenterSeeds(e, 4)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toList
      assert(got == List((1L, 1L, 0L), (2L, 4L, 121000000L),
        (3L, 2L, 1000000L), (4L, 3L, 1000000L)))
    }
  }

  describe("TimeSeries.interruptedTrend") {
    it("extrapolates the exact pre trend and reports total divergence") {
      // key a: y = 10 + 2x on pre x=0..4 (idx 100..104); post idx
      // 107..108 actual 50, 60 -> pred 24 + 26 = 50, effect 60.
      val rows = (0L to 4L).map(x => ("a", 100L + x, 10L + 2 * x)) ++
        Seq(("a", 107L, 50L), ("a", 108L, 60L))
      val got = TimeSeries.interruptedTrend(rows.toDF("k", "i", "y"),
          "k", "i", "y", preLo = 100, preHi = 104, postLo = 107,
          postHi = 108)
        .as[(String, Long, Option[Double], Option[Double], Long, Long,
          Option[Double], Option[Double])].collect().head
      assert(got._2 == 5L && got._5 == 2L && got._6 == 110L)
      assert(got._3.contains(2.0) && got._4.contains(10.0))
      assert(got._7.contains(50.0) && got._8.contains(60.0))
    }

    it("nulls the fit for degenerate pre windows") {
      val rows = Seq(("a", 100L, 5L), ("a", 107L, 9L))
      val got = TimeSeries.interruptedTrend(rows.toDF("k", "i", "y"),
          "k", "i", "y", 100, 104, 107, 108)
        .as[(String, Long, Option[Double], Option[Double], Long, Long,
          Option[Double], Option[Double])].collect().head
      assert(got._3.isEmpty && got._8.isEmpty)
    }
  }

  describe("Mixture.waterFill") {
    it("levels the budget across slices up to availability") {
      // counts 1, 5, 10; budget 9 -> level 4: alloc 1+4+4 = 9, left 0
      val df = Seq(("a", 1L), ("b", 5L), ("c", 10L)).toDF("s", "n")
      val got = Mixture.waterFill(df, "s", "n", 9L)
        .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      assert(got == List(("a", 1L, 1L, 4L, 0L), ("b", 5L, 4L, 4L, 0L),
        ("c", 10L, 4L, 4L, 0L)))
    }

    it("matches a brute-force level search on random-ish inputs") {
      val counts = Seq(3L, 7L, 0L, 12L, 12L, 1L, 25L)
      val df = counts.zipWithIndex.map { case (n, i) => (s"s$i", n) }
        .toDF("s", "n")
      for (budget <- Seq(0L, 1L, 10L, 30L, 59L, 60L, 61L, 1000L)) {
        val got = Mixture.waterFill(df, "s", "n", budget)
          .as[(String, Long, Long, Long, Long)].collect()
        val level = got.head._4
        def tot(l: Long) = counts.map(math.min(_, l)).sum
        assert(tot(level) <= math.min(budget, counts.sum),
          s"budget $budget level $level overspends")
        assert(tot(level + 1) > budget || level == counts.max,
          s"budget $budget level $level not maximal")
        assert(got.map(_._3).sum == tot(level))
        assert(got.head._5 == math.min(budget, counts.sum) - tot(level))
      }
    }
  }
}
