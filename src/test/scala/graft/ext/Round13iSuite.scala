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
