package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round13eSuite extends SparkSpec {
  import spark.implicits._

  private def seqDf(codes: Seq[Long]) =
    codes.zipWithIndex.map { case (c, i) =>
      (1L, (i + 1).toLong * 1000L, i.toLong, c)
    }.toDF("u", "t", "eid", "code")

  describe("Analytics.sequenceTrigrams") {
    it("counts consecutive triples per key, window-free") {
      // user 1: 1,2,3,1,2,3 -> trigrams (1,2,3)x2, (2,3,1), (3,1,2)
      val out = Analytics.sequenceTrigrams(
        seqDf(Seq(1L, 2L, 3L, 1L, 2L, 3L)), "u", "t", "code",
        Seq(col("eid")))
      assert(!out.queryExecution.executedPlan.toString.contains("Window"))
      val got = out.as[(Long, Long, Long, Long)].collect().sorted.toList
      assert(got == List((1L, 2L, 3L, 2L), (2L, 3L, 1L, 1L),
        (3L, 1L, 2L, 1L)))
    }

    it("does not bridge keys") {
      val df = Seq((1L, 1L, 0L, 7L), (1L, 2L, 1L, 8L), (2L, 3L, 2L, 9L))
        .toDF("u", "t", "eid", "code")
      assert(Analytics.sequenceTrigrams(df, "u", "t", "code",
        Seq(col("eid"))).count() == 0L)
    }
  }

  describe("Analytics.markovStationary") {
    it("solves the exact stationary distribution of a 2-state chain") {
      // A=10,B=20: A->B, B->B, B->A twice each -> P = [[0,1],[.5,.5]]
      // stationary: pi_A = 1/3, pi_B = 2/3 (exact rational)
      val df = seqDf(Seq(10L, 20L, 20L, 10L, 20L, 20L, 10L))
      val got = Analytics.markovStationary(df, "u", "t", "code",
          Seq(col("eid")))
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
      assert(got == List(
        (10L, 2L, 333333L, 0.333333),
        (20L, 4L, 666666L, 0.666666)))
    }

    it("fails loud on a state with no outgoing transitions") {
      val df = seqDf(Seq(10L, 20L)) // 20 is terminal
      val e = intercept[Exception] {
        Analytics.markovStationary(df, "u", "t", "code", Seq(col("eid")))
      }
      assert(e.getMessage.contains("no outgoing transitions"))
    }
  }

  describe("Stats.calibrationBins") {
    it("buckets micro scores with the top bin closed") {
      val df = Seq(
        (0L, true), (99999L, false),          // bin 0: rate 0.5
        (500000L, true),                      // bin 5
        (999999L, true), (1000000L, false))   // bin 9 (1e6 capped)
        .toDF("s", "p")
      val got = Stats.calibrationBins(df, col("s"), col("p"))
        .orderBy("bin")
        .as[(Long, Long, Long, Double)].collect().toList
      assert(got == List(
        (0L, 2L, 1L, 0.5), (5L, 1L, 1L, 1.0), (9L, 2L, 1L, 0.5)))
    }
  }

  describe("Dedup.sliceGramJaccard") {
    it("computes exact gram-set overlap between slices") {
      // A's 3-gram set: {a b c, b c d}; B's: {b c d, c d e};
      // C shares nothing. A-B: inter 1, union 3 -> 1/3
      val docs = Seq(
        (1L, "a b c d", "A"),
        (2L, "b c d e", "B"),
        (3L, "x y z", "C")).toDF("doc_id", "text", "source")
      val got = Dedup.sliceGramJaccard(docs, "source")
        .select("slice_a", "slice_b", "size_a", "size_b", "inter",
          "jaccard")
        .as[(String, String, Long, Long, Long, Double)].collect().toList
      assert(got == List(("A", "B", 2L, 2L, 1L, 1.0 / 3.0)))
    }
  }
}
