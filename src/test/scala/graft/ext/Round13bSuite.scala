package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round13bSuite extends SparkSpec {
  import spark.implicits._

  describe("Stats.winsorizedMean") {
    it("places discrete fences at rank ceil(q*n) and clamps exactly") {
      // group "a": values 1..10 -> lo fence = elem ceil(0.5)=1 -> 1,
      // hi = elem ceil(9.5)=10 -> 10; with lo=0.2,hi=0.8: rank 2 and 8
      val df = (1 to 10).map(v => ("a", v.toLong)).toDF("g", "v")
      val r = Stats.winsorizedMean(df, "g", "v", 0.2, 0.8)
        .as[(String, Long, Long, Long, Double)].collect().head
      // fences 2 and 8 -> clamped sum = 2+2+3+4+5+6+7+8+8+8 = 53
      assert(r == (("a", 10L, 2L, 8L, 5.3)))
    }

    it("handles hot values (compacted support) and multiple groups") {
      val df = (Seq.fill(95)(("h", 5L)) ++ Seq(("h", 1000L)) ++
        (1 to 4).map(_ => ("h", 1L)) ++ Seq(("z", 7L))).toDF("g", "v")
      val got = Stats.winsorizedMean(df, "g", "v", 0.05, 0.95)
        .as[(String, Long, Long, Long, Double)].collect()
        .sortBy(_._1).toList
      // group h: n=100, rank 5 -> value 5 (cum: 1x4, 5 at rank 5..99),
      // rank 95 -> 5; outlier 1000 clamps to 5, the 1s clamp up to 5
      assert(got == List(("h", 100L, 5L, 5L, 5.0), ("z", 1L, 7L, 7L, 7.0)))
      val plan = Stats.winsorizedMean(df, "g", "v")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"))
    }
  }

  describe("TextAnalysis.bigramLmScore") {
    it("scores conditional bigram frequency in exact micro units") {
      // corpus: "x y" twice, "x z" once, "w" (no bigrams)
      val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "w"))
        .toDF("doc_id", "text")
      val got = TextAnalysis.bigramLmScore(docs)
        .as[(Long, Long, Long, Option[Double])].collect()
        .sortBy(_._1).toList
      // c(x)=3; c(x y)=2 -> (2*1e6) div 3 = 666666; c(x z)=1 -> 333333
      assert(got == List(
        (1L, 1L, 666666L, Some(666666.0 / 1e6)),
        (2L, 1L, 666666L, Some(666666.0 / 1e6)),
        (3L, 1L, 333333L, Some(333333.0 / 1e6)),
        (4L, 0L, 0L, None)))
    }
  }

  describe("Sampling.epochOrder") {
    it("is a deterministic permutation, distinct per epoch, window-free") {
      val df = spark.range(500).select(col("id").as("doc_id"))
      val e1 = Sampling.epochOrder(df, col("doc_id"), 1)
      assert(!e1.queryExecution.executedPlan.toString.contains("Window"))
      val p1 = e1.as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
      val p1b = Sampling.epochOrder(df, col("doc_id"), 1)
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
      val p2 = Sampling.epochOrder(df, col("doc_id"), 2)
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
      assert(p1 == p1b)                       // reproducible
      assert(p1.sorted == (1L to 500L))       // a permutation
      assert(p1 != p2)                        // epochs differ
      assert(p1 != (1L to 500L))              // actually shuffled
    }
  }

  describe("Analytics.rrfFuse") {
    it("sums integer pico contributions across lists") {
      val a = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
      val b = Seq((20L, 1L), (30L, 2L)).toDF("id", "rank")
      val got = Analytics.rrfFuse(Seq(a, b), "id", "rank", kConst = 60)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
      val r1 = 1000000000000L / 61
      val r2 = 1000000000000L / 62
      assert(got == List(
        (10L, 1L, r1, r1 / 1e12),
        (20L, 2L, r1 + r2, (r1 + r2) / 1e12),
        (30L, 1L, r2, r2 / 1e12)))
    }
  }

  describe("Stats.quantileNormalize") {
    it("maps each cohort's ranks onto the reference's discrete quantiles") {
      val df = (Seq(10L, 20L, 30L, 40L).map(("r", _)) ++
        Seq(("x", 5L), ("x", 5L), ("x", 7L))).toDF("g", "v")
      val out = Stats.quantileNormalize(df, "g", "v", "r")
      assert(!out.queryExecution.executedPlan.toString.contains("Window"))
      val got = out.as[(String, Long, Long, Long)].collect().sorted.toList
      // x: cum(5)=2 of 3 -> rank ceil(2/3*4)=3 -> 30; cum(7)=3 -> 4 -> 40
      // r maps onto itself (all rank products exact here)
      assert(got == List(
        ("r", 10L, 1L, 10L), ("r", 20L, 1L, 20L), ("r", 30L, 1L, 30L),
        ("r", 40L, 1L, 40L), ("x", 5L, 2L, 30L), ("x", 7L, 1L, 40L)))
    }
  }

  describe("Dedup.dupFlow") {
    it("attributes borrowed windows owner-source -> borrower-source") {
      val a8 = (1 to 8).map(i => s"a$i").mkString(" ")
      val b8 = (1 to 8).map(i => s"b$i").mkString(" ")
      val docs = Seq(
        (1L, s"$a8", "web"), (2L, s"$a8 x", "books"),
        (3L, s"y $a8", "books"), (4L, b8, "web"), (5L, s"z $b8", "web")
      ).toDF("doc_id", "text", "source")
      val got = Dedup.dupFlow(docs, 8, "source")
        .as[(String, String, Long)].collect().sorted.toList
      // a8 owned by doc1(web): borrowed by docs 2,3 (books) -> 2 windows
      // b8 owned by doc4(web): borrowed by doc5 (web) -> within-source
      assert(got == List(("web", "books", 2L), ("web", "web", 1L)))
    }
  }
}
