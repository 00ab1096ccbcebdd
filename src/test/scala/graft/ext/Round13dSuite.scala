package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round13dSuite extends SparkSpec {
  import spark.implicits._

  describe("Stats.cohenKappa") {
    it("matches the hand-computed kappa on a 2x2 confusion") {
      // classic example: n=50, agree on 20 yes + 15 no; a marginals
      // 25/25, b marginals 30/20 -> p_o=0.7, p_e=0.5, kappa=0.4
      val rows =
        Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
          Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y"))
      val got = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Double, Double, Option[Double])].collect().head
      assert(got._1 == 50L && got._2 == 35L)
      assert(got._3 == 0.7)
      val pe = (30.0 * 25 + 20.0 * 25) / 2500
      assert(got._4 == pe)
      assert(got._5.contains((0.7 - pe) / (1.0 - pe)))
    }

    it("yields null kappa when both raters are constant (p_e = 1)") {
      val got = Stats.cohenKappa(
        Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b")
        .as[(Long, Long, Double, Double, Option[Double])].collect().head
      assert(got._5.isEmpty && got._3 == 1.0 && got._4 == 1.0)
    }
  }

  describe("Stats.higherMoments") {
    it("computes exact skew/kurtosis micro-units for a known set") {
      // x = 1,2,3,4,10: n=5, mean=4; central moments m2=10, m3=36,
      // m4=278.8 -> skew = 36/10^1.5, kurt = 278.8/100 - 3.
      // Expectations replicate the operator's double-expression order
      // exactly (power sums -> m-moments -> micro grid).
      val df = Seq(1L, 2L, 3L, 4L, 10L).map(("g", _)).toDF("g", "v")
      val r = Stats.higherMoments(df, "g", col("v"))
        .as[(String, Long, Double, Option[Long], Option[Long],
          Option[Double], Option[Double])].collect().head
      assert(r._2 == 5L && r._3 == 4.0)
      val (nd, mean) = (5.0, 4.0)
      val m2 = 130.0 / nd - mean * mean
      val m3 = 1100.0 / nd - 3.0 * mean * (130.0 / nd) +
        2.0 * mean * mean * mean
      val m4 = 10354.0 / nd - 4.0 * mean * (1100.0 / nd) +
        6.0 * mean * mean * (130.0 / nd) -
        3.0 * mean * mean * mean * mean
      assert(m2 == 10.0 && m3 == 36.0)
      val skew = m3 / math.sqrt(m2 * m2 * m2)
      val kurt = m4 / (m2 * m2) - 3.0
      assert(r._4.contains(math.floor(skew * 1e6 + 0.5).toLong))
      assert(r._5.contains(math.floor(kurt * 1e6 + 0.5).toLong))
      assert(r._6.contains(r._4.get / 1e6) && r._7.contains(r._5.get / 1e6))
    }

    it("is null-safe on degenerate groups and survives huge values") {
      // constant group -> zero variance -> nulls; singleton -> nulls;
      // 55k-cent values whose x^4 would wrap a long survive via decimal
      val df = Seq(("c", 7L), ("c", 7L), ("s", 3L),
        ("h", 55000L), ("h", 65000L), ("h", 75000L)).toDF("g", "v")
      val got = Stats.higherMoments(df, "g", col("v"))
        .as[(String, Long, Double, Option[Long], Option[Long],
          Option[Double], Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      assert(got("c")._4.isEmpty && got("s")._4.isEmpty)
      assert(got("h")._4.isDefined)
      // symmetric three-point distribution: skewness exactly 0
      assert(got("h")._4.contains(0L))
    }
  }

  describe("TextAnalysis.termChi2") {
    it("scores target-slice association from exact token counts") {
      val docs = Seq(
        (1L, "apple apple banana", "t"),
        (2L, "banana cherry", "r")).toDF("doc_id", "text", "src")
      val got = TextAnalysis.termChi2(docs, col("src") === "t")
        .as[(String, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      // totals: n1=3 (target tokens), n2=2
      assert(got("apple")._2 == 2L && got("apple")._3 == 0L)
      assert(got("banana")._2 == 1L && got("banana")._3 == 1L)
      // apple: diff = 2*2 - 0*1 = 4; chi2 = 5*16/(3*2*2*3) = 80/36
      assert(got("apple")._4.contains(5.0 * 16.0 / (3.0 * 2.0 * 2.0 * 3.0)))
      // cherry: k1=0,k2=1: diff = 0*1 - 1*3 = -3; chi2 = 5*9/(3*2*1*4)
      assert(got("cherry")._4.contains(5.0 * 9.0 / (3.0 * 2.0 * 1.0 * 4.0)))
    }
  }

  describe("TextAnalysis.freqOfFreqs") {
    it("octave-buckets the vocabulary by corpus frequency") {
      // freqs: a->5 (octave 2), b->2, c->3 (octave 1), d->1 (octave 0)
      val docs = Seq((1L, "a a a b c d"), (2L, "a a b c c"))
        .toDF("doc_id", "text")
      val got = TextAnalysis.freqOfFreqs(docs)
        .orderBy("octave")
        .as[(Long, Long, Long, Long, Long)].collect().toList
      assert(got == List(
        (0L, 1L, 1L, 1L, 1L),   // d
        (1L, 2L, 5L, 2L, 3L),   // b, c
        (2L, 1L, 5L, 5L, 5L)))  // a
    }
  }

  describe("TextAnalysis.sourceKeywords") {
    it("ranks slice terms by integer tf-idf, window-free") {
      // 4 docs; 'rare' appears only in src A (df=1, idf_bits=3),
      // 'common' in all (df=4, idf_bits=1)
      val docs = Seq(
        (1L, "rare rare common", "A"),
        (2L, "common common", "A"),
        (3L, "common", "B"),
        (4L, "common other", "B")).toDF("doc_id", "text", "source")
      val out = TextAnalysis.sourceKeywords(docs, "source", 2)
      assert(!out.queryExecution.executedPlan.toString.contains("Window"))
      val got = out.orderBy("source", "rnk")
        .as[(String, Long, String, Long, Long, Long)].collect().toList
      // A: rare tf=2 * idf_bits 3 = 6 beats common tf=3 * 1 = 3;
      // B: other tf=1 * 3 = 3 beats common tf=2 * 1 = 2
      assert(got.map(r => (r._1, r._2, r._3, r._4)) == List(
        ("A", 1L, "rare", 6L), ("A", 2L, "common", 3L),
        ("B", 1L, "other", 3L), ("B", 2L, "common", 2L)))
    }
  }
}
