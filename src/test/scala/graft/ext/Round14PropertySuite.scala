package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized-input properties for the round-13 statistical operators
  * the dedup/window families already had (round-13 verdict task 4):
  * each operator is checked against an INDEPENDENT small-input oracle —
  * a defining mathematical property or a from-scratch Scala recompute —
  * never a re-run of the operator's own formula.
  */
class Round14PropertySuite extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1414)

  describe("TextAnalysis.freqOfFreqs (Good–Turing census)") {
    it("matches a from-scratch token-count octave census") {
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
      val docs = (1L to 50L).map { id =>
        val len = 1 + rnd.nextInt(20)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = TextAnalysis.freqOfFreqs(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // independent oracle: plain Scala counts, octave = floor(log2 c)
      val counts = docs.flatMap(_._2.split("\\s+")).groupBy(identity)
        .map { case (_, v) => v.size.toLong }
      val want = counts.groupBy(c => 63L - java.lang.Long.numberOfLeadingZeros(c))
        .map { case (oct, cs) =>
          (oct, cs.size.toLong, cs.sum, cs.min, cs.max)
        }.toSet
      assert(got == want)
    }
  }

  describe("Stats.groupLinFit2 (two-feature OLS)") {
    it("betas satisfy the normal equations (residual orthogonality)") {
      val rows = (1 to 400).map { i =>
        val g = s"g${i % 3}"
        val x1 = rnd.nextInt(50).toLong
        val x2 = rnd.nextInt(30).toLong
        // y = 7 + 3*x1 - 2*x2 + bounded noise, all integers
        val y = 7L + 3L * x1 - 2L * x2 + rnd.nextInt(11) - 5L
        (g, y, x1, x2)
      }
      val df = rows.toDF("g", "y", "x1", "x2")
      val fit = Stats.groupLinFit2(df, "g", col("y"), col("x1"), col("x2"))
        .as[(String, Long, Option[Double], Option[Double], Option[Double])]
        .collect().map(r => r._1 -> r).toMap
      for ((g, data) <- rows.groupBy(_._1)) {
        val (_, n, b0o, b1o, b2o) = fit(g)
        assert(n == data.size)
        val (b0, b1, b2) = (b0o.get, b1o.get, b2o.get)
        // defining property: X^T (y - Xb) = 0 for columns [1, x1, x2]
        def resid(r: (String, Long, Long, Long)): Double =
          r._2 - (b0 + b1 * r._3 + b2 * r._4)
        val scale = data.map(r => math.abs(r._2.toDouble)).max
        assert(math.abs(data.map(resid).sum) < 1e-6 * scale * data.size)
        assert(math.abs(data.map(r => resid(r) * r._3).sum) <
          1e-6 * scale * data.size * 50)
        assert(math.abs(data.map(r => resid(r) * r._4).sum) <
          1e-6 * scale * data.size * 30)
      }
    }

    it("recovers an exact linear relation with zero noise") {
      val rows = (1 to 60).map { i =>
        val x1 = (i % 13).toLong
        val x2 = (i % 7).toLong
        ("g", 11L + 5L * x1 - 3L * x2, x1, x2)
      }
      val fit = Stats.groupLinFit2(rows.toDF("g", "y", "x1", "x2"),
          "g", col("y"), col("x1"), col("x2"))
        .as[(String, Long, Option[Double], Option[Double], Option[Double])]
        .collect().head
      assert(math.abs(fit._3.get - 11.0) < 1e-9)
      assert(math.abs(fit._4.get - 5.0) < 1e-9)
      assert(math.abs(fit._5.get - (-3.0)) < 1e-9)
    }
  }

  describe("Stats.cupedAdjust") {
    it("adjusted cohort means preserve the pooled post mean") {
      val units = (1L to 300L).map { i =>
        (i % 4, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)
      }
      val got = Stats.cupedAdjust(units.toDF("cohort", "pre", "post"),
          "cohort", col("pre"), col("post"))
        .as[(Long, Long, Double, Option[Double], Double)].collect()
      // Σ n_c·adj_c = Σ n_c·post_c because Σ n_c(pre_c − pre̅) = 0
      val wAdj = got.map(r => r._2 * r._5).sum
      val wPost = got.map(r => r._2 * r._3).sum
      assert(math.abs(wAdj - wPost) < 1e-6 * math.abs(wPost))
    }

    it("matches a from-scratch double recompute") {
      val units = (1L to 200L).map { i =>
        (i % 3, rnd.nextInt(500).toLong, rnd.nextInt(500).toLong)
      }
      val got = Stats.cupedAdjust(units.toDF("cohort", "pre", "post"),
          "cohort", col("pre"), col("post"))
        .as[(Long, Long, Double, Option[Double], Double)].collect()
        .map(r => r._1 -> r).toMap
      val n = units.size.toDouble
      val preM = units.map(_._2).sum / n
      val postM = units.map(_._3).sum / n
      val varP = units.map(u => (u._2 - preM) * (u._2 - preM)).sum
      val covPq = units.map(u => (u._2 - preM) * (u._3 - postM)).sum
      val theta = covPq / varP
      for ((c, rows) <- units.groupBy(_._1)) {
        val mPost = rows.map(_._3).sum.toDouble / rows.size
        val mPre = rows.map(_._2).sum.toDouble / rows.size
        val want = mPost - theta * (mPre - preM)
        assert(math.abs(got(c)._5 - want) < 1e-6 * (math.abs(want) + 1),
          s"cohort $c: ${got(c)._5} vs $want")
        assert(math.abs(got(c)._4.get - theta) < 1e-6 * (math.abs(theta) + 1))
      }
    }

    it("theta = 1 and flat means when post == pre exactly") {
      val units = (1L to 100L).map(i => (i % 2, i * 3, i * 3))
      val got = Stats.cupedAdjust(units.toDF("cohort", "pre", "post"),
          "cohort", col("pre"), col("post"))
        .as[(Long, Long, Double, Option[Double], Double)].collect()
      val overall = units.map(_._3).sum.toDouble / units.size
      got.foreach { r =>
        assert(math.abs(r._4.get - 1.0) < 1e-12)
        assert(math.abs(r._5 - overall) < 1e-9)
      }
    }
  }

  describe("TimeSeries.conformalBacktest") {
    it("q_hat and coverage match a from-scratch residual recompute") {
      val keys = Seq("k1", "k2", "k3")
      val series = for (k <- keys; i <- 0L to 60L) yield
        (k, i, (rnd.nextInt(200) + 10 * i).toLong)
      val lag = 4
      val (calLo, calHi, testLo, testHi) = (10L, 39L, 40L, 60L)
      val pPct = 90
      val got = TimeSeries.conformalBacktest(
          series.toDF("k", "i", "y"), "k", "i", "y", lag,
          calLo, calHi, testLo, testHi, pPct)
        .as[(String, Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val byKey = series.groupBy(_._1)
        .map { case (k, v) => k -> v.map(r => r._2 -> r._3).toMap }
      for (k <- keys) {
        val ys = byKey(k)
        def resid(i: Long): Long = math.abs(ys(i) - ys(i - lag))
        val cal = (calLo to calHi).map(resid).sorted
        // 0-based lower-interpolation order statistic
        val qHat = cal(((cal.size - 1) * pPct / 100).toInt)
        val test = (testLo to testHi).map(resid)
        val covered = test.count(_ <= qHat)
        val (_, nCal, gq, nTest, nCov, cov) = got(k)
        assert(nCal == cal.size && gq == qHat,
          s"$k: q_hat $gq vs $qHat")
        assert(nTest == test.size && nCov == covered)
        assert(math.abs(cov - covered.toDouble / test.size) < 1e-12)
      }
    }
  }

  describe("TextAnalysis.crossEntropyBits") {
    it("matches a from-scratch add-one bit-entropy recompute") {
      val docs = Seq(
        (1L, "a b a b c", "x"), (2L, "a b a b", "x"),
        (3L, "c d c d e", "y"), (4L, "a b c d", "y")
      ).toDF("doc_id", "text", "src")
      val got = TextAnalysis.crossEntropyBits(docs, "src")
        .as[(String, String, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r).toMap
      // independent oracle: plain Scala bigram counts
      val corpus = Seq(
        "x" -> Seq("a b a b c", "a b a b"),
        "y" -> Seq("c d c d e", "a b c d"))
      def bigrams(t: String) = t.split("\\s+").sliding(2)
        .map(_.mkString(" ")).toSeq
      val cnt = corpus.map { case (s, ds) =>
        s -> ds.flatMap(bigrams).groupBy(identity)
          .map { case (b, v) => b -> v.size.toLong }
      }.toMap
      val vocab = cnt.values.flatMap(_.keys).toSet.size.toLong
      for (m <- Seq("x", "y"); e <- Seq("x", "y")) {
        val nM = cnt(m).values.sum
        val bitsTotal = cnt(e).map { case (b, cE) =>
          val ratio = (nM + vocab) / (cnt(m).getOrElse(b, 0L) + 1L)
          cE * (63L - java.lang.Long.numberOfLeadingZeros(ratio))
        }.sum
        val nE = cnt(e).values.sum
        val (_, _, gn, gb, gm) = got((m, e))
        assert(gn == nE && gb == bitsTotal, s"($m,$e): $gb vs $bitsTotal")
        assert(math.abs(gm - bitsTotal.toDouble / nE) < 1e-12)
      }
    }

    it("fails loud past the slice-count bound") {
      val docs = (1L to 20L).map(i => (i, "a b c", s"s$i"))
        .toDF("doc_id", "text", "src")
      val e = intercept[IllegalArgumentException] {
        TextAnalysis.crossEntropyBits(docs, "src", maxSlices = 10)
          .collect()
      }
      assert(e.getMessage.contains("exceed maxSlices"))
    }

    it("diagonal is the row minimum on a separated corpus") {
      val rnd2 = new scala.util.Random(40)
      val docs = (1L to 40L).map { i =>
        val src = if (i % 2 == 0) "x" else "y"
        val vocab = if (src == "x") Vector("a", "b", "c")
        else Vector("p", "q", "r")
        (i, Seq.fill(10)(vocab(rnd2.nextInt(3))).mkString(" "), src)
      }.toDF("doc_id", "text", "src")
      val m = TextAnalysis.crossEntropyBits(docs, "src")
        .as[(String, String, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._5).toMap
      assert(m(("x", "x")) < m(("y", "x")))
      assert(m(("y", "y")) < m(("x", "y")))
    }
  }

  describe("TextAnalysis.dsirScoreBits") {
    it("ranks target-domain documents above off-domain ones") {
      val rnd2 = new scala.util.Random(41)
      val docs = (1L to 60L).map { i =>
        val tgt = i % 3 == 0
        val vocab = if (tgt) Vector("t1", "t2", "t3")
        else Vector("o1", "o2", "o3", "o4")
        (i, Seq.fill(12)(vocab(rnd2.nextInt(vocab.size))).mkString(" "),
          tgt)
      }
      val got = TextAnalysis.dsirScoreBits(
          docs.toDF("doc_id", "text", "tgt"), col("tgt"))
        .as[(Long, Long, Option[Long], Option[Long], Option[Long],
          Option[Double])].collect()
        .map(r => r._1 -> r._6.get).toMap
      val tgtScores = docs.filter(_._3).map(d => got(d._1))
      val offScores = docs.filterNot(_._3).map(d => got(d._1))
      assert(tgtScores.min > offScores.max,
        s"target docs should dominate: min(tgt)=${tgtScores.min} " +
          s"max(off)=${offScores.max}")
    }

    it("matches a from-scratch whole-bit recompute") {
      val docs = Seq(
        (1L, "a b a", true), (2L, "a b c", false), (3L, "b c b", false))
      val got = TextAnalysis.dsirScoreBits(
          docs.toDF("doc_id", "text", "tgt"), col("tgt"))
        .as[(Long, Long, Option[Long], Option[Long], Option[Long],
          Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      def bigrams(t: String) = t.split("\\s+").sliding(2)
        .map(_.mkString(" ")).toSeq
      val all = docs.flatMap(d => bigrams(d._2))
      val raw = all.groupBy(identity).map { case (b, v) => b -> v.size.toLong }
      val tgt = docs.filter(_._3).flatMap(d => bigrams(d._2))
        .groupBy(identity).map { case (b, v) => b -> v.size.toLong }
      val (nRaw, nTgt, v) = (all.size.toLong,
        tgt.values.sum, raw.size.toLong)
      def bits(x: Long) = 63L - java.lang.Long.numberOfLeadingZeros(x)
      for (d <- docs) {
        val bs = bigrams(d._2)
        val br = bs.map(b => bits((nRaw + v) / (raw(b) + 1))).sum
        val bt = bs.map(b =>
          bits((nTgt + v) / (tgt.getOrElse(b, 0L) + 1))).sum
        val r = got(d._1)
        assert(r._3.get == br && r._4.get == bt && r._5.get == br - bt,
          s"doc ${d._1}: ${r._3.get}/${r._4.get} vs $br/$bt")
      }
    }
  }

  describe("Analytics.bradleyTerry") {
    it("scores are an MM fixed point of the observed win matrix") {
      val items = 0L until 6L
      val wins = for {
        a <- items; b <- items if a != b
        w = rnd.nextInt(20) + 1
      } yield (a, b, w.toLong)
      val got = Analytics.bradleyTerry(wins.toDF("a", "b", "w"),
          "a", "b", "w", iters = 500)
        .as[(Long, Long, Long, Long, Double)].collect()
        .sortBy(_._1)
      val p = got.map(_._5)
      assert(math.abs(p.sum - 1.0) < 1e-4) // micro-grid rounding
      // defining stationarity: p_i ∝ W_i / Σ_j n_ij/(p_i+p_j),
      // recomputed HERE from the raw table
      val wMap = wins.map(t => (t._1, t._2) -> t._3).toMap
      def n(i: Long, j: Long) =
        wMap.getOrElse((i, j), 0L) + wMap.getOrElse((j, i), 0L)
      def w(i: Long) = items.filter(_ != i)
        .map(j => wMap.getOrElse((i, j), 0L)).sum
      val next = items.map { i =>
        w(i) / items.filter(_ != i)
          .map(j => n(i, j) / (p(i.toInt) + p(j.toInt))).sum
      }
      val norm = next.map(_ / next.sum)
      items.foreach { i =>
        assert(math.abs(norm(i.toInt) - p(i.toInt)) < 1e-4,
          s"item $i not stationary: ${norm(i.toInt)} vs ${p(i.toInt)}")
      }
      // wins/losses margins match the raw table
      got.foreach { r =>
        assert(r._2 == w(r._1))
        assert(r._3 == items.filter(_ != r._1)
          .map(j => wMap.getOrElse((j, r._1), 0L)).sum)
      }
    }

    it("two items recover the closed-form MLE ratio") {
      val wins = Seq((0L, 1L, 30L), (1L, 0L, 10L))
      val got = Analytics.bradleyTerry(wins.toDF("a", "b", "w"),
          "a", "b", "w", iters = 500)
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
      // MLE: p0/(p0+p1) = 30/40 → p0 = 0.75, p1 = 0.25
      assert(math.abs(got(0)._5 - 0.75) < 1e-4)
      assert(math.abs(got(1)._5 - 0.25) < 1e-4)
    }
  }
}
