package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Contract coverage for the round-12 third-batch operators — each
  * checked against a brute-force in-memory re-formulation on random
  * fixed-seed data: kmRiskTable against per-t filter counts, runsTest
  * against a literal run scan, pettittChangepoint against the O(n²)
  * double-sum definition of U_t, crossCorr against per-lag pair
  * enumeration, seasonalNaiveBacktest against a map lookup, and the
  * readability census band arithmetic.
  */
class Round12cSuite extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed * 1000 + i)))

  describe("Survival.kmRiskTable") {
    it("matches per-t filter counts on random censored durations") {
      for (seed <- 1L to 5L) {
        val g = Gen.zip(Gen.chooseNum(0L, 8L), Gen.oneOf(true, false))
        val rows = samples(g, 60, seed)
        val got = Survival.kmRiskTable(rows.toDF("dur", "ev"), "dur",
            col("ev"))
          .as[(Long, Long, Long, Long, Option[Double])].collect()
          .sortBy(_._1)
        val ts = rows.map(_._1).distinct.sorted
        assert(got.map(_._1).toSeq == ts, s"seed=$seed t spine")
        for ((t, nRisk, d, c, hz) <- got) {
          val wantRisk = rows.count(_._1 >= t).toLong
          val wantD = rows.count(r => r._1 == t && r._2).toLong
          val wantC = rows.count(r => r._1 == t && !r._2).toLong
          assert((nRisk, d, c) == ((wantRisk, wantD, wantC)),
            s"seed=$seed t=$t")
          assert(hz.contains(wantD.toDouble / wantRisk.toDouble),
            s"seed=$seed t=$t hazard")
        }
      }
    }

    it("risk set shrinks monotonically and starts at N") {
      val rows = Seq((0L, true), (0L, false), (2L, true), (5L, false),
        (5L, true), (5L, true))
      val got = Survival.kmRiskTable(rows.toDF("dur", "ev"), "dur",
          col("ev"))
        .as[(Long, Long, Long, Long, Option[Double])].collect()
        .sortBy(_._1)
      assert(got.head._2 == rows.size.toLong)
      assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
      assert(got.map(r => r._3 + r._4).sum == rows.size.toLong)
    }
  }

  describe("Stats.runsTest") {
    it("matches a literal run scan on random series") {
      for (seed <- 1L to 5L) {
        val g = Gen.chooseNum(0L, 6L)
        val ys = samples(g, 41, seed)
        val rows = ys.zipWithIndex.map { case (y, i) => (0L, i.toLong, y) }
        val got = Stats.runsTest(rows.toDF("k", "ts", "y"), "k", "ts",
            "y", Seq.empty)
          .as[(Long, Long, Long, Long, Option[Double])].collect()
        assert(got.length == 1)
        val sorted = ys.sorted
        val med2 = sorted((ys.size - 1) / 2) + sorted(ys.size / 2)
        val signs = ys.map(y => 2 * y).map(y2 =>
          if (y2 > med2) 1 else if (y2 < med2) 0 else -1)
          .filter(_ >= 0)
        val runs = signs.zip(-1 +: signs.init).count { case (a, b) =>
          a != b }
        val n1 = signs.count(_ == 1).toLong
        val n2 = signs.count(_ == 0).toLong
        val (_, gn1, gn2, gruns, _) = got.head
        assert((gn1, gn2, gruns) == ((n1, n2, runs.toLong)),
          s"seed=$seed")
      }
    }

    it("z is null for a one-sided series and set for a mixed one") {
      // constant series: every row equals the median -> all dropped
      val const = (0 until 8).map(i => (0L, i.toLong, 5L))
      val gotC = Stats.runsTest(const.toDF("k", "ts", "y"), "k", "ts",
        "y", Seq.empty).collect()
      assert(gotC.isEmpty || gotC.head.isNullAt(4))
      val mixed = Seq((0L, 0L, 1L), (0L, 1L, 9L), (0L, 2L, 1L),
        (0L, 3L, 9L), (0L, 4L, 1L), (0L, 5L, 9L))
      val gotM = Stats.runsTest(mixed.toDF("k", "ts", "y"), "k", "ts",
          "y", Seq.empty)
        .as[(Long, Long, Long, Long, Option[Double])].collect().head
      assert(gotM._4 == 6L) // perfect alternation: every row a new run
      assert(gotM._5.exists(_ > 0.0)) // more runs than expected
    }
  }

  describe("Stats.pettittChangepoint") {
    it("matches the O(n²) sign-sum definition on random series") {
      for (seed <- 1L to 5L) {
        val g = Gen.chooseNum(0L, 9L)
        val ys = samples(g, 25, seed)
        val rows = ys.zipWithIndex.map { case (y, i) => (0L, i.toLong, y) }
        val got = Stats.pettittChangepoint(rows.toDF("g", "ts", "y"),
            "g", "ts", "y", Seq.empty)
          .as[(Long, Long, Long, Long)].collect().head
        val n = ys.size
        val us = (1 to n).map { t =>
          val u = (for (i <- 0 until t; j <- t until n)
            yield java.lang.Long.signum(ys(i) - ys(j)).toLong).sum
          t.toLong -> math.abs(u)
        }
        val k = us.map(_._2).max
        val cp = us.find(_._2 == k).get._1 - 1L // earliest, 0-based ts
        assert(got == ((0L, n.toLong, k, cp)), s"seed=$seed got=$got " +
          s"want=${(0L, n, k, cp)}")
      }
    }

    it("finds an injected level shift at the right day") {
      val ys = Seq.fill(10)(10L) ++ Seq.fill(10)(90L)
      val rows = ys.zipWithIndex.map { case (y, i) => (7L, i.toLong, y) }
      val got = Stats.pettittChangepoint(rows.toDF("g", "ts", "y"),
          "g", "ts", "y", Seq.empty)
        .as[(Long, Long, Long, Long)].collect().head
      assert(got._4 == 9L) // last pre-shift index maximizes |U_t|
      assert(got._3 == 10L * 10L) // all 100 cross pairs disagree
    }
  }

  describe("Stats.crossCorr") {
    it("matches per-lag pair enumeration on random aligned series") {
      for (seed <- 1L to 5L) {
        val g = Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L))
        val xy = samples(g, 30, seed)
        val rows = xy.zipWithIndex.map { case ((x, y), i) =>
          (i.toLong, x, y) }
        val lags = Seq(-2, 0, 3)
        val got = Stats.crossCorr(rows.toDF("i", "x", "y"), "i", "x",
            "y", lags)
          .as[(Long, Long, Option[Double])].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        val ymap = rows.map(r => r._1 -> r._3).toMap
        for (l <- lags) {
          val pairs = rows.flatMap(r =>
            ymap.get(r._1 + l).map(y => (r._2, y)))
          val n = pairs.size.toDouble
          val sx = pairs.map(_._1).sum.toDouble
          val sy = pairs.map(_._2).sum.toDouble
          val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
          val syy = pairs.map(p => p._2 * p._2).sum.toDouble
          val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
          val vx = n * sxx - sx * sx
          val vy = n * syy - sy * sy
          val want =
            if (pairs.size >= 2 && vx != 0.0 && vy != 0.0)
              Some((n * sxy - sx * sy) / math.sqrt(vx * vy))
            else None
          val (gn, gr) = got(l.toLong)
          assert(gn == pairs.size.toLong, s"seed=$seed lag=$l n")
          (gr, want) match {
            case (Some(a), Some(b)) =>
              assert(math.abs(a - b) < 1e-12, s"seed=$seed lag=$l")
            case (a, b) => assert(a == b, s"seed=$seed lag=$l")
          }
        }
      }
    }
  }

  describe("TimeSeries.seasonalNaiveBacktest") {
    it("matches a map-lookup backtest on random sparse series") {
      for (seed <- 1L to 5L) {
        val g = Gen.zip(Gen.chooseNum(0L, 1L), Gen.chooseNum(0L, 20L),
          Gen.chooseNum(-50L, 50L))
        val rows = samples(g, 40, seed)
          .groupBy(r => (r._1, r._2))
          .map { case ((k, d), vs) => (k, d, vs.map(_._3).sum) }.toSeq
        val got = TimeSeries.seasonalNaiveBacktest(
            rows.toDF("k", "d", "y"), "k", "d", "y", period = 7L)
          .as[(Long, Long, Long, Double, Double)].collect()
          .map(r => r._1 -> r).toMap
        val byKey = rows.groupBy(_._1)
        for ((k, rs) <- byKey) {
          val m = rs.map(r => r._2 -> r._3).toMap
          val errs = rs.flatMap(r => m.get(r._2 - 7L).map(f => r._3 - f))
          if (errs.isEmpty) assert(!got.contains(k), s"seed=$seed k=$k")
          else {
            val (_, n, sae, mae, bias) = got(k)
            assert(n == errs.size.toLong, s"seed=$seed k=$k n")
            assert(sae == errs.map(math.abs).sum, s"seed=$seed k=$k")
            assert(mae == errs.map(math.abs).sum.toDouble / errs.size)
            assert(bias == errs.sum.toDouble / errs.size)
          }
        }
      }
    }
  }

  describe("Stats.kruskalWallis") {
    it("matches the textbook H on random k-sample data") {
      for (seed <- 1L to 5L) {
        val g = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 9L))
        val rows = samples(g, 45, seed)
        val got = Stats.kruskalWallis(rows.toDF("tk", "y"), "tk", "y",
            k = 4)
          .as[(Long, Long, Option[Double], Option[Double])]
          .collect().head
        val n = rows.size
        val sorted = rows.map(_._2).sorted
        def midrank(v: Long): Double = {
          val lo = sorted.indexOf(v) + 1
          val hi = sorted.lastIndexOf(v) + 1
          (lo + hi) / 2.0
        }
        val byG = rows.groupBy(_._1)
        val s = byG.values.map { vs =>
          val r = vs.map(v => midrank(v._2)).sum
          r * r / vs.size
        }.sum
        val h = 12.0 / (n.toDouble * (n + 1)) * s - 3.0 * (n + 1)
        val ties = rows.map(_._2).groupBy(identity).values
          .map(t => t.size.toLong)
          .map(t => t * t * t - t).sum
        val corr = 1.0 - ties.toDouble /
          (n.toDouble * n * n - n)
        assert(got._1 == n.toLong)
        assert(got._2 == ties, s"seed=$seed ties")
        assert(math.abs(got._3.get - h) < 1e-9, s"seed=$seed h")
        assert(math.abs(got._4.get - h / corr) < 1e-9, s"seed=$seed")
      }
    }
  }

  describe("EventStream.forecastAlerts") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    val DayUs = 86400000000L

    def tc(typ: String, day: Long, id: Long, cents: Long) = {
      val tsu = day * DayUs + id * 1000000L
      EventStream.TypedCents(typ, tsu, id, cents,
        new Timestamp(tsu / 1000L))
    }

    it("alerts on >50% deviation vs 7 days back, across batches, " +
       "and never on the still-open day") {
      implicit val sc = spark.sqlContext
      val src = MemoryStream[EventStream.TypedCents]
      val q = EventStream.forecastAlerts(src.toDS()).toDF()
        .writeStream.format("memory").queryName("fcast_test")
        .outputMode("append").start()
      // day 0 total 100, day 7 total 260 (alert when day 7 closes),
      // day 8 still open (no alert even though 8-1=7... no base at 1)
      src.addData(tc("a", 0, 1, 60), tc("a", 0, 2, 40))
      q.processAllAvailable()
      src.addData(tc("a", 7, 3, 260)) // closes day 0: no 7-back base
      q.processAllAvailable()
      src.addData(tc("a", 8, 4, 100)) // closes day 7: |260-100|*2>100
      q.processAllAvailable()
      src.addData(tc("a", 14, 5, 90)) // closes day 8: no base at day 1
      q.processAllAvailable()
      val rows = spark.table("fcast_test")
        .orderBy("day").collect()
      q.stop()
      assert(rows.map(r => (r.getAs[Long]("day"),
        r.getAs[Long]("total_cents"), r.getAs[Long]("prev_cents")))
        .toSeq == Seq((7L, 260L, 100L)))
      // day 14 is open: 14-7=7 present in the pruned ledger but no
      // alert until a later event closes it
    }

    it("stays quiet inside the 50% band") {
      implicit val sc = spark.sqlContext
      val src = MemoryStream[EventStream.TypedCents]
      val q = EventStream.forecastAlerts(src.toDS()).toDF()
        .writeStream.format("memory").queryName("fcast_quiet")
        .outputMode("append").start()
      src.addData(tc("b", 0, 1, 100), tc("b", 7, 2, 149),
        tc("b", 8, 3, 1)) // closes day 7: |149-100|*2=98 <= 100
      q.processAllAvailable()
      val n = spark.table("fcast_quiet").count()
      q.stop()
      assert(n == 0L)
    }
  }

  describe("Stats.ksDriftBins") {
    it("agrees with pairwise ksTest for every bin vs baseline") {
      for (seed <- 1L to 3L) {
        val g = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 12L))
        val rows = samples(g, 80, seed)
        val drift = Stats.ksDriftBins(rows.toDF("m", "v"), "m", "v",
            k = 4, baselineBin = 0)
          .as[(Long, Long, Long, Option[Double])].collect()
          .map(r => r._1 -> r).toMap
        for (b <- 1L to 3L) {
          val pair = rows.filter(r => r._1 == 0L || r._1 == b)
          val bn = rows.count(_._1 == b).toLong
          if (bn == 0L) assert(!drift.contains(b), s"seed=$seed b=$b")
          else {
            val ks = Stats.ksTest(pair.toDF("m", "v"), col("v"),
                col("m") === b)
              .as[(Long, Long, Long, Option[Double])].collect().head
            val (_, n, num, d) = drift(b)
            // ksTest's support is the PAIR's values; ksDriftBins runs
            // over the pooled support — extra points never change the
            // max gap of a step function, so the statistics agree
            assert(n == bn && num == ks._3 && d == ks._4,
              s"seed=$seed b=$b got=${drift(b)} want=$ks")
          }
        }
      }
    }
  }

  describe("Stats.pcaPowerModel") {
    it("recovers the dominant axis of an elongated cloud") {
      // points spread ±10 along dim 0, ±0.1 along dim 1, 0 elsewhere
      val rows = (0 until 40).map { i =>
        val t = (i - 20) / 2.0
        (i.toLong, Seq.tabulate(8)(d =>
          if (d == 0) t.toFloat
          else if (d == 1) (0.01 * (i % 5 - 2)).toFloat else 0.0f))
      }
      val df = rows.toDF("vec_id", "embedding")
      val (means, vec, eig) = Stats.pcaPowerModel(df, "vec_id",
        "embedding", dims = 8)
      assert(math.abs(means(0)) < 0.3)
      assert(math.abs(math.abs(vec(0)) - 1.0) < 1e-3,
        s"v=${vec.toSeq}") // dominant axis is dim 0
      assert(vec(0) > 0.0) // sign convention: first component positive
      assert(eig > 1.0) // variance along dim 0 is ~35
      assert(math.abs(vec.map(x => x * x).sum - 1.0) < 1e-9)
    }
    it("is deterministic run-to-run") {
      val rows = (0 until 30).map(i => (i.toLong,
        Seq.tabulate(8)(d => ((i * 31 + d * 17) % 13 / 13.0).toFloat)))
      val df = rows.toDF("vec_id", "embedding")
      val a = Stats.pcaPowerModel(df, "vec_id", "embedding", 8)
      val b = Stats.pcaPowerModel(df.repartition(7), "vec_id",
        "embedding", 8)
      assert(a._2.toSeq == b._2.toSeq && a._3 == b._3)
    }
  }

  describe("TextAnalysis.readabilityCensus") {
    it("counts words/sentences/syllable-runs and bands correctly") {
      val docs = Seq(
        ("en", "The cat sat. The dog ran!"), // 6 words, 2 sentences
        ("en", "no terminator here"),        // floor sentences at 1
        ("zh", "你好 世界"),                  // zero latin words
        ("en", "Why why why why why?? A b c d e f g h j k!")
      ).toDF("lang", "text")
      val got = TextAnalysis.readabilityCensus(docs, col("lang"),
          col("text"))
        .orderBy("g").collect()
      val en = got.find(_.getString(0) == "en").get
      val zh = got.find(_.getString(0) == "zh").get
      assert(en.getAs[Long]("n_docs") == 3L)
      assert(zh.getAs[Long]("n_nonlatin") == 1L)
      assert(zh.isNullAt(zh.fieldIndex("corpus_score")))
      // "The cat sat. The dog ran!": w=6 s=2 y=6 (e,a,a,e,o,a)
      // "no terminator here": w=3 s=1 y=7 (o,e,i,a,o,e,e)
      // third en doc: w=15 (5×"why" + 10 single letters), s=2
      val w = en.getAs[Long]("words")
      assert(w == 6L + 3L + 15L, s"words=$w")
      assert(en.getAs[Long]("sentences") == 2L + 1L + 2L)
      assert(en.getAs[Long]("n_nonlatin") == 0L)
      val bands = Seq("n_easy", "n_medium", "n_hard")
        .map(b => en.getAs[Long](b)).sum
      assert(bands == 3L)
    }
  }
}
