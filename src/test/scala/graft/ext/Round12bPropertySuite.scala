package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Randomized contract coverage for the round-12 continuation
  * operators — random datasets against brute-force re-formulations
  * computed driver-side with the SAME fixed IEEE formulas: rocAuc
  * against the pairwise U definition, spearmanRho against literal
  * midranks, paretoTopShare against sort+cumsum, longestRun against a
  * scanline, kendallTau against the triple loop. Fixed-seed
  * ScalaCheck, the Round12PropertySuite recipe.
  */
class Round12bPropertySuite extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed * 1000 + i)))

  it("rocAuc equals the pairwise Mann–Whitney definition") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 2L), Gen.oneOf(true, false),
        Gen.chooseNum(0L, 12L))
      val rows = samples(g, 80, seed)
      val out = Stats.rocAuc(rows.toDF("g", "p", "s"), "g", col("p"),
          col("s")).collect()
        .map(r => r.getLong(0) -> r).toMap
      rows.groupBy(_._1).foreach { case (grp, rs) =>
        val pos = rs.filter(_._2).map(_._3)
        val neg = rs.filterNot(_._2).map(_._3)
        val r = out(grp)
        assert(r.getLong(1) === pos.size.toLong, s"seed=$seed g=$grp")
        assert(r.getLong(2) === neg.size.toLong)
        if (pos.nonEmpty && neg.nonEmpty) {
          val u2 = (for (p <- pos; n <- neg) yield
            if (p > n) 2L else if (p == n) 1L else 0L).sum
          val want = u2.toDouble /
            (2.0 * pos.size.toDouble * neg.size.toDouble)
          assert(r.getDouble(3) === want, s"seed=$seed g=$grp")
        } else assert(r.isNullAt(3))
      }
    }
  }

  it("spearmanRho equals the literal-midrank Pearson") {
    def midranks2(vs: Seq[Long]): Map[Long, Long] = {
      // 2·midrank per distinct value: 2·cumBelow + count + 1
      val counts = vs.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var below = 0L
      counts.map { case (v, c) =>
        val r2 = 2L * below + c + 1L
        below += c
        v -> r2
      }.toMap
    }
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 1L), Gen.chooseNum(0L, 9L),
        Gen.chooseNum(0L, 9L))
      val rows = samples(g, 70, seed)
      val out = Stats.spearmanRho(rows.toDF("g", "x", "y"), "g",
          col("x"), col("y")).collect()
        .map(r => r.getLong(0) -> r).toMap
      rows.groupBy(_._1).foreach { case (grp, rs) =>
        val rx = midranks2(rs.map(_._2))
        val ry = midranks2(rs.map(_._3))
        val pairs = rs.map(r => (rx(r._2), ry(r._3)))
        val n = pairs.size.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val cov = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
        val vx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        val vy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
        val r = out(grp)
        assert(r.getLong(1) === n, s"seed=$seed g=$grp")
        if (n >= 2 && vx != 0.0 && vy != 0.0)
          assert(r.getDouble(2) === cov / math.sqrt(vx * vy),
            s"seed=$seed g=$grp")
        else assert(r.isNullAt(2), s"seed=$seed g=$grp")
      }
    }
  }

  it("paretoTopShare equals sort+cumsum at every threshold") {
    for (seed <- 1L to 5L; Seq(num, den) <- Seq(Seq(4, 5), Seq(1, 2))) {
      val g = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 20L))
      val rows = samples(g, 60, seed).zipWithIndex
        .map { case ((grp, v), i) => (grp, i.toLong, v) }
      val out = Stats.paretoTopShare(rows.toDF("g", "ent", "v"), "g",
          "v", Seq(col("ent")), pctNum = num, pctDen = den).collect()
        .map(r => r.getLong(0) -> r).toMap
      rows.groupBy(_._1).foreach { case (grp, rs) =>
        val sorted = rs.sortBy(r => (-r._3, r._2))
        val total = sorted.map(_._3).sum
        val cums = sorted.scanLeft(0L)(_ + _._3).tail
        val idx = cums.indexWhere(c => c * den >= total * num)
        val r = out(grp)
        assert(r.getLong(1) === rs.size.toLong)
        assert(r.getLong(2) === total)
        assert(r.getLong(3) === (idx + 1).toLong, s"seed=$seed g=$grp")
        assert(r.getLong(4) === cums(idx))
        assert(r.getDouble(5) === cums(idx).toDouble / total.toDouble)
      }
    }
  }

  it("longestRun equals the scanline over sorted distinct indices") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 25L))
      val rows = samples(g, 60, seed)
      val out = TimeSeries.longestRun(rows.toDF("k", "i"), "k", "i")
        .collect().map(r => r.getLong(0) -> r).toMap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val idx = rs.map(_._2).distinct.sorted
        val runs = idx.foldLeft(List.empty[(Long, Long)]) {
          case ((s, e) :: t, i) if i == e + 1 => (s, i) :: t
          case (acc, i) => (i, i) :: acc
        }.reverse
        val lens = runs.map { case (s, e) => e - s + 1 }
        val best = runs.zip(lens).minBy { case ((s, _), l) => (-l, s) }
        val r = out(k)
        assert(r.getLong(1) === idx.size.toLong, s"seed=$seed k=$k")
        assert(r.getLong(2) === runs.size.toLong)
        assert(r.getLong(3) === lens.max)
        assert(r.getLong(4) === best._1._1, s"seed=$seed k=$k")
      }
    }
  }

  it("ksTest equals the literal max-CDF-gap over the merged support") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.oneOf(true, false), Gen.chooseNum(0L, 15L))
      val rows = samples(g, 70, seed)
      val r = Stats.ksTest(rows.toDF("c", "v"), col("v"), col("c"))
        .collect()(0)
      val s1 = rows.filterNot(_._1).map(_._2)
      val s2 = rows.filter(_._1).map(_._2)
      val support = (s1 ++ s2).distinct.sorted
      val num = support.map { x =>
        math.abs(s1.count(_ <= x).toLong * s2.size.toLong -
          s2.count(_ <= x).toLong * s1.size.toLong)
      }.max
      assert(r.getLong(0) === s1.size.toLong, s"seed=$seed")
      assert(r.getLong(1) === s2.size.toLong)
      assert(r.getLong(2) === num, s"seed=$seed")
      assert(r.getDouble(3) === num.toDouble /
        (s1.size.toDouble * s2.size.toDouble))
    }
  }

  it("kendallTau equals the pairwise triple loop") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 1L), Gen.chooseNum(0L, 15L),
        Gen.chooseNum(0L, 6L))
      // unique idx per group (the operator contract)
      val rows = samples(g, 60, seed)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val out = Stats.kendallTau(rows.toDF("g", "i", "v"), "g", "i", "v")
        .collect().map(r => r.getLong(0) -> r).toMap
      rows.groupBy(_._1).foreach { case (grp, rs) =>
        val s = rs.sortBy(_._2).map(_._3)
        val ps = for (a <- s.indices; b <- a + 1 until s.size)
          yield (s(a), s(b))
        val c = ps.count(p => p._2 > p._1).toLong
        val d = ps.count(p => p._2 < p._1).toLong
        val t = ps.count(p => p._2 == p._1).toLong
        val r = out(grp)
        assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
          === ((c + d + t, c, d, t)), s"seed=$seed g=$grp")
        if (c + d + t > 0 && c + d > 0)
          assert(r.getDouble(5) === (c - d).toDouble /
            math.sqrt((c + d + t).toDouble * (c + d).toDouble))
        else assert(r.isNullAt(5))
      }
    }
  }
}
