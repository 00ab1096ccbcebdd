package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Randomized contract coverage for the round-13 continuation
  * operators — random datasets against brute-force driver-side
  * re-formulations with the SAME fixed IEEE arithmetic: cohenKappa
  * against the literal confusion-matrix formula, higherMoments against
  * exact BigInt power sums, termChi2 against the 2×2 cell loop,
  * sequenceTrigrams against a per-key scanline, calibrationBins
  * against direct bucketing, markovStationary against a π·P
  * fixed-point residual check in exact rationals, and greedyCoverage
  * against a brute-force greedy over Sets. Fixed-seed ScalaCheck, the
  * Round12PropertySuite recipe.
  */
class Round13PropertySuite extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed * 1000 + i)))

  it("cohenKappa equals the literal confusion formula") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf("x", "y", "z"))
      val rows = samples(g, 60, seed)
      val r = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b")
        .collect().head
      val n = rows.size.toDouble
      val agree = rows.count(t => t._1 == t._2)
      val ma = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val mb = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val peNum = ma.keys.toSeq.intersect(mb.keys.toSeq)
        .map(k => ma(k) * mb(k)).sum
      val po = agree.toDouble / n
      val pe = peNum.toDouble / (n * n)
      assert(r.getLong(0) == rows.size.toLong, s"seed=$seed")
      assert(r.getLong(1) == agree.toLong)
      assert(r.getDouble(2) == po && r.getDouble(3) == pe)
      if (pe < 1.0) assert(r.getDouble(4) == (po - pe) / (1.0 - pe))
      else assert(r.isNullAt(4))
    }
  }

  it("higherMoments matches exact BigInt power-sum moments") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(1L, 60000L))
      val rows = samples(g, 100, seed)
      val out = Stats.higherMoments(rows.toDF("g", "v"), "g", col("v"))
        .collect().map(r => r.getLong(0) -> r).toMap
      rows.groupBy(_._1).foreach { case (grp, rs) =>
        val xs = rs.map(_._2)
        val n = xs.size
        val nd = n.toDouble
        def s(p: Int): BigInt = xs.map(BigInt(_).pow(p)).sum
        val mean = s(1).toDouble / nd
        val m2 = s(2).toDouble / nd - mean * mean
        val m3 = s(3).toDouble / nd - 3.0 * mean * (s(2).toDouble / nd) +
          2.0 * mean * mean * mean
        val m4 = s(4).toDouble / nd - 4.0 * mean * (s(3).toDouble / nd) +
          6.0 * mean * mean * (s(2).toDouble / nd) -
          3.0 * mean * mean * mean * mean
        val r = out(grp)
        assert(r.getLong(1) == n.toLong && r.getDouble(2) == mean)
        if (n >= 2 && m2 > 0) {
          val skew = math.floor(m3 / math.sqrt(m2 * m2 * m2) * 1e6 + 0.5)
          val kurt = math.floor((m4 / (m2 * m2) - 3.0) * 1e6 + 0.5)
          // the operator derives moments from decimal-cast sums; allow
          // one micro-grid step of cast slack at the boundary
          assert(math.abs(r.getLong(3) - skew.toLong) <= 1,
            s"seed=$seed g=$grp skew")
          assert(math.abs(r.getLong(4) - kurt.toLong) <= 1,
            s"seed=$seed g=$grp kurt")
        } else assert(r.isNullAt(3) && r.isNullAt(4))
      }
    }
  }

  it("termChi2 equals the 2x2 cell loop") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.listOfN(6,
        Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")),
        Gen.oneOf(true, false))
      val rows = samples(g, 40, seed).zipWithIndex
        .map { case ((t, tgt), i) => (i.toLong, t, tgt) }
      val out = TextAnalysis.termChi2(
          rows.toDF("doc_id", "text", "tgt"), col("tgt"))
        .collect().map(r => r.getString(0) -> r).toMap
      val toks = rows.flatMap { case (_, t, tgt) =>
        t.split("\\s+").map(_ -> tgt) }
      val n1 = toks.count(_._2).toLong
      val n2 = toks.size - n1
      toks.groupBy(_._1).foreach { case (term, ts) =>
        val k1 = ts.count(_._2).toLong
        val k2 = ts.size - k1
        val r = out(term)
        assert(r.getLong(1) == k1 && r.getLong(2) == k2, s"seed=$seed")
        val diff = (k1 * (n2 - k2) - k2 * (n1 - k1)).toDouble
        val nD = n1.toDouble + n2.toDouble
        val rowT = k1.toDouble + k2.toDouble
        val rowR = nD - rowT
        if (n1 > 0 && n2 > 0 && rowR > 0)
          assert(r.getDouble(3) ==
            nD * (diff * diff) / (n1.toDouble * n2.toDouble * rowT * rowR))
        else assert(r.isNullAt(3))
      }
    }
  }

  it("sequenceTrigrams equals a per-key scanline") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 4L))
      val rows = samples(g, 120, seed).zipWithIndex
        .map { case ((u, c), i) => (u, i.toLong, i.toLong, c) }
      val got = Analytics.sequenceTrigrams(
          rows.toDF("u", "t", "eid", "code"), "u", "t", "code",
          Seq(col("eid")))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val cs = rs.sortBy(r => (r._2, r._3)).map(_._4)
        cs.sliding(3).filter(_.size == 3)
          .map(w => (w(0), w(1), w(2))).toSeq
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  it("markovStationary satisfies pi = pi*P on the empirical chain") {
    for (seed <- 1L to 3L) {
      val g = Gen.chooseNum(0L, 3L)
      val codes = samples(g, 200, seed)
      val rows = codes.zipWithIndex.map { case (c, i) =>
        (1L, i.toLong, i.toLong, c) }
      val out = Analytics.markovStationary(
          rows.toDF("u", "t", "eid", "code"), "u", "t", "code",
          Seq(col("eid")))
        .as[(Long, Long, Long, Double)].collect()
      // verify the balance equation on the exact empirical counts:
      // for each state j, |pi_j - sum_i pi_i * P(i,j)| small (pi is on
      // the micro grid, so allow k * 1e-6 slack)
      val trans = codes.zip(codes.tail)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val states = out.map(_._1)
      val outN = states.map(s =>
        s -> states.map(t => trans.getOrElse((s, t), 0L)).sum).toMap
      val pi = out.map(r => r._1 -> r._4).toMap
      states.foreach { j =>
        val flow = states.map(i =>
          pi(i) * trans.getOrElse((i, j), 0L).toDouble / outN(i)).sum
        assert(math.abs(pi(j) - flow) < states.length * 2e-6,
          s"seed=$seed state=$j pi=${pi(j)} flow=$flow")
      }
      assert(math.abs(out.map(_._4).sum - 1.0) < 1e-5)
    }
  }

  it("greedyCoverage equals a brute-force greedy over Sets") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"),
        Gen.chooseNum(0L, 30L))
      val rows = samples(g, 120, seed).distinct
      val steps = 3
      val sets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        .toMap
      if (sets.size >= steps) {
        val gotT = scala.util.Try(
          Sampling.greedyCoverage(rows.toDF("s", "e"), "s", "e", steps)
            .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList)
        var covered = Set.empty[Long]
        var picked = List.empty[(String, Long)]
        var dead = false
        for (_ <- 1 to steps if !dead) {
          val cands = sets.view.filterKeys(k => !picked.exists(_._1 == k))
            .mapValues(s => (s -- covered).size.toLong).toSeq
            .filter(_._2 > 0)
          if (cands.isEmpty) dead = true
          else {
            val best = cands.minBy { case (k, gain) => (-gain, k) }
            covered ++= sets(best._1)
            picked :+= best
          }
        }
        if (dead) assert(gotT.isFailure, s"seed=$seed expected saturation")
        else {
          val got = gotT.get
          assert(got.map(r => (r._2, r._3)) == picked, s"seed=$seed")
          assert(got.last._4 == covered.size.toLong)
        }
      }
    }
  }

  it("calibrationBins equals direct bucketing") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.oneOf(true, false))
      val rows = samples(g, 100, seed)
      val got = Stats.calibrationBins(rows.toDF("s", "p"), col("s"),
          col("p")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = rows.groupBy { case (s, _) =>
        math.min(s * 10 / 1000000, 9L) }
        .view.mapValues(rs =>
          (rs.size.toLong, rs.count(_._2).toLong)).toMap
      assert(got == want, s"seed=$seed")
    }
  }
}
