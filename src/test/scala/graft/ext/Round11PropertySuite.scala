package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.engine.Warehouse

/** Randomized contract coverage for the round-11 operators. The
  * deterministic Round11Suite pins the engineered shapes; these sweep
  * RANDOM datasets against brute-force re-formulations of the same
  * semantics — the merge ≡ rebuild equivalence under arbitrary append
  * splits, the forward as-of against a per-row scan, the overlap matrix
  * against nested loops. Plain ScalaCheck generators with fixed seeds
  * (the GlobalOrderPropertySuite recipe).
  */
class Round11PropertySuite extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed * 1000 + i)))

  it("scd2Merge ≡ full rebuild for ANY append split of ANY change stream") {
    def norm(df: DataFrame) =
      df.select("k", "attr", "valid_from", "valid_to", "is_current")
        .as[(Long, Long, Long, Option[Long], Boolean)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    for (seed <- 1L to 5L) {
      // few keys, few attr values (maximal no-change-run pressure),
      // versions deduplicated per key (the uniqueness contract)
      val g = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 30L),
        Gen.chooseNum(0L, 2L))
      val rows = samples(g, 80, seed)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      for (cutoff <- Seq(0L, 10L, 20L, 31L)) {
        // append split: per-key, everything <= cutoff stands, the rest
        // arrives as the delta — every delta version is AFTER the key's
        // standing span, satisfying the documented contract
        val standing = rows.filter(_._2 <= cutoff)
        val delta = rows.filter(_._2 > cutoff)
        if (standing.nonEmpty && delta.nonEmpty) {
          val sDf = standing.toDF("k", "ver", "attr")
          val dDf = delta.toDF("k", "ver", "attr")
          val merged = Warehouse.scd2Merge(
            Warehouse.scd2HistoryBig(sDf, "k", "ver", Seq("attr")),
            dDf, "k", "ver", Seq("attr"))
          val rebuilt = Warehouse.scd2HistoryBig(
            sDf.unionByName(dDf), "k", "ver", Seq("attr"))
          assert(norm(merged) == norm(rebuilt),
            s"seed=$seed cutoff=$cutoff")
        }
      }
    }
  }

  it("nextEventWithin matches the per-row scan on random tied data") {
    for (seed <- 1L to 4L) {
      val ga = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 40L))
      val gb = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 40L))
      val aRows = samples(ga, 50, seed).distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val bRows = samples(gb, 50, seed + 100).distinct
      val w = 7L
      val got = Analytics.nextEventWithin(
          aRows.toDF("k", "ts", "id"), bRows.toDF("k", "ts"),
          "k", "ts", w, "nxt")
        .select("id", "nxt").as[(Long, Option[Long])].collect().toMap
      val want = aRows.map { case (k, t, i) =>
        val cands = bRows.collect {
          case (bk, bt) if bk == k && bt > t && bt - t <= w => bt
        }
        i -> (if (cands.isEmpty) None else Some(cands.min))
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  it("audienceOverlap matches the nested-loop matrix on random membership") {
    for (seed <- 1L to 3L) {
      val g = Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(0L, 15L))
      val rows = samples(g, 70, seed)
      val sets = rows.distinct.groupBy(_._1)
        .map { case (grp, ms) => grp -> ms.map(_._2).toSet }
      val want = (for {
        (ga, sa) <- sets; (gb, sb) <- sets if ga < gb
        common = (sa & sb).size if common > 0
      } yield (ga, gb, common.toLong, sa.size.toLong, sb.size.toLong,
        common.toDouble / (sa.size + sb.size - common))).toSet
      val got = Analytics.audienceOverlap(rows.toDF("g", "e"), "g", "e")
        .as[(String, String, Long, Long, Long, Double)].collect().toSet
      assert(got == want, s"seed=$seed")
    }
  }

  it("basketLift's Apriori prune is result-invariant on random baskets") {
    // reference = the same pipeline WITHOUT the frequent-item prune:
    // pair support >= minPairBaskets implies both items frequent, so
    // the outputs must be identical row-for-row
    for (seed <- 1L to 3L) {
      val g = Gen.zip(Gen.chooseNum(0L, 12L), Gen.oneOf(
        "w", "x", "y", "z", "u", "v"))
      val df = samples(g, 90, seed).toDF("b", "i")
      val got = Analytics.basketLift(df, "b", "i", maxPerBasket = 4,
          minPairBaskets = 2L)
        .as[(String, String, Long, Long, Long, Long, Double, Double)]
        .collect().toSet
      // brute force over the same kept-basket universe
      val m = samples(g, 90, seed).distinct
      val keptB = m.groupBy(_._1).filter(_._2.size <= 4).keySet
      val kept = m.filter(r => keptB.contains(r._1))
      val itemN = kept.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nB = keptB.size.toLong
      val pairs = kept.groupBy(_._1).values.flatMap { bs =>
        val is = bs.map(_._2).sorted
        for (a <- is; b <- is if a < b) yield (a, b)
      }.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= 2L).toMap
      val want = pairs.map { case ((a, b), nab) =>
        (a, b, nab, itemN(a), itemN(b), nB,
          nab.toDouble / itemN(a),
          nab.toDouble * nB / (itemN(a).toDouble * itemN(b).toDouble))
      }.toSet
      assert(got == want, s"seed=$seed")
    }
  }

  it("halfLifeScore equals the direct per-row decay sum exactly") {
    // every term is cents · 2^-k with k <= 10 and |sum| < 2^53: the
    // bucketed fold must equal the mathematically exact value, not just
    // approximate it
    for (seed <- 1L to 3L) {
      val g = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 1000L),
        Gen.chooseNum(-500L, 500L))
      val rows = samples(g, 60, seed)
      val ref = 1000L
      val hl = 100L
      val got = Stats.halfLifeScore(rows.toDF("u", "ts", "vc"), "u", "ts",
          col("vc"), ref, hl, maxK = 10)
        .select("u", "decayed_score").as[(Long, Double)].collect().toMap
      val want = rows.filter(_._2 <= ref).groupBy(_._1).map {
        case (u, rs) =>
          // exact rational arithmetic at denominator 2^10
          val num = rs.map { case (_, t, v) =>
            val k = math.min((ref - t) / hl, 10L).toInt
            v * (1L << (10 - k))
          }.sum
          u -> num.toDouble / 1024.0
      }
      assert(got == want, s"seed=$seed")
    }
  }
}
