package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.engine.Warehouse

/** Randomized contract coverage for the round-12 operators — random
  * datasets against brute-force re-formulations: sessionMerge ≡ rebuild
  * under ANY time split, intervalCoverage against a literal interval
  * union, ssspHops against hop-bounded path enumeration,
  * nearestEventWithin against a per-row scan, groupWeightedMedian
  * against the sorted-prefix definition. Fixed-seed ScalaCheck, the
  * Round11PropertySuite recipe.
  */
class Round12PropertySuite extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed * 1000 + i)))

  it("sessionMerge ≡ full re-sessionize for ANY time split") {
    val gap = 5L
    def norm(df: DataFrame) =
      df.as[(Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    for (seed <- 1L to 5L) {
      // (user, ts) pairs, deduplicated (the total-order contract)
      val g = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 60L))
      val rows = samples(g, 70, seed).distinct
        .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      for (cutoff <- Seq(15L, 30L, 45L)) {
        val standing = rows.filter(_._2 <= cutoff)
        val delta = rows.filter(_._2 > cutoff)
        if (standing.nonEmpty && delta.nonEmpty) {
          val sDf = standing.toDF("u", "ts", "id")
          val dDf = delta.toDF("u", "ts", "id")
          val merged = Warehouse.sessionMerge(
            Warehouse.sessionTable(sDf, "u", "ts", gap, Seq(col("id"))),
            dDf, "u", "ts", gap, Seq(col("id")))
          val rebuilt = Warehouse.sessionTable(
            sDf.unionByName(dDf), "u", "ts", gap, Seq(col("id")))
          assert(norm(merged) == norm(rebuilt),
            s"seed=$seed cutoff=$cutoff")
        }
      }
    }
  }

  it("intervalCoverage equals the literal union length on random " +
     "overlapping intervals") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 50L),
        Gen.chooseNum(1L, 15L))
      val rows = samples(g, 60, seed)
        .map { case (k, s, len) => (k, s, s + len) }
        .distinct
      val got = TimeSeries
        .intervalCoverage(rows.toDF("k", "s", "e"), "k", "s", "e")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (k, ivs) =>
          // literal union: mark every covered integer point
          val pts = ivs.flatMap(iv => iv._2 until iv._3).toSet
          // segments = maximal runs of covered points
          val sorted = pts.toSeq.sorted
          val nSeg = sorted.zipWithIndex.count { case (p, i) =>
            i == 0 || sorted(i - 1) != p - 1
          }
          (k, pts.size.toLong, nSeg.toLong)
      }
      assert(got == want, s"seed=$seed")
    }
  }

  it("ssspHops equals hop-bounded brute-force path enumeration") {
    for (seed <- 1L to 4L) {
      val g = Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 7L),
        Gen.chooseNum(1L, 9L))
      val edges = samples(g, 25, seed)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val seeds = Seq(0L, 1L)
      val maxIter = 3
      val got = Graph.ssspHops(edges.toDF("src", "dst", "w"),
          seeds.toDF("node"), maxIter)
        .as[(Long, Long)].collect().sorted.toSeq
      // brute force: all paths of <= maxIter edges from any seed
      var dist = seeds.map(_ -> 0L).toMap
      var frontier: Map[Long, Long] = dist
      for (_ <- 1 to maxIter) {
        val next = (for {
          (n, d) <- dist.toSeq
          (s2, dst, w) <- edges if s2 == n
        } yield dst -> (d + w))
          .groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
        dist = (dist.toSeq ++ next.toSeq)
          .groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
        frontier = next
      }
      assert(got == dist.toSeq.sorted, s"seed=$seed")
    }
  }

  it("nearestEventWithin matches the per-row scan on random data") {
    val tol = 7L
    for (seed <- 1L to 4L) {
      val g = Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 40L))
      val aRows = samples(g, 30, seed).distinct
      val bRows = samples(g, 30, seed + 100).distinct
      val got = Analytics.nearestEventWithin(aRows.toDF("k", "ts"),
          bRows.toDF("k", "ts"), "k", "ts", tol, "near", "dist")
        .select("k", "ts", "near")
        .as[(Long, Long, Option[Long])].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val want = aRows.sorted.map { case (k, t) =>
        val cand = bRows.filter(b => b._1 == k && math.abs(b._2 - t) <= tol)
        val near =
          if (cand.isEmpty) None
          // closest distance; tie -> the earlier timestamp
          else Some(cand.minBy(b => (math.abs(b._2 - t), b._2))._2)
        (k, t, near)
      }
      assert(got == want, s"seed=$seed")
    }
  }

  it("groupWeightedMedian equals the sorted-prefix definition") {
    for (seed <- 1L to 5L) {
      val g = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 20L),
        Gen.chooseNum(0L, 5L))
      val rows = samples(g, 50, seed)
        .zipWithIndex.map { case ((k, v, w), i) => (k, v, w, i.toLong) }
        .filter { case (k, _, _, _) => true }
      val byKey = rows.groupBy(_._1)
      val positive = byKey.filter(_._2.map(_._3).sum > 0).keySet
      val df = rows.toDF("k", "v", "w", "id")
      val got = GlobalOrder.groupWeightedMedian(df, "k", "v", "w",
          Seq(col("id")))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
        .filter(r => positive.contains(r._1))
      val want = byKey.toSeq.sortBy(_._1)
        .filter(kv => positive.contains(kv._1))
        .map { case (k, rs) =>
          val total = rs.map(_._3).sum
          val sorted = rs.sortBy(r => (r._2, r._4))
          var cum = 0L
          val med = sorted.find { r => cum += r._3; cum * 2 >= total }.get._2
          (k, rs.size.toLong, total, med)
        }
      assert(got == want, s"seed=$seed")
    }
  }
}
