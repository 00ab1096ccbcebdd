package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed contracts for the round-12 continuation operators:
  * rocAuc (Mann–Whitney with ties), spearmanRho (midranks), Pareto
  * top-share (integer threshold + argmin), longestRun
  * (gaps-and-islands).
  */
class Round12bSuite extends SparkSpec {
  import spark.implicits._

  describe("Stats.rocAuc") {
    it("matches the hand-computed U statistic with ties") {
      // group 0: pos scores {3, 2}, neg scores {1, 2}
      // pairs: 3>1, 3>2, 2>1 = 3 wins; 2=2 one tie -> U = 3.5
      val df = Seq(
        (0L, true, 3L), (0L, true, 2L), (0L, false, 1L), (0L, false, 2L),
        (1L, true, 5L), (1L, true, 7L) // no negatives -> null auc
      ).toDF("g", "pos", "s")
      val out = Stats.rocAuc(df, "g", col("pos"), col("s"))
        .orderBy("g").collect()
      assert(out(0) === Row(0L, 2L, 2L, 3.5 / 4.0))
      assert(out(1).getLong(1) === 2L && out(1).getLong(2) === 0L)
      assert(out(1).isNullAt(3))
    }

    it("is 1.0 for perfect separation and 0.5 for identical scores") {
      val df = Seq(
        (0L, true, 10L), (0L, true, 9L), (0L, false, 1L), (0L, false, 2L),
        (1L, true, 5L), (1L, false, 5L)
      ).toDF("g", "pos", "s")
      val out = Stats.rocAuc(df, "g", col("pos"), col("s"))
        .orderBy("g").collect()
      assert(out(0).getDouble(3) === 1.0)
      assert(out(1).getDouble(3) === 0.5)
    }
  }

  describe("Stats.spearmanRho") {
    it("is ±1 for perfect monotonic relations, null when degenerate") {
      val df = Seq(
        (0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L),
        (1L, 1L, 30L), (1L, 2L, 20L), (1L, 3L, 10L),
        (2L, 1L, 7L), (2L, 2L, 7L), (2L, 3L, 7L)
      ).toDF("g", "x", "y")
      val out = Stats.spearmanRho(df, "g", col("x"), col("y"))
        .orderBy("g").collect()
      assert(out(0).getDouble(2) === 1.0)
      assert(out(1).getDouble(2) === -1.0)
      assert(out(2).isNullAt(2)) // constant y: zero rank variance
    }

    it("applies midranks to ties (hand-computed sqrt(0.9) case)") {
      // x = [1,2,2,3] -> 2·midranks [2,5,5,8]; y = [1,2,3,4] -> [2,4,6,8]
      // Pearson = 72 / sqrt(72·80) = sqrt(0.9)
      val df = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 2L, 3L), (0L, 3L, 4L))
        .toDF("g", "x", "y")
      val out = Stats.spearmanRho(df, "g", col("x"), col("y")).collect()
      assert(math.abs(out(0).getDouble(2) - math.sqrt(0.9)) < 1e-15)
    }

    it("drops null-x or null-y rows pairwise") {
      val df = Seq(
        (0L, Some(1L), Some(10L)), (0L, Some(2L), Some(20L)),
        (0L, None, Some(99L)), (0L, Some(9L), None)
      ).toDF("g", "x", "y")
      val out = Stats.spearmanRho(df, "g", col("x"), col("y")).collect()
      assert(out(0).getLong(1) === 2L && out(0).getDouble(2) === 1.0)
    }
  }

  describe("Stats.paretoTopShare") {
    it("finds the smallest top-k reaching 80% (hand case)") {
      // values 50,30,10,10: cum desc 50,80,90,100 -> n_top=2, top=80
      val df = Seq((0L, 1L, 50L), (0L, 2L, 30L), (0L, 3L, 10L),
        (0L, 4L, 10L)).toDF("g", "id", "v")
      val out = Stats.paretoTopShare(df, "g", "v", Seq(col("id")))
        .collect()
      assert(out(0) === Row(0L, 4L, 100L, 2L, 80L, 0.8))
    }

    it("handles a single entity and deterministic tie order") {
      val df = Seq((0L, 9L, 7L),
        (1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 5L)).toDF("g", "id", "v")
      val out = Stats.paretoTopShare(df, "g", "v", Seq(col("id")))
        .orderBy("g").collect()
      assert(out(0) === Row(0L, 1L, 7L, 1L, 7L, 1.0))
      // g=1: total 25, 80% = 20 -> cum 10 (id 1), 20 (id 2) -> n_top 2
      assert(out(1) === Row(1L, 3L, 25L, 2L, 20L, 0.8))
    }
  }

  describe("TimeSeries.longestRun") {
    it("splits runs at gaps and reports the longest (ties -> earliest)") {
      val df = Seq((7L, 1L), (7L, 2L), (7L, 3L), (7L, 5L), (7L, 6L),
        (7L, 10L), (7L, 10L), // duplicate index must dedup
        (8L, 4L), (8L, 5L), (8L, 8L), (8L, 9L) // two len-2 runs
      ).toDF("k", "i")
      val out = TimeSeries.longestRun(df, "k", "i").orderBy("k").collect()
      assert(out(0) === Row(7L, 6L, 3L, 3L, 1L))
      assert(out(1) === Row(8L, 4L, 2L, 2L, 4L)) // earliest of the ties
    }

    it("treats a lone index as a run of one") {
      val df = Seq((1L, 42L)).toDF("k", "i")
      val out = TimeSeries.longestRun(df, "k", "i").collect()
      assert(out(0) === Row(1L, 1L, 1L, 1L, 42L))
    }
  }

  describe("GlobalOrder.withRunningTotalsPerKey") {
    it("matches two single-column stitches, including cross-partition carries") {
      val rows = (1L to 500L).map(i =>
        (i % 3, i, i % 7, (i * 31) % 11)) // 3 keys interleaved
      val df = rows.toDF("k", "t", "v1", "v2").repartition(7)
      val fused = GlobalOrder.withRunningTotalsPerKey(df, "k", "t",
          Seq("v1", "v2"), Seq.empty, outs = Seq("r1", "r2"))
        .select("k", "t", "r1", "r2").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val s1 = GlobalOrder.withRunningTotalPerKey(df, "k", "t", "v1",
          Seq.empty, out = "r1")
        .select("k", "t", "r1").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val s2 = GlobalOrder.withRunningTotalPerKey(df, "k", "t", "v2",
          Seq.empty, out = "r2")
        .select("k", "t", "r2").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(fused.size === 500)
      fused.foreach { case (kt, (a, b)) =>
        assert(a === s1(kt) && b === s2(kt))
      }
    }
  }

  describe("Stats.kendallTau") {
    it("matches hand-computed C/D/T counts with ties") {
      // values over idx 1..4: [10,20,20,5] -> C=2 D=3 T=1,
      // tau = -1/sqrt(30)
      val df = Seq((0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 20L),
        (0L, 4L, 5L)).toDF("g", "i", "v")
      val out = Stats.kendallTau(df, "g", "i", "v").collect()
      assert(out(0).getLong(1) === 6L && out(0).getLong(2) === 2L &&
        out(0).getLong(3) === 3L && out(0).getLong(4) === 1L)
      assert(math.abs(out(0).getDouble(5) - (-1.0 / math.sqrt(30.0)))
        < 1e-15)
    }

    it("is 1 for a strictly increasing series, null for all-tied") {
      val df = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
        (1L, 1L, 9L), (1L, 2L, 9L)).toDF("g", "i", "v")
      val out = Stats.kendallTau(df, "g", "i", "v").orderBy("g").collect()
      assert(out(0).getDouble(5) === 1.0)
      assert(out(1).isNullAt(5)) // C+D = 0
    }
  }

  describe("Stats.wilsonRate") {
    it("matches the closed form and is exact at the p=0 / p=1 edges") {
      val df = Seq(
        (0L, false), (0L, false), (0L, false), (0L, true), // k=1, n=4
        (1L, false), (1L, false), // k=0 -> wilson_lo exactly 0
        (2L, true), (2L, true), (2L, true) // k=n -> wilson_hi exactly 1
      ).toDF("g", "hit")
      val out = Stats.wilsonRate(df, "g", col("hit")).orderBy("g")
        .collect()
      val (n, p) = (4.0, 0.25)
      val half = 2.0 * math.sqrt((p * (1.0 - p) + 1.0 / n) / n)
      val denom = 1.0 + 4.0 / n
      assert(out(0).getLong(1) === 4L && out(0).getLong(2) === 1L)
      assert(out(0).getDouble(4) === (p + 2.0 / n - half) / denom)
      assert(out(0).getDouble(5) === (p + 2.0 / n + half) / denom)
      assert(out(1).getDouble(4) === 0.0) // sqrt(1/n²) = 1/n cancels
      assert(out(2).getDouble(5) === 1.0)
      assert(out(1).getDouble(5) > 0.0 && out(2).getDouble(4) < 1.0)
    }
  }

  describe("Graph.localClustering") {
    it("credits each triangle to its three corners (triangle + pendant)") {
      // triangle {1,2,3} plus pendant edge 3-4
      val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
        .toDF("src", "dst")
      val out = Graph.localClustering(e).orderBy("node").collect()
      assert(out(0) === Row(1L, 2L, 1L, 1.0))
      assert(out(1) === Row(2L, 2L, 1L, 1.0))
      assert(out(2) === Row(3L, 3L, 1L, 1.0 / 3.0))
      assert(out(3).getLong(1) === 1L && out(3).getLong(2) === 0L)
      assert(out(3).isNullAt(3)) // deg < 2: no wedge possible
    }

    it("handles duplicate/reverse edges and zero triangles") {
      val e = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
      val out = Graph.localClustering(e).orderBy("node").collect()
      assert(out.map(_.getLong(2)).sum === 0L) // path graph: no triangle
      assert(out(1).getLong(1) === 2L) // node 2 deg 2, dup edge collapsed
      assert(out(1).getDouble(3) === 0.0)
    }
  }

  describe("Dedup.sortedNeighborhoodPairs") {
    it("pairs each record with its next w sort neighbors, once each") {
      // sort order by key: 20(a) < 30(b) < 10(c); window 1 ->
      // rank pairs (20,30), (30,10) -> canonical (20,30), (10,30)
      val df = Seq((10L, "c", "C10"), (20L, "a", "A20"),
        (30L, "b", "B30")).toDF("id", "k", "c")
      val out = Dedup.sortedNeighborhoodPairs(df, "id", col("k"),
          col("c"), 1)
        .orderBy("doc_a", "doc_b").collect()
      assert(out.length === 2)
      // (30,10) flips to (10,30) and the cmp strings flip with it
      assert(out(0) === Row(10L, 30L, "C10", "B30"))
      assert(out(1) === Row(20L, 30L, "A20", "B30"))
    }

    it("emits exactly n·w - w(w+1)/2 candidate pairs, no duplicates") {
      val df = (1L to 10L).map(i => (i, f"k$i%02d", s"c$i"))
        .toDF("id", "k", "c")
      val out = Dedup.sortedNeighborhoodPairs(df, "id", col("k"),
        col("c"), 3).collect()
      assert(out.length === 10 * 3 - 3 * 4 / 2) // 24: tail truncation
      val keys = out.map(r => (r.getLong(0), r.getLong(1)))
      assert(keys.distinct.length === keys.length)
    }
  }
}
