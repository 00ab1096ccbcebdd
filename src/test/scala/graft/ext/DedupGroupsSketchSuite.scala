package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupGroupsSketchSuite extends SparkSpec {
  import spark.implicits._

  describe("DedupGroups.connectedComponents") {
    it("labels chains, cliques, and separate components correctly") {
      // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
      val pairs = Seq(
        (1L, 2L), (2L, 3L), (3L, 4L),
        (10L, 11L), (11L, 12L), (10L, 12L),
        (20L, 21L)).toDF("doc_a", "doc_b")
      val cc = DedupGroups.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
      assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
      assert(Seq(20L, 21L).forall(cc(_) == 20L))
    }
    it("empty pair set converges to an empty labeling (no NPE)") {
      val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      assert(DedupGroups.connectedComponents(empty).collect().isEmpty)
    }
    it("string ids converge via the join-based probe (no arithmetic sum)") {
      val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y"))
        .toDF("doc_a", "doc_b")
      val cc = DedupGroups.connectedComponents(pairs).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(Seq("a", "b", "c").forall(cc(_) == "a"))
      assert(Seq("x", "y").forall(cc(_) == "x"))
    }
    it("drops all but the representative of each group") {
      val docs = (1L to 6L).map(i => (i, s"text$i")).toDF("doc_id", "text")
      val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
      val kept = DedupGroups.dropNearDuplicates(docs, pairs)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 4L, 5L)) // 2,3 fold into 1; 6 into 5; 4 isolated
    }
    it("scales to the real near-dup pairs at sf0.001") {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val pairs = Dedup.jaccardPairs(docs, 0.5)
      val kept = DedupGroups.dropNearDuplicates(docs, pairs).count()
      val nPairs = pairs.count()
      assert(kept < docs.count() || nPairs == 0)
      assert(kept >= docs.count() - 2 * nPairs)
    }
  }

  describe("Sampling determinism") {
    it("split assignment is stable when the corpus grows") {
      import org.apache.spark.sql.functions.col
      val small = (1L to 100L).toDF("doc_id")
      val big = (1L to 1000L).toDF("doc_id")
      def assign(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        Sampling.splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val a = assign(small); val b = assign(big)
      assert(a.forall { case (k, v) => b(k) == v }) // old docs keep splits
      val dist = b.values.groupBy(identity).view.mapValues(_.size).toMap
      assert(dist("train") > 700 && dist("train") < 900) // ~80%
    }
    it("sampleByHash keeps the same rows on re-run and caps fractions") {
      import org.apache.spark.sql.functions.col
      val df = (1L to 2000L).toDF("doc_id")
      val s1 = Sampling.sampleByHash(df, col("doc_id"), 0.25)
        .collect().map(_.getLong(0)).toSet
      val s2 = Sampling.sampleByHash(df, col("doc_id"), 0.25)
        .collect().map(_.getLong(0)).toSet
      assert(s1 == s2)
      assert(s1.size > 400 && s1.size < 600) // ~25% of 2000
    }
  }

  describe("Sketches vs exact answers") {
    it("HLL distinct count is within the configured error bound") {
      val df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      val approx = Sketches.approxDistinct(df, "o_orderstatus", "o_custkey", 0.05)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = df.groupBy("o_orderstatus")
        .agg(countDistinct("o_custkey").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, e) =>
        assert(math.abs(approx(k) - e).toDouble / e < 0.15,
          s"$k: approx=${approx(k)} exact=$e")
      }
    }
    it("approximate percentiles are close to exact ones") {
      val df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      val approx = Sketches.approxPercentiles(
        df, "l_returnflag", "l_extendedprice", Seq(0.5), 10000)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
      val exact = df.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("m")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      exact.foreach { case (k, e) =>
        assert(math.abs(approx(k) - e) / e < 0.01,
          s"$k: approx=${approx(k)} exact=$e")
      }
    }
  }
}
