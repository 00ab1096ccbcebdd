package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 randomized properties (round-14 verdict task 8): the
  * permutation and merge algebras behind the OPQ-lite and incremental
  * gram-stats operators, plus the layout-independence the round-15
  * training-sample fix claims. Oracles are independent recomputes or
  * defining mathematical properties, never the operator's own formula.
  */
class Round15PropertySuite extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1515)

  private def randomCorpus(n: Int, dim: Int) = {
    val rows = (0 until n).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * (1 + i % 7)))
    }
    rows.toDF("vec_id", "embedding")
  }

  describe("Pq.varianceBalancedPerm") {
    it("is a bijection with equal-size subspaces, beats contiguous chunking") {
      for ((dim, m) <- Seq((16, 4), (24, 8), (64, 32))) {
        val corpus = randomCorpus(80, dim)
        val perm = Pq.varianceBalancedPerm(corpus, dim, m)
        // bijection over 0 until dim
        assert(perm.sorted == (0 until dim))
        // independent variance oracle (exact arithmetic on the collected
        // corpus, same micro snapping as the operator documents)
        val data = corpus.select(col("vec_id"),
            col("embedding").cast("array<double>"))
          .as[(Long, Seq[Double])].collect().map(_._2)
        def variance(j: Int): Double = {
          val xs = data.map(v => math.floor(v(j) * 1e6 + 0.5) / 1e6)
          val mean = xs.sum / xs.length
          xs.map(x => x * x).sum / xs.length - mean * mean
        }
        val sub = dim / m
        def spread(buckets: Seq[Seq[Int]]): Double = {
          val sums = buckets.map(_.map(variance).sum)
          sums.max - sums.min
        }
        // subspace b holds perm[b*sub until (b+1)*sub] — equal sizes by
        // construction; its variance-sum spread must not exceed the
        // naive contiguous deal of the variance-sorted dims (the
        // crowding the operator exists to avoid)
        val snake = (0 until m).map(b => perm.slice(b * sub, (b + 1) * sub))
        val byVar = (0 until dim).sortBy(j => (-variance(j), j))
        val contiguous = (0 until m).map(b => byVar.slice(b * sub, (b + 1) * sub))
        assert(spread(snake) <= spread(contiguous) + 1e-9)
      }
    }

    it("is invariant under repartition (layout independence)") {
      val corpus = randomCorpus(120, 16)
      val perm = Pq.varianceBalancedPerm(corpus, 16, 4)
      for (parts <- Seq(1, 3, 7)) {
        assert(Pq.varianceBalancedPerm(corpus.repartition(parts), 16, 4)
          == perm)
      }
    }
  }

  describe("Pq.trainCodebooksLocal") {
    it("trains the identical model under any partition layout") {
      val corpus = randomCorpus(300, 16)
      val model = Pq.trainCodebooksLocal(spark, corpus, 16, 4, 4,
        maxTrainVectors = 100L)
      for (parts <- Seq(1, 5, 11)) {
        val m2 = Pq.trainCodebooksLocal(spark, corpus.repartition(parts),
          16, 4, 4, maxTrainVectors = 100L)
        assert(Pq.modelHash(m2) == Pq.modelHash(model))
      }
    }
  }

  describe("Dedup.mergeGramStats") {
    it("is associative, commutative, and equals the unsharded recompute") {
      val vocab = Vector("u", "v", "w", "x", "y", "z")
      val docs = (1L to 60L).map { id =>
        val len = 3 + rnd.nextInt(12)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val L = 3
      def census(stats: org.apache.spark.sql.DataFrame) =
        stats.orderBy("g").as[(Long, Long, Long)].collect().toSeq
      val full = census(Dedup.gramStats(docs, L))
      // random 4-way shard assignment, three different merge shapes
      val shards = (0 until 4).map(i =>
        Dedup.gramStats(docs.filter(
          pmod(graft.functions.Portable.hash60(
            concat(lit(s"sh:"), col("doc_id").cast("string"))),
            lit(4)) === i), L))
      val allAtOnce = census(Dedup.mergeGramStats(shards))
      val reversed = census(Dedup.mergeGramStats(shards.reverse))
      val pairwise = census(Dedup.mergeGramStats(Seq(
        Dedup.mergeGramStats(Seq(shards(0), shards(1))),
        Dedup.mergeGramStats(Seq(shards(2), shards(3))))))
      val nested = census(Dedup.mergeGramStats(Seq(
        Dedup.mergeGramStats(Seq(
          Dedup.mergeGramStats(Seq(shards(3), shards(0))), shards(2))),
        shards(1))))
      assert(allAtOnce == full)
      assert(reversed == full)
      assert(pairwise == full)
      assert(nested == full)
    }
  }

  describe("Pq.adcRefineKnn recall dominance") {
    it("refined recall@k >= pure-ADC recall@k on random corpora") {
      // theorem being exercised: a true neighbor in the ADC top-k is in
      // the shortlist (k <= shortlistK), and its exact rank within the
      // shortlist is <= its global exact rank, so refinement can only
      // keep or add true neighbors — never lose one
      import graft.functions.VectorFunctions.dot
      val corpus = randomCorpus(150, 16)
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("embedding"))
      val model = Pq.trainCodebooksLocal(spark, corpus, 16, 4, 4)
      val codes = Pq.encodePacked(corpus, model)
      val q = corpus.filter(col("vec_id") < 4)
      val k = 8
      val exactD = corpus.select(col("vec_id"),
          col("embedding").as("v"))
        .crossJoin(broadcast(q.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          floor((dot(col("v"), col("v")) -
            lit(2.0) * dot(col("v"), col("qv")) +
            dot(col("qv"), col("qv"))) * 1e6 + lit(0.5)).cast("long")
            .as("d"))
      val exact = graft.functions.TopKFunctions.topkPerGroup(exactD,
          Seq(col("query_id")), -col("d"), col("vec_id"), k)
        .select(col("query_id"), col("id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (g, v) => g -> v.map(_._2).toSet }
      def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
        df.select(col("query_id"), col("neighbor_id"))
          .as[(Long, Long)].collect().groupBy(_._1)
          .map { case (g, v) =>
            g -> v.map(_._2).count(exact(g).contains)
          }
      val adc = hits(Pq.adcKnnPacked(q, codes, model, k))
      val refined = hits(Pq.adcRefineKnn(q, corpus, codes, model, k, 24))
      for (g <- exact.keys)
        assert(refined.getOrElse(g, 0) >= adc.getOrElse(g, 0),
          s"query $g: refined ${refined.get(g)} < adc ${adc.get(g)}")
    }
  }

  describe("Hybrid.rrfFuse monotonicity") {
    it("improving an item's rank in one system never lowers its score") {
      val base = Seq((0L, 10L, 3L), (0L, 11L, 1L), (0L, 12L, 2L))
        .toDF("query_id", "id", "rnk")
      val other = Seq((0L, 10L, 5L), (0L, 11L, 4L), (0L, 12L, 6L))
      def score(o: Seq[(Long, Long, Long)], id: Long): Long =
        Hybrid.rrfFuse(Seq(base, o.toDF("query_id", "id", "rnk")), 60, 3)
          .filter(col("id") === id)
          .select("rrf_micro").as[Long].collect().headOption.getOrElse(0L)
      val before = score(other, 10L)
      val improved = other.map { case (q, id, r) =>
        if (id == 10L) (q, id, 1L) else (q, id, r + 1) }
      assert(score(improved, 10L) > before)
    }
  }
}
