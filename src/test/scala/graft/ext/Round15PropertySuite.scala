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
}
