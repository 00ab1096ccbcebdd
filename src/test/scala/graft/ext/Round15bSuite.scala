package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 second batch: hybrid RRF fusion and the ADC shortlist+refine
  * path, each against an independent small-input oracle.
  */
class Round15bSuite extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  describe("Hybrid.rrfFuse") {
    it("matches a from-scratch RRF recompute, absent items contribute 0") {
      val rnd = new scala.util.Random(51)
      // two systems, overlapping but not identical item sets
      def ranking(seed: Int) = (0L until 3L).flatMap { q =>
        val ids = rnd.shuffle((10L to 40L).toList).take(12)
        ids.zipWithIndex.map { case (id, i) => (q, id, (i + 1).toLong) }
      }
      val a = ranking(1).toDF("query_id", "id", "rnk")
      val b = ranking(2).toDF("query_id", "id", "rnk")
      val got = Hybrid.rrfFuse(Seq(a, b), 60, 5)
        .select("query_id", "rnk", "id", "rrf_micro")
        .as[(Long, Long, Long, Long)].collect().toSet
      // independent oracle: plain Scala maps
      val aM = a.as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (q, v) => q -> v.map(r => r._2 -> r._3).toMap }
      val bM = b.as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (q, v) => q -> v.map(r => r._2 -> r._3).toMap }
      val want = (0L until 3L).flatMap { q =>
        val items = (aM(q).keySet ++ bM(q).keySet).toSeq
        val scored = items.map { id =>
          val c = aM(q).get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
            bM(q).get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L)
          (id, c)
        }.sortBy { case (id, c) => (-c, id) }.take(5)
        scored.zipWithIndex.map { case ((id, c), i) =>
          (q, (i + 1).toLong, id, c)
        }
      }.toSet
      assert(got == want)
    }
  }

  describe("Pq.adcRefineKnn") {
    it("refined top-k is the exact re-rank of the ADC shortlist") {
      import graft.functions.VectorFunctions.dot
      val model = Pq.trainCodebooksLocal(spark, embeddings, 64, 8, 4)
      val q = embeddings.filter(col("vec_id") < 3)
      val codes = Pq.encodePacked(embeddings, model)
      val sl = Pq.adcKnnPacked(q, codes, model, 15)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      val got = Pq.adcRefineKnn(q, embeddings, codes, model, 5, 15)
        .select("query_id", "rnk", "neighbor_id", "d_micro")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      // independent oracle: exact micro distances for shortlisted pairs,
      // computed driver-side from the raw vectors
      val vecs = embeddings.select(col("vec_id"),
          col("embedding").cast("array<double>"))
        .as[(Long, Seq[Double])].collect().toMap
      def dMicro(a: Seq[Double], b: Seq[Double]): Long = {
        def d(x: Seq[Double], y: Seq[Double]) =
          x.zip(y).foldLeft(0.0) { case (acc, (u, v)) => acc + u * v }
        math.floor((d(a, a) - 2.0 * d(a, b) + d(b, b)) * 1e6 + 0.5).toLong
      }
      val want = sl.toSeq.flatMap { case (qid, cands) =>
        cands.toSeq.map(c => (qid, c, dMicro(vecs(c), vecs(qid))))
          .sortBy { case (_, c, dm) => (dm, c) }.take(5).zipWithIndex
          .map { case ((qq, c, dm), i) => (qq, (i + 1).toLong, c, dm) }
      }.sorted
      assert(got == want)
    }
  }

  describe("TextAnalysis.bpeTrain") {
    it("matches a from-scratch driver BPE on a synthetic corpus") {
      val docs = Seq(
        (1L, "lower lower lowest newer newer newer wider"),
        (2L, "low low lowest newer new wide wide"),
        (3L, "lower newest newest wide new low")).toDF("doc_id", "text")
      val got = TextAnalysis.bpeTrain(docs, 5)
        .as[(Long, String, String, String, Long)].collect().toSeq
      // independent oracle: plain Scala word-type BPE with the same
      // documented variant (distinct-halves pairs only, ties by
      // (count desc, left, right))
      var types = docs.as[(Long, String)].collect()
        .flatMap(_._2.trim.split("\\s+")).filter(_.matches("^[a-z0-9]+$"))
        .groupBy(identity).map { case (word, v) =>
          word.map(_.toString).toVector -> v.length.toLong
        }.toVector
      val want = (1 to 5).map { step =>
        val census = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, cnt) <- types; Seq(a, b) <- syms.sliding(2) if a != b)
          census((a, b)) = census.getOrElse((a, b), 0L) + cnt
        val ((a, b), c) = census.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        types = types.map { case (syms, cnt) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toVector -> cnt
        }
        (step.toLong, a, b, a + b, c)
      }
      assert(got.sortBy(_._1) == want)
    }
  }

  describe("SparseSim.tfidfQueryTopK") {
    it("agrees with tfidfCosinePairs scores on query-corpus pairs") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val n = docs.count()
      val topk = SparseSim.tfidfQueryTopK(docs, n, 3, 10)
        .as[(Long, Long, Long, Long)].collect()
      assert(topk.nonEmpty)
      // the pair operator at a tiny threshold is the independent scorer:
      // every (query, id) the ranking emitted must appear there with the
      // same micro cosine (pairs are doc_a < doc_b — normalize)
      val pairs = SparseSim.tfidfCosinePairs(docs, n, 1e-6)
        .select(col("doc_a"), col("doc_b"),
          floor(col("cos") * 1e6 + lit(0.5)).cast("long").as("cm"))
        .as[(Long, Long, Long)].collect()
        .flatMap { case (a, b, cm) => Seq((a, b) -> cm, (b, a) -> cm) }
        .toMap
      topk.foreach { case (q, _, id, cm) =>
        assert(pairs.get((q, id)).contains(cm),
          s"pair ($q,$id) micro-cos mismatch: topk=$cm pairs=${pairs.get((q, id))}")
      }
      // per-query ranks are 1..k dense and ordered by (cm desc, id asc)
      topk.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        assert(sorted.map(_._2).toSeq == (1L to sorted.length))
        val keys = sorted.map(r => (-r._4, r._3)).toSeq
        assert(keys == keys.sorted)
      }
    }
  }
}
