package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized property coverage for the round-15 continuation algebra:
  * the floor-div offset identity every trainer's update leans on, the
  * winnowing guarantee on random corpora with planted overlaps, the
  * k-means emptied-cluster edge, and KN normalization on random text.
  */
class Round15cPropertySuite extends SparkSpec {
  import spark.implicits._

  describe("the positive-offset floor-div identity") {
    it("(s + n·F) div n − F == floorDiv(s, n) for random signed sums") {
      // the contract every trainer update satisfies BY CONSTRUCTION:
      // s is a sum of n values each in [−F, F], so s + n·F >= 0 and
      // truncating division is floor division
      val rnd = new scala.util.Random(151)
      val f = 1000000L
      val cases = Seq.fill(300) {
        val n = rnd.nextInt(50).toLong + 1
        val s = (1L to n).map(_ => rnd.nextLong() % f).sum
        (s, n)
      }
      val got = cases.toDF("s", "n")
        .select((expr("(s + n * 1000000L) div n") - f).as("v"))
        .as[Long].collect().toSeq
      val want = cases.map { case (s, n) => Math.floorDiv(s, n) }
      assert(got == want)
    }
  }

  describe("winnowing guarantee, randomized") {
    it("every planted >= w+n-1-gram overlap yields a shared fingerprint") {
      val rnd = new scala.util.Random(152)
      val (n, w) = (3, 4)
      for (trial <- 1 to 10) {
        val span = n + w - 1 + rnd.nextInt(4) // >= guarantee threshold
        val shared = Seq.fill(span + n - 1)(s"s${rnd.nextInt(1000)}x")
          .mkString(" ")
        def noise(len: Int, tag: String) =
          Seq.fill(len)(s"$tag${rnd.nextInt(100000)}").mkString(" ")
        val docs = Seq(
          (1L, s"${noise(rnd.nextInt(20), "a")} $shared ${noise(rnd.nextInt(20), "b")}"),
          (2L, s"${noise(rnd.nextInt(20), "c")} $shared ${noise(rnd.nextInt(20), "d")}"))
          .toDF("doc_id", "text")
        val pairs = Winnow.overlapPairs(docs, n, w, 1, 50)
          .as[(Long, Long, Long)].collect()
        assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
          s"trial $trial: guarantee missed (span $span grams)")
      }
    }
  }

  describe("KMeans emptied-cluster edge") {
    it("keeps the previous grid when duplicate seeds empty a cluster") {
      // the 4 lowest vec_ids share ONE vector: all four centroids
      // initialize identically, every point ties to cid 0, clusters
      // 1-3 receive no members and must keep their (identical) grid
      val base = Seq.fill(8)(0.25f)
      val far = Seq.tabulate(8)(i => if (i == 0) 5.0f else 0.0f)
      val emb = ((0L to 3L).map(id => (id, base)) ++
        (4L to 40L).map(id => (id, far))).toDF("vec_id", "embedding")
      val cents = KMeans.lloyd(emb, 4, 2)
      // cid 0 moved toward the data; cids 1-3 kept the seed grid
      val seed = base.map(x => math.floor(x * 1e6 + 0.5).toLong)
      for (cid <- 1 to 3)
        assert(cents(cid)._2 == seed, s"cluster $cid should keep its grid")
      assert(cents(0)._2 != seed, "cluster 0 should have moved")
      // and the census accounts for every vector
      val census = KMeans.assign(emb, cents)
        .groupBy("cid").count().as[(Long, Long)].collect().toMap
      assert(census.values.sum == 41L)
    }
  }

  describe("KN normalization, randomized corpora") {
    it("sum over the full vocab of num(v,.) equals den(v) exactly") {
      val rnd = new scala.util.Random(153)
      val vocab = Vector("a", "b", "cc", "d1", "e", "f2", "g", "h")
      val docs = (1L to 12L).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }.toDF("doc_id", "text")
      val rows = LangModel.knBigram(docs, 1L)
        .as[(String, String, Long, Long, Long)].collect()
      val n1r = rows.groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
      val n1p = rows.groupBy(_._1).map { case (a, v) => a -> v.length.toLong }
      val npp = rows.length.toLong
      for ((v, vRows) <- rows.groupBy(_._1)) {
        val den = vRows.head._5
        val seenNum = vRows.map(_._4).sum
        val seenN1r = vRows.map(r => n1r(r._2)).sum
        val unseenNum = 3 * n1p(v) * (npp - seenN1r)
        assert(seenNum + unseenNum == den,
          s"normalization broke for context '$v'")
      }
    }
  }
}
