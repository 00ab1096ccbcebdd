package graft.ext

import graft.SparkSpec
import graft.engine.Warehouse
import org.apache.spark.sql.functions._

class Round10Suite extends SparkSpec {
  import spark.implicits._

  describe("Warehouse.scd2History first-version rule") {
    it("opens the initial interval even when every tracked attr is null") {
      // key 1: all-null first version, then a value (null -> "a" opens);
      // key 2: all-null ONLY version — the history must still carry it
      val changes = Seq[(Long, Long, Option[String])](
        (1L, 10L, None), (1L, 20L, Some("a")), (1L, 30L, Some("a")),
        (2L, 5L, None)
      ).toDF("k", "ver", "attr")
      val got = Warehouse.scd2History(changes, "k", "ver", Seq("attr"))
        .select("k", "valid_from", "valid_to", "is_current")
        .as[(Long, Long, Option[Long], Boolean)].collect().sorted.toSeq
      assert(got == Seq(
        (1L, 10L, Some(20L), false), (1L, 20L, None, true),
        (2L, 5L, None, true)))
    }

    it("scd2HistoryBig matches on the all-null-first-version shape") {
      val changes = Seq[(Long, Long, Option[String])](
        (1L, 10L, None), (1L, 20L, Some("a")), (1L, 30L, Some("a")),
        (1L, 40L, None), // value -> null reopens (null-safe compare)
        (2L, 5L, None)
      ).toDF("k", "ver", "attr")
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "attr", "valid_from", "valid_to", "is_current")
          .as[(Long, Option[String], Long, Option[Long], Boolean)]
          .collect().sortBy(r => (r._1, r._3)).toSeq
      val want = norm(Scd2WindowOracle(changes, "k", "ver", Seq("attr")))
      val got = norm(Warehouse.scd2HistoryBig(changes, "k", "ver", Seq("attr")))
      assert(got == want)
      assert(want.count(r => r._1 == 1L) == 3) // 10 opens, 20 changes, 40 reopens
    }
  }

  describe("TextAnalysis.oovStats vocab hygiene") {
    it("is invariant to duplicate vocab rows") {
      val docs = Seq((1L, "aa bb cc"), (2L, "aa aa zz")).toDF("doc_id", "text")
      val vocab = Seq("aa", "bb").toDF("tok")
      val dupVocab = vocab.union(vocab).union(Seq("aa").toDF("tok"))
      def norm(v: org.apache.spark.sql.DataFrame) =
        TextAnalysis.oovStats(docs, v)
          .select("doc_id", "n_tokens", "n_oov")
          .as[(Long, Long, Long)].collect().sorted.toSeq
      val want = Seq((1L, 3L, 1L), (2L, 3L, 1L))
      assert(norm(vocab) == want)
      assert(norm(dupVocab) == want)
    }
  }

  describe("AsofJoin call-site guards") {
    val left = Seq((1L, 10L, 7L)).toDF("k", "t", "payload")
    val right = Seq((1L, 5L, 42L)).toDF("k", "rt", "v")

    it("rejects reserved __-prefixed input columns") {
      val bad = left.withColumnRenamed("payload", "__side")
      val e = intercept[IllegalArgumentException] {
        AsofJoin.leftAsof(bad, right, "k", "t", "rt", Seq("v"))
      }
      assert(e.getMessage.contains("__side"))
      intercept[IllegalArgumentException] {
        AsofJoin.leftAsofBig(left.withColumnRenamed("payload", "__f"),
          right, "k", "t", "rt", "v")
      }
    }

    it("rejects right values colliding with left columns") {
      val collide = left.withColumnRenamed("payload", "v")
      intercept[IllegalArgumentException] {
        AsofJoin.leftAsof(collide, right, "k", "t", "rt", Seq("v"))
      }
      intercept[IllegalArgumentException] {
        AsofJoin.leftAsofBig(collide, right, "k", "t", "rt", "v")
      }
      // clean inputs still pass
      val ok = AsofJoin.leftAsofBig(left, right, "k", "t", "rt", "v")
        .select("k", "t", "payload", "v")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(ok == Seq((1L, 10L, 7L, 42L)))
    }
  }

  describe("GlobalOrder output-column guards") {
    it("rejects an input that already has the out column") {
      val df = Seq((1L, 2L)).toDF("v", "rn")
      val e = intercept[IllegalArgumentException] {
        GlobalOrder.withRowNumber(df, Seq(col("v")))
      }
      assert(e.getMessage.contains("rn"))
      intercept[IllegalArgumentException] {
        GlobalOrder.withNtile(df.withColumnRenamed("rn", "bucket"), 2,
          Seq(col("v")))
      }
      // a different out name passes
      val ok = GlobalOrder.withRowNumber(df, Seq(col("v")), out = "rn2")
      assert(ok.columns.contains("rn2"))
    }
  }

  describe("RangeJoin with negative coordinates") {
    it("pointInInterval is exact across the origin") {
      val pts = spark.range(61).select((col("id") - 30L).as("p"))
      val ivs = spark.range(20).select(col("id").as("iid"),
        (col("id") * 5L - 45L).as("s"))
        .withColumn("e", col("s") + (col("iid") % 9L) + 1L)
      val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", binUs = 7L)
        .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = pts.join(ivs, col("p") >= col("s") && col("p") < col("e"))
        .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want && want.nonEmpty)
      assert(got.distinct == got)
    }

    it("intervalOverlap dedups pairs exactly once across the origin") {
      val l = spark.range(30).select(col("id").as("lid"),
        (col("id") * 7L % 100L - 50L).as("ls"))
        .withColumn("le", col("ls") + (col("lid") % 25L) + 1L)
      val r = spark.range(20).select(col("id").as("rid"),
        (col("id") * 11L % 90L - 45L).as("rs"))
        .withColumn("re", col("rs") + (col("rid") % 30L) + 1L)
      val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
        binUs = 8L)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val want = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want && want.nonEmpty)
      assert(got.distinct == got)
    }
  }
}
