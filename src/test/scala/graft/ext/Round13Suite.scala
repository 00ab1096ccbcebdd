package graft.ext

import graft.SparkSpec
import graft.engine.Warehouse
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class Round13Suite extends SparkSpec {
  import spark.implicits._

  describe("Sampling.capPerGroup (window-free rewrite)") {
    it("matches the row_number window oracle under a hot group") {
      // half the rows in one group, non-unique order values so the
      // hash-tie path is exercised; strings as the group type to prove
      // the rewrite stayed type-generic
      val rows = spark.range(600).select(
        when(col("id") % 2 === 0, lit("hot"))
          .otherwise(concat(lit("g"), (col("id") % 37).cast("string")))
          .as("grp"),
        (col("id") % 50).as("ord"),
        col("id").as("uid"))
      val got = Sampling.capPerGroup(rows, "grp", "ord", 7)
        .as[(String, Long, Long)].collect().toSet
      val tie = pmod(hash(col("grp"), col("ord"), col("uid")), lit(1 << 30))
      val w = Window.partitionBy("grp").orderBy(col("ord"), tie)
      val want = rows.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 7).drop("rn")
        .as[(String, Long, Long)].collect().toSet
      assert(got == want && want.nonEmpty)
      assert(got.count(_._1 == "hot") == 7)
    }

    it("plans no Window and survives a tiny combiner bound (flush path)") {
      val rows = spark.range(500).select(
        (col("id") % 97).as("grp"), col("id").as("ord"), col("id").as("uid"))
      val capped = Sampling.capPerGroup(rows, "grp", "ord", 3,
        maxCombinerGroups = 2) // force constant flushing
      assert(!capped.queryExecution.executedPlan.toString.contains("Window"))
      val got = capped.as[(Long, Long, Long)].collect().toSet
      val tie = pmod(hash(col("grp"), col("ord"), col("uid")), lit(1 << 30))
      val w = Window.partitionBy("grp").orderBy(col("ord"), tie)
      val want = rows.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want)
    }

    it("keeps null order values first and handles n=0 and null groups") {
      val rows = Seq(
        (Option("a"), Option(5L), 1L), (Option("a"), None, 2L),
        (Option("a"), Option(1L), 3L), (None: Option[String], Option(9L), 4L),
        (None: Option[String], Option(2L), 5L)
      ).toDF("grp", "ord", "uid")
      val got = Sampling.capPerGroup(rows, "grp", "ord", 1)
        .as[(Option[String], Option[Long], Long)].collect().toSet
      // nulls-first ascending: group "a" keeps its null-ord row; the
      // null GROUP is a group of its own (window partitionBy semantics)
      assert(got == Set((Option("a"), None: Option[Long], 2L),
        (None: Option[String], Option(2L), 5L)))
      assert(Sampling.capPerGroup(rows, "grp", "ord", 0).count() == 0L)
    }
  }

  describe("Warehouse.scd2History (boundary-stitch delegation)") {
    it("matches the retired window formulation and plans no Window") {
      val changes = spark.range(300).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % 7L).as("k"),
        col("id").as("ver"),
        when(col("id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("v"), (col("id") % 3L).cast("string")))
          .as("attr"))
      val cols = Seq("k", "attr", "valid_from", "valid_to", "is_current")
      val hist = Warehouse.scd2History(changes, "k", "ver", Seq("attr"))
      assert(!hist.queryExecution.executedPlan.toString.contains("Window"))
      val got = hist.select(cols.head, cols.tail: _*)
        .as[(Long, Option[String], Long, Option[Long], Boolean)]
        .collect().toSet
      val want = Scd2WindowOracle(changes, "k", "ver", Seq("attr"))
        .select(cols.head, cols.tail: _*)
        .as[(Long, Option[String], Long, Option[Long], Boolean)]
        .collect().toSet
      assert(got == want && want.size > 10)
    }

    it("fails loud on non-long key/version columns") {
      val changes = Seq(("k1", 1L, "a")).toDF("k", "ver", "attr")
      val e = intercept[IllegalArgumentException] {
        Warehouse.scd2History(changes, "k", "ver", Seq("attr"))
      }
      assert(e.getMessage.contains("LongType"))
    }
  }

  describe("Dedup.duplicatedSpans (exact substring dedup)") {
    it("finds and merges repeated L-token spans, including within-doc") {
      // docs 1 and 2 share tokens a1..a9 (two overlapping 8-windows ->
      // one merged 9-token span); doc 3 repeats its own 8-gram twice
      // (within-doc dup); doc 4 is unique; doc 5 is shorter than L
      val a9 = (1 to 9).map(i => s"a$i").mkString(" ")
      val d3 = ((1 to 8).map(i => s"c$i") ++ Seq("x") ++
        (1 to 8).map(i => s"c$i")).mkString(" ")
      val docs = Seq(
        (1L, s"$a9 t1 t2 t3"), (2L, s"s1 s2 $a9"),
        (3L, d3), (4L, (1 to 20).map(i => s"u$i").mkString(" ")),
        (5L, "short doc")
      ).toDF("doc_id", "text")
      val got = Dedup.duplicatedSpans(docs, 8)
        .as[(Long, Long, Long, Long, Double)].collect()
        .sortBy(_._1).toList
      assert(got == List(
        (1L, 1L, 9L, 12L, 9.0 / 12),   // span a1..a9
        (2L, 1L, 9L, 11L, 9.0 / 11),
        (3L, 2L, 16L, 17L, 16.0 / 17), // both copies flagged, gap at "x"
        (4L, 0L, 0L, 20L, 0.0),
        (5L, 0L, 0L, 2L, 0.0)))
    }

    it("merges ADJACENT windows (contiguous duplicated text, one span)") {
      // a 16-token block repeated across two docs: windows at pos 1..9
      // all flagged, pos 9 = pos 1 + 8 adjacency included -> ONE span
      val b16 = (1 to 16).map(i => s"b$i").mkString(" ")
      val docs = Seq((1L, s"$b16 p q"), (2L, s"z $b16")).toDF("doc_id", "text")
      val got = Dedup.duplicatedSpans(docs, 8)
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toList
      assert(got.map(r => (r._1, r._2, r._3)) ==
        List((1L, 1L, 16L), (2L, 1L, 16L)))
    }
  }

  describe("Dedup.spanProvenance") {
    it("attributes duplicated windows to the minimum doc_id owner") {
      val a8 = (1 to 8).map(i => s"a$i").mkString(" ")
      val docs = Seq(
        (10L, s"$a8 x y"), (20L, s"p $a8"), (30L, s"q r $a8"),
        (40L, (1 to 10).map(i => s"w$i").mkString(" "))
      ).toDF("doc_id", "text")
      val got = Dedup.spanProvenance(docs, 8)
        .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toList
      assert(got == List(
        (10L, 1L, 1L, Some(1.0)), (20L, 1L, 0L, Some(0.0)),
        (30L, 1L, 0L, Some(0.0)), (40L, 0L, 0L, None)))
    }
  }

  describe("Dedup.jaccardPairsAuto") {
    it("matches the plain exact join whichever branch the probe picks") {
      val boiler = (1 to 6).map(i => s"b$i").mkString(" ")
      val docs = spark.range(60).select(col("id").as("doc_id"),
        concat(lit(boiler + " "), col("id").cast("string"),
          lit(" tail"), (col("id") % 7).cast("string")).as("text"))
      val want = Dedup.jaccardPairs(docs, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      // force EACH branch via the budget knob: both must be exact
      val viaPrefix = Dedup.jaccardPairsAuto(docs, 0.5, passBudget = 1e-9)
        .as[(Long, Long, Double)].collect().toSet
      val viaPlain = Dedup.jaccardPairsAuto(docs, 0.5, passBudget = 1e9)
        .as[(Long, Long, Double)].collect().toSet
      assert(viaPrefix == want && viaPlain == want && want.nonEmpty)
    }
  }
}
