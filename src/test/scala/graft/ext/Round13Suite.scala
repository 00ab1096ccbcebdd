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
}
