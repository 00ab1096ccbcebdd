package graft.engine

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AuditsCompactSuite extends SparkSpec {
  import spark.implicits._

  describe("Audits") {
    val df = Seq(
      ("Officer", 100.0, "FT"),
      ("Officer", -5.0, "FT"),   // negative amount
      (null, 50.0, "XX"),        // null job, bad type
      ("Chief", 500.0, "PT")
    ).toDF("job_title", "total_amount", "employment_type")

    it("reports every violation with counts in one pass") {
      val failures = Audits.run(df, Seq(
        Audits.NotNull("job_title"),
        Audits.Unique("job_title"),
        Audits.AcceptedValues("employment_type", Seq("FT", "PT")),
        Audits.Expression("total_amount_non_negative", col("total_amount") >= 0)))
      val byName = failures.map(f => f.audit -> f.violations).toMap
      assert(byName(Audits.NotNull("job_title").name) == 1L)
      assert(byName("unique(job_title)") == 1L) // Officer twice
      assert(byName("accepted_values(employment_type)") == 1L)
      assert(byName("total_amount_non_negative") == 1L)
    }
    it("passes clean data silently and enforce throws on dirty data") {
      val clean = Seq(("A", 1.0)).toDF("job_title", "total_amount")
      Audits.enforce(clean, Audits.contractAudits) // no throw
      assertThrows[IllegalStateException](
        Audits.enforce(df, Audits.contractAudits))
    }
    it("a failing model audit aborts materialization before the swap") {
      val wh = Files.createTempDirectory("graft_audit").resolve("w")
      val bad = Pipeline.ModelSpec("m.bad", Nil,
        (s, _) => { import s.implicits._
          Seq((null.asInstanceOf[String], 1.0)).toDF("job_title", "total_amount") },
        audits = Audits.contractAudits)
      assertThrows[IllegalStateException](
        Pipeline.materialize(spark, Seq(bad), wh))
      assert(!Files.exists(wh)) // never went live
    }
  }

  describe("Warehouse.writePartitioned") {
    it("prunes partitions at planning time for partition-column filters") {
      val dir = Files.createTempDirectory("graft_part").resolve("events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      Warehouse.writePartitioned(ev, dir.toString, "event_type")
      val q = spark.read.parquet(dir.toString)
        .filter(col("event_type") === "purchase")
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters"), scan)
      // only the purchase partition's rows are read
      assert(q.count() ==
        ev.filter(col("event_type") === "purchase").count())
      val files = q.queryExecution.executedPlan.collectLeaves().head.toString
      assert(files.contains("event_type=purchase") ||
        scan.contains("isnotnull(event_type"), files)
    }
  }

  describe("Warehouse.compact") {
    it("rewrites many small files into few, preserving data") {
      val dir = Files.createTempDirectory("graft_compact").resolve("t")
      spark.range(10000).selectExpr("id", "id * 2 as v")
        .repartition(40) // 40 tiny files
        .write.parquet(dir.toString)
      def parquetFiles = {
        val w = Files.walk(dir)
        try w.filter(_.toString.endsWith(".parquet")).count()
        finally w.close()
      }
      assert(parquetFiles >= 40)
      Warehouse.compact(spark, dir.toString)
      assert(parquetFiles <= 2)
      val after = spark.read.parquet(dir.toString)
      assert(after.count() == 10000)
      assert(after.agg(sum("v")).as[Long].collect()(0) == 10000L * 9999)
    }
  }
}
