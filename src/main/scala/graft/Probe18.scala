package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe for round-18 optimization (deleted before close). */
object Probe18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // doc stats
    docs.select(count(lit(1)), avg(length(col("text"))),
      max(length(col("text"))),
      avg(size(split(trim(col("text")), "\\s+")))).show()

    time("warmup count")(docs.count())

    time("old shinglesRaw+distinct") {
      noop(graft.ext.Dedup.shinglesRaw(docs, 3).distinct())
    }
    time("old shinglesRaw+distinct (2nd)") {
      noop(graft.ext.Dedup.shinglesRaw(docs, 3).distinct())
    }
    time("shinglesRaw alone") {
      noop(graft.ext.Dedup.shinglesRaw(docs, 3))
    }
    // in-row transform WITHOUT array_distinct
    val w = col("w")
    val m = size(w) - 2
    val tr = when(m >= 1, transform(sequence(lit(1), m),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
        element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    val base = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    time("in-row transform only") {
      noop(base.select(col("doc_id"), tr.as("sharr")))
    }
    time("in-row transform+array_distinct") {
      noop(base.select(col("doc_id"), array_distinct(tr).as("sharr")))
    }
    time("in-row transform+array_sort") {
      noop(base.select(col("doc_id"), array_sort(tr).as("sharr")))
    }
    time("shingleSets as written") {
      noop(graft.ext.Dedup.shingleSets(docs, 3))
    }
    time("shingleSets explode (new shingles)") {
      noop(graft.ext.Dedup.shingles(docs, 3))
    }
    time("explode(tr) inline, no distinct") {
      noop(base.select(col("doc_id"), explode(tr).as("shingle")))
    }
    time("explode(array_distinct(tr)) inline") {
      noop(base.select(col("doc_id"), explode(array_distinct(tr)).as("shingle")))
    }
    time("sets then explode + keep n_shingles (2 refs)") {
      val s2 = graft.ext.Dedup.shingleSets(docs, 3)
      noop(s2.select(col("doc_id"), col("n_shingles"),
        explode(col("sharr")).as("shingle")))
    }
    time("jaccardPairs(0.5)") {
      noop(graft.ext.Dedup.jaccardPairs(docs, 0.5))
    }
    time("containmentPairs(0.8)") {
      noop(graft.ext.Dedup.containmentPairs(docs, 0.8))
    }
    val plan = graft.ext.Dedup.jaccardPairs(docs, 0.5)
    plan.write.format("noop").mode("overwrite").save()
    println("[probe] jaccardPairs executed plan:\n" +
      plan.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
