package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.engine.{Pipeline, Tenancy}

/** End-to-end upload->transform throughput vs the reference's only stated
  * performance numbers (BASELINE.md: ~30-60s for <10MB, ~1-3min for
  * 10-100MB, single-process + global upload mutex). Generates a synthetic
  * corporate payroll CSV of the requested size, runs the full ingest path
  * (auth -> gate -> raw archive -> stg -> fct, FULL materialization), and
  * prints one JSON line. Usage: runMain graft.IngestBench [sizeMb]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sizeMb = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val storage = Files.createTempDirectory("graft_ingest_bench")
    val csv = storage.resolve("src.csv")
    val w = Files.newBufferedWriter(csv)
    w.write("Row ID,Year,Department Title,Job Class Title,Employment Type," +
      "Base Pay,Overtime Pay,Longevity Bonus Pay,Average Benefit Cost\n")
    val targetBytes = sizeMb.toLong * 1024 * 1024
    var written = 0L
    var i = 0
    while (written < targetBytes) {
      val row = s"""$i,2013,Department ${i % 40},Job Title ${i % 500},FT,""" +
        s""""$$${60000 + i % 90000}.${i % 100}%02d","$$${i % 9000}.00",""" +
        s""""$$${i % 2000}.00","$$${10000 + i % 15000}.00"\n"""
      w.write(row)
      written += row.length
      i += 1
    }
    w.close()

    val users = Seq(Tenancy.Tenant("Bench_Tenant",
      Tenancy.sha256Hex("pw"), "corporate"))
    // warm the JVM/codegen on a tiny ingest first (the reference's numbers
    // are steady-state service numbers, not cold-JVM numbers)
    val warmCsv = storage.resolve("warm.csv")
    Files.write(warmCsv, Files.readAllLines(csv).subList(0, 100)
      .stream().reduce("", (a: String, b: String) => a + b + "\n")
      .getBytes("UTF-8"))
    Pipeline.ingest(spark, storage, users, "Bench_Tenant", "pw",
      "corporate_warm.csv", warmCsv)

    val t0 = System.nanoTime()
    val built = Pipeline.ingest(spark, storage, users, "Bench_Tenant", "pw",
      "corporate_bench.csv", csv)
    val nRows = built("corporate.fct_corporate").count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"ingest_${sizeMb}mb","value":$sec,"unit":"sec","rows":$nRows,"reference_claim_sec":"30-60 (<10MB) / 60-180 (10-100MB)"}""")
    spark.stop()
  }
}
