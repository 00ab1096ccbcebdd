package graft.engine

import java.nio.file.Files
import org.apache.spark.sql.functions.lit
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/** Facade tests covering all three industries end-to-end through the
  * service API (upload -> report/export/list), i.e. the reference's four
  * Flight entry points.
  */
class ServiceSuite extends SparkSpec {

  private val frozen = lit("2020-01-01 00:00:00").cast("timestamp")
  private val storage = Files.createTempDirectory("graft_svc")
  private val users = Tenancy.parseUsersJson(
    """{
      |  "LA": {"password": "%s", "industry_type": "corporate"},
      |  "NJ": {"password": "%s", "industry_type": "education"},
      |  "US": {"password": "%s", "industry_type": "hospital"}
      |}""".stripMargin.format(
      Tenancy.sha256Hex("p1"), Tenancy.sha256Hex("p2"), Tenancy.sha256Hex("p3")))

  private def svc = new GraftService(SparkSpec.session, storage, users, frozen)

  private def writeCsv(name: String, content: String) = {
    val p = storage.resolve(name)
    Files.write(p, content.stripMargin.getBytes("UTF-8"))
    p
  }

  it("serves corporate upload -> report -> export -> list") {
    val csv = writeCsv("c.csv",
      """Row ID,Year,Department Title,Job Class Title,Employment Type,Base Pay,Overtime Pay,Longevity Bonus Pay,Average Benefit Cost
        |1,2013,Police,Officer,FT,"$10,000.00",$500.00,,$100.00
        |2,2013,Police,Officer,FT,"$20,000.00",,,
        |3,2013,Fire,Chief,FT,"$30,000.00","$10,000.00",,
        |""")
    svc.upload("LA", "p1", "corporate_a.csv", csv)
    val report = svc.budgetReport("LA", "p1", "corporate_a.csv", saveCopy = true)
      .collect()
    assert(report.map(_.getAs[String]("job_title")).toSeq == Seq("Chief", "Officer"))
    assert(report(1).getAs[Long]("total_employee") == 2L)
    val export = svc.fullExport("LA", "p1", "corporate_a.csv").collect()
    assert(export.length == 3)
    assert(export.head.getAs[String]("job_title") == "Chief")
    val (raw, clean) = svc.listFiles("LA", "p1")
    assert(raw == Seq("corporate_a.csv"))
    assert(clean == Seq("LA_corporate_corporate_a"))
    // S8 archive landed as a single CSV part in Downloads
    val dl = storage.resolve("LA/Downloads/corporate_a_summary")
    assert(Files.list(dl).iterator().asScala.exists(_.toString.endsWith(".csv")))
  }

  it("serves education with fte/seniority semantics intact") {
    val csv = writeCsv("e.csv",
      """last_name,first_name,district,school,primary_job,fte,experience_total,certificate,salary
        |Smith,Ann,Newark,Lincoln,Teacher,,17,Std,64000
        |Lee,Bo,Newark,Lincoln,Aide,0.5,3,Std,30000
        |""")
    svc.upload("NJ", "p2", "education_b.csv", csv)
    val export = svc.fullExport("NJ", "p2", "education_b.csv").collect()
    val smith = export.find(_.getAs[String]("job_title") == "Teacher").get
    assert(smith.getAs[String]("employment_status") == "Full Time") // fte null -> 1.0
    assert(smith.getAs[Double]("total_amount") == 64000 * 1.05)     // 17y bonus
  }

  it("serves hospital through header normalization") {
    val csv = writeCsv("h.csv",
      """Provider Name,Provider City,Provider State,DRG Definition, Total Discharges , Average Total Payments ,Average Medicare Payments
        |General,LA,CA,DRG X,10,1000.5,800.0
        |Mercy,SF,CA,DRG Y,5,2000.0,1500.0
        |""")
    svc.upload("US", "p3", "hospital_c.csv", csv)
    val report = svc.budgetReport("US", "p3", "hospital_c.csv").collect()
    assert(report.head.getAs[String]("job_title") == "DRG X") // 10*1000.5 > 5*2000
    assert(report.head.getAs[Double]("total_budget") == 10005.0)
  }

  it("runs tenant uploads concurrently (no global mutex — M6 dropped)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val csvA = writeCsv("conc_a.csv",
      """Row ID,Year,Department Title,Job Class Title,Employment Type,Base Pay,Overtime Pay,Longevity Bonus Pay,Average Benefit Cost
        |1,2013,D,JobA,FT,$100.00,,,
        |""")
    val csvB = writeCsv("conc_b.csv",
      """last_name,first_name,district,school,primary_job,fte,experience_total,certificate,salary
        |Roe,Jay,Camden,North,JobB,1.0,2,Std,40000
        |""")
    val fa = Future(svc.upload("LA", "p1", "corporate_conc.csv", csvA))
    val fb = Future(svc.upload("NJ", "p2", "education_conc.csv", csvB))
    val (ra, rb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(ra("corporate.fct_corporate").count() == 1)
    assert(rb("education.fct_education").count() == 1)
    // each landed in its own warehouse, untouched by the other
    assert(svc.budgetReport("LA", "p1", "corporate_conc.csv")
      .collect()(0).getAs[String]("job_title") == "JobA")
    assert(svc.budgetReport("NJ", "p2", "education_conc.csv")
      .collect()(0).getAs[String]("job_title") == "JobB")
  }

  it("round-trips the Arrow wire format (S4 upload / S7 result stream)") {
    import org.apache.spark.sql.graftshim.ArrowBridge
    val spark = SparkSpec.session
    import spark.implicits._
    // pure bridge round-trip preserves data
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
    val back = ArrowBridge.fromArrowBatches(spark, ArrowBridge.toArrowBatches(df))
    assert(back.orderBy("k").collect().map(_.toSeq).toSeq ==
      df.orderBy("k").collect().map(_.toSeq).toSeq)
    // empty round-trip keeps the schema (at least one empty batch ships)
    val empty = ArrowBridge.fromArrowBatches(spark,
      ArrowBridge.toArrowBatches(df.limit(0)))
    assert(empty.count() == 0 && empty.schema == df.schema)
    // maxRecordsPerBatch caps records, not bytes: 5 rows / cap 2 -> 3 batches
    val five = spark.range(5).coalesce(1).toDF("k")
    assert(ArrowBridge.toArrowBatches(five, maxRecordsPerBatch = 2).length == 3)

    // service: upload via Arrow batches, read the report back as Arrow
    val raw = Seq(
      ("1", "2013", "Ops", "Analyst", "FT", "$1,000.00", "", "", ""),
      ("2", "2013", "Ops", "Analyst", "FT", "$2,000.00", "", "", ""))
      .toDF("Row ID", "Year", "Department Title", "Job Class Title",
        "Employment Type", "Base Pay", "Overtime Pay", "Longevity Bonus Pay",
        "Average Benefit Cost")
    svc.uploadArrow("LA", "p1", "corporate_arrow.csv",
      ArrowBridge.toArrowBatches(raw))
    val report = ArrowBridge.fromArrowBatches(spark,
      svc.budgetReportArrow("LA", "p1", "corporate_arrow.csv"))
    val row = report.collect()(0)
    assert(row.getAs[String]("job_title") == "Analyst")
    assert(row.getAs[Long]("total_employee") == 2L)
    assert(row.getAs[Double]("total_budget") == 3000.0)
  }

  it("streams Arrow batches lazily for full exports (bounded driver memory)") {
    import org.apache.spark.sql.graftshim.ArrowBridge
    val spark = SparkSpec.session
    // 4 partitions, batch cap 10 -> every partition yields multiple batches;
    // the iterator must deliver the same bytes the collecting path does
    val df = spark.range(100).repartition(4).toDF("k")
    val streamed = ArrowBridge.toArrowBatchIterator(df, maxRecordsPerBatch = 10)
    val back = ArrowBridge.fromArrowBatches(spark, streamed.toArray)
    assert(back.agg(org.apache.spark.sql.functions.sum("k")).collect()(0)
      .getLong(0) == 4950L)
    assert(back.count() == 100)
    // zero-row export still ships a schema-bearing batch
    val empty = ArrowBridge.toArrowBatchIterator(df.limit(0)).toArray
    assert(empty.length == 1)
    assert(ArrowBridge.fromArrowBatches(spark, empty).schema == df.schema)
    // laziness: building the iterator must not materialize the batches —
    // pulling the head leaves the rest of the stream unconsumed
    val it = ArrowBridge.toArrowBatchIterator(df, maxRecordsPerBatch = 10)
    assert(it.next().nonEmpty && it.hasNext)
  }

  it("serves the four entry points over a real socket (HTTP Arrow binding)") {
    import java.io.{DataInputStream, DataOutputStream, EOFException}
    import java.net.{HttpURLConnection, URI}
    import org.apache.spark.sql.graftshim.ArrowBridge
    val spark = SparkSpec.session
    import spark.implicits._

    val http = new GraftHttpServer(svc)
    val port = http.start()
    def conn(path: String, method: String,
             auth: (String, String) = ("LA", "p1")): HttpURLConnection = {
      val c = new URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      c.setRequestMethod(method)
      c.setRequestProperty("X-Graft-Client", auth._1)
      c.setRequestProperty("X-Graft-Password", auth._2)
      c
    }
    def readFrames(in: java.io.InputStream): Array[Array[Byte]] = {
      val d = new DataInputStream(in)
      val out = Array.newBuilder[Array[Byte]]
      try {
        while (true) {
          val buf = new Array[Byte](d.readInt())
          d.readFully(buf); out += buf
        }
      } catch { case _: EOFException => () }
      out.result()
    }
    try {
      // do_put: upload Arrow batches over the wire
      val raw = Seq(
        ("1", "2013", "Ops", "Analyst", "FT", "$1,500.00", "", "", ""),
        ("2", "2013", "Ops", "Analyst", "FT", "$2,500.00", "", "", ""))
        .toDF("Row ID", "Year", "Department Title", "Job Class Title",
          "Employment Type", "Base Pay", "Overtime Pay", "Longevity Bonus Pay",
          "Average Benefit Cost")
      val put = conn("/files/corporate_http.csv", "PUT")
      put.setDoOutput(true)
      val body = new DataOutputStream(put.getOutputStream)
      ArrowBridge.toArrowBatches(raw).foreach { b =>
        body.writeInt(b.length); body.write(b)
      }
      body.close()
      assert(put.getResponseCode == 200)

      // do_get get_budget_report: Arrow batches back over the wire
      val rep = conn("/files/corporate_http.csv/report", "GET")
      val report = ArrowBridge.fromArrowBatches(
        spark, readFrames(rep.getInputStream))
      val row = report.collect()(0)
      assert(row.getAs[String]("job_title") == "Analyst")
      assert(row.getAs[Double]("total_budget") == 4000.0)

      // do_get get_full_clean: streamed (chunked) full export
      val exp = conn("/files/corporate_http.csv/export", "GET")
      val export = ArrowBridge.fromArrowBatches(
        spark, readFrames(exp.getInputStream))
      assert(export.count() == 2)

      // do_action list_files
      val ls = conn("/files", "GET")
      val listing = new String(ls.getInputStream.readAllBytes(), "UTF-8")
      assert(listing.contains("raw/corporate_http.csv"))

      // uniform auth failure over the wire
      val bad = conn("/files", "GET", auth = ("LA", "wrong"))
      assert(bad.getResponseCode == 401)
      val missing = conn("/files/nope.csv/report", "GET")
      assert(missing.getResponseCode == 500 || missing.getResponseCode == 400)
    } finally http.stop()
  }

  it("refuses cross-tenant access") {
    assertThrows[IllegalArgumentException](
      svc.budgetReport("LA", "wrong", "corporate_a.csv"))
  }

  it("auth failures are indistinguishable (no client-id enumeration)") {
    val badPw = intercept[IllegalArgumentException](
      svc.listFiles("LA", "wrong"))
    val badId = intercept[IllegalArgumentException](
      svc.listFiles("NOBODY", "p1"))
    assert(badPw.getMessage == badId.getMessage)
    assert(badPw.getMessage == "AUTHENTICATION_FAILED")
  }

  it("listFiles hides scratch and metadata entries") {
    Files.createDirectories(storage.resolve("LA/Clean/.wh.tmp-abc"))
    Files.createDirectories(storage.resolve("LA/Clean/_spark_metadata"))
    val (_, clean) = svc.listFiles("LA", "p1")
    assert(!clean.exists(n => n.startsWith(".") || n.startsWith("_")))
  }

}
