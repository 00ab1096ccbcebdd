package graft.engine

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp
import scala.jdk.CollectionConverters._

/** The reference's four service entry points (SURVEY.md §3) as a library
  * facade — a user of the reference's Flight endpoints maps 1:1 onto these
  * calls. Transport (gRPC/Arrow Flight) is out of scope by design
  * (SURVEY.md §7.2 PR3): DataFrames returned here already cross process
  * boundaries efficiently via Spark's own Arrow paths when needed.
  *
  *  - do_put (upload+transform)        -> [[upload]]
  *  - do_get get_budget_report         -> [[budgetReport]]
  *  - do_get get_full_clean            -> [[fullExport]]
  *  - do_action list_files             -> [[listFiles]]
  */
final class GraftService(spark: SparkSession, storageBase: Path,
                         users: Seq[Tenancy.Tenant],
                         now: Column = current_timestamp()) {

  /** Upload a CSV for a tenant: authenticate, gate the filename, archive
    * the raw file, FULL-rebuild the industry's stg+fct models into the
    * per-upload warehouse (`serve_flight.py:81-230`).
    */
  def upload(clientId: String, password: String, filename: String,
             sourceCsv: Path): Map[String, DataFrame] =
    Pipeline.ingest(spark, storageBase, users, clientId, password,
      filename, sourceCsv, now)

  private def fctOf(tenant: Tenancy.Tenant, filename: String): DataFrame = {
    val warehouse = Tenancy.cleanDir(storageBase, tenant, filename)
    // contract table name is a pure function of the industry (M-contract,
    // `serve_flight.py:285-286`)
    val fct = s"${tenant.industryType}.fct_${tenant.industryType}"
    spark.read.parquet(warehouse.resolve(fct).toString)
  }

  private def auth(clientId: String, password: String): Tenancy.Tenant =
    // Uniform failure message at the service boundary: distinguishing
    // unknown-client from bad-password would enable client-id enumeration
    // (the reference emits a single AUTHENTICATION_FAILED the same way).
    Tenancy.authenticate(users, clientId, password)
      .fold(_ => throw new IllegalArgumentException("AUTHENTICATION_FAILED"),
        identity)

  /** Budget report over a prior upload (`serve_flight.py:295`), optionally
    * archived as `<base>_summary.csv` in Downloads (S8).
    */
  def budgetReport(clientId: String, password: String, filename: String,
                   saveCopy: Boolean = false): DataFrame = {
    val tenant = auth(clientId, password)
    val report = Reports.budgetReport(fctOf(tenant, filename))
    if (saveCopy) saveCsv(report, tenant, filename, "_summary")
    report
  }

  /** Full export ordered by job_title (`serve_flight.py:291`), optionally
    * archived as `<base>_full_export.csv` (S8).
    */
  def fullExport(clientId: String, password: String, filename: String,
                 saveCopy: Boolean = false): DataFrame = {
    val tenant = auth(clientId, password)
    val export = Reports.fullExport(fctOf(tenant, filename))
    if (saveCopy) saveCsv(export, tenant, filename, "_full_export")
    export
  }

  /** S4 — Arrow ingest: accept the upload as Arrow IPC record batches
    * (the reference's do_put wire format), materialize to CSV in the Raw
    * zone, and run the normal ingest path — mirroring the reference's
    * arrow -> pandas -> csv sequence (`serve_flight.py:145-151`).
    */
  def uploadArrow(clientId: String, password: String, filename: String,
                  batches: Array[Array[Byte]]): Map[String, DataFrame] = {
    // authenticate + gate BEFORE decoding anything — a bad caller must not
    // cost a Spark job or leave payload bytes on disk
    val tenant = auth(clientId, password)
    Tenancy.validateFilename(tenant, filename)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val df = org.apache.spark.sql.graftshim.ArrowBridge
      .fromArrowBatches(spark, batches)
    val tmp = Files.createTempDirectory("graft_arrow_upload")
    try {
      val csvDir = tmp.resolve("csv")
      df.coalesce(1).write.option("header", "true").csv(csvDir.toString)
      val ls = Files.list(csvDir)
      val part =
        try ls.iterator().asScala
          .find(_.getFileName.toString.endsWith(".csv"))
          .getOrElse(throw new IllegalStateException("no csv part written"))
        finally ls.close()
      upload(clientId, password, filename, part)
    } finally {
      val walk = Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
  }

  /** S7 — Arrow result stream: the budget report as Arrow IPC batches
    * (the reference's do_get wire format, `serve_flight.py:301,330`).
    */
  def budgetReportArrow(clientId: String, password: String,
                        filename: String): Array[Array[Byte]] =
    org.apache.spark.sql.graftshim.ArrowBridge
      .toArrowBatches(budgetReport(clientId, password, filename))

  /** List a tenant's raw uploads and built warehouses, sorted
    * (`serve_flight.py:337-363`, S11).
    */
  def listFiles(clientId: String, password: String): (Seq[String], Seq[String]) = {
    val tenant = auth(clientId, password)
    def ls(sub: String): Seq[String] = {
      val dir = storageBase.resolve(tenant.clientId).resolve(sub)
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val stream = Files.list(dir)
        // hide in-progress/stale scratch dirs (dot-prefixed) and Spark
        // metadata — only complete warehouses/uploads are listable
        try stream.iterator().asScala.map(_.getFileName.toString)
          .filterNot(n => n.startsWith(".") || n.startsWith("_"))
          .toSeq.sorted
        finally stream.close()
      }
    }
    (ls("Raw"), ls("Clean"))
  }

  /** S8 — single-file CSV archive into the tenant's Downloads zone. The
    * coalesce(1) is intentional: report outputs are small by construction
    * (one row per job_title); never do this on a fact table.
    */
  private def saveCsv(df: DataFrame, tenant: Tenancy.Tenant,
                      filename: String, suffix: String): Unit = {
    val base = filename.replaceAll("\\.[^.]*$", "")
    val out = storageBase.resolve(tenant.clientId).resolve("Downloads")
      .resolve(base + suffix)
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(out.toString)
  }
}
