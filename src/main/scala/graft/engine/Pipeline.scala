package graft.engine

import java.nio.file.{Files, Path}
import java.util.Comparator
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp
import graft.engine.models.{Corporate, Education, Hospital}

/** Model DAG + materialization (SURVEY.md §2.12 M1-M8), re-created
  * Spark-natively. The reference's SQLMesh layer contributes: a model
  * registry with dependencies, FULL (rebuild-from-scratch) materialization,
  * selective per-industry plans, and failure cleanup of half-built outputs.
  * Catalyst makes the rest of SQLMesh's work (parse/qualify/annotate)
  * unnecessary.
  *
  * Materialization writes parquet per model under a per-upload warehouse
  * directory; writes go to a temp dir first and atomically rename on
  * success (M8 — the reference deletes corrupt DuckDB files on failure;
  * temp+rename is the Spark-native equivalent and is also safe under
  * concurrent readers). No global upload mutex (M6): per-upload warehouse
  * paths are disjoint by construction, so Spark's scheduler can run tenant
  * uploads concurrently — the reference's process-global env-var tenancy
  * hack (SURVEY.md §7.4.7) is designed out by passing paths as arguments.
  */
object Pipeline {

  /** M1 — a named model: dependencies by model name, and a build function
    * from already-built upstream DataFrames to this model's DataFrame.
    */
  final case class ModelSpec(
      name: String,
      deps: Seq[String],
      build: (SparkSession, Map[String, DataFrame]) => DataFrame,
      audits: Seq[Audits.Audit] = Nil)

  /** The six reference models, keyed by industry. `rawPath` is a plain
    * function parameter — the Spark-native replacement for the
    * `@client_raw_path` macro variable (M4/S3). `audits` attaches
    * data-quality checks per model name, enforced pre-swap by
    * [[materialize]]. The DEFAULT is no audits, deliberately: the
    * reference validates nothing at runtime (SURVEY.md §5 — empty
    * `audits/`), and e.g. a null job_title flows through its reports, so
    * enforcing [[Audits.contractAudits]] by default would reject uploads
    * the reference accepts. Deployments that prefer safety over parity
    * pass `Map(s"$industry.fct_$industry" -> Audits.contractAudits)`.
    */
  def industryModels(industry: String, rawPath: String,
                     now: Column = current_timestamp(),
                     audits: Map[String, Seq[Audits.Audit]] = Map.empty)
  : Seq[ModelSpec] = {
    def spec(name: String, deps: Seq[String],
             build: (SparkSession, Map[String, DataFrame]) => DataFrame) =
      ModelSpec(name, deps, build, audits.getOrElse(name, Nil))
    industry match {
      case "corporate" => Seq(
        spec("corporate.stg_corporate", Nil,
          (s, _) => Corporate.stg(Readers.csvAllVarchar(s, rawPath), now)),
        spec("corporate.fct_corporate", Seq("corporate.stg_corporate"),
          (_, up) => Corporate.fct(up("corporate.stg_corporate"))))
      case "education" => Seq(
        spec("education.stg_education", Nil,
          (s, _) => Education.stg(Readers.csvAllVarchar(s, rawPath), now)),
        spec("education.fct_education", Seq("education.stg_education"),
          (_, up) => Education.fct(up("education.stg_education"))))
      case "hospital" => Seq(
        spec("hospital.stg_hospital", Nil,
          (s, _) => Hospital.stg(Readers.csvNormalized(s, rawPath), now)),
        spec("hospital.fct_hospital", Seq("hospital.stg_hospital"),
          (_, up) => Hospital.fct(up("hospital.stg_hospital"))))
      case other =>
        throw new IllegalArgumentException(s"unknown industry: $other")
    }
  }

  /** Topological order of a model selection (M3 — selective plan). */
  def topoOrder(models: Seq[ModelSpec]): Seq[ModelSpec] = {
    val byName = models.map(m => m.name -> m).toMap
    val visited = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(n: String, path: Set[String]): Unit = byName.get(n).foreach { m =>
      require(!path.contains(n), s"model dependency cycle at $n")
      if (!visited.contains(n)) {
        m.deps.foreach(visit(_, path + n))
        visited += n
      }
    }
    models.foreach(m => visit(m.name, Set.empty))
    visited.toSeq.map(byName)
  }

  /** M2+M8 — FULL materialization of a model selection into
    * `warehouse/<model_name>/` parquet dirs, built in dependency order.
    * The upload builds into a UNIQUE temp sibling (so concurrent retries
    * of the same upload cannot clobber each other's in-progress build),
    * then swaps: old warehouse renamed aside, temp renamed in, old copy
    * deleted last. Both renames are same-directory moves (atomic on POSIX
    * filesystems); a failure between them restores the old warehouse, so
    * at every point at least one complete copy exists.
    */
  def materialize(spark: SparkSession, models: Seq[ModelSpec],
                  warehouse: Path): Map[String, DataFrame] = {
    val ordered = topoOrder(models)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val name = warehouse.getFileName.toString
    // dot-prefixed scratch names: hidden from listFiles and from Spark's
    // own file discovery, so a crash mid-build never surfaces a partial
    // warehouse. Stale scratch from earlier crashed builds of the SAME
    // warehouse is swept here (a crashed rename has no other cleanup path).
    val tmp = warehouse.resolveSibling(s".$name.tmp-$tag")
    val old = warehouse.resolveSibling(s".$name.old-$tag")
    sweepStaleScratch(warehouse)
    try {
      var built = Map.empty[String, DataFrame]
      ordered.foreach { m =>
        val out = tmp.resolve(m.name).toString
        m.build(spark, built).write.mode("overwrite").parquet(out)
        // read back the materialized table so downstream models consume the
        // written parquet, not a re-computed plan (FULL semantics)
        val table = spark.read.parquet(out)
        // audits run on the written data, inside the build — a failing
        // audit aborts BEFORE the swap, so it can never go live
        Audits.enforce(table, m.audits)
        built += m.name -> table
      }
      val hadOld = Files.exists(warehouse)
      if (hadOld) Files.move(warehouse, old)
      try Files.move(tmp, warehouse)
      catch {
        case e: Throwable =>
          if (hadOld) Files.move(old, warehouse) // restore previous build
          throw e
      }
      if (hadOld) deleteRecursively(old)
      built.map { case (n, _) =>
        n -> spark.read.parquet(warehouse.resolve(n).toString)
      }
    } finally {
      deleteRecursively(tmp) // M8: no corrupt half-built leftovers
    }
  }

  /** Delete crashed builds' scratch dirs (`.{name}.tmp-*` / `.{name}.old-*`)
    * for this warehouse. Age-gated so a CONCURRENT healthy build's scratch
    * (which exists only for seconds) is never swept mid-swap.
    */
  private def sweepStaleScratch(warehouse: Path,
                                olderThanMs: Long = 60 * 60 * 1000L): Unit = {
    val parent = warehouse.getParent
    val name = warehouse.getFileName.toString
    if (parent == null || !Files.isDirectory(parent)) return
    val cutoff = System.currentTimeMillis() - olderThanMs
    val ls = Files.list(parent)
    try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          (n.startsWith(s".$name.tmp-") || n.startsWith(s".$name.old-")) &&
            Files.getLastModifiedTime(p).toMillis < cutoff
        }
        .toList.foreach(deleteRecursively)
    } finally ls.close()
  }

  /** Entry point 1 (SURVEY.md §3.1) — upload + transform, end to end:
    * authenticate, validate the filename gate, copy the CSV into the Raw
    * zone, run the industry's stg+fct models FULL into the per-upload
    * warehouse. Returns the built tables keyed by model name.
    */
  def ingest(spark: SparkSession, storageBase: Path,
             users: Seq[Tenancy.Tenant], clientId: String, password: String,
             filename: String, sourceCsv: Path,
             now: Column = current_timestamp(),
             audits: Map[String, Seq[Audits.Audit]] = Map.empty)
  : Map[String, DataFrame] = {
    val tenant = Tenancy.authenticate(users, clientId, password)
      .fold(e => throw new IllegalArgumentException(e), identity)
    Tenancy.validateFilename(tenant, filename)
      .fold(e => throw new IllegalArgumentException(e), identity)
    Tenancy.provisionStorage(storageBase, Seq(tenant))
    val raw = Tenancy.rawPath(storageBase, tenant, filename)
    Files.copy(sourceCsv, raw,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING) // S5 raw backup
    val warehouse = Tenancy.cleanDir(storageBase, tenant, filename)
    materialize(spark,
      industryModels(tenant.industryType, raw.toString, now, audits),
      warehouse)
  }

  /** M5 — fingerprint-based rebuild skip (the Spark analog of SQLMesh's
    * content-hash snapshot cache). The fingerprint covers the input file's
    * (size, mtime, sha-256) plus the model names; when unchanged since the
    * last successful build, [[ingestIfChanged]] returns the existing
    * warehouse without running any Spark job. The reference always
    * rebuilds (`include_unmodified=True`, `serve_flight.py:181`), so
    * [[ingest]] keeps FULL semantics and this is the opt-in fast path.
    */
  def inputFingerprint(source: Path, modelNames: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(modelNames.mkString(",").getBytes("UTF-8"))
    md.update(Files.size(source).toString.getBytes("UTF-8"))
    md.update(Files.readAllBytes(source))
    md.digest().map("%02x".format(_)).mkString
  }

  def ingestIfChanged(spark: SparkSession, storageBase: Path,
                      users: Seq[Tenancy.Tenant], clientId: String,
                      password: String, filename: String, sourceCsv: Path,
                      now: Column = current_timestamp()): Map[String, DataFrame] = {
    val tenant = Tenancy.authenticate(users, clientId, password)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val warehouse = Tenancy.cleanDir(storageBase, tenant, filename)
    val marker = warehouse.resolve("_fingerprint")
    val models = industryModels(tenant.industryType, "unused", now).map(_.name)
    val fp = inputFingerprint(sourceCsv, models)
    if (Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == fp) {
      models.map(n =>
        n -> spark.read.parquet(warehouse.resolve(n).toString)).toMap
    } else {
      val built = ingest(spark, storageBase, users, clientId, password,
        filename, sourceCsv, now)
      Files.write(marker, fp.getBytes("UTF-8"))
      built
    }
  }

  /** Recursive delete with the walk stream closed — the one shared copy
    * (query-side gates delete their scratch corpora through this too).
    */
  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
}
