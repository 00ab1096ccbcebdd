package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}

/** Sources (SURVEY.md §2.1).
  *
  * The reference ingests every CSV with `all_varchar=True` (reference
  * `models/corporate/stg_corporate.sql:40-45`) so raw columns are always text,
  * and — for the hospital vertical — additionally normalizes messy header
  * names (`models/hospital/stg_hospital.sql:25-31`, documented rules at
  * `stg_hospital.sql:6-11`). Both behaviors are reproduced here on top of
  * Spark's CSV source, which is distributed and predicate/projection-pruned
  * by Catalyst out of the box: at 100 TB the CSV scan splits by file and by
  * range within splittable files, so no custom reader work is needed.
  */
object Readers {

  /** S1 — all-varchar CSV scan. Spark's CSV reader already defaults every
    * column to StringType when schema inference is off, which is exactly
    * DuckDB's `all_varchar=True` semantics; a header pass resolves names at
    * runtime (same late-binding as the reference — SURVEY.md §4).
    */
  def csvAllVarchar(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"") // RFC-4180 doubled-quote escaping, like DuckDB
      .option("inferSchema", "false")
      .csv(path)

  /** S2 — DuckDB `normalize_names=True` column-name rule: trim, lowercase,
    * every run of non-alphanumerics becomes a single underscore, and leading/
    * trailing underscores are stripped (reference behavior observed at
    * `stg_hospital.sql:6-11`: ' Total Discharges ' -> total_discharges).
    * A name left empty or starting with a digit is prefixed with '_' so it
    * stays a valid identifier (DuckDB does the same).
    */
  def normalizeName(name: String): String = {
    val base = name.trim.toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    if (base.isEmpty || base.head.isDigit) "_" + base else base
  }

  /** Rename all columns with [[normalizeName]], de-duplicating collisions the
    * way DuckDB does (second occurrence gets a numeric suffix). Suffixed
    * names are checked against EVERY name assigned so far — a bare
    * counter would let the generated `a_1` collide with a natural `a_1`
    * column later in the header, yielding a DataFrame with duplicate
    * columns that fails far away with AMBIGUOUS_REFERENCE.
    */
  def normalizeColumns(df: DataFrame): DataFrame = {
    val used = scala.collection.mutable.Set.empty[String]
    val renamed = df.columns.map { c =>
      val n = normalizeName(c)
      val name =
        if (!used.contains(n)) n
        else {
          var k = 1
          while (used.contains(s"${n}_$k")) k += 1
          s"${n}_$k"
        }
      used += name
      name
    }
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** S2 composed: all-varchar CSV with normalized header names. */
  def csvNormalized(spark: SparkSession, path: String): DataFrame =
    normalizeColumns(csvAllVarchar(spark, path))

  /** S6-analog — parquet table scan from a warehouse/testdata directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table scan, normalized to the engine-wide contract that
    * `ts` is a NANOSECOND epoch long (consumers convert with
    * `timestamp_micros(ts div 1000)` where they need a timestamp).
    *
    * The physical column has shipped as both TIMESTAMP(NANOS) — which
    * Spark cannot represent natively; the session-wide legacy conf reads
    * it as a nanos long — and TIMESTAMP(MICROS), which reads as
    * TIMESTAMP_NTZ (or TIMESTAMP). This helper absorbs the difference so
    * every consumer sees the same nanos-long column whichever vintage of
    * the table it scans: the micros instant is exact under the UTC
    * session timezone, and ×1000 stays far inside Long range
    * (~1.7e18 for current epochs).
    *
    * The conf is intentionally set here and NOT restored: it is a global
    * session mutation, and scattering per-query set calls (the previous
    * shape) made later parquet timestamp reads order-dependent. The
    * invariant that keeps the global setting safe is that EVERY events
    * consumer in this engine goes through this helper and wants the
    * nanos-long representation — no query in the suite reads a
    * nanos-timestamp parquet column expecting TimestampType. Keep it that
    * way: new events readers must call this, not re-set the conf.
    */
  def eventsNanos(spark: SparkSession, dir: String): DataFrame = {
    enableNanosAsLong(spark)
    toNanosLong(table(spark, dir, "events"), "ts")
  }

  /** Normalize an epoch column to the nanos-long representation, whatever
    * physical type it was read as. `withColumn` replaces in place, so the
    * column order callers pattern-match on is preserved.
    */
  def toNanosLong(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol,
          unix_micros(col(tsCol).cast("timestamp")) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"$tsCol has unsupported epoch type $other")
    }

  /** Streaming events readers (which must pass an explicit schema) call
    * this before `readStream` — same invariant as [[eventsNanos]].
    */
  def enableNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** The type Spark reads this directory's events.ts as — LongType for the
    * TIMESTAMP(NANOS) vintage (under nanosAsLong), Timestamp(NTZ)Type for
    * the TIMESTAMP(MICROS) one. Streaming readers need it to declare a
    * schema that matches the files; one footer read, no data scan.
    */
  def eventsNanosPhysicalTsType(spark: SparkSession, dir: String)
      : org.apache.spark.sql.types.DataType = {
    enableNanosAsLong(spark)
    table(spark, dir, "events").schema("ts").dataType
  }

  /** Schema-evolution scan: one DataFrame over parquet written under
    * EVOLVING schemas (a column added mid-corpus), reconciled by column
    * name — rows from pre-evolution files null-fill the new columns.
    * `mergeSchema` reads every file's footer at planning time, which is
    * the right trade for an ingest/reconcile step; a steady-state 100 TB
    * table should instead pin the superset schema explicitly (or keep it
    * in a catalog) so planning stays O(1) in file count.
    */
  def parquetMerged(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** JSONL (newline-delimited JSON) scan with a caller-supplied schema.
    * Schema inference is deliberately not offered: it costs an extra full
    * pass over the files, which at 100 TB doubles the scan bill — a
    * training-data pipeline always knows its record schema.
    */
  def jsonl(spark: SparkSession, path: String, ddlSchema: String): DataFrame =
    spark.read.schema(ddlSchema).json(path)
}
