package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audits — the working version of SQLMesh's
  * audit facility, which the reference declares but leaves empty
  * (`audits/` contains only .gitkeep; no model lists an `audits` key —
  * SURVEY.md §5). An audit is a named predicate over a materialized model;
  * failures carry the violating row count. All audits for a table run in
  * ONE aggregation pass (a single job computing every violation count),
  * not one scan per audit.
  */
object Audits {

  sealed trait Audit { def name: String; def violations: Column }

  /** Rows where `col` is null. */
  final case class NotNull(column: String) extends Audit {
    val name = s"not_null($column)"
    val violations: Column = count_if(col(column).isNull)
  }

  /** Duplicate key values (unique constraint). */
  final case class Unique(column: String) extends Audit {
    val name = s"unique($column)"
    // counted via distinct-vs-total in the same pass
    val violations: Column =
      (count(col(column)) - countDistinct(col(column))).cast("long")
  }

  /** Values outside the accepted set (nulls don't count — combine with
    * NotNull when both are required).
    */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Audit {
    val name = s"accepted_values($column)"
    val violations: Column = count_if(
      col(column).isNotNull &&
        !col(column).isin(values.map(_.asInstanceOf[Any]): _*))
  }

  /** Rows violating an arbitrary boolean expression. */
  final case class Expression(name: String, predicate: Column) extends Audit {
    val violations: Column = count_if(!coalesce(predicate, lit(false)))
  }

  final case class Failure(audit: String, violations: Long)

  /** Run all audits in one aggregation pass; return every failure. */
  def run(df: DataFrame, audits: Seq[Audit]): Seq[Failure] = {
    if (audits.isEmpty) return Seq.empty
    val row = df.agg(
      audits.head.violations.as("a0"),
      audits.tail.zipWithIndex.map { case (a, i) =>
        a.violations.as(s"a${i + 1}")
      }: _*).collect()(0)
    audits.zipWithIndex.flatMap { case (a, i) =>
      val v = row.getLong(i)
      if (v > 0) Some(Failure(a.name, v)) else None
    }
  }

  /** Run and THROW on any failure — wired after materialization so a bad
    * build never becomes the live warehouse (composes with Pipeline's
    * atomic swap: audit inside the build, before the rename).
    */
  def enforce(df: DataFrame, audits: Seq[Audit]): Unit = {
    val failures = run(df, audits)
    if (failures.nonEmpty)
      throw new IllegalStateException("audit failures: " +
        failures.map(f => s"${f.audit}=${f.violations}").mkString(", "))
  }

  /** The fct contract audits every industry shares (SURVEY.md §1.3). */
  def contractAudits: Seq[Audit] = Seq(
    NotNull("job_title"),
    Expression("total_amount_non_negative", col("total_amount") >= 0))

  /** Referential-integrity audit between a child FK column and a parent
    * key: counts `orphan_children` (child rows whose key has no parent —
    * broken FK) and `childless_parents` (parent rows no child
    * references — suspicious for fact/dim pairs that should join 1:n).
    * Returns two (metric, v) rows.
    *
    * Scale shape: two anti-joins, each hashing only the KEY columns
    * (projection-pruned scans); Catalyst plans broadcast anti-joins when
    * one side's key set fits, shuffle otherwise — either way no row
    * wider than a key ever moves, so the audit is safe to run on every
    * warehouse build of a 100 TB fact table.
    */
  def fkAudit(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
    // DataFrame-qualified refs: unqualified col(...) === col(...) throws
    // an ambiguous-reference AnalysisException whenever the FK and the
    // parent key share a column name (the common case for conformed keys)
    val c = child.select(col(childKey))
    val p = parent.select(col(parentKey))
    val orphans = c.join(p, c(childKey) === p(parentKey), "left_anti")
      .agg(count(lit(1)).as("v"))
      .withColumn("metric", lit("orphan_children"))
    val childless = p.join(c, p(parentKey) === c(childKey), "left_anti")
      .agg(count(lit(1)).as("v"))
      .withColumn("metric", lit("childless_parents"))
    orphans.unionByName(childless).select(col("metric"), col("v"))
  }

  /** Functional-dependency audit: does `lhs → rhs` hold? Returns one row
    * per candidate FD: distinct determinant count, how many determinants
    * map to MORE than one rhs value (violations), and the widest variant
    * set — the schema-inference / conformed-dimension sanity check
    * ("does order_id determine customer? does event_id determine user?")
    * that catches silent grain breaks before they corrupt a rollup.
    *
    * Scale shape: one (lhs, rhs) distinct (null-safe — null rhs is a
    * value), then a combinable per-lhs count and a 3-number aggregate.
    * No count(distinct) over the raw facts, no window; each candidate FD
    * is one pass over two key-width columns.
    */
  def fdViolations(df: DataFrame, fds: Seq[(String, String)]): DataFrame = {
    require(fds.nonEmpty, "fdViolations needs at least one candidate FD")
    fds.map { case (lhs, rhs) =>
      val variants = df.select(col(lhs).as("__l"), col(rhs).as("__r"))
        .distinct()
        .groupBy("__l").agg(count(lit(1)).as("__n"))
      variants.agg(
        count(lit(1)).as("n_lhs"),
        count_if(col("__n") > 1L).as("n_violating_lhs"),
        max("__n").as("max_rhs_variants"))
        .withColumn("fd", lit(s"$lhs -> $rhs"))
        .select(col("fd"), col("n_lhs"), col("n_violating_lhs"),
          col("max_rhs_variants"))
    }.reduce(_ unionByName _)
  }

  /** Benford's-law first-digit constants log10(1 + 1/d), d = 1..9,
    * computed ONCE on the driver and injected as the SAME double
    * literals into the Spark plan and the oracle SQL — a runtime
    * `log10()` call would tie the gate to two engines' libm agreeing in
    * the last ulp.
    */
  val benfordP: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Benford first-digit audit per group: for each (group, leading
    * digit of a POSITIVE integer measure), the observed count, observed
    * share, Benford's expected share, and the excess — the classic
    * fabricated-/synthetic-data screen (amounts entered by humans or
    * generators deviate; organically grown magnitudes don't). One
    * combinable groupBy over (group, digit) + one tiny co-keyed join
    * against the per-group totals (|groups| rows — broadcast); shares
    * are single IEEE divisions of exact integer counts, expectations
    * are plan literals ([[benfordP]]). Non-positive measures are
    * excluded (no leading digit). Returns (groupCol, digit, n_total, n,
    * share, benford_p, excess) sorted-ready; digits with zero
    * occurrences are absent (join the 1-9 spine if completeness
    * matters).
    */
  def benfordAudit(df: DataFrame, groupCol: String,
                   valueLong: Column): DataFrame = {
    val v = when(valueLong > 0L, valueLong)
    // leading digit via the decimal string head: engine-portable (no
    // float log10 on data), and the cast of a positive long has no
    // sign/locale surprises
    val digit = substring(v.cast("string"), 1, 1).cast("long")
    val counts = df.filter(v.isNotNull)
      .groupBy(col(groupCol), digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(groupCol)
      .agg(sum(col("n")).as("n_total"))
    val p = benfordP.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (pd, i)) => when(col("digit") === (i + 1).toLong, pd)
        .otherwise(acc)
    }
    counts.join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col("digit"), col("n_total"), col("n"),
        (col("n").cast("double") / col("n_total").cast("double"))
          .as("share"),
        p.as("benford_p"))
      .withColumn("excess", col("share") - col("benford_p"))
  }

  /** Cross-table reconciliation: does a parent table's stored total
    * equal the sum of its children? (order header vs line items, ledger
    * vs journal, rollup vs fact — THE consistency audit between any
    * summary and its detail.) Returns ONE row: parent count, exact
    * matches, mismatches beyond `toleranceCents`, parents with no child
    * rows (null child sum — counted separately, not as a zero), and the
    * largest absolute discrepancy.
    *
    * Exactness discipline: both sides are integer cents — the child's
    * per-row measure is scaled BEFORE summing, so the comparison never
    * depends on float accumulation order. Scale shape: one combinable
    * child aggregation, one co-keyed left join (both shuffle on the
    * key; AQE handles a hot parent), one global reduction — at 100 TB
    * the audit costs one pass over each table.
    */
  def reconcile(parent: DataFrame, parentKey: String, parentCents: Column,
                child: DataFrame, childKey: String, childCents: Column,
                toleranceCents: Long = 0L): DataFrame = {
    val p = parent.select(col(parentKey).as("__graft_k"),
      parentCents.as("__graft_pv"))
    val c = child.groupBy(col(childKey).as("__graft_k"))
      .agg(sum(childCents).as("__graft_cv"))
    val j = p.join(c, Seq("__graft_k"), "left")
      .select(col("__graft_pv"), col("__graft_cv"),
        abs(col("__graft_pv") - col("__graft_cv")).as("__graft_diff"))
    j.agg(
      count(lit(1)).as("n_parents"),
      count_if(col("__graft_cv").isNull).as("n_missing_child"),
      count_if(col("__graft_diff") <= toleranceCents).as("n_matched"),
      count_if(col("__graft_diff") > toleranceCents).as("n_mismatched"),
      max(col("__graft_diff")).as("max_abs_diff_cents"))
  }
}
