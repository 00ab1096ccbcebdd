package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support for co-located joins (SURVEY.md §7.2 PR5 /
  * "Partitioning & shuffle" in the build brief).
  *
  * Repeated large-table joins on a stable key (lineitem ⋈ orders on
  * orderkey every report run) pay a full shuffle of both sides each time.
  * Writing both tables bucketed by the join key into the warehouse makes
  * the partitioning part of the table layout: Spark's scan reports the
  * bucketing as the output partitioning, and the sort-merge join plans
  * with NO Exchange on either side — verified in WarehouseSuite by
  * asserting the physical plan is exchange-free. At 100 TB this converts
  * the dominant recurring shuffle into a one-time layout cost.
  */
object Warehouse {

  /** Write `df` as a bucketed managed table (overwrite semantics match the
    * pipeline's FULL materialization).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with the same bucket count on the join column.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** CDC changelog application (the MERGE INTO / Debezium-apply shape):
    * fold a changelog of (key, version, op ∈ I/U/D, payload…) rows into a
    * base snapshot — keys without changes keep their base row, changed
    * keys take the payload of their HIGHEST-version change, and keys
    * whose latest op is 'D' disappear (earlier D's overridden by later
    * upserts resurrect the key — the standard changelog semantics).
    *
    * Versions must be unique per key (the SCD2/q108 contract) so the
    * latest-change argmax `max_by(payload, version)` is deterministic.
    *
    * Scale shape: ONE combinable aggregate collapses the changelog to a
    * row per changed key (map-side combined — a billion-row changelog
    * with a hot key never buffers in one task), then an anti-join +
    * union against the base. The base is never shuffled wider than its
    * join; at warehouse scale, bucket both sides on `key`
    * ([[writeBucketed]]) and the anti-join plans Exchange-free too.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCol: String,
                     versionCol: String, opCol: String,
                     payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val latest = changes.groupBy(keyCol)
      .agg(max_by(struct((opCol +: payloadCols).map(col): _*),
        col(versionCol)).as("__c"))
      .select(col(keyCol) +:
        (opCol +: payloadCols).map(c => col(s"__c.$c").as(c)): _*)
    val untouched = base.select((keyCol +: payloadCols).map(col): _*)
      .join(latest.select(keyCol), Seq(keyCol), "left_anti")
    untouched.unionByName(
      latest.filter(col(opCol) =!= "D")
        .select((keyCol +: payloadCols).map(col): _*))
  }

  /** Hive-style partitioned layout: one directory per distinct value of
    * `partitionCol`. Queries filtering on the partition column prune whole
    * directories at planning time (PartitionFilters in the scan, zero I/O
    * for excluded partitions) — the first lever for time-series or
    * per-category data at 100 TB. Keep partition cardinality moderate
    * (dates, categories — never high-cardinality keys: millions of tiny
    * directories defeat the purpose).
    */
  def writePartitioned(df: DataFrame, dir: String,
                       partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(dir)

  /** M7 analog — small-file compaction. Streaming sinks and fine-grained
    * appends accumulate many small parquet files; scans then pay per-file
    * open/footer costs and lose row-group locality. Rewrites the directory
    * to ~`targetFileBytes` files via a temp+rename swap. Hive-partitioned
    * directories (from [[writePartitioned]]) are compacted PER PARTITION —
    * the layout (and its pruning) is preserved, and partition values never
    * round-trip through schema inference.
    *
    * Swap caveat: the rename-out/rename-in pair leaves a brief window
    * where the directory is absent; a reader landing exactly there fails
    * and retries, and a crash in the window leaves the data intact in a
    * `.old-*` sibling (manual recovery). True always-available compaction
    * needs a manifest-based table format; this is the plain-parquet trade.
    * The reference's CHECKPOINT/VACUUM (`serve_flight.py:196-198`) is the
    * single-file-DB version of this operation.
    */
  /** SCD-1 upsert (CDC apply): latest version per key across
    * base ∪ updates — the MERGE-INTO-by-key pattern without a table
    * format. ONE combinable aggregate (`max_by(struct(payload),
    * version)` — the [[applyChangelog]] argmax): a hot key collapses to
    * one row per map partition before the shuffle, where the original
    * window-row_number formulation buffered and sorted the hot key's
    * whole row set in a single task (the banned
    * `Window.partitionBy(hotableKey)` shape; `changelog_hot_key` in
    * ScaleBench measures this exact plan under half-the-input-one-key
    * skew). Versions must be distinct per key (a CDC log's LSN / batch
    * id is): ties would make "latest" partition-order-dependent.
    */
  def upsertLatest(base: DataFrame, updates: DataFrame, keyCol: String,
                   versionCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val all = base.unionByName(updates)
    val payload = all.columns.filter(_ != keyCol)
    all.groupBy(keyCol)
      .agg(max_by(struct(payload.map(col): _*), col(versionCol)).as("__r"))
      .select(all.columns.map(c =>
        if (c == keyCol) col(keyCol) else col(s"__r.$c").as(c)): _*)
  }

  /** SCD-2 history build: turn a change log (key, version, attributes)
    * into validity intervals — the dimension-history counterpart of
    * [[upsertLatest]]'s latest-wins SCD-1. Consecutive versions whose
    * tracked attributes are all unchanged are compressed into one
    * interval; each surviving row gets `valid_from` (its version),
    * `valid_to` (the NEXT change's version, null while current) and
    * `is_current`.
    *
    * Scale: one hash shuffle on `keyCol`; the change-compression lag and
    * the interval lead share the same partitioning AND ordering, so
    * Catalyst plans a single Exchange + Sort and runs both Window
    * operators over it. Versions must be distinct per key (a CDC log's
    * LSN / commit timestamp is); attribute comparison is null-safe
    * (`<=>`), so null→value and value→null transitions open intervals.
    *
    * Since round 13 this IS the boundary-stitch build — the per-key
    * lag/lead window formulation is retired from the library (it sorted
    * a key's whole version chain in one task; a retry-storm changelog
    * put 10⁸ versions of one key into one sort — the exact hot-key
    * straggler `scd2_hot_key` adversarializes). The contract that was
    * implicit in the window version is now FAIL-LOUD: key and version
    * must be LongType (the range-stitch needs an orderable 64-bit grid;
    * a CDC log's LSN / micros timestamp is), and versions must be
    * distinct per key. Narrower integrals just cast; non-integral keys
    * should map through a surrogate (e.g. `hash60` plus a collision
    * audit) before building. The old window formulation survives only
    * as the independent test oracle (`Scd2WindowOracle` in the suite).
    */
  def scd2History(changes: DataFrame, keyCol: String, versionCol: String,
                  attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2History needs at least one tracked attribute")
    import org.apache.spark.sql.types.LongType
    Seq(keyCol, versionCol).foreach { c =>
      val dt = changes.schema(c).dataType
      require(dt == LongType,
        s"scd2History is the hot-key-safe boundary-stitch build and needs " +
          s"LongType key/version columns; '$c' is $dt — cast it to long " +
          s"or derive a surrogate key first")
    }
    scd2HistoryBig(changes, keyCol, versionCol, attrCols)
  }

  /** [[scd2History]] re-expressed hot-key-safe: identical semantics
    * (change detection by null-safe attr comparison against the
    * previous version, `valid_to` = next CHANGE's version), built
    * without any per-key window. Rank-within-key comes from
    * [[graft.ext.GlobalOrder.withRunningTotalPerKey]]'s range shuffle
    * (running count in (key, version) order), and "previous"/"next"
    * rows attach via equi-joins on (key, rank) — a key whose rank
    * values are UNIQUE, so a version chain of 10^8 rows for one hot key
    * shuffles uniformly instead of sorting in one task. Two rank
    * passes + two joins, all linear.
    *
    * Requires LongType key and version columns (the stitch contract)
    * and unique (key, version) pairs — same precondition the window
    * formulation needs for a deterministic history.
    */
  def scd2HistoryBig(changes: DataFrame, keyCol: String,
                     versionCol: String,
                     attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty,
      "scd2HistoryBig needs at least one tracked attribute")
    import org.apache.spark.sql.functions._
    import graft.ext.GlobalOrder
    val ranked = GlobalOrder.withRunningTotalPerKey(
        changes.withColumn("__graft_one", lit(1L)), keyCol, versionCol,
        "__graft_one", Seq.empty, out = "__graft_rk")
      .drop("__graft_one")
    // previous version's attrs, re-keyed to the follower's rank; the
    // left join leaves rank-1 rows with all-null prevs — exactly what
    // lag() yields. Rank 1 is kept UNCONDITIONALLY ([[scd2History]]'s
    // isFirst): an all-null-attr first version would otherwise make
    // every null<=>null true and drop the key's opening interval.
    val prev = ranked.select(
      col(keyCol) +: (col("__graft_rk") + 1L).as("__graft_rk") +:
        attrCols.map(a => col(a).as(s"__graft_prev_$a")): _*)
    val changed = attrCols
      .map(a => !(col(a) <=> col(s"__graft_prev_$a")))
      .reduce(_ || _)
    val ch = ranked.join(prev, Seq(keyCol, "__graft_rk"), "left")
      .filter(col("__graft_rk") === 1L || changed)
      .drop("__graft_rk" +: attrCols.map(a => s"__graft_prev_$a"): _*)
    val ranked2 = GlobalOrder.withRunningTotalPerKey(
        ch.withColumn("__graft_one", lit(1L)), keyCol, versionCol,
        "__graft_one", Seq.empty, out = "__graft_rk")
      .drop("__graft_one")
    val next = ranked2.select(col(keyCol),
      (col("__graft_rk") - 1L).as("__graft_rk"),
      col(versionCol).as("__graft_next_ver"))
    ranked2.join(next, Seq(keyCol, "__graft_rk"), "left")
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", col("__graft_next_ver"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__graft_rk", "__graft_next_ver")
  }

  /** Right-to-be-forgotten / tombstone delete: drop every base row whose
    * key appears in `tombstones` — one key-only LEFT ANTI join, the only
    * shape that scales to "delete these 10⁶ users from a 100 TB fact
    * table" (a NOT IN subquery de-sugars to the same anti join; a
    * per-key DELETE loop is a driver-side anti-pattern). The tombstone
    * side is deduplicated and carries only the key, so Catalyst
    * broadcasts it when it fits and AQE handles a hot key otherwise.
    *
    * Deletion-proof discipline: compose with a LEFT SEMI count of the
    * RESULT against the same tombstones (must be 0) in the same job —
    * the q197 gate carries that proof column, which is what an auditor
    * asks for ("show me the query that proves the data is gone").
    */
  def deleteKeys(base: DataFrame, tombstones: DataFrame, baseKey: String,
                 tombKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val t = tombstones.select(col(tombKey)).distinct()
    base.join(t, base(baseKey) === t(tombKey), "left_anti")
  }

  /** Incremental SCD-2 maintenance: fold a DELTA batch of change events
    * into a standing [[scd2HistoryBig]] history without rebuilding the
    * untouched keys. Keys absent from the delta pass through verbatim;
    * for keys the delta touches, the key's existing CHANGE rows
    * (key, version, attrs — exactly what the history stores) are
    * replayed together with the delta's rows through the same history
    * build, and the result replaces that key's slice.
    *
    * CONTRACT: every delta version must fall OUTSIDE the key's existing
    * version span — strictly after its latest standing version (the
    * append case) or strictly before its first (a backfill prefix).
    * Under that contract the merge is exact: the standing history only
    * discarded INTERIOR no-change rows, whose predecessor change point
    * the delta cannot alter, so merge ≡ rebuild-from-scratch on the
    * union of all change events (the q188 gate proves it against a
    * full-recompute oracle). A delta version landing BETWEEN a key's
    * existing versions voids the equivalence — the original build
    * dropped interior duplicates whose change-detection the insert
    * would have changed, and their attrs are no longer recoverable;
    * such late interior data needs a rebuild of that key from the
    * retained source stream (Scd2MergeSuite pins both directions).
    * Out-of-order WITHIN the delta batch is fine — the replay re-sorts
    * the (version) timeline.
    *
    * The contract is ENFORCED, not merely documented: by default the
    * call fails loud — naming the offending keys — when any delta
    * version lands strictly inside a touched key's standing
    * [min, max] version span, because at 100 TB "silently wrong for
    * late interior data" is the failure mode that matters and a caller
    * cannot be expected to pre-check. The detector is one combinable
    * min/max agg over the TOUCHED keys' history slice (already
    * materialized for the replay) plus a key-equi-join with the delta
    * — O(touched + delta), never the dimension — and runs as an eager
    * action (the price of failing before any downstream write).
    * `enforceSpanContract = false` restores the unchecked fold for
    * callers that guarantee the contract upstream and cannot afford
    * the extra action.
    *
    * Scale shape: cost is O(|history| anti-join + |touched keys'
    * history| + |delta|) — the anti-join and the touched-slice join are
    * both key-equi-joins (broadcast when the delta's key set is small),
    * and the replay runs the hot-key-safe [[scd2HistoryBig]] over ONLY
    * touched keys. A 100 TB dimension history with a 1 GB nightly delta
    * moves ~the delta's key slice, never the dimension.
    *
    * Contracts inherited from [[scd2HistoryBig]]: LongType key/version,
    * unique (key, version) across history ∪ delta.
    */
  def scd2Merge(history: DataFrame, delta: DataFrame, keyCol: String,
                versionCol: String, attrCols: Seq[String],
                enforceSpanContract: Boolean = true): DataFrame = {
    require(attrCols.nonEmpty, "scd2Merge needs at least one tracked attribute")
    import org.apache.spark.sql.functions.{col, min, max}
    val touched = delta.select(col(keyCol)).distinct()
    val untouched = history.join(touched, Seq(keyCol), "left_anti")
    val changeCols = (keyCol +: versionCol +: attrCols).map(col)
    val touchedHistory = history.join(touched, Seq(keyCol))
      .select(changeCols: _*)
    if (enforceSpanContract) {
      // a delta version STRICTLY inside a key's standing [min, max]
      // span would replay against a history whose interior no-change
      // rows are gone — detect and fail before producing a silently
      // divergent merge. Equality with a standing version is already a
      // (key, version)-uniqueness violation; the strict interior test
      // is the span contract itself.
      val spans = touchedHistory.groupBy(keyCol)
        .agg(min(col(versionCol)).as("__graft_vmin"),
          max(col(versionCol)).as("__graft_vmax"))
      val offenders = delta.select(col(keyCol), col(versionCol))
        .join(spans, Seq(keyCol))
        .filter(col(versionCol) > col("__graft_vmin") &&
          col(versionCol) < col("__graft_vmax"))
        .select(col(keyCol)).distinct()
        .orderBy(col(keyCol))
        .limit(20)
        .collect()
        .map(_.get(0))
      require(offenders.isEmpty,
        s"scd2Merge span contract violated: delta contains versions " +
          s"strictly inside the standing history span for key(s) " +
          s"[${offenders.mkString(", ")}]${if (offenders.length == 20) " …" else ""}; " +
          s"interior late data needs a rebuild of those keys from the " +
          s"retained source stream (see scd2Merge scaladoc)")
    }
    val replayed = touchedHistory
      .unionByName(delta.select(changeCols: _*))
    untouched.unionByName(
      scd2HistoryBig(replayed, keyCol, versionCol, attrCols))
  }

  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val path = java.nio.file.Paths.get(dir)
    // Streaming file-sink output is manifest-tracked: rewriting files
    // behind _spark_metadata's back makes readers silently drop data.
    require(!java.nio.file.Files.exists(path.resolve("_spark_metadata")),
      s"$dir is a streaming file-sink output (_spark_metadata present); " +
        "stop the query and remove the manifest before compacting, or " +
        "compact into a NEW directory")
    // Hive-partitioned layout? recurse into each partition directory
    // (skipping hidden/underscore dirs, which Spark ignores too).
    val partDirs = {
      val ls = java.nio.file.Files.list(path)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            java.nio.file.Files.isDirectory(p) && n.contains("=") &&
              !n.startsWith(".") && !n.startsWith("_")
          }
          .toList
      } finally ls.close()
    }
    if (partDirs.nonEmpty) {
      partDirs.foreach(p => compact(spark, p.toString, targetFileBytes))
      return
    }
    val totalBytes = {
      val walk = java.nio.file.Files.walk(path)
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally walk.close()
    }
    // nothing to compact (empty or header-only sink dir): reading it back
    // would fail schema inference with an unrelated-looking error
    if (totalBytes == 0L) return
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    // tmp/old sibling names: leading '.' (Spark's readers and our own
    // partition-recursion skip hidden dirs) and no '=' (so a partition
    // leaf's scratch dir can never be partition-discovered as data —
    // without this, compacting table/part=k1 would briefly create
    // table/part=k1.compact-x, which readers would treat as a partition)
    val safeName = "." + path.getFileName.toString.replace('=', '_')
    val tmp = path.resolveSibling(
      safeName + ".compact-" + java.util.UUID.randomUUID().toString.take(8))
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = path.resolveSibling(tmp.getFileName.toString + ".old")
    java.nio.file.Files.move(path, old)
    try java.nio.file.Files.move(tmp, path)
    catch { case e: Throwable =>
      java.nio.file.Files.move(old, path); throw e
    }
    val walk2 = java.nio.file.Files.walk(old)
    try walk2.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    finally walk2.close()
  }

  /** Point-in-time (AS OF) snapshot over an SCD-2 history
    * ([[scd2History]]/[[scd2HistoryBig]] output): the version of each key
    * whose validity interval contains `atVersion` — `valid_from ≤ at` and
    * (`valid_to` null or `> at`). Keys whose first version opens after
    * `at` are absent, exactly as the dimension looked then.
    *
    * Scale shape: a pure filter — no shuffle, no window; at most one row
    * per key survives by the history's non-overlapping-interval
    * invariant, so the snapshot reads as a plain dimension table
    * downstream (and the filter prunes row groups where min/max
    * statistics on valid_from permit).
    */
  def scd2Snapshot(history: DataFrame, atVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    history.filter(col("valid_from") <= atVersion &&
      (col("valid_to").isNull || col("valid_to") > atVersion))
  }

  /** Incremental maintenance of an ADDITIVE aggregate (materialized-view
    * refresh): fold a delta's partial aggregate into the standing
    * aggregate without touching the base data. Both inputs carry
    * (keyCols..., aggCols...) where every agg column is additive — counts
    * and sums, the class closed under union (averages refresh as
    * sum+count pairs; min/max do NOT belong here, a retraction can lower
    * a max and only a rescan recovers it). Retractions arrive as
    * NEGATIVE contributions; groups whose refreshed count column (if
    * `countCol` is given) reaches 0 are dropped, so a fully-retracted
    * key disappears exactly as a recompute would drop it.
    *
    * Scale shape: the refresh cost is O(|standing| + |delta partials|) —
    * one union + one combinable groupBy on the keys, NEVER a rescan of
    * the base fact table. This is the contract that makes a 100 TB fact
    * table's dashboard aggregate maintainable from a per-batch changelog:
    * each refresh moves rows proportional to the AGGREGATE's cardinality,
    * not the fact table's.
    */
  def refreshAdditiveAgg(standing: DataFrame, deltaPartials: DataFrame,
                         keyCols: Seq[String], aggCols: Seq[String],
                         countCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(standing.columns.sameElements(deltaPartials.columns),
      "standing and delta partials must share one schema; got " +
        s"${standing.columns.mkString(",")} vs " +
        s"${deltaPartials.columns.mkString(",")}")
    countCol.foreach(c => require(aggCols.contains(c),
      s"countCol $c must be one of the additive agg columns"))
    val merged = standing.unionByName(deltaPartials)
      .groupBy(keyCols.map(col): _*)
      .agg(aggCols.head -> "sum", aggCols.tail.map(_ -> "sum"): _*)
      .select((keyCols.map(col) ++
        aggCols.map(a => col(s"sum($a)").as(a))): _*)
    countCol.fold(merged)(c => merged.filter(col(c) =!= 0L))
  }

  /** Durable, batchId-guarded [[refreshAdditiveAgg]] fold for
    * `foreachBatch` materialized-view maintenance — the restart-safe
    * twin of q200's in-memory fold. Spark's `foreachBatch` contract is
    * AT-LEAST-ONCE: after a crash the last uncommitted micro-batch is
    * re-delivered with the SAME batchId, so an unguarded fold
    * double-counts it — the one correctness question that separates a
    * demo from a production MV. The guard is the standard idempotent
    * commit protocol:
    *
    *  1. read `_committed` (last applied batchId + its generation dir);
    *  2. `batchId <= lastId` → SKIP (this delivery already folded);
    *  3. fold the batch's partial into the committed generation and
    *     write the result to `gen-<batchId>` (overwrite — a crashed
    *     half-write of the same generation is simply rewritten);
    *  4. ATOMIC_MOVE a fresh marker over `_committed`; only this
    *     rename publishes the new generation;
    *  5. best-effort delete of older generations.
    *
    * A crash between 3 and 4 leaves `_committed` on the old
    * generation: the re-delivered batch re-folds from the OLD standing
    * state and rewrites the same `gen-<batchId>` — exactly-once
    * results from at-least-once delivery. State on disk is the
    * AGGREGATE (|keys| rows), never the stream; each batch costs one
    * parquet read of that aggregate + one write, the price of
    * durability over q200's checkpoint-block fold.
    *
    * The per-batch partial is `batch.groupBy(keyCols).agg(sum(aggCols))`
    * with the columns named `aggCols` verbatim — the batch must already
    * carry additive columns (counts as literal 1-sums, sums as the
    * summand), matching [[refreshAdditiveAgg]]'s schema contract.
    */
  def durableAdditiveMvFold(mvDir: String, keyCols: Seq[String],
                            aggCols: Seq[String],
                            countCol: Option[String] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = batch.sparkSession
    val root = java.nio.file.Paths.get(mvDir)
    java.nio.file.Files.createDirectories(root)
    val committed = root.resolve("_committed")
    val last: Option[(Long, String)] =
      if (java.nio.file.Files.exists(committed)) {
        val lines = new String(java.nio.file.Files.readAllBytes(committed),
          java.nio.charset.StandardCharsets.UTF_8).trim.split("\n")
        Some((lines(0).toLong, lines(1)))
      } else None
    if (last.exists(_._1 >= batchId)) return // re-delivered: already folded
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(aggCols.head -> "sum", aggCols.tail.map(_ -> "sum"): _*)
      .select((keyCols.map(col) ++
        aggCols.map(a => col(s"sum($a)").as(a))): _*)
    val next = last match {
      case Some((_, genDir)) =>
        refreshAdditiveAgg(spark.read.parquet(genDir), partial,
          keyCols, aggCols, countCol)
      case None => partial
    }
    val genPath = root.resolve(s"gen-$batchId")
    next.write.mode("overwrite").parquet(genPath.toString)
    val tmp = root.resolve(s"_committed.tmp-$batchId")
    java.nio.file.Files.write(tmp,
      s"$batchId\n$genPath\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, committed,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // best-effort GC of superseded generations (never the committed one)
    last.foreach { case (_, old) =>
      val op = java.nio.file.Paths.get(old)
      if (op != genPath && java.nio.file.Files.exists(op)) {
        val walk = java.nio.file.Files.walk(op)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } finally walk.close()
      }
    }
  }

  /** Build a session TABLE from raw events: one row per
    * (key, gap-session) with start/end timestamps and event count —
    * [[graft.ext.GlobalOrder.withSessionId]]'s hot-key-safe numbering
    * followed by one combinable aggregate. The materialized form
    * [[sessionMerge]] maintains incrementally.
    */
  def sessionTable(events: DataFrame, keyCol: String, tsCol: String,
                   gapUs: Long, tieCols: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    import org.apache.spark.sql.functions._
    graft.ext.GlobalOrder
      .withSessionId(events, keyCol, tsCol, gapUs, tieCols,
        out = "__graft_sid")
      .groupBy(col(keyCol), col("__graft_sid"))
      .agg(min(col(tsCol)).as("start_tsu"), max(col(tsCol)).as("end_tsu"),
        count(lit(1)).as("n_events"))
      .drop("__graft_sid")
  }

  /** Incremental session-table maintenance — the [[scd2Merge]] of
    * sessionization: fold a DELTA batch of events into a standing
    * [[sessionTable]] without re-sessionizing untouched keys. A key's
    * LAST standing session may EXTEND (the delta's first events arrive
    * within `gapUs` of its end — sessions have no closing bracket until
    * the gap elapses, so an "append-only" session table is wrong by
    * construction); everything earlier is immutable and passes through
    * verbatim.
    *
    * CONTRACT (enforced like [[scd2Merge]]'s): every delta event must be
    * STRICTLY LATER than its key's last standing `end_tsu` — the
    * time-partitioned nightly-batch invariant. A delta event at or
    * before a standing end would need the original events to
    * re-sessionize (the aggregate discarded them); violations fail loud
    * with the offending keys. Cost: the delta is sessionized
    * (O(delta log delta) range shuffle), each key's last standing
    * session joins against the delta's FIRST session (one co-keyed join
    * of |touched keys| rows), and untouched rows move via one key
    * anti-join — a 100 TB session table with a nightly delta moves the
    * delta, never the table. The q216 gate proves merge ≡ full
    * re-sessionize of the event union.
    */
  def sessionMerge(standing: DataFrame, delta: DataFrame, keyCol: String,
                   tsCol: String, gapUs: Long,
                   tieCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    import org.apache.spark.sql.functions._
    val touched = delta.select(col(keyCol)).distinct()
    val untouchedKeys = standing.join(touched, Seq(keyCol), "left_anti")
    // each touched key's LAST standing session (max start; starts are
    // unique per key by construction) via one combinable struct-max
    val touchedStanding = standing.join(touched, Seq(keyCol))
    val last = touchedStanding.groupBy(keyCol)
      .agg(max(struct(col("start_tsu"), col("end_tsu"), col("n_events")))
        .as("__graft_last"))
      .select(col(keyCol),
        col("__graft_last.start_tsu").as("__graft_ls"),
        col("__graft_last.end_tsu").as("__graft_le"),
        col("__graft_last.n_events").as("__graft_ln"))
    // contract: the delta must lie strictly after the standing end
    val offenders = delta.join(last, Seq(keyCol))
      .filter(col(tsCol) <= col("__graft_le"))
      .select(col(keyCol)).distinct().orderBy(col(keyCol)).limit(20)
      .collect().map(_.get(0))
    require(offenders.isEmpty,
      s"sessionMerge contract violated: delta contains events at or " +
        s"before the standing session end for key(s) " +
        s"[${offenders.mkString(", ")}]" +
        s"${if (offenders.length == 20) " …" else ""}; such late data " +
        s"needs re-sessionizing those keys from retained events")
    val deltaSessions = sessionTable(delta, keyCol, tsCol, gapUs, tieCols)
    // per touched key: the delta's FIRST session (min start) either
    // extends the standing last session (gap not elapsed) or stands
    // alone; later delta sessions always stand alone
    val firstDelta = deltaSessions.groupBy(keyCol)
      .agg(min(col("start_tsu")).as("__graft_fs"))
    // both sides of deltaSessions ⋈ firstDelta are delta-sized and
    // broadcast-eligible at once, so AQE's build-side choice races run
    // to run (observed as q216's recurring bench fp flip: BuildLeft +
    // downstream re-shuffle in some runs, BuildRight + local read in
    // others). Pin sort-merge: both sides leave their aggregates
    // already hash-partitioned on the key, the join stays spillable
    // for arbitrarily large deltas (the q118 SHJ-cannot-spill lesson),
    // and the added sorts are over delta-sized rows only.
    val joined = deltaSessions.hint("merge")
      .join(firstDelta.hint("merge"), Seq(keyCol))
      .join(last.hint("merge"), Seq(keyCol), "left")
    val isFirst = col("start_tsu") === col("__graft_fs")
    val extendsLast = isFirst && col("__graft_le").isNotNull &&
      (col("start_tsu") - col("__graft_le")) <= gapUs
    val mergedDelta = joined.select(col(keyCol),
      when(extendsLast, col("__graft_ls")).otherwise(col("start_tsu"))
        .as("start_tsu"),
      col("end_tsu"),
      when(extendsLast, col("__graft_ln") + col("n_events"))
        .otherwise(col("n_events")).as("n_events"))
    // standing last sessions that were NOT extended pass through (a
    // key has exactly ONE last session, so the extended set is a key
    // set and one anti-join removes the absorbed rows)
    val extendedKeys = joined.filter(extendsLast).select(col(keyCol))
    val keptLast = last.join(extendedKeys, Seq(keyCol), "left_anti")
      .select(col(keyCol), col("__graft_ls").as("start_tsu"),
        col("__graft_le").as("end_tsu"), col("__graft_ln").as("n_events"))
    // touched keys' standing sessions BEFORE the last one are immutable
    val touchedEarlier = touchedStanding.join(
        last.select(col(keyCol), col("__graft_ls")), Seq(keyCol))
      .filter(col("start_tsu") < col("__graft_ls"))
      .drop("__graft_ls")
    untouchedKeys
      .unionByName(touchedEarlier)
      .unionByName(keptLast)
      .unionByName(mergedDelta)
  }

  /** Order-invariant per-group content fingerprint: (group, n_rows,
    * fp_sum) where fp_sum is the SUM of a portable 30-bit md5 hash of
    * each row's selected columns — change detection for snapshot
    * equality ("did this partition change since yesterday") that costs
    * ONE combinable pass and compares as two integers, instead of a
    * row-by-row diff. Sum (not xor) so duplicate multiplicity counts;
    * addition is commutative, so the fingerprint is identical under any
    * partitioning and any engine (the hash is the md5-derived
    * [[graft.functions.Portable.hash30]], mirrored verbatim in SQL).
    * Nulls are folded through an explicit sentinel — `concat_ws` SKIPS
    * nulls, which would collide (a, NULL, b) with (a, b, NULL).
    * Collision note: a 30-bit hash sum is a cheap screen, not a proof —
    * budget: 2³⁰ × rows-per-group must fit int64 (~8·10⁹ rows; sum as
    * DECIMAL(38,0) beyond).
    */
  def tableFingerprint(df: DataFrame, groupCol: String,
                       cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "tableFingerprint needs at least one column")
    // chr(1) separates fields (so ("ab","c") != ("a","bc")); chr(2)
    // is the null sentinel (distinct from empty string); both
    // mirrored as chr(1)/chr(2) in the oracle
    val rowKey = concat_ws("",
      cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        sum(graft.functions.Portable.hash30(rowKey)).as("fp_sum"))
  }

  /** Read the committed standing aggregate of a [[durableAdditiveMvFold]]
    * directory (None before the first committed batch).
    */
  def readDurableMv(spark: SparkSession, mvDir: String): Option[DataFrame] = {
    val committed = java.nio.file.Paths.get(mvDir).resolve("_committed")
    if (!java.nio.file.Files.exists(committed)) None
    else {
      val lines = new String(java.nio.file.Files.readAllBytes(committed),
        java.nio.charset.StandardCharsets.UTF_8).trim.split("\n")
      Some(spark.read.parquet(lines(1)))
    }
  }
}
