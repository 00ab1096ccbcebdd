package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Audits, Readers}
import graft.ext.{Graph, Profile, Stats, TimeSeries}

/** Round-12 operators: weighted shortest paths, interval-union coverage,
  * per-group OLS trend fits, Benford first-digit auditing, CUSUM
  * changepoint screening, and join-key skew profiling — each implemented
  * as a library operator (`ext`/`engine`) and gated here against a DuckDB
  * oracle on the driver's parquet tables.
  */
object Round12Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Readers.table(s, dir, name)

  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    Readers.eventsNanos(s, dir).select(
      col("user_id"), expr("ts div 1000").as("tsu"),
      col("event_id"), col("event_type"), col("value"))

  /** DuckDB twin of [[graft.ext.Stats.cents]]. */
  private def centsSql(e: String, scale: Int = 100): String =
    s"CAST(floor($e * $scale + 0.5) AS BIGINT)"

  /** q202 hop budget (q183's depth). */
  private val SsspMaxIter = 3

  /** q203 synthetic interval length: 1 minute + (event_id mod 10)
    * minutes — variable-length so the merge is a real interval union,
    * not the fixed-gap sessionize degenerate case.
    */
  private val IvBaseUs = 60000000L
  private val IvStepUs = 60000000L

  /** q204 time origin (2024-01-01T00:00:00Z epoch micros — the corpus
    * start) and bucket (1 hour): x = hours-since-origin keeps Σx²
    * inside the int64 budget where raw epoch micros would overflow.
    */
  private val LinFitOriginUs = 1704067200000000L
  private val HourUsL = 3600000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Weighted single-source-set shortest paths over the
    // customer–supplier trade graph (q183's bipartite edges, each pair
    // carrying a deterministic 1..5 cost): cheapest route within 3
    // hops from the seed suppliers — frontier Bellman–Ford with a
    // combinable per-destination MIN, O(V) state, never O(paths).
    "q202_sssp" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c:"), col("o_custkey")).as("c"),
          concat(lit("s:"), col("l_suppkey")).as("sup"),
          (lit(1L) + (col("o_custkey") + col("l_suppkey")) % 5L).as("w"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("sup").as("dst"),
          col("w"))
        .unionAll(pairs.select(col("sup").as("src"), col("c").as("dst"),
          col("w")))
      val seeds = t(s, dir, "supplier")
        .filter(col("s_suppkey") % 10 === 0)
        .select(concat(lit("s:"), col("s_suppkey")).as("node"))
      Graph.ssspHops(edges, seeds, SsspMaxIter).orderBy("node")
    }),

    // Per-user active-time: each event opens a variable-length
    // interval; overlaps merge via the exclusive running-max sweep
    // (two boundary-stitch passes — a hot user never sorts in one
    // task), and the union length + merged-segment count are exact
    // integers.
    "q203_interval_coverage" -> ((s, dir) => {
      val iv = eventsUs(s, dir).select(col("user_id"),
        col("tsu").as("s"),
        (col("tsu") + lit(IvBaseUs) +
          (col("event_id") % 10L) * lit(IvStepUs)).as("e"))
      TimeSeries.intervalCoverage(iv, "user_id", "s", "e")
        .orderBy("user_id")
    }),

    // Per-event-type value trend over the corpus month: OLS slope /
    // intercept / r² of value-cents against hours-since-origin, from
    // ONE combinable pass of exact integer sums and a fixed IEEE
    // closed form — the drift detector that needs no window and no
    // second scan.
    "q204_group_linfit" -> ((s, dir) =>
      Stats.groupLinFit(
          eventsUs(s, dir).select(col("event_type"),
            expr(s"(tsu - ${LinFitOriginUs}L) div ${HourUsL}L").as("x"),
            Stats.cents(col("value")).as("y")),
          "event_type", col("x"), col("y"))
        .orderBy("event_type")),

    // Benford first-digit audit of extended prices by return flag —
    // the fabricated-data screen: leading-digit shares vs Benford's
    // expectation, constants injected as identical literals on both
    // engines (no runtime log10 on either side).
    "q205_benford" -> ((s, dir) =>
      Audits.benfordAudit(t(s, dir, "lineitem"), "l_returnflag",
          Stats.cents(col("l_extendedprice")))
        .orderBy("l_returnflag", "digit")),

    // Per-user CUSUM peak: max deviation of the running value sum from
    // the user's uniform trend — the distribution-free changepoint
    // screen, integer-exact via |S_i·n − i·T| with ONE final division.
    "q206_cusum" -> ((s, dir) =>
      Stats.cusumPeak(
          eventsUs(s, dir).select(col("user_id"), col("tsu"),
            col("event_id"), Stats.cents(col("value")).as("vc")),
          "user_id", "tsu", "vc", Seq(col("event_id")))
        .orderBy("user_id")),

    // Join-key skew profile of the events user distribution: the audit
    // a 100 TB plan runs BEFORE shuffling on a key — hottest key, p99
    // count (rank-based, engine-exact), skew ratio. Reductions over
    // |keys| rows only.
    "q207_key_skew" -> ((s, dir) =>
      Profile.keySkew(eventsUs(s, dir), "user_id"))
  )

  val oracleSql: Map[String, String] = Map(

    "q202_sssp" ->
      s"""WITH RECURSIVE b AS (SELECT DISTINCT o_custkey AS ck,
                                      l_suppkey AS sk
                               FROM orders
                               JOIN lineitem ON o_orderkey = l_orderkey),
          bw AS (SELECT 'c:' || ck AS c, 's:' || sk AS sup,
                        1 + (ck + sk) % 5 AS w
                 FROM b),
          e AS (SELECT c AS src, sup AS dst, w FROM bw
                UNION ALL SELECT sup, c, w FROM bw),
          seeds AS (SELECT 's:' || s_suppkey AS node FROM supplier
                    WHERE s_suppkey % 10 = 0),
          r(node, d, h) AS (SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
                            UNION
                            SELECT e.dst, r.d + e.w, r.h + 1 FROM r
                            JOIN e ON e.src = r.node
                            WHERE r.h < $SsspMaxIter)
          SELECT node, CAST(min(d) AS BIGINT) AS dist FROM r
          GROUP BY 1 ORDER BY 1""",

    "q203_interval_coverage" ->
      s"""WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                             epoch_us(ts) + $IvBaseUs
                               + (event_id % 10) * $IvStepUs AS e
                      FROM events),
          m AS (SELECT user_id, s, e,
                       max(e) OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS pmax
                FROM iv),
          g AS (SELECT user_id, s, e,
                       CASE WHEN pmax IS NULL OR s > pmax
                            THEN 1 ELSE 0 END AS ns
                FROM m),
          gg AS (SELECT user_id, s, e,
                        sum(ns) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS UNBOUNDED PRECEDING) AS gid
                 FROM g),
          seg AS (SELECT user_id, gid, min(s) AS ms, max(e) AS me
                  FROM gg GROUP BY 1, 2)
          SELECT user_id, CAST(sum(me - ms) AS BIGINT) AS covered,
                 count(*) AS n_segments
          FROM seg GROUP BY 1 ORDER BY user_id""",

    "q204_group_linfit" ->
      s"""WITH src AS (SELECT event_type,
                  (epoch_us(ts) - $LinFitOriginUs) // $HourUsL AS x,
                  ${centsSql("value")} AS y
               FROM events),
          a AS (SELECT event_type,
                       count(CASE WHEN y IS NOT NULL THEN 1 END) AS n,
                       CAST(sum(CASE WHEN y IS NOT NULL THEN x END)
                            AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x * y) AS BIGINT) AS sxy,
                       CAST(sum(CASE WHEN y IS NOT NULL THEN x * x END)
                            AS BIGINT) AS sxx,
                       CAST(sum(y * y) AS BIGINT) AS syy
                FROM src GROUP BY 1),
          f AS (SELECT event_type, n,
                       CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                       CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
                       CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary,
                       CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy,
                       CAST(n AS DOUBLE) AS dn
                FROM a)
          SELECT event_type, n,
                 CASE WHEN n >= 2 AND varx <> 0
                      THEN cov / varx END AS slope,
                 CASE WHEN n >= 2 AND varx <> 0
                      THEN (dsy - (cov / varx) * dsx) / dn END AS intercept,
                 CASE WHEN n >= 2 AND varx <> 0 AND vary <> 0
                      THEN (cov * cov) / (varx * vary) END AS r2
          FROM f ORDER BY event_type""",

    "q205_benford" -> {
      val pCase = Audits.benfordP.zipWithIndex
        .map { case (p, i) => s"WHEN ${i + 1} THEN '$p'::DOUBLE" }
        .mkString("CASE digit ", " ", " END")
      s"""WITH v AS (SELECT l_returnflag,
                            ${centsSql("l_extendedprice")} AS vc
                     FROM lineitem),
          pos AS (SELECT l_returnflag, vc FROM v WHERE vc > 0),
          c AS (SELECT l_returnflag,
                       CAST(substr(CAST(vc AS VARCHAR), 1, 1) AS BIGINT)
                         AS digit,
                       count(*) AS n
                FROM pos GROUP BY 1, 2),
          t AS (SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS n_total
                FROM c GROUP BY 1),
          j AS (SELECT c.l_returnflag, digit, n_total,
                       CAST(n AS BIGINT) AS n,
                       CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)
                         AS share,
                       $pCase AS benford_p
                FROM c JOIN t USING (l_returnflag))
          SELECT l_returnflag, digit, n_total, n, share, benford_p,
                 share - benford_p AS excess
          FROM j ORDER BY l_returnflag, digit"""
    },

    "q206_cusum" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id,
                            ${centsSql("value")} AS vc
                     FROM events),
          w AS (SELECT user_id,
                       sum(vc) OVER (PARTITION BY user_id
                         ORDER BY tsu, event_id
                         ROWS UNBOUNDED PRECEDING) AS s,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY tsu, event_id) AS i,
                       sum(vc) OVER (PARTITION BY user_id) AS tt,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM e)
          SELECT user_id, CAST(max(n) AS BIGINT) AS n,
                 CAST(max(abs(s * n - i * tt)) AS DOUBLE)
                   / CAST(max(n) AS DOUBLE) AS cusum_peak
          FROM w GROUP BY 1 ORDER BY user_id""",

    "q207_key_skew" ->
      """WITH c AS (SELECT user_id AS k, count(*) AS n FROM events
                    GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows,
                       count(*) AS n_keys,
                       CAST(max(n) AS BIGINT) AS max_n
                FROM c),
          r AS (SELECT n, row_number() OVER (ORDER BY n, k) AS rn FROM c),
          p AS (SELECT CAST(r.n AS BIGINT) AS p99_n FROM r, t
                WHERE rn = CAST(ceil(n_keys * 0.99) AS BIGINT)),
          h AS (SELECT CAST(k AS VARCHAR) AS top_key FROM c
                ORDER BY n DESC, k LIMIT 1)
          SELECT n_rows, n_keys, max_n, p99_n,
                 CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS mean_n,
                 CAST(max_n AS DOUBLE)
                   / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
                   AS skew_ratio,
                 top_key
          FROM t, p, h"""
  )
}
