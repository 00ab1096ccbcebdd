package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Readers
import graft.ext.{Stats, Survival, TextAnalysis, TimeSeries}

/** Round-12 third batch: right-censored survival (Kaplan–Meier risk
  * table), forecasting floor (seasonal-naive backtest), randomness and
  * robust-changepoint screens (Wald–Wolfowitz runs, Pettitt), lead–lag
  * discovery (cross-correlation), and a corpus readability census —
  * each a library operator (`ext`) gated against a DuckDB oracle on the
  * driver's parquet tables, all following the exact-integer discipline
  * (int64 aggregates under any partitioning; derived doubles are one
  * fixed IEEE formula on both engines).
  */
object Round12cQueries {

  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    Readers.eventsNanos(s, dir).select(
      col("user_id"), expr("ts div 1000").as("tsu"),
      col("event_id"), col("event_type"), col("value"))

  /** DuckDB twin of [[graft.ext.Stats.cents]]. */
  private def centsSql(e: String, scale: Int = 100): String =
    s"CAST(floor($e * $scale + 0.5) AS BIGINT)"

  private val DayUs = 86400000000L

  /** Alphabetical event-type code map (the q239 convention — the
    * boundary-stitch primitives key on int64).
    */
  private val TypeCodes =
    Seq("click" -> 0L, "error" -> 1L, "purchase" -> 2L,
      "signup" -> 3L, "view" -> 4L)

  private def typeKeyCol: org.apache.spark.sql.Column =
    TypeCodes.tail.foldLeft(
      when(col("event_type") === TypeCodes.head._1,
        lit(TypeCodes.head._2))) { case (acc, (n, c)) =>
      acc.when(col("event_type") === n, lit(c))
    }

  private def typeNameCol(tk: String): org.apache.spark.sql.Column =
    TypeCodes.tail.foldLeft(
      when(col(tk) === TypeCodes.head._2,
        lit(TypeCodes.head._1))) { case (acc, (n, c)) =>
      acc.when(col(tk) === c, lit(n))
    }

  /** Per-type daily cents totals — the shared series builder for the
    * runs/Pettitt/backtest screens (one combinable rollup).
    */
  private def dailyByType(s: SparkSession, dir: String): DataFrame =
    eventsUs(s, dir)
      .groupBy(col("event_type"), expr(s"tsu div ${DayUs}L").as("day"))
      .agg(sum(Stats.cents(col("value"))).as("y"))

  private val DailySql =
    s"""SELECT event_type, epoch_us(ts) // $DayUs AS day,
               CAST(sum(${centsSql("value")}) AS BIGINT) AS y
        FROM events GROUP BY 1, 2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Kaplan–Meier risk table for signup → purchase conversion with
    // right censoring at the user's last observed event: per duration
    // day — subjects at risk, conversions, censorings, and the discrete
    // hazard d/n_risk. The unbiased conversion-latency read (q236's
    // median conditions on having converted; this keeps the unconverted
    // in the denominator until their observation ends).
    "q272_survival_km" -> ((s, dir) => {
      val ev = eventsUs(s, dir)
      val per = ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "signup", col("tsu")))
          .as("startus"),
        max(col("tsu")).as("lastus"))
        .filter(col("startus").isNotNull)
      val firstP = ev.filter(col("event_type") === "purchase")
        .join(per.select(col("user_id"), col("startus")), Seq("user_id"))
        .filter(col("tsu") >= col("startus"))
        .groupBy(col("user_id")).agg(min(col("tsu")).as("pts"))
      val subj = per.join(firstP, Seq("user_id"), "left")
        .select(
          expr(s"(coalesce(pts, lastus) - startus) div ${DayUs}L")
            .as("dur"),
          col("pts").isNotNull.as("ev"))
      Survival.kmRiskTable(subj, "dur", col("ev")).orderBy("t")
    }),

    // Seasonal-naive forecast backtest per event type: score
    // ŷ(day) = y(day − 7) against the actual daily totals — the
    // zero-parameter floor any forecaster must beat, and the drift
    // alarm when a series stops being weekly-seasonal. Error sums in
    // exact cents; MAE/bias are one division each.
    "q273_seasonal_naive" -> ((s, dir) =>
      TimeSeries.seasonalNaiveBacktest(dailyByType(s, dir),
          "event_type", "day", "y", period = 7L)
        .orderBy("event_type")),

    // Wald–Wolfowitz runs test on the daily totals: does each type's
    // above/below-median sequence clump into regimes or alternate?
    // Median-exact (doubled-grid compare), runs counted by one lag
    // stitch, z one fixed formula.
    "q274_runs_test" -> ((s, dir) => {
      val daily = dailyByType(s, dir)
        .select(typeKeyCol.as("tk"), col("day"), col("y"))
      Stats.runsTest(daily, "tk", "day", "y", Seq.empty)
        .select(typeNameCol("tk").as("event_type"), col("n1"),
          col("n2"), col("runs"), col("z"))
        .orderBy("event_type")
    }),

    // Pettitt rank changepoint on the daily totals: the
    // outlier-immune single-changepoint screen (q206's CUSUM follows
    // values — one junk spike drags it; Pettitt follows midranks).
    // K and the changepoint day are exact integers.
    "q275_pettitt" -> ((s, dir) => {
      val daily = dailyByType(s, dir)
        .select(typeKeyCol.as("tk"), col("day"), col("y"))
      Stats.pettittChangepoint(daily, "tk", "day", "y", Seq.empty)
        .select(typeNameCol("tk").as("event_type"), col("n"), col("k"),
          col("cp"))
        .orderBy("event_type")
    }),

    // Corpus readability census per language: Flesch reading-ease from
    // exact word/sentence/syllable-proxy counts — corpus-level score
    // from summed integers (never a sum of per-doc doubles) plus the
    // per-doc easy/medium/hard band counts.
    "q276_readability" -> ((s, dir) =>
      TextAnalysis.readabilityCensus(
          Readers.table(s, dir, "documents"), col("lang"), col("text"))
        .withColumnRenamed("g", "lang")
        .orderBy("lang")),

    // Lead–lag cross-correlation between daily purchase and click
    // totals at lags −3..+3 days: r(lag) of (click(d), purchase(d+lag))
    // — does purchase volume trail click volume, and by how much?
    "q277_cross_corr" -> ((s, dir) => {
      val daily = eventsUs(s, dir)
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy(expr(s"tsu div ${DayUs}L").as("day"))
        .agg(
          sum(when(col("event_type") === "click",
            Stats.cents(col("value"))).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase",
            Stats.cents(col("value"))).otherwise(0L)).as("y"))
      Stats.crossCorr(daily, "day", "x", "y", Seq(-3, -2, -1, 0, 1, 2, 3))
        .orderBy("lag")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q272_survival_km" ->
      s"""WITH per AS (SELECT user_id,
                              min(CASE WHEN event_type = 'signup'
                                THEN epoch_us(ts) END) AS startus,
                              max(epoch_us(ts)) AS lastus
                       FROM events GROUP BY 1),
          ok AS (SELECT * FROM per WHERE startus IS NOT NULL),
          p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS pts
                FROM events e JOIN ok ON e.user_id = ok.user_id
                WHERE e.event_type = 'purchase'
                  AND epoch_us(e.ts) >= ok.startus
                GROUP BY 1),
          subj AS (SELECT (coalesce(pts, lastus) - startus)
                            // $DayUs AS dur,
                          pts IS NOT NULL AS ev
                   FROM ok LEFT JOIN p USING (user_id)),
          tab AS (SELECT dur AS t,
                         CAST(count(CASE WHEN ev THEN 1 END)
                           AS BIGINT) AS d,
                         CAST(count(CASE WHEN NOT ev THEN 1 END)
                           AS BIGINT) AS c
                  FROM subj GROUP BY 1),
          r AS (SELECT t, d, c,
                       CAST(sum(d + c) OVER (ORDER BY t)
                         AS BIGINT) AS run
                FROM tab),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM subj)
          SELECT t, n - run + d + c AS n_risk, d, c,
                 CASE WHEN n - run + d + c > 0
                      THEN CAST(d AS DOUBLE)
                           / CAST(n - run + d + c AS DOUBLE)
                      END AS hazard
          FROM r, tot ORDER BY t""",

    "q273_seasonal_naive" ->
      s"""WITH daily AS ($DailySql),
          j AS (SELECT a.event_type, a.y - b.y AS e
                FROM daily a JOIN daily b
                  ON a.event_type = b.event_type
                 AND a.day = b.day + 7)
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(abs(e)) AS BIGINT) AS sum_abs_err,
                 CAST(sum(abs(e)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS mae,
                 CAST(sum(e) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS bias
          FROM j GROUP BY 1 ORDER BY event_type""",

    "q274_runs_test" ->
      s"""WITH daily AS ($DailySql),
          med AS (SELECT event_type, median(y) AS m
                  FROM daily GROUP BY 1),
          sg AS (SELECT d.event_type, d.day,
                        CASE WHEN 2 * y > CAST(2 * m AS BIGINT) THEN 1
                             WHEN 2 * y < CAST(2 * m AS BIGINT) THEN 0
                             END AS s
                 FROM daily d JOIN med USING (event_type)),
          lg AS (SELECT event_type, s,
                        lag(s) OVER (PARTITION BY event_type
                          ORDER BY day) AS p
                 FROM sg WHERE s IS NOT NULL),
          a AS (SELECT event_type,
                       CAST(count(CASE WHEN s = 1 THEN 1 END)
                         AS BIGINT) AS n1,
                       CAST(count(CASE WHEN s = 0 THEN 1 END)
                         AS BIGINT) AS n2,
                       CAST(count(CASE WHEN p IS NULL OR p <> s THEN 1
                         END) AS BIGINT) AS runs
                FROM lg GROUP BY 1)
          SELECT event_type, n1, n2, runs,
                 CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2
                       AND (2.0 * CAST(n1 AS DOUBLE)
                              * CAST(n2 AS DOUBLE))
                           * ((2.0 * CAST(n1 AS DOUBLE)
                                 * CAST(n2 AS DOUBLE))
                              - (CAST(n1 AS DOUBLE)
                                 + CAST(n2 AS DOUBLE)))
                           / (((CAST(n1 AS DOUBLE)
                                 + CAST(n2 AS DOUBLE))
                               * (CAST(n1 AS DOUBLE)
                                  + CAST(n2 AS DOUBLE)))
                              * ((CAST(n1 AS DOUBLE)
                                   + CAST(n2 AS DOUBLE)) - 1.0)) > 0
                      THEN (CAST(runs AS DOUBLE)
                            - ((2.0 * CAST(n1 AS DOUBLE)
                                  * CAST(n2 AS DOUBLE))
                               / (CAST(n1 AS DOUBLE)
                                  + CAST(n2 AS DOUBLE)) + 1.0))
                           / sqrt((2.0 * CAST(n1 AS DOUBLE)
                                     * CAST(n2 AS DOUBLE))
                                  * ((2.0 * CAST(n1 AS DOUBLE)
                                        * CAST(n2 AS DOUBLE))
                                     - (CAST(n1 AS DOUBLE)
                                        + CAST(n2 AS DOUBLE)))
                                  / (((CAST(n1 AS DOUBLE)
                                        + CAST(n2 AS DOUBLE))
                                      * (CAST(n1 AS DOUBLE)
                                         + CAST(n2 AS DOUBLE)))
                                     * ((CAST(n1 AS DOUBLE)
                                          + CAST(n2 AS DOUBLE))
                                        - 1.0)))
                      END AS z
          FROM a ORDER BY event_type""",

    "q275_pettitt" ->
      s"""WITH daily AS ($DailySql),
          r AS (SELECT event_type, y,
                       CAST(2 * cum - c + 1 AS BIGINT) AS r2
                FROM (SELECT event_type, y, count(*) AS c,
                             sum(count(*)) OVER (PARTITION BY event_type
                               ORDER BY y) AS cum
                      FROM daily GROUP BY 1, 2) t),
          j AS (SELECT d.event_type, d.day, r2
                FROM daily d JOIN r USING (event_type, y)),
          run AS (SELECT event_type, day,
                         CAST(sum(r2) OVER (PARTITION BY event_type
                           ORDER BY day) AS BIGINT) AS s2,
                         CAST(row_number() OVER (PARTITION BY event_type
                           ORDER BY day) AS BIGINT) AS i,
                         CAST(count(*) OVER (PARTITION BY event_type)
                           AS BIGINT) AS n
                  FROM j),
          u AS (SELECT event_type, n, day,
                       abs(s2 - i * (n + 1)) AS u
                FROM run),
          k AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                       CAST(max(u) AS BIGINT) AS k
                FROM u GROUP BY 1)
          SELECT u.event_type AS event_type, k.n, k.k,
                 CAST(min(u.day) AS BIGINT) AS cp
          FROM u JOIN k ON u.event_type = k.event_type AND u.u = k.k
          GROUP BY 1, 2, 3 ORDER BY 1""",

    "q276_readability" ->
      """WITH d AS (SELECT lang,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                  AS BIGINT) AS w,
                CAST(greatest(len(regexp_extract_all(text, '[.!?]+')),
                  1) AS BIGINT) AS s,
                CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                  AS BIGINT) AS y
              FROM documents),
          sc AS (SELECT lang, w, s, y,
                        CASE WHEN w > 0
                             THEN 206.835
                                  - 1.015 * (CAST(w AS DOUBLE)
                                             / CAST(s AS DOUBLE))
                                  - 84.6 * (CAST(y AS DOUBLE)
                                            / CAST(w AS DOUBLE))
                             END AS score
                 FROM d),
          a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(w) AS BIGINT) AS words,
                       CAST(sum(s) AS BIGINT) AS sentences,
                       CAST(sum(y) AS BIGINT) AS syllables,
                       CAST(count(CASE WHEN score IS NULL THEN 1 END)
                         AS BIGINT) AS n_nonlatin,
                       CAST(count(CASE WHEN score >= 60.0 THEN 1 END)
                         AS BIGINT) AS n_easy,
                       CAST(count(CASE WHEN score >= 30.0
                         AND score < 60.0 THEN 1 END) AS BIGINT)
                         AS n_medium,
                       CAST(count(CASE WHEN score < 30.0 THEN 1 END)
                         AS BIGINT) AS n_hard
                FROM sc GROUP BY 1)
          SELECT lang, n_docs, words, sentences, syllables, n_nonlatin,
                 n_easy, n_medium, n_hard,
                 CASE WHEN words > 0
                      THEN 206.835
                           - 1.015 * (CAST(words AS DOUBLE)
                                      / CAST(sentences AS DOUBLE))
                           - 84.6 * (CAST(syllables AS DOUBLE)
                                     / CAST(words AS DOUBLE))
                      END AS corpus_score
          FROM a ORDER BY lang""",

    "q277_cross_corr" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // $DayUs AS day,
                                CAST(sum(CASE WHEN event_type = 'click'
                                  THEN ${centsSql("value")} ELSE 0 END)
                                  AS BIGINT) AS x,
                                CAST(sum(CASE WHEN event_type
                                    = 'purchase'
                                  THEN ${centsSql("value")} ELSE 0 END)
                                  AS BIGINT) AS y
                         FROM events
                         WHERE event_type IN ('purchase', 'click')
                         GROUP BY 1),
          lags AS (SELECT * FROM (VALUES (-3), (-2), (-1), (0), (1),
            (2), (3)) t(lag)),
          p AS (SELECT CAST(lag AS BIGINT) AS lag, a.x AS x, b.y AS y
                FROM daily a JOIN lags ON TRUE
                     JOIN daily b ON b.day = a.day + lag),
          a AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x * x) AS BIGINT) AS sxx,
                       CAST(sum(y * y) AS BIGINT) AS syy,
                       CAST(sum(x * y) AS BIGINT) AS sxy
                FROM p GROUP BY 1)
          SELECT lag, n_pairs,
                 CASE WHEN n_pairs >= 2
                       AND CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           <> 0
                       AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           <> 0
                      THEN (CAST(n_pairs AS DOUBLE)
                              * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(n_pairs AS DOUBLE)
                                     * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE)
                                     * CAST(sx AS DOUBLE))
                                  * (CAST(n_pairs AS DOUBLE)
                                       * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE)
                                       * CAST(sy AS DOUBLE)))
                      END AS r
          FROM a ORDER BY lag"""
  )
}
