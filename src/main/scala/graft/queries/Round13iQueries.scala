package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Mixture, Similarity}

/** Round-13 ninth batch: data-selection primitives — k-center greedy
  * diversity seeds over the embedding space (the coreset selector; the
  * whole selection is data-determined, so its oracle recomputes every
  * greedy step from the parquet itself), and water-filling mixture
  * allocation (uniform-up-to-availability, the anti-skew counterpart
  * of proportional allocation).
  */
object Round13iQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val KSeeds = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Farthest-point diversity seeds: 4 exemplars covering the
    // embedding space, exact integer-micro distances, total tie order.
    "q325_kcenter" -> ((s, dir) =>
      Similarity.kCenterSeeds(t(s, dir, "embeddings"), KSeeds)
        .orderBy("step")),

    // Water-filling: spend a budget of half the corpus docs as evenly
    // across sources as availability allows.
    "q326_waterfill" -> ((s, dir) => {
      val perSource = t(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).as("n"))
      val budget = t(s, dir, "documents").count() / 2
      Mixture.waterFill(perSource, "source", "n", budget)
        .orderBy("source")
    }),
  )

  /** d²(a, b) in the canonical engine-portable order. */
  private def d2Sql(a: String, b: String): String =
    s"list_dot_product($a, $a) - 2 * list_dot_product($a, $b) + " +
      s"list_dot_product($b, $b)"

  private def microSql(e: String): String =
    s"CAST(floor(($e) * 1000000.0 + 0.5) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(

    // The greedy selection is pure data: each stage recomputes the
    // min-distance-to-selected argmax (d DESC, vec_id ASC) in SQL.
    "q325_kcenter" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
          p1 AS (SELECT vec_id, v FROM e
                 WHERE vec_id = (SELECT min(vec_id) FROM e)),
          d2 AS (SELECT e.vec_id, e.v,
                        ${microSql(s"min(${d2Sql("e.v", "s.v")})")} AS d
                 FROM e CROSS JOIN p1 s GROUP BY e.vec_id, e.v),
          p2 AS (SELECT vec_id, v, d FROM d2
                 ORDER BY d DESC, vec_id LIMIT 1),
          s2 AS (SELECT vec_id, v FROM p1
                 UNION ALL SELECT vec_id, v FROM p2),
          d3 AS (SELECT e.vec_id, e.v,
                        ${microSql(s"min(${d2Sql("e.v", "s.v")})")} AS d
                 FROM e CROSS JOIN s2 s GROUP BY e.vec_id, e.v),
          p3 AS (SELECT vec_id, v, d FROM d3
                 ORDER BY d DESC, vec_id LIMIT 1),
          s3 AS (SELECT vec_id, v FROM s2
                 UNION ALL SELECT vec_id, v FROM p3),
          d4 AS (SELECT e.vec_id, e.v,
                        ${microSql(s"min(${d2Sql("e.v", "s.v")})")} AS d
                 FROM e CROSS JOIN s3 s GROUP BY e.vec_id, e.v),
          p4 AS (SELECT vec_id, v, d FROM d4
                 ORDER BY d DESC, vec_id LIMIT 1)
          SELECT CAST(1 AS BIGINT) AS step, vec_id,
                 CAST(0 AS BIGINT) AS dmin_micro FROM p1
          UNION ALL SELECT 2, vec_id, d FROM p2
          UNION ALL SELECT 3, vec_id, d FROM p3
          UNION ALL SELECT 4, vec_id, d FROM p4
          ORDER BY step""",
  )

  /** q326's oracle: per-source counts are genuine; the water level and
    * leftover (a k-element driver computation) render as literals, and
    * the allocation is re-derived in SQL as least(n, level).
    */
  val dynamicOracleSql: Map[String, (SparkSession, String) => String] =
    Map(
      "q326_waterfill" -> ((s, dir) => {
        val one = queries("q326_waterfill")(s, dir)
          .select(col("level"), col("leftover")).limit(1)
          .collect().head
        val (level, leftover) = (one.getLong(0), one.getLong(1))
        s"""SELECT source, CAST(count(*) AS BIGINT) AS n,
                   least(CAST(count(*) AS BIGINT), $level) AS alloc,
                   CAST($level AS BIGINT) AS level,
                   CAST($leftover AS BIGINT) AS leftover
            FROM documents GROUP BY source ORDER BY source"""
      }))
}
