package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation beyond [[DedupGroups]]' label propagation:
  * a fixed-iteration PageRank over an edge list, in exact integer
  * arithmetic.
  *
  * Floating-point PageRank is order-dependent (per-node contribution sums
  * fold doubles in partition order), which breaks both the engine's
  * hash-compared oracle gate and reproducible curation runs. Ranks here
  * are micro-units (longs, 1.0 = 1e6): contributions are
  * `rank div outdeg`, damping is `(pct · Σcontrib) div 100` — every
  * operation is exact 64-bit integer arithmetic, so the result is
  * bit-identical under any partitioning and on any engine. The truncation
  * bias of the integer divisions is ≤ 1 micro-unit per edge per
  * iteration — far below any ranking decision.
  *
  * Scale design (the [[DedupGroups.connectedComponents]] discipline):
  * each iteration is one equi-join of the edge list against the current
  * rank table plus one partial-aggregated groupBy on dst — shuffle volume
  * is O(edges) per iteration, AQE handles hub skew, and `localCheckpoint`
  * caps the growing lineage. Iterations are FIXED (the caller picks the
  * budget), so cost is iterations × (join + agg) with no convergence
  * scan; dangling-node mass is dropped, not redistributed — the standard
  * simplification when ranks are used as relative ordering signals.
  */
object Graph {

  val Scale = 1000000L

  /** Fixed-iteration integer PageRank. `edges` needs (src, dst) columns
    * (parallel edges should be pre-deduplicated if unwanted); returns
    * (node, rank) for every node appearing as src or dst, rank in
    * micro-units starting from 1.0 per node.
    */
  def pagerankInt(edges: DataFrame, iterations: Int,
                  dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    val outdeg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val base = lit(Scale * (100 - dampingPct) / 100)
    var ranks = nodes.withColumn("rank", lit(Scale))
    var checkpointed: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("csum"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + expr(s"($dampingPct * coalesce(csum, 0L)) div 100"))
            .as("rank"))
        .localCheckpoint()
      // free the PREVIOUS iteration's checkpoint blocks now that the new
      // one is materialized — leaked checkpoint blocks pin storage
      // memory for the rest of the session (the connectedComponents
      // discipline, DedupGroups.scala)
      checkpointed.foreach(_.unpersist())
      checkpointed = Some(ranks)
    }
    ranks
  }
}
