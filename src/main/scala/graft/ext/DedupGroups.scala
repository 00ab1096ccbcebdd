package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Turning near-duplicate PAIRS into dedup GROUPS: connected components
  * over the similarity graph, then keep-one-per-component.
  *
  * Algorithm: iterative label propagation ("hash-to-min") — every node
  * starts labeled with its own id; each round, every node adopts the
  * minimum label in its neighborhood; converged when no label changes.
  * Each round is one join + one aggregate (both shuffles on node id), and
  * the number of rounds is O(log(diameter)) in practice for near-dup
  * graphs (which are overwhelmingly small cliques and chains). This is
  * the standard scalable formulation — no driver-side union-find, no
  * graph library dependency.
  */
object DedupGroups {

  /** Connected components of an undirected pair list (doc_a, doc_b).
    * Returns (doc_id, component) where component = min doc_id reachable.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // symmetric edge list + self-loops so isolated endpoints keep a label
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node adopts min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("component").as("n_component"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("n_component"), col("component")))
            .as("component"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Keep-one-per-group: given docs and near-dup pairs, return docs minus
    * every non-representative member of each component (representative =
    * min doc_id, matching q37's keep-first policy).
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }
}
