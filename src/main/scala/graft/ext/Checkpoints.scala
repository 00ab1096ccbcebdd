package graft.ext

import org.apache.spark.sql.DataFrame

/** Block-storage release for `localCheckpoint`'d DataFrames.
  *
  * `Dataset.unpersist()` goes through the CacheManager, which only knows
  * about `persist()`'d queries — on a checkpointed DataFrame it is a
  * silent NO-OP (verified: `getPersistentRDDs` still lists the blocks
  * after it). The blocks are held by the RDD inside the plan's LogicalRDD
  * leaf, so freeing them means unpersisting THAT RDD. Every iterative
  * operator that rotates checkpoints (PageRank, connected components)
  * must release through here, or each iteration pins one generation of
  * blocks for the rest of the session.
  */
object Checkpoints {

  /** Unpersist the checkpointed RDD(s) backing `df`. The DataFrame must
    * not be used afterwards: `localCheckpoint` truncated its lineage, so
    * the rows cannot be recomputed once the blocks are gone. No-op for
    * plans without a LogicalRDD leaf.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
