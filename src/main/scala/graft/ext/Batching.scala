package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Training/inference ordering operators: reproducible corpus shuffling
  * and length-bucketed token-capped batching.
  *
  * A training run needs its corpus in a SHUFFLED but REPRODUCIBLE order —
  * "shuffle" as a property of the data, not of the job: re-running the
  * pipeline (on any cluster layout) must yield byte-identical order, or
  * checkpoint resume and ablation comparisons break. Random() is exactly
  * wrong; ordering by a content hash is exactly right.
  *
  * Inference batching wants the opposite of packing: group SIMILAR-length
  * sequences so a batch's padding waste is bounded, then cap each batch's
  * total tokens. Bucketing by length band and chunking within the bucket
  * is the standard compromise.
  */
object Batching {

  /** Deterministic corpus shuffle: position = rank of the md5-derived
    * hash of `idCol` (ties broken by id). Scalable global numbering via
    * [[GlobalOrder.withRowNumber]] (range shuffle + offsets — never a
    * single-partition window); the hash makes the order pseudorandom yet
    * identical on every engine, cluster layout, and rerun. `salt` varies
    * the permutation across epochs without touching the data.
    */
  def deterministicShuffle(df: DataFrame, idCol: Column, salt: Int = 0,
                           out: String = "position"): DataFrame =
    GlobalOrder.withRowNumber(
      df.withColumn("__shuffle_key",
        Portable.hash60(salt, idCol.cast("string"))),
      Seq(col("__shuffle_key"), idCol), out)
      .drop("__shuffle_key")

  /** Length-bucketed batching: rows are banded by `size_bucket` =
    * len div bandWidth, ordered within the band by (len, id), and cut
    * into batches at every `capTokens` of cumulative tokens (the
    * fixed-chunk relaxation of greedy capacity packing, same as
    * [[Packing.chunkSpans]]: a batch holds the rows STARTING in its
    * token chunk, so its total is < capTokens + the band's max row
    * length — with bandWidth <= the padding budget that bound is tight
    * enough for inference scheduling, and the rule stays a pure column
    * program both engines agree on bit-for-bit).
    *
    * The window is PARTITIONED by bucket — per-task state is one band,
    * so this scales with bands x band size rather than corpus size, and
    * the output order within a band is deterministic under any
    * partitioning.
    */
  def lengthBucketedBatches(df: DataFrame, idCol: Column, lenCol: Column,
                            bandWidth: Long, capTokens: Long): DataFrame = {
    require(bandWidth > 0 && capTokens > 0,
      s"bandWidth/capTokens must be positive, got $bandWidth/$capTokens")
    val banded = df
      .withColumn("__len", lenCol.cast("long"))
      .withColumn("size_bucket", expr(s"__len div $bandWidth"))
    val w = Window.partitionBy("size_bucket").orderBy(col("__len"), idCol)
    banded
      .withColumn("__cum", sum(col("__len")).over(w))
      // `div` = exact integer division (Column./ would round-trip double)
      .withColumn("batch_in_bucket", expr(s"(__cum - __len) div $capTokens"))
      .withColumn("pos_in_bucket", row_number().over(w).cast("long"))
      .drop("__cum", "__len")
  }
}
