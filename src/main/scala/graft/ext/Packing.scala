package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a fixed
  * corpus order and cut the token stream into fixed-size training chunks
  * ("concat-and-chunk", the standard GPT-style packing). The operator maps
  * each document to the chunk span it lands in, from which a writer can
  * group documents per chunk or locate chunk boundaries inside documents.
  *
  * Scale shape: the only global state is the running token count, computed
  * with [[GlobalOrder.withRunningTotal]] (range shuffle + per-partition
  * sums + prefix scan) — never a single-partition window. Everything after
  * that is a stateless per-row projection, so the operator is one range
  * shuffle end-to-end regardless of corpus size.
  */
object Packing {

  /** For each row, the chunk ids its tokens span when all rows are
    * concatenated in `sortCols` order and chunked every `chunkTokens`
    * tokens. Appends:
    *
    *   - `n_tokens`     — the row's token count (from `tokens`, null -> 0)
    *   - `chunk_first`  — 0-based id of the chunk its first token lands in
    *   - `chunk_last`   — id of the chunk its last token lands in
    *   - `n_chunks`     — chunks spanned (0 for an empty document)
    *
    * `sortCols` must form a total order (include a unique id): packing is
    * only reproducible when the concatenation order is.
    */
  def chunkSpans(df: DataFrame, tokens: Column, sortCols: Seq[Column],
                 chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    val tmp = df.withColumn("n_tokens", coalesce(tokens.cast("long"), lit(0L)))
    val cum = GlobalOrder.withRunningTotal(tmp, sortCols, "n_tokens",
      "__graft_cum")
    // All dividends are >= 0 by construction (empty docs take the
    // n_tokens = 0 branch), so truncating `div` == floor division and the
    // arithmetic is engine-portable.
    cum
      .withColumn("chunk_first",
        expr(s"(__graft_cum - n_tokens) div $chunkTokens"))
      .withColumn("chunk_last",
        when(col("n_tokens") === 0, col("chunk_first"))
          .otherwise(expr(s"(__graft_cum - 1) div $chunkTokens")))
      .withColumn("n_chunks",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("chunk_last") - col("chunk_first") + lit(1L)))
      .drop("__graft_cum")
  }
}
