package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable primitives used by the dedup / text
  * analysis operators. Everything here is reproducible bit-for-bit in any
  * SQL engine with md5 — which is what lets MinHash and SimHash signatures
  * be verified against the DuckDB oracle instead of being tested
  * rows-only. All built-ins, so the expressions stay codegen-friendly.
  */
object Portable {

  /** 60-bit hash from the first 15 hex chars of md5. Equivalent DuckDB:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. 60 bits keeps the
    * value positive and overflow-free in a signed 64-bit integer on both
    * engines.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant — independent hash families for MinHash. */
  def hash60(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed:"), c))

  /** Whitespace tokenization shared by the text operators; DuckDB:
    * `string_split_regex(trim(text), '\s+')`.
    */
  def wsTokens(text: Column): Column =
    split(trim(text), "\\s+")
}
