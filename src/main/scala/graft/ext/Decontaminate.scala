package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Benchmark decontamination: flag training documents that share a word
  * n-gram with any document in an evaluation/benchmark set, so eval data
  * can be excluded from a pretraining corpus (the standard n-gram-overlap
  * decontamination used by public LLM data pipelines).
  *
  * Scale shape: n-grams are reduced to 60-bit md5 hashes ([[Portable]])
  * before the join, so the shuffle carries 8-byte keys instead of strings.
  * Benchmark suites are small by construction (memberships in the
  * thousands-to-millions while the corpus has billions of docs), so the
  * benchmark gram set is broadcast — the corpus side never shuffles. Set
  * `broadcastBench = false` to fall back to a shuffle join if a benchmark
  * outgrows the broadcast budget.
  */
object Decontaminate {

  /** Distinct (doc_id, 60-bit n-gram hash) pairs of `textCol`, tokenized
    * on whitespace. Documents with fewer than `n` tokens contribute no
    * grams. Hashing is engine-portable: DuckDB gets the same values via
    * `'0x' || substr(md5(gram), 1, 15)`.
    */
  def ngramHashes(df: DataFrame, idCol: Column, textCol: Column,
                  n: Int): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    df.select(idCol.as("doc_id"), Portable.wsTokens(textCol).as("__w"))
      .filter(size(col("__w")) >= n)
      // sequence(1, k) needs k >= 1, guaranteed by the filter above
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(__w) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(__w, i, $n)))")).as("gram"))
      .select(col("doc_id"), Portable.hash60(col("gram")).as("gram_hash"))
      .distinct()
  }

  /** Corpus documents sharing at least one `n`-gram with the benchmark:
    * (doc_id, n_hits) where n_hits counts distinct overlapping grams.
    * Clean documents are absent (anti-join against this result to keep
    * them, or join to drop the contaminated ones).
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame,
                   idCol: Column, textCol: Column, n: Int,
                   broadcastBench: Boolean = true): DataFrame = {
    val bench0 = ngramHashes(benchmark, idCol, textCol, n)
      .select("gram_hash").distinct()
    val bench = if (broadcastBench) broadcast(bench0) else bench0
    ngramHashes(corpus, idCol, textCol, n)
      .join(bench, "gram_hash")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[contaminated]] for benchmark sets too large to broadcast (a full
    * eval-suite union can reach hundreds of millions of grams): a bloom
    * filter built from the benchmark gram hashes prunes ~99% of corpus
    * grams AT THE SCAN, so the unavoidable shuffle join moves only the
    * surviving sliver of the corpus side. False positives are removed by
    * the exact join that follows — the result is IDENTICAL to
    * [[contaminated]] (the q100 BloomJoin discipline), which is exactly
    * what the shared oracle asserts.
    */
  def contaminatedBloom(corpus: DataFrame, benchmark: DataFrame,
                        idCol: Column, textCol: Column, n: Int,
                        expectedBenchGrams: Long,
                        fpp: Double = 0.01): DataFrame = {
    val bench = ngramHashes(benchmark, idCol, textCol, n)
      .select("gram_hash").distinct()
    BloomJoin.prefilteredJoin(
      ngramHashes(corpus, idCol, textCol, n), bench, "gram_hash",
      expectedBenchGrams, fpp)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** FUZZY decontamination — the near-duplicate escape hatch exact
    * n-gram matching misses (an eval item lightly paraphrased or
    * re-tokenized into the training corpus): MinHash-LSH candidate
    * pairs between corpus and benchmark ([[Dedup
    * .minhashCandidatesIncremental]]'s incoming×existing banding — the
    * benchmark side is the small "existing" index a deployment keeps
    * banded), then EXACT shingle-Jaccard verification of candidates
    * only, kept at `threshold`. Per flagged corpus document: how many
    * benchmark items it near-matches and the best match by
    * (jaccard-micro DESC, bench_id ASC) — an exact-integer tie order,
    * with the reported double derived FROM the micro long (both
    * engine-portable). Documents with no match ≥ threshold are absent
    * (anti-join to keep the clean set).
    *
    * Scale: banding is O(docs × bands); the candidate join touches
    * band-key collisions only; verification intersects shingle sets
    * for CANDIDATE pairs only (the [[Dedup.jaccardPairsPrefix]]
    * verification pattern). No window, no unbounded state.
    */
  def contaminatedFuzzy(corpus: DataFrame, benchmark: DataFrame,
                        threshold: Double, numHashes: Int = 16,
                        rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val cand = Dedup.minhashCandidatesIncremental(corpus, benchmark,
        numHashes, rowsPerBand, n)
      .select(col("doc_in").as("doc_id"), col("doc_ex").as("bench_id"))
    val shC = Dedup.shinglesRaw(corpus, n)
      .select(col("doc_id"), col("shingle")).distinct()
    val shB = Dedup.shinglesRaw(benchmark, n)
      .select(col("doc_id").as("bench_id"), col("shingle")).distinct()
    val szC = shC.groupBy("doc_id").agg(count(lit(1)).as("n_c"))
    val szB = shB.groupBy("bench_id").agg(count(lit(1)).as("n_b"))
    val inter = cand.join(shC, Seq("doc_id"))
      .join(shB, Seq("bench_id", "shingle"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("i"))
    val verified = inter
      .join(szC, Seq("doc_id")).join(szB, Seq("bench_id"))
      .withColumn("__u", col("n_c") + col("n_b") - col("i"))
      .withColumn("j_micro", expr("(i * 1000000L) div __u"))
      .filter(col("i").cast("double") / col("__u").cast("double")
        >= threshold)
    verified.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        max(struct(col("j_micro"), (-col("bench_id")).as("__nb")))
          .as("__best"))
      .select(col("doc_id"), col("n_matches"),
        (-col("__best.__nb")).as("best_bench_id"),
        (col("__best.j_micro").cast("double") / 1e6).as("best_jaccard"))
  }
}
