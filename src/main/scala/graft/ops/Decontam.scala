package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact benchmark n-gram decontamination — the standard pretraining
  * hygiene pass (popularized by the GPT-3 appendix): a corpus document is
  * CONTAMINATED iff it shares at least one exact word 13-gram with any
  * document of a held-out benchmark/eval set, and contaminated documents
  * are dropped before training so eval scores measure generalization,
  * not memorization.
  *
  * 100 TB shape: the benchmark side is always tiny (eval suites are
  * megabytes against a 100 TB corpus), so the plan is ONE corpus
  * gram scan ([[graft.functions.TokenRuns]] →
  * [[graft.functions.ShingleRuns]], both codegen'd) joined against a
  * BROADCAST of the distinct benchmark gram set — no corpus-side shuffle
  * beyond the per-doc distinct, no pair explosion, and the verdict
  * aggregation shuffles only the (rare) hit rows. The reference ETL has
  * no decontamination to mirror (`/root/reference/data_transform.py`
  * stops at column ops); the fixture derives the benchmark set as a
  * deterministic md5 slice of `documents` so a DuckDB oracle replays the
  * whole pass.
  */
object Decontam {

  /** Distinct (id, is_bench, gram-HASH) rows: one row per document per
    * distinct word n-gram, the gram carried as its 60-bit md5 chunk
    * (the MinHash-path discipline) rather than the string. `benchCol`
    * marks the held-out side.
    *
    * Hashing BEFORE the distinct is the scale decision: a 13-gram
    * string is ~80 bytes and the per-doc dedup's partial hash build
    * over them spilled 436 MB disk / 1.5 GB mem at sf10 (isolated
    * triple) — on 16-byte (id, hash) rows the exchange shrinks 4×
    * (1.27 GB → 0.34 GB) and the spill vanishes. Exactness: 60-bit md5
    * chunks over ~millions of distinct grams collide with probability
    * ~n²/2⁶¹ (the accepted MinHash-lane risk), and the oracle replays
    * the SAME hash, so both engines agree even on a collision.
    */
  def gramRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchCol: Column,
      n: Int
  ): DataFrame =
    // spread an under-split scan first (r21): the gram explode + md5 is
    // this family's heaviest projection and would otherwise run on ONE
    // task over the single-row-group fixtures (identity at real scale;
    // the distinct and every consumer are placement-independent)
    Caching.spreadToParallelism(
      df.select(
        col(idCol).as("doc_id"),
        benchCol.as("is_bench"),
        col(textCol).as("__t")))
      .select(
        col("doc_id"),
        col("is_bench"),
        explode(TextOps.shinglesFromTokens(TextOps.tokens(col("__t")), n)).as("g"))
      .select(
        col("doc_id"),
        col("is_bench"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gh"))
      .distinct()

  /** The distinct benchmark gram set — the broadcast side of the join.
    * Bounded by the benchmark suite's text volume, never the corpus's.
    */
  def benchmarkGrams(grams: DataFrame): DataFrame =
    grams.filter(col("is_bench")).select("gh").distinct()

  /** Contaminated corpus documents with their gram-overlap evidence:
    * (doc_id, n_hit_grams) — the count of DISTINCT benchmark grams the
    * document shares. Both join inputs are gram-distinct, so a plain
    * count over the join IS the distinct-gram count (no count_distinct
    * state needed).
    */
  def contaminatedDocs(grams: DataFrame): DataFrame =
    grams
      .filter(!col("is_bench"))
      .join(broadcast(benchmarkGrams(grams)), "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_grams"))

  /** Full per-document verdict table — the keep-list form consistent
    * with the dedup family's: every document, with `is_bench` (held out
    * of training by definition), `contaminated` (shares ≥1 exact n-gram
    * with the benchmark side), and the resulting `keep` verdict (train
    * on it iff it is neither).
    */
  def verdicts(docs: DataFrame, idCol: String, benchCol: Column, grams: DataFrame): DataFrame = {
    val hit = contaminatedDocs(grams).select(col("doc_id"), lit(true).as("__hit"))
    docs
      .select(col(idCol).as("doc_id"), benchCol.as("is_bench"))
      .join(hit, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("is_bench"),
        coalesce(col("__hit"), lit(false)).as("contaminated"),
        (!col("is_bench") && !coalesce(col("__hit"), lit(false))).as("keep"))
  }
}
