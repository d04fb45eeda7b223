package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed curation pipelines. The single-corpus funnel lives in the
  * `q_curation_funnel` registration (a pure composition of the
  * independently-proven gates); this object holds the INCREMENTAL form —
  * the shape a daily-ingest pipeline actually runs, where the corpus is
  * a curated snapshot plus a delta batch and re-curating the snapshot
  * per ingest would be an O(corpus)-per-day anti-pattern.
  */
object Curation {

  /** Per-document curation verdicts for the DELTA slice of `docs`
    * (`isNewCol` true), against a prior snapshot (`isNewCol` false) and
    * a fixed benchmark holdout (`isBenchCol`):
    *
    *  - `quality_pass` — [[TextOps.gopherQuality]] keep verdict over the
    *    delta only (zero-token docs default false — the
    *    q_curation_funnel totality rule);
    *  - `dup` — content hash present in the snapshot's distinct-hash
    *    index (the q_dedup_incremental anti-join side), or not the
    *    min-id representative within the delta batch;
    *  - `contaminated` — shares ≥1 exact `gramN`-gram with the benchmark
    *    slice ([[Decontam]] carry-the-hash recipe);
    *  - `keep` — none of the above and not itself held out.
    *
    * Scale contract — O(delta), not O(corpus): the snapshot is read ONLY
    * to build two bounded indexes (its distinct content-hash set and the
    * benchmark gram set, the latter broadcast); every token explode,
    * gram formation and quality aggregate runs over the delta alone, and
    * the output carries delta rows only — snapshot verdicts are
    * structurally unreachable (CurationOpsSpec pins the invariance).
    */
  def incrementalVerdicts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isNewCol: Column,
      isBenchCol: Column,
      gramN: Int = 13,
      // stats-gate override for specs that pin persisted-path ≡ lazy-path
      substrateMinBytes: Long = graft.ops.Caching.MaterializeSubstrateMinBytes): DataFrame = {
    // ONE corpus scan persisted for every stage when the corpus is big
    // enough to matter (r21 scan audit: the lazy form executed SIX text
    // scans of the corpus — quality tokenize, delta hash, snapshot hash,
    // gram explode and the verdict joins each re-read the fixture; at
    // 100 TB that is six corpus passes for one delta's verdicts). Flags
    // and text are pure per-row values, so the persisted copy is
    // bit-identical; the delta-sized result is eagerly materialized so
    // the corpus blocks release before return. Below the stats gate the
    // lazy form wins (measured +0.35 s at sf0.1 from the persist
    // barrier) — both paths value-equal, pinned by CurationOpsSpec.
    val projected = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"),
      isNewCol.as("is_new"),
      isBenchCol.as("is_bench"))
    val big = graft.ops.Caching.bigEnough(projected, substrateMinBytes)
    val base =
      if (big) projected.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else projected
    val delta = base.filter(col("is_new"))
    // stage 1 — gopher quality on the delta only; zero-token docs have
    // no quality row (tokens-exploded derivation) → keep=false via the
    // left join
    val quality = delta.select("doc_id")
      .join(
        TextOps.gopherQuality(delta, "doc_id", "__text")
          .select(col("doc_id"), col("keep").as("__qk")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__qk"), lit(false)).as("quality_pass"))
    // stage 2 — exact dedup: dup iff the content hash exists in the
    // SNAPSHOT hash index, or the doc is not the min-id representative
    // within the delta batch
    val hashed = delta.select(col("doc_id"), md5(coalesce(col("__text"), lit(""))).as("h"))
    val snapHashes = base.filter(!col("is_new"))
      .select(md5(coalesce(col("__text"), lit(""))).as("h"))
      .distinct()
      .withColumn("__in_snap", lit(true))
    val reps = hashed.groupBy("h").agg(min(col("doc_id")).as("__rep"))
    val dup = hashed
      .join(snapHashes, Seq("h"), "left")
      .join(reps, "h")
      .select(
        col("doc_id"),
        (coalesce(col("__in_snap"), lit(false)) || col("doc_id") =!= col("__rep")).as("dup"))
    // stage 3 — decontam: delta grams vs the FIXED benchmark gram set
    // (the benchmark does not grow with the delta); gram explode only
    // over bench ∪ delta
    val gramDocs = base.filter(col("is_bench") || col("is_new"))
    val grams = Decontam.gramRows(gramDocs, "doc_id", "__text", col("is_bench"), gramN)
    val hits = Decontam.contaminatedDocs(grams)
      .select(col("doc_id"), lit(true).as("__hit"))
    val out = delta.select("doc_id", "is_bench")
      .join(quality, "doc_id")
      .join(dup, "doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("is_bench"), col("quality_pass"), col("dup"),
        coalesce(col("__hit"), lit(false)).as("contaminated"))
      .withColumn("keep",
        !col("is_bench") && col("quality_pass") && !col("dup") && !col("contaminated"))
    if (big) graft.ops.Caching.materializeAndRelease(out, base) else out
  }
}
