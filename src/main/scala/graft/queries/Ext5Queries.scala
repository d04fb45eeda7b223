package graft.queries

import graft.ops.Decontam
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fifth wave of extension operators — benchmark decontamination (the
  * pretraining hygiene pass the curation layer was still missing).
  *
  * The held-out "benchmark" set is a deterministic 10% md5 slice of
  * `documents` (the fixture has no external eval suite; the slice gives
  * the oracle an exact replay and the corpus's planted near-duplicates
  * guarantee real 13-gram overlaps across the split boundary). In
  * production the benchmark side is a separate tiny table and the same
  * plan applies verbatim: broadcast its distinct gram set, one corpus
  * scan, anti-join verdicts.
  */
object Ext5Queries {
  import Tables.t

  /** GPT-3-style width: 13 consecutive words. */
  private val GramN = 13

  private def splitDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      (conv(substring(md5(concat(lit("bench:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100 < 10).as("is_bench"),
      col("text"))

  private def grams(s: SparkSession, d: String): DataFrame =
    Decontam.gramRows(splitDocs(s, d), "doc_id", "text", col("is_bench"), GramN)

  /** Shared oracle CTEs: tokenize → split flag → distinct 13-grams →
    * benchmark gram set. The md5-slice replay is the `q_*_roundtrip`
    * sampling pattern; the gram formation is the `dedup_ngram_jaccard`
    * shingle replay generalized to width 13 via list slicing.
    */
  private val decontamCtes: String =
    s"""toks AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10 AS is_bench,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS ts
       |  FROM documents
       |), g AS (
       |  SELECT DISTINCT doc_id, is_bench, array_to_string(ts[i:i+${GramN - 1}], ' ') AS s
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - ${GramN - 1}, 0))) AS i) t
       |), bg AS (SELECT DISTINCT s FROM g WHERE is_bench)""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- exact 13-gram benchmark contamination: corpus docs sharing at
    //      least one exact 13-gram with the held-out slice, with the
    //      distinct-gram overlap count as evidence. Broadcast semi-join
    //      shape — the benchmark gram set is tiny at ANY corpus scale ----
    "q_benchmark_decontam" -> QueryDef(
      (s, d) => Decontam.contaminatedDocs(grams(s, d)),
      Some(s"""WITH $decontamCtes
              |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_grams
              |FROM g JOIN bg USING (s) WHERE NOT g.is_bench GROUP BY 1""".stripMargin),
      "corpus docs sharing >=1 exact 13-gram with the benchmark slice, overlap counts as evidence"
    ),

    // ---- the keep-list form (dedup-family contract): one verdict row
    //      per document — held out, contaminated, or kept for training ----
    "q_decontam_keep_list" -> QueryDef(
      (s, d) =>
        Decontam.verdicts(splitDocs(s, d), "doc_id", col("is_bench"), grams(s, d)),
      Some(s"""WITH $decontamCtes,
              |hits AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (s) WHERE NOT g.is_bench)
              |SELECT t.doc_id, t.is_bench,
              |  (t.doc_id IN (SELECT doc_id FROM hits)) AS contaminated,
              |  (NOT t.is_bench AND t.doc_id NOT IN (SELECT doc_id FROM hits)) AS keep
              |FROM toks t""".stripMargin),
      "per-document decontamination verdicts: held-out / contaminated / keep-for-training"
    )
  )
}
