package graft.queries

import graft.ops.{Bpe, Decontam, TextOps}
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

  /** Merge-table depth for the BPE registry entry — enough iterations
    * that later merges build ON earlier merged symbols (multi-level
    * units), bounded so the unrolled oracle stays tractable. Declared
    * BEFORE `defs` (object-initialization order: `defs` captures it
    * eagerly).
    */
  private val BpeMerges = 8

  private def splitDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      (conv(substring(md5(concat(lit("bench:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100 < 10).as("is_bench"),
      col("text"))

  private def grams(s: SparkSession, d: String): DataFrame =
    Decontam.gramRows(splitDocs(s, d), "doc_id", "text", col("is_bench"), GramN)

  /** Shared oracle CTEs: tokenize → split flag → distinct 13-gram
    * HASHES (60-bit md5 chunks, matching the Spark side's carry-the-hash
    * scale decision — see [[graft.ops.Decontam.gramRows]]) → benchmark
    * gram set. The md5-slice replay is the `q_*_roundtrip` sampling
    * pattern; the gram formation is the `dedup_ngram_jaccard` shingle
    * replay generalized to width 13 via list slicing.
    */
  private val decontamCtes: String =
    s"""toks AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10 AS is_bench,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS ts
       |  FROM documents
       |), g AS (
       |  SELECT DISTINCT doc_id, is_bench,
       |    CAST(('0x' || substr(md5(array_to_string(ts[i:i+${GramN - 1}], ' ')), 1, 15)) AS BIGINT) AS s
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
    ),

    // ---- distributed BPE merge training: M deterministic iterations of
    //      pair-count aggregate → argmax collect → codegen re-tokenize.
    //      The oracle replays the ENTIRE training loop (the
    //      ann_ivf_trained_topk pattern): M unrolled CTE blocks, each
    //      re-deriving the greedy-leftmost merge via match-run parity ----
    "text_bpe_train" -> QueryDef(
      (s, d) => Bpe.trainMerges(t(s, d, "documents"), "text", numMerges = BpeMerges),
      Some(bpeOracle(BpeMerges)),
      s"BPE tokenizer training: top-$BpeMerges merges, the full loop oracle-replayed"
    ),

    // ---- BPE tokenizer INFERENCE over the trained table: per-document
    //      whitespace vs BPE token counts (the tokens-per-doc metric
    //      shard/context budgeting runs on). Train → replay merges over
    //      the vocab (chained codegen projections) → ONE corpus token
    //      scan joined to the broadcast word→|symbols| table ----
    "text_bpe_encode" -> QueryDef(
      (s, d) => Bpe.encodeTokenCounts(t(s, d, "documents"), "doc_id", "text", BpeMerges),
      Some(bpeEncodeOracle(BpeMerges)),
      s"per-doc token counts under the trained $BpeMerges-merge BPE vs whitespace tokens"
    ),

    // ---- PII audit: the OBSERVABILITY side of redaction (the redaction
    //      pass itself is `text_pii_scrub`, ExtQueries) — per-doc integer
    //      redaction counts per PII class (emails + IPv4, which the scrub
    //      pass lacks) + an exact fingerprint of the scrubbed text.
    //      The fixture corpus carries no PII, so the query PLANTS a
    //      deterministic email+IP suffix on 30% of docs (doc_id-derived,
    //      replayed verbatim by the oracle) — the gate then proves the
    //      scrub removes exactly the planted patterns and nothing else.
    //      Map-only projection: no shuffle at any scale ----
    "text_pii_audit" -> QueryDef(
      (s, d) => {
        val planted = t(s, d, "documents").select(
          col("doc_id"),
          when(col("doc_id") % 10 < 3,
            concat(
              col("text"), lit(" contact: user"), col("doc_id").cast("string"),
              lit("@example.com from 10."), (col("doc_id") % 256).cast("string"),
              lit(".0.1")))
            .otherwise(col("text")).as("text"))
        TextOps.piiAudit(planted, "doc_id", "text")
          .select(
            col("doc_id"), col("n_emails"), col("n_ips"),
            conv(substring(md5(col("scrubbed")), 1, 15), 16, 10)
              .cast("long").as("scrubbed_fp"))
      },
      Some(s"""WITH p AS (
              |  SELECT doc_id,
              |    CASE WHEN doc_id % 10 < 3
              |      THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
              |           '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
              |      ELSE text END AS text
              |  FROM documents)
              |SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${TextOps.EmailPattern}')) AS BIGINT) AS n_emails,
              |  CAST(len(regexp_extract_all(text, '${TextOps.Ipv4Pattern}')) AS BIGINT) AS n_ips,
              |  CAST(('0x' || substr(md5(
              |    regexp_replace(regexp_replace(text, '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
              |      '${TextOps.Ipv4Pattern}', '<IP>', 'g')), 1, 15)) AS BIGINT) AS scrubbed_fp
              |FROM p""".stripMargin),
      "email/IPv4 redaction with planted PII: counts + exact scrubbed-text fingerprint"
    )
  )

  /** DuckDB replay of [[graft.ops.Bpe.trainMerges]]: vocab + initial
    * char sequences, then per iteration (unrolled — oracle SQL is
    * static): pair counts weighted by freq, argmax with the pair-string
    * tiebreak, and the greedy-leftmost merge. Greedy replay: a match at
    * position j overlaps the match at j-1 only inside a run of identical
    * pairs, and greedy keeps exactly the EVEN OFFSETS within each
    * maximal match run (gaps-and-islands + offset parity); a kept match
    * consumes position j+1 (the lag filter). `seq$i`/`m$i` are
    * MATERIALIZED: DuckDB inlines CTEs by default, and each iteration
    * references the previous sequence frame twice — inlined, the plan
    * tree doubles per iteration (2^M blowup; measured as a multi-minute
    * hang at M=8).
    */
  /** The shared training-replay CTE chain (vocab → seq0 → per-iteration
    * blocks up to seq`m`), consumed by both BPE oracles.
    */
  private def bpeCtes(m: Int): String = {
    val iters = (1 to m).map { i =>
      val prev = s"seq${i - 1}"
      s"""p$i AS (
         |  SELECT s[j] || ' ' || s[j+1] AS pair, SUM(freq) AS cnt
         |  FROM $prev, LATERAL (SELECT unnest(generate_series(1, len(s) - 1)) AS j) t$i
         |  GROUP BY 1),
         |m$i AS MATERIALIZED (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair ASC LIMIT 1),
         |x$i AS (
         |  SELECT w, freq, j, s[j] AS sym,
         |    COALESCE(j < len(s) AND s[j] || ' ' || s[j+1] = (SELECT pair FROM m$i), false) AS mt
         |  FROM $prev, LATERAL (SELECT unnest(generate_series(1, len(s))) AS j) u$i),
         |r$i AS (
         |  SELECT w, freq, j, sym, mt,
         |    CASE WHEN mt THEN j - ROW_NUMBER() OVER (PARTITION BY w, mt ORDER BY j) END AS grp
         |  FROM x$i),
         |k$i AS (
         |  SELECT w, freq, j, sym,
         |    (mt AND (j - MIN(j) OVER (PARTITION BY w, grp)) % 2 = 0) AS take
         |  FROM r$i),
         |c$i AS (
         |  SELECT w, freq, j, sym, take,
         |    COALESCE(lag(take) OVER (PARTITION BY w ORDER BY j), false) AS consumed
         |  FROM k$i),
         |seq$i AS MATERIALIZED (
         |  SELECT w, freq,
         |    list(CASE WHEN take THEN (SELECT replace(pair, ' ', '') FROM m$i) ELSE sym END ORDER BY j)
         |      FILTER (WHERE NOT consumed) AS s
         |  FROM c$i GROUP BY w, freq)""".stripMargin
    }.mkString(",\n")
    s"""v AS (
       |  SELECT t AS w, COUNT(*) AS freq FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS t
       |    FROM documents) GROUP BY 1),
       |seq0 AS (SELECT w, freq, list_append(regexp_split_to_array(w, ''), '</w>') AS s FROM v),
       |$iters""".stripMargin
  }

  private def bpeOracle(m: Int): String = {
    val rows = (1 to m).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS merge_rank,
         |  split_part(pair, ' ', 1) AS sym_a, split_part(pair, ' ', 2) AS sym_b,
         |  replace(pair, ' ', '') AS merged, CAST(cnt AS BIGINT) AS pair_count FROM m$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeCtes(m)}
       |$rows""".stripMargin
  }

  /** Encode oracle: the same training replay, then per-document token
    * counts — whitespace tokens joined to the trained word → |symbols|
    * table.
    */
  private def bpeEncodeOracle(m: Int): String =
    s"""WITH ${bpeCtes(m)},
       |wl AS (SELECT w, len(s) AS n_sym FROM seq$m),
       |dt AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS w
       |  FROM documents)
       |SELECT dt.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens_ws,
       |  CAST(SUM(n_sym) AS BIGINT) AS n_tokens_bpe
       |FROM dt JOIN wl USING (w) GROUP BY 1""".stripMargin
}
