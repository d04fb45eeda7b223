package graft.queries

import graft.ops.{Multimodal, Similarity, SpanDedup, TextOps, TokenPack}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixth wave of extension operators — the production-composition tier:
  * token-ID packing (the terminal LM training-data op), composite
  * IVF-PQ ANN, frozen-model Kneser-Ney holdout scoring, span-level
  * decontamination, and perceptual-hash image near-dup.
  */
object Ext6Queries {
  import Tables.t

  /** Context window length for the packing gate — small enough that the
    * sf fixtures produce many windows (boundary arithmetic is the thing
    * under test), shaped exactly like the production 1024/2048.
    */
  private val ContextLen = 128

  /** Merge-table depth shared with the Ext5 BPE gates. */
  private val PackMerges = 8

  /** Context length for the artifact round-trip gate — deliberately ≠
    * [[ContextLen]] so its result set is distinct from
    * `text_pack_sequences` (same tokenizer, different window boundaries).
    */
  private val ArtifactContextLen = 96

  /** Context length for the byte-level packing gate (≠ 128/96 so all
    * three packing gates' result sets are independent).
    */
  private val BytePackContextLen = 112

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- token-ID sequences + fixed-context packing: train the BPE,
    //      tokenize IN PLACE (per-doc id arrays in one projection — the
    //      bounded merge table + symbol-id map ship to the executors;
    //      id 0 = separator, alphabet 1..A in binary order, merged =
    //      A + merge_rank), concatenate in doc order via a
    //      doc-count-sized distributed prefix sum, chop into 128-token
    //      windows. The oracle replays the id assignment and the packing
    //      arithmetic exactly, down to a per-window content
    //      fingerprint ----
    "text_pack_sequences" -> QueryDef(
      (s, d) =>
        TokenPack.packTokenWindows(
          t(s, d, "documents"), "doc_id", "text",
          numMerges = PackMerges, contextLen = ContextLen),
      Some(packOracle(PackMerges, ContextLen)),
      s"BPE token-id packing into $ContextLen-token training windows with per-window content fingerprints"
    ),

    // ---- BYTE-LEVEL token packing: the packTokenWindows escape hatch
    //      for corpora beyond the BMP — training, symbol-id assignment
    //      and per-token inference all on hex-coded UTF-8 byte symbols,
    //      exact on non-BMP text (the multibyte-planted corpus: é, ü,
    //      日本語 and the surrogate-pair 😀 the char-level splitter
    //      cannot represent). Window length 112 keeps the result set
    //      independent of the char-level gates ----
    "text_pack_sequences_bytes" -> QueryDef(
      (s, d) =>
        TokenPack.packTokenWindows(
          Ext5Queries.plantedMultibyteDocs(s, d), "doc_id", "text",
          numMerges = PackMerges, contextLen = BytePackContextLen, byteLevel = true),
      Some(packOracle(
        PackMerges, BytePackContextLen,
        textSql = Ext5Queries.MultibytePlantSql,
        seq0Sql = Ext5Queries.ByteSeq0Sql)),
      s"byte-level BPE token-id packing ($BytePackContextLen-token windows) on multibyte-planted text — exact beyond the BMP"
    ),

    // ---- tokenizer-artifact round-trip: train the BPE ONCE, persist
    //      the merge table + symbol-id map as a parquet artifact, reload
    //      it (a fresh read — nothing survives from the training plan),
    //      and pack the corpus under the RELOADED tokenizer. The oracle
    //      replays the full in-job training path, so a green row proves
    //      save → load → pack ≡ train → pack — the production deployment
    //      contract: the tokenizer ships as an artifact, training never
    //      reruns. Window length 96 ≠ text_pack_sequences' 128, so the
    //      two gates' result sets are independent ----
    "text_bpe_artifact_roundtrip" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        val dir = s"/tmp/graft-tokenizer/${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        try {
          val (merges, symIds) = TokenPack.trainTokenizer(docs, "text", PackMerges)
          TokenPack.saveTokenizer(s, dir, merges, symIds)
          // pack under the RELOADED artifact via the validated entry
          // point (merges + symbol ids + byteLevel all come from the
          // artifact, params checked on load); the result materializes
          // (eager checkpoint) inside packTokenWindowsWith, so the
          // finally-cleanup below can never yank files from under a lazy
          // consumer
          TokenPack.packTokenWindowsWithArtifact(docs, "doc_id", "text", dir, ArtifactContextLen)
        } finally {
          try fs.delete(p, true)
          catch {
            case scala.util.control.NonFatal(e) =>
              graft.util.JsonLog.warning(s"tokenizer artifact cleanup failed for $dir: $e")
          }
        }
      },
      Some(packOracle(PackMerges, ArtifactContextLen)),
      s"tokenizer artifact round-trip: persist+reload the trained BPE, pack $ArtifactContextLen-token windows under the reloaded artifact"
    ),

    // ---- composite IVF-PQ (the FAISS IVFADC production shape): ADC
    //      scoring restricted to the IVF-probed cells — the ADC scan
    //      touches Σ probed-cell rows, never corpus × queries, and the
    //      compressed corpus never shuffles (the probe frame broadcasts).
    //      Deterministic end to end, so the oracle replays cell
    //      assignment, probing, LUT scoring, the adaptive shortlist, and
    //      the exact re-rank ----
    "ann_ivfpq_topk" -> QueryDef(
      (s, d) =>
        Similarity.ivfPqTopK(
          t(s, d, "embeddings"), "vec_id", "embedding",
          k = 5, queryPred = col("cid") < 50, nClusters = 8, nProbe = 6,
          subspaces = 16, subDim = 4, nCodes = 64
        ).withColumn("rank", col("rank").cast("long")),
      Some {
        s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |${ivfPqTopkCtes(
              nClusters = 8, nProbe = 6, subspaces = 16, subDim = 4, nCodes = 64,
              rerankSql = ExtQueries.pqAdaptiveRerankSql, k = 5, queryBound = 50)}
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM pq""".stripMargin
      },
      "composite IVF-PQ ANN: cell-restricted ADC scan + corpus-adaptive exact re-rank"
    ),

    // ---- persisted-index ANN (the production retrieval shape — VERDICT
    //      r18 gap #3): build the IVF-PQ index ONCE (centroids + the
    //      corpus-sized compressed codes, written distributed to
    //      parquet), reload the artifact, and run probe/LUT/ADC/re-rank
    //      against the RELOADED index — cell assignment and PQ encoding
    //      never recompute at query time. The build is deterministic, so
    //      the oracle replays the whole pipeline; k=3 ≠ ann_ivfpq_topk's
    //      k=5 keeps the two gates' result sets independent ----
    "ann_ivfpq_persisted" -> QueryDef(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val dir = s"/tmp/graft-annindex/${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        try {
          Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
            nClusters = 8, subspaces = 16, subDim = 4, nCodes = 64, dir)
          // result materializes (eager checkpoint) inside
          // ivfPqTopKWithIndex, so the finally-delete never races a
          // lazy consumer of the artifact files
          Similarity.ivfPqTopKWithIndex(emb, "vec_id", "embedding", dir,
            k = 3, queryPred = col("cid") < 50, nProbe = 6,
            subspaces = 16, subDim = 4, nCodes = 64)
            .withColumn("rank", col("rank").cast("long"))
        } finally {
          try fs.delete(p, true)
          catch {
            case scala.util.control.NonFatal(e) =>
              graft.util.JsonLog.warning(s"ann index artifact cleanup failed for $dir: $e")
          }
        }
      },
      Some {
        s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |${ivfPqTopkCtes(
              nClusters = 8, nProbe = 6, subspaces = 16, subDim = 4, nCodes = 64,
              rerankSql = ExtQueries.pqAdaptiveRerankSql, k = 3, queryBound = 50)}
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM pq""".stripMargin
      },
      "IVF-PQ top-k against a persisted index artifact: build once, reload, query many (k=3)"
    ),

    // ---- fuzzy incremental dedup against a PERSISTED signature index:
    //      the daily-ingest twin of q_dedup_incremental at near-dup
    //      sensitivity — the snapshot's LSH band keys are written to a
    //      parquet artifact, reloaded, and the delta batch bands only
    //      ITSELF against the reloaded index (O(delta) signature work per
    //      ingest; the snapshot never re-shingles). The banding is fully
    //      deterministic, so the oracle replays both sides' lanes and the
    //      split predicate exactly ----
    "dedup_incremental_fuzzy" -> QueryDef(
      (s, d) => {
        val dir = s"/tmp/graft-lshindex/${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        try {
          // result materializes (eager checkpoint) inside
          // lshIncrementalCandidates — the finally-delete never races a
          // lazy consumer of the index files
          graft.ops.Dedup.lshIncrementalCandidates(
            t(s, d, "documents"), "doc_id", "text",
            isNewCol = graft.ops.Sampling.hashBucket(col("doc_id"), "inc", 100) >= 80,
            indexDir = dir)
        } finally {
          try fs.delete(p, true)
          catch {
            case scala.util.control.NonFatal(e) =>
              graft.util.JsonLog.warning(s"lsh index artifact cleanup failed for $dir: $e")
          }
        }
      },
      Some(s"""WITH ${ExtQueries.minhashCtes(64, 16)},
              |flags AS (
              |  SELECT doc_id,
              |    CAST(('0x' || substr(md5('inc:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 >= 80 AS is_new
              |  FROM documents)
              |SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_snap
              |FROM bnd n
              |JOIN flags fn ON fn.doc_id = n.doc_id AND fn.is_new
              |JOIN bnd o ON o.band = n.band AND o.bh = n.bh
              |JOIN flags fo ON fo.doc_id = o.doc_id AND NOT fo.is_new""".stripMargin),
      "fuzzy incremental dedup: delta LSH bands joined against the persisted snapshot signature index"
    ),

    // ---- WITHIN-document repetition removal: the local pass of the
    //      CCNet/Gopher repetition family (dedup_paragraph is the
    //      corpus-wide twin) — 8-token chunks repeating an earlier chunk
    //      of the SAME doc are excised, first occurrence kept in order.
    //      The 100 TB dream shape: ONE codegen'd projection over the
    //      scan — zero shuffle, zero joins, no aggregation state ----
    "dedup_paragraph_local" -> QueryDef(
      (s, d) =>
        graft.ops.Dedup.chunkDedupLocal(t(s, d, "documents"), "doc_id", "text", chunkTokens = 8),
      Some("""WITH d AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(
             |    trim(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS ts
             |  FROM documents),
             |c AS (
             |  SELECT doc_id,
             |    list_transform(generate_series(1, CAST(ceil(len(ts) / 8.0) AS INT)),
             |      i -> array_to_string(ts[(i-1)*8 + 1 : (i-1)*8 + 8], ' ')) AS chunks
             |  FROM d),
             |k AS (
             |  SELECT doc_id, chunks,
             |    list_filter(chunks, (x, i) -> list_position(chunks, x) = i) AS kept
             |  FROM c)
             |SELECT doc_id,
             |  CAST(len(chunks) AS BIGINT) AS total_chunks,
             |  CAST(len(kept) AS BIGINT) AS kept_chunks,
             |  array_to_string(kept, ' ') AS cleaned_text
             |FROM k""".stripMargin),
      "within-doc repeated-chunk excision (first occurrence kept): one map-only projection, zero shuffle"
    ),

    // ---- incremental curation funnel: the composed gopher → dedup →
    //      decontam pipeline run as a DELTA against a prior corpus
    //      snapshot — the shape a daily-ingest 100 TB pipeline actually
    //      runs. The snapshot (hash buckets < 80) is touched ONLY as two
    //      bounded indexes: its distinct content-hash set (the
    //      q_dedup_incremental anti-join side) and the fixed benchmark
    //      gram set (broadcast); every corpus-sized stage — token
    //      explode, gram formation, quality aggregate — runs over the
    //      DELTA alone. Old docs' verdicts are structurally unreachable
    //      by the run (CurationOpsSpec pins the invariance), so a daily
    //      delta costs O(delta), not O(corpus). One verdict row per
    //      delta doc: held-out / quality / dup-vs-snapshot-or-delta /
    //      contaminated / keep ----
    "q_curation_incremental" -> QueryDef(
      (s, d) =>
        graft.ops.Curation.incrementalVerdicts(
          t(s, d, "documents"), "doc_id", "text",
          isNewCol = graft.ops.Sampling.hashBucket(col("doc_id"), "inc", 100) >= 80,
          isBenchCol =
            conv(substring(md5(concat(lit("bench:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
              .cast("long") % 100 < 10),
      Some("""WITH docs AS (
             |  SELECT doc_id, text,
             |    CAST(('0x' || substr(md5('inc:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 >= 80 AS is_new,
             |    CAST(('0x' || substr(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10 AS is_bench
             |  FROM documents),
             |gt AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS t
             |  FROM docs WHERE is_new),
             |gtf AS (SELECT doc_id, t, COUNT(*) AS c FROM gt GROUP BY 1, 2),
             |gd AS (
             |  SELECT doc_id, SUM(c) AS n_words, SUM(c * length(t)) AS wc, MAX(c) AS top_count,
             |    SUM(CASE WHEN t IN ('the','a','an','of','and','to','in','is','it','for') THEN c ELSE 0 END) AS n_stop
             |  FROM gtf GROUP BY 1),
             |q AS (
             |  SELECT d.doc_id,
             |    COALESCE(gd.n_words BETWEEN 50 AND 100000
             |      AND CAST(gd.wc AS DOUBLE) / gd.n_words BETWEEN 3.0 AND 10.0
             |      AND gd.n_stop >= 2
             |      AND CAST(gd.top_count AS DOUBLE) / gd.n_words <= 0.1, FALSE) AS quality_pass
             |  FROM docs d LEFT JOIN gd USING (doc_id) WHERE d.is_new),
             |h AS (SELECT doc_id, md5(coalesce(text, '')) AS h, is_new FROM docs),
             |dh AS (SELECT doc_id, h FROM h WHERE is_new),
             |snap AS (SELECT DISTINCT h FROM h WHERE NOT is_new),
             |rep AS (SELECT h, MIN(doc_id) AS rep FROM dh GROUP BY 1),
             |dup AS (
             |  SELECT dh.doc_id, (snap.h IS NOT NULL OR dh.doc_id <> rep.rep) AS dup
             |  FROM dh JOIN rep USING (h) LEFT JOIN snap USING (h)),
             |toks AS (
             |  SELECT doc_id, is_bench,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM docs WHERE is_bench OR is_new),
             |g AS (
             |  SELECT DISTINCT doc_id, is_bench,
             |    CAST(('0x' || substr(md5(array_to_string(ts[i:i+12], ' ')), 1, 15)) AS BIGINT) AS gh
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 12, 0))) AS i) t),
             |bg AS (SELECT DISTINCT gh FROM g WHERE is_bench),
             |hits AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gh) WHERE NOT g.is_bench)
             |SELECT d.doc_id, d.is_bench, q.quality_pass, dup.dup,
             |  (d.doc_id IN (SELECT doc_id FROM hits)) AS contaminated,
             |  (NOT d.is_bench AND q.quality_pass AND NOT dup.dup
             |   AND d.doc_id NOT IN (SELECT doc_id FROM hits)) AS keep
             |FROM docs d JOIN q USING (doc_id) JOIN dup USING (doc_id)
             |WHERE d.is_new""".stripMargin),
      "incremental curation: gopher -> dedup-vs-snapshot -> decontam on a delta batch, O(delta) not O(corpus)"
    ),

    // ---- frozen-model Kneser-Ney holdout scoring: the production
    //      decontam/quality filter — the 10% md5 slice scored under the
    //      interpolated-KN model trained on the other 90%, exact integer
    //      arithmetic, every unseen-event case pinned (unseen bigram →
    //      pure continuation term; unseen context → add-1 continuation
    //      distribution; per-event floor at the uniform 1/(B+V)) ----
    "text_lm_kn_holdout" -> QueryDef(
      (s, d) => {
        val split = t(s, d, "documents").select(
          col("doc_id"),
          (conv(substring(md5(concat(lit("bench:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 100 < 10).as("is_bench"),
          col("text"))
        TextOps.lmKnPerplexityScored(
          split.filter(!col("is_bench")),
          split.filter(col("is_bench")),
          "doc_id", "text")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substr(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10 AS is_bench,
             |    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), mbt AS (
             |  SELECT ts[i] || ' ' || ts[i+1] AS bg
             |  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i) g
             |  WHERE NOT is_bench
             |), bgc AS (SELECT bg, COUNT(*) AS c12 FROM mbt GROUP BY 1),
             |ctx AS (SELECT split_part(bg, ' ', 1) AS cw, SUM(c12) AS c1, COUNT(*) AS n1p FROM bgc GROUP BY 1),
             |cont AS (SELECT split_part(bg, ' ', 2) AS vw, COUNT(*) AS n1m FROM bgc GROUP BY 1),
             |bb AS (SELECT CAST(COUNT(*) AS HUGEINT) AS b FROM bgc),
             |vv AS (SELECT CAST(COUNT(DISTINCT t) AS HUGEINT) AS v FROM (SELECT unnest(ts) AS t FROM d WHERE NOT is_bench)),
             |st AS (
             |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg, ts[i] AS w1, ts[i+1] AS w2
             |  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i) g
             |  WHERE is_bench
             |), sc AS (
             |  SELECT st.doc_id,
             |    CASE
             |      WHEN c1 IS NULL THEN CAST(COALESCE(n1m, 0) + 1 AS HUGEINT)
             |      WHEN (CASE WHEN c12 IS NULL THEN CAST(0 AS HUGEINT) ELSE CAST(4 * c12 - 3 AS HUGEINT) END) * (b + v)
             |           + CAST(3 * n1p AS HUGEINT) * (COALESCE(n1m, 0) + 1) < CAST(4 * c1 AS HUGEINT)
             |        THEN CAST(1 AS HUGEINT)
             |      ELSE (CASE WHEN c12 IS NULL THEN CAST(0 AS HUGEINT) ELSE CAST(4 * c12 - 3 AS HUGEINT) END) * (b + v)
             |           + CAST(3 * n1p AS HUGEINT) * (COALESCE(n1m, 0) + 1)
             |    END AS num,
             |    CASE
             |      WHEN c1 IS NULL THEN b + v
             |      WHEN (CASE WHEN c12 IS NULL THEN CAST(0 AS HUGEINT) ELSE CAST(4 * c12 - 3 AS HUGEINT) END) * (b + v)
             |           + CAST(3 * n1p AS HUGEINT) * (COALESCE(n1m, 0) + 1) < CAST(4 * c1 AS HUGEINT)
             |        THEN b + v
             |      ELSE CAST(4 * c1 AS HUGEINT) * (b + v)
             |    END AS den
             |  FROM st LEFT JOIN bgc USING (bg)
             |  LEFT JOIN ctx ON ctx.cw = st.w1
             |  LEFT JOIN cont ON cont.vw = st.w2, bb, vv)
             |SELECT doc_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(length(bin(CAST(den // num AS BIGINT))) - 1) AS BIGINT) AS nll_bits,
             |  CAST(SUM(num * 1000000000000 // den) AS BIGINT) AS sum_p_fp,
             |  CAST(SUM(length(bin(CAST(den // num AS BIGINT))) - 1) AS DOUBLE) / COUNT(*) AS avg_bits
             |FROM sc GROUP BY 1""".stripMargin),
      "held-out Kneser-Ney perplexity: frozen d=3/4 model, pinned unseen-event backoff + uniform floor"
    ),

    // ---- span-level benchmark decontamination: the stricter production
    //      gate — contaminated iff a CONTIGUOUS ≥8-token run is shared
    //      verbatim with a held-out doc (a single 13-gram can be idiom;
    //      a long aligned span is leaked eval text). The span-dedup
    //      island machinery restricted cross-(bench, corpus); keep-list
    //      contract output ----
    "q_decontam_span" -> QueryDef(
      (s, d) =>
        SpanDedup.spanDecontamVerdicts(
          t(s, d, "documents"), "doc_id", "text",
          benchCol = conv(
            substring(md5(concat(lit("bench:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 100 < 10,
          l = 4, minLen = 8, maxGramFreq = 50),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substr(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10 AS is_bench,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), g AS MATERIALIZED (
             |  SELECT doc_id, is_bench, CAST(i AS BIGINT) AS p,
             |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]), 1, 13)) AS BIGINT) AS h
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 3, 0))) AS i) sq
             |), cg AS (
             |  SELECT doc_id, p, h FROM (
             |    SELECT doc_id, p, h, COUNT(*) OVER (PARTITION BY h) AS occ
             |    FROM g WHERE NOT is_bench)
             |  WHERE occ <= 50
             |), m AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, a.p - b.p AS delta
             |  FROM g a JOIN cg b ON b.h = a.h WHERE a.is_bench
             |), isl AS (
             |  SELECT id_a, id_b, delta, pa,
             |    pa - row_number() OVER (PARTITION BY id_a, id_b, delta ORDER BY pa) AS grp
             |  FROM m
             |), hits AS (
             |  SELECT DISTINCT id_b AS doc_id FROM isl
             |  GROUP BY id_a, id_b, delta, grp
             |  HAVING MAX(pa) - MIN(pa) + 4 >= 8)
             |SELECT t.doc_id, t.is_bench,
             |  (t.doc_id IN (SELECT doc_id FROM hits)) AS contaminated,
             |  (NOT t.is_bench AND t.doc_id NOT IN (SELECT doc_id FROM hits)) AS keep
             |FROM toks t""".stripMargin),
      "span-level decontamination: >=8-token contiguous overlap with the benchmark slice, keep-list verdicts"
    ),

    // ---- perceptual-hash image near-dup: the multimodal twin of text
    //      near-dup. A REAL PNG per sampled doc (planted cell pattern;
    //      consecutive shard ids of an even group differ in 3 cells of
    //      one row — a near duplicate; odd groups get an unrelated
    //      second image), decoded back through ImageIO on the executors
    //      (mapPartitions batch shape), 56-bit dHash over integer cell
    //      sums, then the Hamming-band recipe: 4 bands × 14 bits,
    //      same-band-key candidates only (NEVER all-pairs), exact
    //      bit_count(xor) verify ≤ 12. The oracle predicts the planted
    //      pixels arithmetically — the decode gate is real.
    //
    //      COMPLETENESS BOUND (pigeonhole, the simhashNearDupPairs
    //      contract): 4 bands guarantee a clean band — hence a candidate
    //      — only for Hamming ≤ 3. A pair in the 4..12 verify range is
    //      surfaced only if its differing bits leave SOME 14-bit band
    //      untouched; diffs spread across all 4 bands are missed. This is
    //      the deliberate scale trade: guaranteeing Hamming ≤ 12 via
    //      single-band keys needs ≥13 bands of ≤4 bits (≤16 buckets/band
    //      → O(n²/16) candidates — all-pairs in disguise), so the
    //      operator keeps 14-bit keys (16384 buckets, linear candidates)
    //      and documents the probabilistic tail. Empirical tail recall is
    //      measured by RecallProbe's phash_band_recall line (planted
    //      cross-band diffs at each Hamming 4..12); dHash bit locality
    //      (one changed cell touches ≤2 adjacent bits, so small image
    //      edits cluster in one band) keeps real-world recall far above
    //      the adversarial bound. The oracle replays the same banding, so
    //      the gate checks the recipe, not a complete-≤12 contract ----
    "mm_phash_dedup" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "documents")
          .select(col("doc_id").cast("long"))
          .filter(col("doc_id") % 10 === 0)
          .as[Long]
          .repartition(s.sparkContext.defaultParallelism) // CPU-bound decode below
        // decode once, read thrice (two band-join sides + the verify):
        // materialize the hash table rather than re-decoding per branch
        val hashes = ids.mapPartitions { it =>
          it.map { id =>
            val sid = id / 10
            (id, Multimodal.dHash56(Multimodal.synthCellPng(sid / 2, sid % 2)))
          }
        }.toDF("doc_id", "dhash").localCheckpoint(true)
        val cand = Multimodal.dhashBandCandidates(hashes)
        val out = cand
          .join(hashes.select(col("doc_id").as("id_a"), col("dhash").as("ha")), "id_a")
          .join(hashes.select(col("doc_id").as("id_b"), col("dhash").as("hb")), "id_b")
          .select(
            col("id_a"), col("id_b"),
            expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
          .filter(col("hamming") <= 12)
          .select("id_a", "id_b", "hamming")
        graft.ops.Caching.materializeAndRelease(out, hashes)
      },
      Some("""WITH p AS (
             |  SELECT doc_id, (doc_id // 10) // 2 AS grp, (doc_id // 10) % 2 AS vr
             |  FROM documents WHERE doc_id % 10 = 0),
             |cells AS (
             |  SELECT doc_id, vr, grp, ci.i AS ci, cj.j AS cj,
             |    CASE WHEN vr = 1 AND grp % 2 = 1
             |      THEN (grp * 95 + ci.i * 31 + cj.j * 5 + 17) % 251
             |      ELSE (grp * 63 + ci.i * 9 + cj.j) % 251
             |    END AS k
             |  FROM p,
             |  LATERAL (SELECT unnest(generate_series(0, 6)) AS i) ci,
             |  LATERAL (SELECT unnest(generate_series(0, 8)) AS j) cj),
             |cv AS (
             |  SELECT doc_id, ci, cj,
             |    CASE WHEN vr = 1 AND grp % 2 = 0 AND ci = 2 AND cj % 3 = 1
             |      THEN (k * k * k % 251 + 60) % 251
             |      ELSE k * k * k % 251
             |    END AS v
             |  FROM cells),
             |bits AS (
             |  SELECT doc_id, ci, cj,
             |    CASE WHEN lead(v) OVER (PARTITION BY doc_id, ci ORDER BY cj) > v THEN 1 ELSE 0 END AS bit
             |  FROM cv),
             |dh AS (
             |  SELECT doc_id, SUM(CAST(bit AS BIGINT) << (ci * 8 + cj)) AS dhash
             |  FROM bits WHERE cj <= 7 GROUP BY 1),
             |bands AS (
             |  SELECT doc_id, dhash, b.b AS band, (dhash >> (14 * b.b)) & 16383 AS bkey
             |  FROM dh, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) b),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM bands a JOIN bands c ON c.band = a.band AND c.bkey = a.bkey AND a.doc_id < c.doc_id)
             |SELECT id_a, id_b, CAST(bit_count(xor(da.dhash, db.dhash)) AS BIGINT) AS hamming
             |FROM cand
             |JOIN dh da ON da.doc_id = id_a
             |JOIN dh db ON db.doc_id = id_b
             |WHERE bit_count(xor(da.dhash, db.dhash)) <= 12""".stripMargin),
      "perceptual-hash (dHash-56) image near-dup: real PNG decode, Hamming-banded candidates, exact verify"
    )
  )

  /** CTE chain replaying [[graft.ops.Similarity.ivfPqTopK]] — the
    * [[ExtQueries.pqTopkCtes]] pipeline with its ADC candidate set
    * restricted to (query, corpus-vector) pairs whose vector sits in one
    * of the query's probed IVF cells. Same GROUP-BY ADC pivot (DuckDB
    * join-order safety, see the pqTopkCtes commentary), same fixed
    * p0+…+p{m−1} summation order. Emits `pq(query_id, neighbor_id, rank)`
    * with rank ≤ k; assumes a prior `base(vec_id, v)` CTE.
    */
  private[queries] def ivfPqTopkCtes(
      nClusters: Int,
      nProbe: Int,
      subspaces: Int,
      subDim: Int,
      nCodes: Int,
      rerankSql: String,
      k: Int,
      queryBound: Int
  ): String = {
    val pivotCols = (0 until subspaces)
      .map(s => s"        MAX(CASE WHEN s = $s THEN p END) AS p$s")
      .mkString(",\n")
    val adcSum = (0 until subspaces).map(s => s"p$s").mkString(" + ")
    s"""icent AS (SELECT vec_id AS ccid, v AS cv FROM base WHERE vec_id < $nClusters),
       |iassign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT b.vec_id, c.ccid AS cell,
       |      row_number() OVER (PARTITION BY b.vec_id
       |        ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.ccid) AS rn
       |    FROM base b CROSS JOIN icent c) WHERE rn = 1),
       |iprobes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, c.ccid AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, c.cv) DESC, c.ccid) AS rn
       |    FROM base q CROSS JOIN icent c WHERE q.vec_id < $queryBound) WHERE rn <= $nProbe),
       |psub AS (
       |  SELECT vec_id, g.s, list_slice(v, g.s * $subDim + 1, g.s * $subDim + $subDim) AS sv
       |  FROM base, LATERAL (SELECT unnest(generate_series(0, ${subspaces - 1})) AS s) g),
       |pcb AS (SELECT vec_id AS code, s, sv AS cv FROM psub WHERE vec_id < $nCodes),
       |passign AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT a.vec_id, a.s, pcb.code,
       |      row_number() OVER (PARTITION BY a.vec_id, a.s
       |        ORDER BY list_cosine_similarity(a.sv, pcb.cv) DESC, pcb.code) AS rn
       |    FROM psub a JOIN pcb ON pcb.s = a.s) WHERE rn = 1),
       |pqq AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < $queryBound),
       |plut AS (
       |  SELECT pqq.query_id, pcb.s, pcb.code,
       |    list_inner_product(list_slice(pqq.qv, pcb.s * $subDim + 1, pcb.s * $subDim + $subDim), pcb.cv) AS p
       |  FROM pqq, pcb),
       |psc AS (
       |  SELECT l.query_id, a.vec_id AS neighbor_id, a.s, l.p
       |  FROM passign a
       |  JOIN iassign ia ON ia.vec_id = a.vec_id
       |  JOIN iprobes ip ON ip.cell = ia.cell
       |  JOIN plut l ON l.s = a.s AND l.code = a.code AND l.query_id = ip.query_id
       |  WHERE a.vec_id <> ip.query_id),
       |ppool AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY $adcSum DESC, neighbor_id) AS rank
       |    FROM (
       |      SELECT query_id, neighbor_id,
       |$pivotCols
       |      FROM psc GROUP BY 1, 2)
       |  ) WHERE rank <= $rerankSql),
       |pq AS (
       |  SELECT query_id, neighbor_id, rank FROM (
       |    SELECT ppool.query_id, ppool.neighbor_id,
       |      row_number() OVER (PARTITION BY ppool.query_id
       |        ORDER BY list_cosine_similarity(qb.v, nb.v) DESC, ppool.neighbor_id) AS rank
       |    FROM ppool JOIN base qb ON qb.vec_id = ppool.query_id
       |               JOIN base nb ON nb.vec_id = ppool.neighbor_id
       |  ) WHERE rank <= $k)""".stripMargin
  }

  /** DuckDB replay of [[graft.ops.TokenPack.packTokenWindows]]: the
    * Ext5 training-replay CTE chain, then symbol-id assignment (alphabet
    * by binary order, merged ids by rank, MIN on string collisions), the
    * (doc, token pos, symbol pos)-ordered id stream with one separator
    * row per document, and the `row_number div contextLen` window roll-up.
    */
  private def packOracle(
      m: Int,
      contextLen: Int,
      textSql: String = "text",
      seq0Sql: String = Ext5Queries.CharSeq0Sql): String =
    s"""WITH ${packIdCtes(m, textSql, seq0Sql)},
       |pos AS (
       |  SELECT id, row_number() OVER (ORDER BY doc_id, tpos, spos) - 1 AS g
       |  FROM stream)
       |SELECT CAST(g // $contextLen AS BIGINT) AS window_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_seps,
       |  CAST(('0x' || substr(md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY g)), 1, 15)) AS BIGINT) AS content_fp
       |FROM pos GROUP BY 1""".stripMargin

  /** The shared id-assignment CTE prefix of every packing oracle: BPE
    * training replay ([[Ext5Queries.bpeCtes]]), symbol-id assignment
    * (alphabet in binary order + merge ranks, min-id on collisions), and
    * the per-document token-id `stream(doc_id, tpos, spos, id)` with one
    * trailing separator row per document. Emitted WITHOUT the leading
    * `WITH`, so callers append their own packing CTEs.
    */
  private[queries] def packIdCtes(
      m: Int,
      textSql: String = "text",
      seq0Sql: String = Ext5Queries.CharSeq0Sql): String = {
    val msym = (1 to m)
      .map(i => s"SELECT replace(pair, ' ', '') AS sym, (SELECT COUNT(*) FROM alpha) + $i AS id FROM m$i")
      .mkString("\n  UNION ALL\n  ")
    s"""${Ext5Queries.bpeCtes(m, textSql, seq0Sql)},
       |alpha AS (SELECT DISTINCT sym FROM (SELECT unnest(s) AS sym FROM seq0)),
       |aids AS (SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS id FROM alpha),
       |msym AS (
       |  $msym
       |),
       |sid AS (
       |  SELECT sym, MIN(id) AS id
       |  FROM (SELECT sym, id FROM aids UNION ALL SELECT sym, CAST(id AS BIGINT) AS id FROM msym)
       |  GROUP BY 1),
       |wsym AS (
       |  SELECT w, g.i AS spos, s[g.i] AS sym
       |  FROM seq$m, LATERAL (SELECT unnest(generate_series(1, len(s))) AS i) g),
       |wids AS (SELECT w, spos, id FROM wsym JOIN sid USING (sym)),
       |toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(trim($textSql), '\\s+'), x -> x <> '') AS ts
       |  FROM documents),
       |dt AS (
       |  SELECT doc_id, g.i AS tpos, ts[g.i] AS w
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g),
       |stream AS (
       |  SELECT d.doc_id, d.tpos, wi.spos, wi.id FROM dt d JOIN wids wi USING (w)
       |  UNION ALL
       |  SELECT doc_id, len(ts) + 1 AS tpos, 0 AS spos, CAST(0 AS BIGINT) AS id FROM toks)""".stripMargin
  }
}
