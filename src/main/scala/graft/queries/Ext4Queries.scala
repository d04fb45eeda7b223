package graft.queries

import graft.ops.{Dedup, GlobalRank, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth wave of extension operators — the curation/packaging layer of a
  * pretraining-data pipeline: document quality gating (Gopher rules),
  * sketch-based similarity scoring (MinHash Jaccard estimates), vector
  * compression (product quantization), deterministic corpus shuffling
  * into training shards, and per-source corpus observability.
  */
object Ext4Queries {
  import Tables.t

  /** Sink+source round-trip for one interchange format: write a
    * deterministic 10% hash sample of `documents`, read it back with an
    * EXPLICIT schema (inference is an extra scan and a nondeterminism
    * source), and aggregate per lang with an md5-chunk content
    * fingerprint. The oracle replays the SAME aggregation over the
    * parquet directly, so any row loss or text/encoding corruption in
    * the round-trip hash-mismatches — the fidelity contract for the
    * formats a training pipeline actually ships: JSONL (line-oriented;
    * splittable because a distributed write shards it into many files —
    * never whole-shard gzip at 100 TB, the codec kills splits) and ORC
    * (the columnar alternative when downstream is another SQL engine).
    * The fingerprint is an 8-hex md5 chunk (< 2^32) summed over ≤10% of
    * the corpus — exact in BIGINT on both engines. The staging path is
    * applicationId-scoped: deterministic within a run, collision-free
    * across concurrent harness processes.
    */
  private def formatRoundtrip(
      s: SparkSession,
      d: String,
      format: String,
      writeOptions: Map[String, String] = Map.empty,
      readOptions: Map[String, String] = Map.empty): DataFrame = {
    val docs = t(s, d, "documents")
      .filter(
        conv(substring(md5(concat(lit("rt:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 100 < 10)
      .select(
        col("doc_id").cast("long").as("doc_id"), col("source"), col("lang"),
        col("n_chars").cast("long").as("n_chars"), col("text"))
    val dir = s"/tmp/graft-roundtrip/${s.sparkContext.applicationId}/$format"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // staging cleanup in `finally`: a throwing read-back/aggregate must
    // not leak the staged files under /tmp/graft-roundtrip — the exact
    // unbounded accumulation the eager delete exists to prevent
    try {
      docs.write.mode("overwrite").options(writeOptions).format(format).save(dir)
      val agg = s.read
        .schema("doc_id BIGINT, source STRING, lang STRING, n_chars BIGINT, text STRING")
        .options(readOptions)
        .format(format).load(dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          // concat (NOT concat_ws): a null text must null the row's
          // fingerprint on both engines, not collapse to md5(doc_id)
          sum(conv(
            substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))), 1, 8),
            16, 10).cast("long")).as("content_fp"))
      // Materialize the aggregate (one row per lang — bounded) before the
      // `finally` delete: the lazy frame would pin the staged files for the
      // caller's lifetime, and applicationId-fresh runs otherwise accumulate
      // staging data unboundedly across sweeps.
      s.createDataFrame(agg.collectAsList(), agg.schema)
    } finally {
      // the cleanup itself can throw on a flaky filesystem, and an
      // exception escaping a finally REPLACES the primary write/read-back
      // failure — swallow cleanup errors so the real one propagates (the
      // leaked staging dir is the lesser defect and the next overwrite
      // run reclaims it)
      try {
        fs.delete(p, true)
        // drop the per-application parent too once its last format is gone
        val parent = p.getParent
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty) fs.delete(parent, true)
      } catch {
        // NonFatal, not just IOException: Hadoop LocalFileSystem wraps
        // some failures in RuntimeExceptions, and ANY throwable escaping
        // a finally replaces the primary error
        case scala.util.control.NonFatal(e) =>
          graft.util.JsonLog.warning(s"roundtrip staging cleanup failed for $dir: $e")
      }
    }
  }

  /** The pinned CSV round-trip dialect — CSV's null/empty/quote/newline
    * encodings are exactly what the md5-chunk fingerprint exists to
    * catch, and three Spark defaults silently corrupt a naive
    * write-then-read (measured by RoundtripSpec): the writer TRIMS
    * trailing whitespace (`ignoreTrailingWhiteSpace` defaults true on
    * write), a nullValue TOKEN collides with equal-valued data (the
    * writer never quotes a value that contains no quote/delimiter/
    * newline), and backslash-escape is not what RFC-4180 readers expect.
    * The dialect:
    *  - null → UNQUOTED empty field, empty string → QUOTED `""` (both
    *    are the write defaults); univocity distinguishes the two on
    *    read — unquoted empty hits `nullValue` (default ""→null), quoted
    *    empty hits `emptyValue` (pinned to ""→empty string) — so the
    *    null/empty split survives with NO in-band token to collide with
    *    data;
    *  - `escape = "`: RFC-4180 doubled-quote escaping instead of Spark's
    *    backslash default, pinned on BOTH sides;
    *  - write-side whitespace trimming off, so padded values survive;
    *  - `multiLine = true` on read: embedded newlines survive (note: a
    *    multiLine CSV file is NOT input-splittable — at 100 TB ship
    *    JSONL/ORC and keep CSV for bounded interchange extracts, which
    *    is exactly the 10% sample this gate exercises).
    */
  private[graft] val csvWriteOptions: Map[String, String] = Map(
    "emptyValue" -> "\"\"",
    "escape" -> "\"",
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false")

  private[graft] val csvReadOptions: Map[String, String] = Map(
    // the parser maps an unquoted empty field to nullValue BEFORE the
    // null comparison, but it also compares every other datum to the
    // same token — so the default nullValue="" would null a quoted
    // empty string too. A NUL sentinel keeps unquoted-empty→null while
    // quoted-empty→"" survives via emptyValue (caveat: a data value
    // that IS a lone NUL character would read as null — not encodable
    // distinctly in this dialect, and absent from any text corpus)
    "nullValue" -> "\u0000",
    "emptyValue" -> "",
    "escape" -> "\"",
    "multiLine" -> "true")

  private val roundtripOracle: String =
    """WITH s AS (
      |  SELECT doc_id, lang, n_chars, text FROM documents
      |  WHERE CAST(('0x' || substr(md5('rt:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10)
      |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8)) AS BIGINT)) AS BIGINT) AS content_fp
      |FROM s GROUP BY 1""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- interchange-format round-trips: the sink+source fidelity
    //      gates for shipped training data (see formatRoundtrip) ----
    "q_jsonl_roundtrip" -> QueryDef(
      (s, d) => formatRoundtrip(s, d, "json"),
      Some(roundtripOracle),
      "JSONL sink+source round-trip fidelity vs the direct aggregation"),
    "q_orc_roundtrip" -> QueryDef(
      (s, d) => formatRoundtrip(s, d, "orc"),
      Some(roundtripOracle),
      "ORC sink+source round-trip fidelity vs the direct aggregation"),
    "q_csv_roundtrip" -> QueryDef(
      (s, d) => formatRoundtrip(s, d, "csv", csvWriteOptions, csvReadOptions),
      Some(roundtripOracle),
      "CSV sink+source round-trip fidelity under the pinned null/empty/quote dialect"),

    // ---- Gopher-style quality gate: word-count / mean-word-length /
    //      stopword / top-token-dominance rules from one token explode,
    //      integer counts + one division per ratio → portable verdicts ----
    "text_gopher_rules" -> QueryDef(
      (s, d) => TextOps.gopherQuality(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS t
             |  FROM documents
             |), tf AS (SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
             |d AS (
             |  SELECT doc_id,
             |    CAST(SUM(c) AS BIGINT) AS n_words,
             |    CAST(SUM(c * length(t)) AS BIGINT) AS word_chars,
             |    COUNT(*) AS n_types,
             |    MAX(c) AS top_count,
             |    CAST(SUM(CASE WHEN t IN ('the','a','an','of','and','to','in','is','it','for')
             |             THEN c ELSE 0 END) AS BIGINT) AS n_stop
             |  FROM tf GROUP BY 1)
             |SELECT doc_id, n_words,
             |  CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
             |  CAST(n_types AS DOUBLE) / CAST(n_words AS DOUBLE) AS ttr,
             |  CAST(top_count AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_frac,
             |  n_stop,
             |  (n_words BETWEEN 50 AND 100000
             |    AND CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE) BETWEEN 3.0 AND 10.0
             |    AND n_stop >= 2
             |    AND CAST(top_count AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1) AS keep
             |FROM d""".stripMargin),
      "Gopher word-count/word-length/stopword/repetition gate, integer-exact"
    ),

    // ---- sketch-only dedup scoring: candidate pairs annotated with the
    //      MinHash Jaccard estimate (matching lanes / 64) — ranks and
    //      filters candidates without re-touching shingle sets ----
    "dedup_minhash_est" -> QueryDef(
      (s, d) =>
        Dedup.lshCandidatePairsWithEstFromShingles(
          SharedIntermediates.shingles(s, d), numHashes = 64, bands = 16
        ),
      Some(s"""WITH ${ExtQueries.minhashCtes(64, 16)}, pairs AS (
              |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
              |SELECT p.id_a, p.id_b,
              |  CAST(SUM(CASE WHEN la.mv = lb.mv THEN 1 ELSE 0 END) AS BIGINT) AS matched,
              |  CAST(SUM(CASE WHEN la.mv = lb.mv THEN 1 ELSE 0 END) AS DOUBLE) / 64 AS est_jaccard
              |FROM pairs p
              |JOIN lanes la ON la.doc_id = p.id_a
              |JOIN lanes lb ON lb.doc_id = p.id_b AND lb.j = la.j
              |GROUP BY 1, 2""".stripMargin),
      "MinHash lane-agreement Jaccard estimate per LSH candidate pair"
    ),

    // ---- product quantization: 64 dims → 4 subspaces × 16 dims, each
    //      assigned its most-similar of 8 fixed codes — the compressed
    //      code-word representation for billion-scale ANN ----
    "emb_pq_encode" -> QueryDef(
      (s, d) =>
        Similarity.pqEncode(
          t(s, d, "embeddings"), "vec_id", "embedding",
          subspaces = 4, subDim = 16, nCodes = 8
        ),
      Some("""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sub AS (
             |  SELECT vec_id, g.s, list_slice(v, g.s * 16 + 1, g.s * 16 + 16) AS sv
             |  FROM base, LATERAL (SELECT unnest(generate_series(0, 3)) AS s) g
             |), cb AS (SELECT vec_id AS code, s, sv AS cv FROM sub WHERE vec_id < 8),
             |j AS (
             |  SELECT a.vec_id, a.s, cb.code,
             |    row_number() OVER (PARTITION BY a.vec_id, a.s
             |      ORDER BY list_cosine_similarity(a.sv, cb.cv) DESC, cb.code) AS rn
             |  FROM sub a JOIN cb ON cb.s = a.s)
             |SELECT vec_id, CAST(s AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code
             |FROM j WHERE rn = 1""".stripMargin),
      "PQ encode: per-subspace nearest-code assignment, oracle-replayed"
    ),

    // ---- CCNet-style sub-document dedup: 8-token chunks, corpus-wide
    //      first-occurrence keep ordered by (doc_id, chunk idx), text
    //      reassembled from survivors. Two shuffles (chunk hash, doc id);
    //      no pair space ----
    "dedup_paragraph" -> QueryDef(
      (s, d) => Dedup.chunkDedup(t(s, d, "documents"), "doc_id", "text", chunkTokens = 8),
      Some("""WITH d AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(
             |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS ts
             |  FROM documents),
             |ci AS (
             |  SELECT doc_id, ts, unnest(generate_series(0, (len(ts) + 7) // 8 - 1)) AS ci
             |  FROM d),
             |ch AS (
             |  SELECT doc_id, ci,
             |    array_to_string(list_slice(ts, ci * 8 + 1, ci * 8 + 8), ' ') AS chunk,
             |    doc_id * 1048576 + ci AS okey
             |  FROM ci),
             |fo AS (SELECT md5(chunk) AS h, MIN(okey) AS first_okey FROM ch GROUP BY 1)
             |SELECT ch.doc_id,
             |  CAST(COUNT(*) AS BIGINT) AS total_chunks,
             |  CAST(SUM(CASE WHEN ch.okey = fo.first_okey THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
             |  COALESCE(string_agg(CASE WHEN ch.okey = fo.first_okey THEN ch.chunk END, ' ' ORDER BY ch.ci), '') AS cleaned_text
             |FROM ch JOIN fo ON fo.h = md5(ch.chunk)
             |GROUP BY 1""".stripMargin),
      "sub-document chunk dedup: corpus-wide first-occurrence, text rebuilt"
    ),

    // ---- hashing-trick linear classifier (fastText-style scoring with
    //      a deterministic md5 weight table): token → 52-bit md5 chunk
    //      mod 4096 bucket → md5-derived integer weight in [-1000,1000],
    //      BIGINT sum per doc — integer-exact in both engines ----
    "text_hash_classifier" -> QueryDef(
      (s, d) => TextOps.hashClassifier(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(
             |      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '')) AS t
             |  FROM documents
             |), w AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substr(md5(t), 1, 13)) AS BIGINT) % 4096 AS b
             |  FROM toks
             |), sc AS (
             |  SELECT doc_id,
             |    COUNT(*) AS n_tokens,
             |    SUM(CAST(('0x' || substr(md5('graft-clf:' || CAST(b AS VARCHAR)), 1, 13)) AS BIGINT) % 2001 - 1000) AS score_raw
             |  FROM w GROUP BY 1)
             |-- LEFT JOIN from documents: zero-token docs still get a
             |-- verdict (n_tokens 0, score 0, label false) — the same
             |-- totality the Spark side's per-row HOF fold has
             |SELECT d.doc_id, CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
             |  CAST(COALESCE(sc.score_raw, 0) AS BIGINT) AS score_raw,
             |  COALESCE(sc.score_raw, 0) > 0 AS label
             |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin),
      "hashing-trick linear scorer with md5-derived weights, integer-exact"
    ),

    // ---- SemDeDup: coarse-quantize into cells (nearest of 8 fixed
    //      centroids, same convention as emb_cluster_assign), then drop
    //      any row whose cell holds a lower-id row at cosine ≥ 0.35.
    //      The O(m²) verify never leaves a cell — the linear-ish recipe
    //      for semantic dedup over web-scale embedding corpora ----
    "dedup_semantic" -> QueryDef(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        // SemDeDup's pairwise stage is O(n²/k): a FIXED cell count is
        // quadratic at scale (k=8 measured 142.7 s at the 100× fixture —
        // 2.5G in-cell dot products). Size the cell count with the
        // corpus (avg cell ≈ 2000 rows → in-cell pair work grows
        // linearly in n), exactly as the SemDeDup recipe prescribes
        // (cluster count tracks corpus size). The oracle replays the
        // SAME count-derived k, so the result stays hash-exact at every
        // scale; at the sf0.01/sf0.1 gates the formula floors to the
        // historical k=8. The count() is metadata-only on parquet.
        val k = math.max(8L, emb.count() / 2000L).toInt
        Similarity.semanticDedup(
          emb, "vec_id", "embedding",
          k = k, threshold = 0.35
        ).withColumn("centroid_id", col("centroid_id").cast("long"))
      },
      Some("""WITH kk AS (SELECT GREATEST(8, COUNT(*) // 2000) AS k FROM embeddings),
             |cl AS (
             |  SELECT vid AS vec_id, cid AS centroid_id FROM (
             |    SELECT v.vec_id AS vid, c.vec_id AS cid,
             |      row_number() OVER (PARTITION BY v.vec_id
             |        ORDER BY list_cosine_similarity(CAST(v.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
             |                 c.vec_id) AS rn
             |    FROM embeddings v, embeddings c, kk WHERE c.vec_id < kk.k
             |  ) WHERE rn = 1),
             |m AS (SELECT cl.vec_id, cl.centroid_id, CAST(e.embedding AS DOUBLE[]) AS v
             |      FROM cl JOIN embeddings e USING (vec_id)),
             |drp AS (SELECT DISTINCT b.vec_id FROM m a JOIN m b
             |        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
             |        WHERE list_cosine_similarity(a.v, b.v) >= 0.35)
             |SELECT m.vec_id, CAST(m.centroid_id AS BIGINT) AS centroid_id,
             |       m.vec_id NOT IN (SELECT vec_id FROM drp) AS kept
             |FROM m""".stripMargin),
      "SemDeDup: per-cell cosine pruning after coarse quantization"
    ),

    // ---- PQ asymmetric-distance top-k: full-precision queries scored
    //      against PQ-coded corpus via a per-(query, subspace, code)
    //      lookup table; ADC sum is a fixed-order add chain so the FP
    //      math replays exactly. The memory-compressed ANN re-rank ----
    "emb_pq_adc_topk" -> QueryDef(
      (s, d) =>
        Similarity.pqAdcTopK(
          t(s, d, "embeddings"), "vec_id", "embedding",
          k = 5, queryPred = col("cid") < 50,
          subspaces = 16, subDim = 4, nCodes = 64,
          rerankK = Similarity.AdaptiveRerank
        ).withColumn("rank", col("rank").cast("long")),
      Some {
        s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |${ExtQueries.pqTopkCtes(subspaces = 16, subDim = 4, nCodes = 64, rerankSql = ExtQueries.pqAdaptiveRerankSql, k = 5, queryBound = 50)}
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM pq""".stripMargin
      },
      "PQ ADC shortlist + exact re-rank: LUT-scored compressed-corpus ANN"
    ),

    // ---- deterministic global shuffle into training shards: md5-keyed
    //      permutation via the partitioned global rank (no single-task
    //      window), then round-robin shard + in-shard position ----
    "q_shuffle_shard" -> QueryDef(
      (s, d) => {
        val ranked = GlobalRank.globalRank(
          t(s, d, "documents").select(col("doc_id")),
          Seq(md5(concat(lit("shuf:"), col("doc_id").cast("string"))).asc, col("doc_id").asc),
          "rnk",
          parts = 16
        )
        ranked.select(
          col("doc_id"),
          ((col("rnk") - 1) % 8).cast("long").as("shard"),
          floor((col("rnk") - 1) / lit(8.0)).cast("long").as("pos")
        )
      },
      Some("""SELECT doc_id,
             |  CAST((rn - 1) % 8 AS BIGINT) AS shard,
             |  CAST((rn - 1) // 8 AS BIGINT) AS pos
             |FROM (
             |  SELECT doc_id, row_number() OVER (
             |    ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)""".stripMargin),
      "hash-keyed deterministic corpus shuffle into 8 training shards"
    ),

    // ---- temperature-balanced mixture sampling (alpha = 0.5): per-source
    //      keep rate sqrt(n_min/n_s) up-weights small sources relative to
    //      big ones — the standard multilingual/multi-domain pretraining
    //      rebalance. Rates are sqrt+divide of exact integer counts (both
    //      correctly-rounded IEEE ops → identical doubles on both
    //      engines); keeps are deterministic md5 uniforms, so the sample
    //      is exactly reproducible. One agg + one broadcast join. ----
    "q_mixture_temperature" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
        val nmin = counts.agg(min(col("n_s")).as("n_min"))
        val rates = counts
          .crossJoin(broadcast(nmin))
          .select(
            col("source"),
            (sqrt(col("n_min").cast("double")) / sqrt(col("n_s").cast("double"))).as("keep_rate"))
        val u = conv(substring(md5(concat(lit("mixtemp:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
          .cast("long").cast("double") / lit(4503599627370496.0) // 2^52
        docs
          .join(broadcast(rates), "source")
          .filter(u < col("keep_rate"))
          .select(col("doc_id"), col("source"))
      },
      Some("""WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
             |m AS (SELECT MIN(n_s) AS n_min FROM c),
             |r AS (SELECT source, sqrt(CAST(n_min AS DOUBLE)) / sqrt(CAST(n_s AS DOUBLE)) AS keep_rate
             |      FROM c, m)
             |SELECT d.doc_id, d.source
             |FROM documents d JOIN r ON r.source = d.source
             |WHERE CAST(('0x' || substr(md5('mixtemp:' || CAST(d.doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
             |      / 4503599627370496.0 < r.keep_rate""".stripMargin),
      "temperature (alpha=0.5) source rebalance, deterministic md5 keeps"
    ),

    // ---- streaming exact dedup: dropDuplicatesWithinWatermark drained
    //      AvailableNow. Only the key set is emitted (which physical row
    //      survives same-batch dedup is arrival-order dependent; the set
    //      is deterministic and equals batch DISTINCT). ----
    "q_stream_dedup" -> QueryDef(
      (s, d) =>
        graft.streaming.EventStream.dedupRunOnce(s, s"$d/events.parquet", "10 minutes"),
      Some("SELECT DISTINCT user_id, event_type FROM events"),
      "watermark-bounded streaming dedup; surviving key set = batch DISTINCT"
    ),

    // ---- vocabulary growth (Heaps-law curve): distinct word BIGRAMS
    //      seen after each 25-doc ingest prefix, from one argmin
    //      (bigram → first doc) + a small cumulative window — the
    //      corpus statistic that forecasts vocab/n-gram-table growth as
    //      data scales (bigrams, because the fixture's unigram vocab
    //      saturates inside the first bucket) ----
    "q_vocab_growth" -> QueryDef(
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), TextOps.normTokens(col("text")).as("__ts"))
          .select(col("doc_id"), explode(TextOps.shinglesFromTokens(col("__ts"), 2)).as("tk"))
        val firstDoc = toks.groupBy("tk").agg(min("doc_id").as("fd"))
        val buckets = firstDoc
          .groupBy(floor(col("fd") / 25).cast("long").as("bucket"))
          .agg(count(lit(1)).as("new_tokens"))
        // the running total is the two-level distributed prefix sum, NOT
        // a bare `sum OVER (ORDER BY bucket)`: the bucket table grows
        // with the corpus (n_docs/25 rows — 100 TB of 4 KB docs is ~1B
        // buckets), so the single-partition window that sizes with the
        // DATA is replaced by per-range local sums + a |partitions|-row
        // offset side; sums are exact integers, order-free.
        // buckets is checkpointed first (r21): globalCumSum's range
        // sampler re-ran the whole explode + two-aggregate chain a
        // second time when fed lazily; the checkpoint is n_docs/25
        // 2-long rows at any scale
        // durability: local by default, reliable under
        // spark.graft.checkpoint.dir (the r22 checkpoint rule in Caching)
        val bucketsM = graft.ops.Caching.eagerCheckpoint(buckets)
        val cum = graft.ops.GlobalRank
          .globalCumSum(
            bucketsM, Seq(col("bucket")), col("new_tokens"), "vocab_size",
            parts = s.sessionState.conf.numShufflePartitions)
        graft.ops.Caching.release(bucketsM)
        cum.select(
          ((col("bucket") + 1) * 25).as("docs_ingested"),
          col("new_tokens"),
          col("vocab_size"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), toks AS (
             |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] AS tk
             |  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i) g
             |), fo AS (SELECT tk, MIN(doc_id) AS fd FROM toks GROUP BY 1),
             |b AS (SELECT CAST(fd // 25 AS BIGINT) AS bucket, COUNT(*) AS new_tokens FROM fo GROUP BY 1)
             |SELECT (bucket + 1) * 25 AS docs_ingested,
             |  CAST(new_tokens AS BIGINT) AS new_tokens,
             |  CAST(SUM(new_tokens) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
             |FROM b""".stripMargin),
      "distinct-vocabulary growth per 25-doc ingest prefix (Heaps curve)"
    ),

    // ---- market-basket lift on the FACT table: parts co-purchased in
    //      the same order, ranked by integer-exact lift with min
    //      support — the q_token_lift blocking pattern exercised at
    //      lineitem scale (pairs per order are bounded by basket size,
    //      never the part-catalog cross) ----
    // Shape note (three measured negatives, r12-r14, all rejected):
    // (1) checkpointing the distinct (order, part) frame before its four
    // consumers — the pinned ~1 GB starves the pair-expansion join
    // (sf10 55.7 -> 66.3 s); (2) per-order sorted baskets (collect_set)
    // + in-row transform×slice pair generation replacing the self-join —
    // the object-hash collect_set partial (369 s CPU, 34 s GC, 369 MB
    // spill) and a fatter pair exchange (1.5 vs 1.19 GB) cost more than
    // the join they removed (sf10 64.0 -> 72.9 s isolated). The
    // self-join over lazily re-scanned columnar parquet IS the fast
    // shape at this memory budget; the pair-space partial agg is the
    // query's inherent candidate mass. (3) support-threshold prefilter
    // (a pair needs n_ab >= 3, so semi-filtering li to parts with
    // n_p >= 3 before the self-join is sound and would bound the
    // expansion on a sparse corpus) — a measured NO-OP here: 0 of 2k/20k
    // parts at sf0.01/sf0.1 appear in <3 orders (per-part mean ~30
    // orders), and ScaleGen offsets part keys per copy, so the per-part
    // frequency distribution at sf1/sf10 is exactly sf0.1's — the filter
    // drops zero rows at every scale of this corpus and would only add a
    // frequency build + semi-join probe to the hot path.
    "q_basket_lift" -> QueryDef(
      (s, d) => {
        val nPart = s.sessionState.conf.numShufflePartitions * 2
        val liRaw = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
        // plan-time shape pick from the scan's COLUMN-PRUNED size stats
        // (file bytes × projected-width ratio — no job): past ~100 MB of
        // pruned input (≈20M+ (order, part) rows; the fixture reads
        // 2.2 MB / 27 MB / 312 MB at sf0.1/1/10) the classic shape's
        // spill (r15's one remaining sf10 spiller) moves to the
        // SPILL-PROOF shape; below it the classic AQE-coalesced shape is
        // ~1 s faster (gate-scale triples) because the spill it avoids
        // never happens there.
        //
        // The spill-proof shape (r16 StageProbe: after the r15 fixes,
        // ALL remaining spill — 2.8 GB over four stages at sf10 — was
        // the distinct's partial hash build, re-executed per consumer):
        // (a) explicit-N repartition on (order, part) BEFORE the
        // distinct — distribution satisfied → the partial drops out and
        // with it the per-task 60M-row hash build (pairs are mostly
        // unique, so the partial barely compacted the exchange anyway:
        // 597 MB written post-partial vs ~650 MB raw); (b) n_orders
        // from the RAW table, not the pair-distinct frame (stacking the
        // two distincts re-ran the pair partial just to count orders);
        // (c) explicit-N repartition on l_orderkey before the
        // self-join, so the SMJ sorts keep full width instead of AQE's
        // ~35 coalesced tasks. Measured sf10 triples: classic
        // 33.2 s / 4.9 GB disk spill → spill-proof 28.3 s / ZERO spill
        // (mem AND disk); sf1 classic 5.2 s beats spill-proof 6.3 s,
        // hence the threshold.
        val spillProof =
          liRaw.queryExecution.optimizedPlan.stats.sizeInBytes > (100L << 20)
        val li =
          if (spillProof)
            liRaw.repartition(nPart, col("l_orderkey"), col("l_partkey")).distinct()
          else liRaw.distinct()
        val nOrders =
          (if (spillProof) t(s, d, "lineitem").select("l_orderkey").distinct()
           else li.select("l_orderkey").distinct())
            .agg(count(lit(1)).as("n_orders"))
        val pf = li.groupBy("l_partkey").agg(count(lit(1)).as("n_p"))
        // explicit-N repartition on the pair key before the aggregation:
        // (a) the partial aggregate drops out (distribution satisfied →
        // one complete agg) — the map-side hash insert per generated
        // pair was pure overhead on the query's heaviest stage; (b) AQE
        // cannot coalesce an explicit-N user repartition, so the agg
        // keeps full width instead of the measured 35 coalesced tasks
        // spilling ~1.2 GB. 2× the batch lever (r14 A/B at sf10:
        // 37.9/37.3 s vs 43.8/51.1 s at 1×, sf0.1 indifferent): the
        // ~1.5B-pair agg state per task halves, cutting memory pressure
        // on the complete agg. (A SHUFFLE_HASH join hint instead:
        // measured negative, +37% wall.)
        val liJ = if (spillProof) li.repartition(nPart, col("l_orderkey")) else li
        val rawPairs = liJ.select(col("l_orderkey"), col("l_partkey").as("pa"))
          .join(liJ.select(col("l_orderkey"), col("l_partkey").as("pb")), "l_orderkey")
          .filter(col("pa") < col("pb"))
        // The explicit pair-key repartition belongs to the SPILL-PROOF
        // shape only (its two rationales — dropping the partial agg's
        // per-task hash build and defeating AQE's 35-task coalesce — are
        // both about the ~1.5B-pair sf10 state). In the classic shape it
        // was pure overhead: an extra full-width exchange of the pair
        // stream ahead of an aggregation AQE sizes fine at gate scale.
        // Measured r22 (repeat-5 medians): 2.13 -> 1.65 s at 32 cores,
        // 2.59 -> 1.69 s at 8 (bench/r22_basket_ab_*.json).
        val pairs = (if (spillProof) rawPairs.repartition(nPart * 2, col("pa"), col("pb"))
                     else rawPairs)
          .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 3)
        pairs
          .join(pf.select(col("l_partkey").as("pa"), col("n_p").as("n_a")), "pa")
          .join(pf.select(col("l_partkey").as("pb"), col("n_p").as("n_b")), "pb")
          .crossJoin(broadcast(nOrders))
          .select(
            col("pa").as("part_a"), col("pb").as("part_b"), col("n_ab"),
            (col("n_ab").cast("double") * col("n_orders").cast("double") /
              (col("n_a") * col("n_b")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("part_a").asc, col("part_b").asc)
          .limit(20)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
             |pf AS (SELECT l_partkey, COUNT(*) AS n_p FROM li GROUP BY 1),
             |pr AS (
             |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
             |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
             |SELECT pa AS part_a, pb AS part_b, CAST(n_ab AS BIGINT) AS n_ab,
             |  CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE) / CAST(fa.n_p * fb.n_p AS DOUBLE) AS lift
             |FROM pr, n
             |JOIN pf fa ON fa.l_partkey = pa
             |JOIN pf fb ON fb.l_partkey = pb
             |ORDER BY lift DESC, part_a, part_b LIMIT 20""".stripMargin),
      "co-purchase part pairs by integer-exact lift over the fact table"
    ),

    // ---- exact time-decayed engagement: half-life decay with the decay
    //      factor bucketed to powers of two per week of age, so every
    //      term is cents · 2^(10−k) — an exact BIGINT — and the final
    //      ÷1024 is a dyadic (representation-exact) division. The
    //      portable alternative to pow(0.5, age/halflife), which is
    //      libm-dependent ----
    "q_time_decay_score" -> QueryDef(
      (s, d) =>
        t(s, d, "events")
          .withColumn("k",
            greatest(lit(0), least(lit(10),
              floor(datediff(lit("2024-03-01").cast("date"), to_date(col("ts"))) / 7))).cast("int"))
          .withColumn("w", expr("shiftright(1024, k)"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .groupBy("user_id")
          .agg(sum(col("cents") * col("w")).as("score_scaled"))
          .select(
            col("user_id"),
            col("score_scaled"),
            (col("score_scaled").cast("double") / 1024.0).as("decayed_score")),
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents,
             |    (1024 >> GREATEST(0, LEAST(10,
             |      CAST(FLOOR(date_diff('day', CAST(ts AS DATE), DATE '2024-03-01') / 7.0) AS INT)))) AS w
             |  FROM events)
             |SELECT user_id, CAST(SUM(cents * w) AS BIGINT) AS score_scaled,
             |  CAST(SUM(cents * w) AS DOUBLE) / 1024.0 AS decayed_score
             |FROM ev GROUP BY 1""".stripMargin),
      "weekly power-of-two decay: integer-exact half-life scoring"
    ),

    // ---- hourly volume anomaly detection: z-score each (type, hour)
    //      event count against that type's hourly distribution (exact
    //      integer moments, identical IEEE formula both engines) and
    //      flag |z| > 3 — the ops-side monitor a streaming ingest runs
    //      batch-side for backfill audits ----
    "q_event_anomaly" -> QueryDef(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val stats = hourly
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("m"),
            sum(col("n").cast("decimal(38,0)")).cast("double").as("sy"),
            sum((col("n") * col("n")).cast("decimal(38,0)")).cast("double").as("syy"))
        // nullif(sd, 0): a zero-variance group (e.g. a type with one hourly
        // bucket) yields NULL z instead of NaN/Inf — identical in both
        // engines regardless of DuckDB's ieee_floating_point_ops setting.
        hourly
          .join(broadcast(stats), "event_type")
          .select(
            col("event_type"), col("h"), col("n"),
            ((col("n").cast("double") - col("sy") / col("m")) /
              nullif(sqrt(col("m") * col("syy") - col("sy") * col("sy")) / col("m"), lit(0.0))).as("z_hour"))
          .withColumn("is_anomaly", abs(col("z_hour")) > 3.0)
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2
             |), st AS (
             |  SELECT event_type, COUNT(*) AS m,
             |    CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(n * n AS DECIMAL(38,0))) AS DOUBLE) AS syy
             |  FROM hourly GROUP BY 1)
             |SELECT hourly.event_type, hourly.h, CAST(hourly.n AS BIGINT) AS n,
             |  (CAST(hourly.n AS DOUBLE) - st.sy / st.m) /
             |    nullif(sqrt(st.m * st.syy - st.sy * st.sy) / st.m, 0) AS z_hour,
             |  abs((CAST(hourly.n AS DOUBLE) - st.sy / st.m) /
             |    nullif(sqrt(st.m * st.syy - st.sy * st.sy) / st.m, 0)) > 3.0 AS is_anomaly
             |FROM hourly JOIN st USING (event_type)""".stripMargin),
      "per-type hourly volume z-scores with 3-sigma anomaly flags"
    ),

    // ---- stream-static enrichment: streaming events broadcast-join a
    //      batch-computed dimension, then tumbling-window counts. The
    //      join is stateless (static side re-broadcast per micro-batch);
    //      only the window agg holds bounded state ----
    "q_stream_enrich" -> QueryDef(
      (s, d) =>
        graft.streaming.EventStream.enrichRunOnce(s, s"$d/events.parquet", "1 hour"),
      Some("""WITH dim AS (SELECT event_type, COUNT(*) AS type_total FROM events GROUP BY 1)
             |SELECT date_trunc('hour', ts) AS ws, event_type,
             |  COUNT(*) AS n,
             |  MAX(dim.type_total) AS type_total
             |FROM events JOIN dim USING (event_type)
             |GROUP BY 1, 2""".stripMargin),
      "stream-static broadcast enrichment + tumbling counts, batch-equivalent"
    ),

    // ---- sketch aggregate #2: approximate percentile, checked against
    //      its rank-error contract (like q_approx_count_distinct's 3·rsd
    //      bound): the returned value's exact-rank interval must overlap
    //      the target rank ± n/accuracy. Spark emits the measured
    //      verdict, DuckDB emits TRUE from the exact ranks. ----
    "q_approx_percentile" -> QueryDef(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val apx = li
          .groupBy("l_returnflag")
          .agg(
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("__apx"),
            count(lit(1)).as("__n"))
        li.join(broadcast(apx), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("l_extendedprice") <= col("__apx"), 1L).otherwise(0L)).as("__le"),
            sum(when(col("l_extendedprice") < col("__apx"), 1L).otherwise(0L)).as("__lt"),
            max(col("__n")).as("__n"))
          .select(
            col("l_returnflag"),
            (col("__le").cast("double") >= lit(0.5) * col("__n").cast("double")
              - col("__n").cast("double") / 1000.0 - 2.0 &&
              (col("__lt") + 1).cast("double") <= lit(0.5) * col("__n").cast("double")
              + col("__n").cast("double") / 1000.0 + 2.0).as("within_bound"))
      },
      Some("""SELECT l_returnflag, TRUE AS within_bound
             |FROM lineitem GROUP BY 1""".stripMargin),
      "approx median checked against its n/accuracy rank-error contract"
    ),

    // ---- hybrid retrieval: reciprocal-rank fusion of the lexical
    //      (df-capped inverted index) and dense (exact cosine) top-20
    //      lists, integer-scaled so the fusion replays exactly. Both
    //      retrievers stay in their own scale shape; fusion only sees
    //      ≤2·poolK bounded rows per query ----
    "q_hybrid_rrf" -> QueryDef(
      (s, d) =>
        graft.ops.Retrieval.hybridRrfTopK(
          t(s, d, "documents"), t(s, d, "embeddings"),
          "doc_id", "text", "vec_id", "embedding",
          k = 5, poolK = 20, rrfK = 60, queryMax = 50L, maxDf = 50
        ),
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '')) AS t
             |  FROM documents
             |), tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
             |kept AS (SELECT t FROM tf GROUP BY t HAVING COUNT(*) <= 50),
             |idx AS (SELECT tf.doc_id, tf.t, tf.tf FROM tf JOIN kept USING (t)),
             |sscored AS (
             |  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id, SUM(a.tf * b.tf) AS score
             |  FROM idx a JOIN idx b ON a.t = b.t AND a.doc_id <> b.doc_id
             |  GROUP BY 1, 2),
             |srk AS (
             |  SELECT query_id, neighbor_id, rs FROM (
             |    SELECT query_id, neighbor_id,
             |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rs
             |    FROM sscored) WHERE rs <= 20),
             |drk AS (
             |  SELECT query_id, neighbor_id, rd FROM (
             |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
             |                 c.vec_id) AS rd
             |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
             |    WHERE q.vec_id < 50) WHERE rd <= 20),
             |fused AS (
             |  SELECT COALESCE(s.query_id, d.query_id) AS query_id,
             |         COALESCE(s.neighbor_id, d.neighbor_id) AS neighbor_id,
             |         COALESCE(1000000 // (60 + s.rs), 0) + COALESCE(1000000 // (60 + d.rd), 0) AS rrf_score
             |  FROM (SELECT * FROM srk WHERE query_id < 50) s
             |  FULL OUTER JOIN drk d
             |    ON s.query_id = d.query_id AND s.neighbor_id = d.neighbor_id)
             |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, CAST(rrf_score AS BIGINT) AS rrf_score
             |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, neighbor_id) AS rank
             |      FROM fused)
             |WHERE rank <= 5""".stripMargin),
      "reciprocal-rank fusion of lexical and dense top-k, integer-exact"
    ),

    // ---- the curation funnel: Gopher quality gate → hash classifier →
    //      exact dedup → fuzzy (LSH-verified CC) dedup, with cumulative
    //      survivor counts per stage — the observability artifact a
    //      curation run ends with. Pure composition of gates that are
    //      each independently oracle-proven; one extra pass computes all
    //      four per-doc flags and a 5-row rollup ----
    "q_curation_funnel" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        // Left-join from the corpus so stage 0 ("ingest") counts every doc:
        // gopherQuality derives from exploded tokens, so a zero-token doc
        // has no quality row — default it to keep=false instead of silently
        // dropping it from the funnel (totality matches the classifier flag).
        val gq = docs.select("doc_id")
          .join(
            TextOps.gopherQuality(docs, "doc_id", "text")
              .select(col("doc_id"), col("keep").as("__gk")),
            Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("__gk"), lit(false)).as("g_quality"))
        val clf = TextOps.hashClassifier(docs, "doc_id", "text")
          .select(col("doc_id"), col("label").as("g_clf"))
        val ex = docs.select(col("doc_id"), md5(col("text")).as("__h"))
        val exKeep = ex.groupBy("__h").agg(min("doc_id").as("__keeper"))
        val g3 = ex.join(exKeep, "__h")
          .select(col("doc_id"), (col("doc_id") === col("__keeper")).as("g_exact"))
        val pairs = SharedIntermediates.verifiedPairs(s, d)
        val kl = Dedup.keepList(docs, "doc_id", pairs.select("id_a", "id_b"), iterations = 4)
          .select(col("doc_id"), col("is_canonical").as("g_fuzzy"))
        val flags = gq.join(clf, "doc_id").join(g3, "doc_id").join(kl, "doc_id")
        val agg = flags.agg(
          count(lit(1)).as("n0"),
          sum(when(col("g_quality"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("g_quality") && col("g_clf"), 1L).otherwise(0L)).as("n2"),
          sum(when(col("g_quality") && col("g_clf") && col("g_exact"), 1L).otherwise(0L)).as("n3"),
          sum(when(col("g_quality") && col("g_clf") && col("g_exact") && col("g_fuzzy"), 1L)
            .otherwise(0L)).as("n4"))
        agg.select(explode(array(
          struct(lit(0L).as("stage"), lit("ingest").as("stage_name"), col("n0").as("n_docs")),
          struct(lit(1L).as("stage"), lit("quality_gate").as("stage_name"), col("n1").as("n_docs")),
          struct(lit(2L).as("stage"), lit("classifier").as("stage_name"), col("n2").as("n_docs")),
          struct(lit(3L).as("stage"), lit("exact_dedup").as("stage_name"), col("n3").as("n_docs")),
          struct(lit(4L).as("stage"), lit("fuzzy_dedup").as("stage_name"), col("n4").as("n_docs"))
        )).as("r"))
          .select(col("r.stage"), col("r.stage_name"), col("r.n_docs"))
      },
      Some("""WITH gt AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS t
             |  FROM documents
             |), gtf AS (SELECT doc_id, t, COUNT(*) AS c FROM gt GROUP BY 1, 2),
             |gd AS (
             |  SELECT doc_id, SUM(c) AS n_words, SUM(c * length(t)) AS wc, MAX(c) AS top_count,
             |    SUM(CASE WHEN t IN ('the','a','an','of','and','to','in','is','it','for') THEN c ELSE 0 END) AS n_stop
             |  FROM gtf GROUP BY 1),
             |gflag AS (
             |  -- LEFT JOIN from documents: a zero-token doc has no gd row;
             |  -- it ingests with g_quality=false rather than vanishing
             |  SELECT d.doc_id,
             |    COALESCE(gd.n_words BETWEEN 50 AND 100000
             |      AND CAST(gd.wc AS DOUBLE) / gd.n_words BETWEEN 3.0 AND 10.0
             |      AND gd.n_stop >= 2
             |      AND CAST(gd.top_count AS DOUBLE) / gd.n_words <= 0.1, FALSE) AS g_quality
             |  FROM documents d LEFT JOIN gd ON gd.doc_id = d.doc_id),
             |ct AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '')) AS t
             |  FROM documents),
             |cw AS (SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 13)) AS BIGINT) % 4096 AS b FROM ct),
             |csum AS (
             |  SELECT doc_id,
             |    SUM(CAST(('0x' || substr(md5('graft-clf:' || CAST(b AS VARCHAR)), 1, 13)) AS BIGINT) % 2001 - 1000) AS s
             |  FROM cw GROUP BY 1),
             |cflag AS (
             |  -- LEFT JOIN: docs with raw tokens but zero NORMALIZED
             |  -- tokens still reach the funnel (classifier is total on
             |  -- the Spark side; score 0 → label false)
             |  SELECT d.doc_id, COALESCE(csum.s, 0) > 0 AS g_clf
             |  FROM documents d LEFT JOIN csum ON csum.doc_id = d.doc_id),
             |eflag AS (
             |  SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS g_exact
             |  FROM documents),
             |toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), sh AS (
             |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) g
             |),
             |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |pr AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), pairs AS (
             |  SELECT id_a, id_b FROM pr
             |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
             |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4
             |), e AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
             |l1 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l0 l LEFT JOIN e ON e.src = l.node LEFT JOIN l0 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l2 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l1 l LEFT JOIN e ON e.src = l.node LEFT JOIN l1 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l3 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l2 l LEFT JOIN e ON e.src = l.node LEFT JOIN l2 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l4 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l3 l LEFT JOIN e ON e.src = l.node LEFT JOIN l3 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |fflag AS (
             |  SELECT d.doc_id, COALESCE(cc.label, d.doc_id) = d.doc_id AS g_fuzzy
             |  FROM documents d LEFT JOIN l4 cc ON cc.node = d.doc_id),
             |fl AS MATERIALIZED (
             |  -- MATERIALIZED is load-bearing: fl is referenced once per
             |  -- funnel stage below, and inlining would re-run the whole
             |  -- shingle self-join + CC chain five times (observed to
             |  -- exhaust DuckDB temp disk at sf0.1)
             |  SELECT g.doc_id, g.g_quality, c.g_clf, e2.g_exact, f.g_fuzzy
             |  FROM gflag g JOIN cflag c USING (doc_id)
             |  JOIN eflag e2 USING (doc_id) JOIN fflag f USING (doc_id))
             |SELECT CAST(0 AS BIGINT) AS stage, 'ingest' AS stage_name, CAST(COUNT(*) AS BIGINT) AS n_docs FROM fl
             |UNION ALL SELECT 1, 'quality_gate', CAST(COUNT(*) FILTER (WHERE g_quality) AS BIGINT) FROM fl
             |UNION ALL SELECT 2, 'classifier', CAST(COUNT(*) FILTER (WHERE g_quality AND g_clf) AS BIGINT) FROM fl
             |UNION ALL SELECT 3, 'exact_dedup', CAST(COUNT(*) FILTER (WHERE g_quality AND g_clf AND g_exact) AS BIGINT) FROM fl
             |UNION ALL SELECT 4, 'fuzzy_dedup', CAST(COUNT(*) FILTER (WHERE g_quality AND g_clf AND g_exact AND g_fuzzy) AS BIGINT) FROM fl""".stripMargin),
      "per-stage survivor counts through the composed curation pipeline"
    ),

    // ---- UniMax budget allocation: water-fill a 550k-char training
    //      budget across sources, each capped at 4 epochs of its own
    //      units. Closed-form saturated-prefix + integer water level —
    //      no FP in the decision path, windows run over |sources| rows ----
    "q_unimax_budget" -> QueryDef(
      (s, d) =>
        graft.ops.Sampling.unimaxAllocation(
          t(s, d, "documents"), "source", col("n_chars"),
          budget = 550000L, maxEpochs = 4),
      Some("""WITH caps AS (
             |  SELECT source, SUM(n_chars) AS n_units, SUM(n_chars) * 4 AS cap
             |  FROM documents GROUP BY 1),
             |rk AS (
             |  SELECT source, n_units, cap,
             |    row_number() OVER (ORDER BY cap, source) AS i,
             |    SUM(cap) OVER (ORDER BY cap, source ROWS UNBOUNDED PRECEDING) AS p,
             |    COUNT(*) OVER () AS n
             |  FROM caps),
             |fl AS (
             |  SELECT *, CASE WHEN cap * (n - i + 1) <= 550000 - (p - cap) THEN i ELSE 0 END AS sat_i
             |  FROM rk),
             |kk AS (
             |  SELECT MAX(sat_i) AS k,
             |         COALESCE(MAX(CASE WHEN sat_i = i THEN p END), 0) AS pk
             |  FROM fl)
             |SELECT source,
             |  CAST(n_units AS BIGINT) AS n_units,
             |  CAST(cap AS BIGINT) AS cap,
             |  CAST(CASE WHEN i <= k THEN cap ELSE (550000 - pk) // (n - k) END AS BIGINT) AS alloc,
             |  CAST(CASE WHEN i <= k THEN cap ELSE (550000 - pk) // (n - k) END AS DOUBLE) / n_units AS epochs_used
             |FROM fl, kk""".stripMargin),
      "epoch-capped water-filling of a training budget across sources"
    ),

    // ---- cross-source leakage report: verified near-dup pairs rolled up
    //      by unordered source pair — which feeds are copying which. The
    //      pair set is the composed LSH→exact-verify chain (its oracle =
    //      exact Jaccard pairs, proven by dedup_minhash_verified); the
    //      rollup adds two id-keyed joins + one small agg ----
    "q_cross_source_leakage" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        val pairs = SharedIntermediates.verifiedPairs(s, d)
        val srcA = docs.select(col("doc_id").as("id_a"), col("source").as("src_a"))
        val srcB = docs.select(col("doc_id").as("id_b"), col("source").as("src_b"))
        pairs.select("id_a", "id_b")
          .join(srcA, "id_a").join(srcB, "id_b")
          .select(
            least(col("src_a"), col("src_b")).as("src_lo"),
            greatest(col("src_a"), col("src_b")).as("src_hi"))
          .groupBy("src_lo", "src_hi")
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), sh AS (
             |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) g
             |), sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |pr AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), vp AS (
             |  SELECT id_a, id_b
             |  FROM pr JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
             |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4)
             |SELECT least(da.source, db.source) AS src_lo,
             |       greatest(da.source, db.source) AS src_hi,
             |       CAST(COUNT(*) AS BIGINT) AS n_pairs
             |FROM vp JOIN documents da ON da.doc_id = vp.id_a
             |        JOIN documents db ON db.doc_id = vp.id_b
             |GROUP BY 1, 2""".stripMargin),
      "near-dup pair counts by unordered source pair — the leakage matrix"
    ),

    // ---- near-dup cluster-size distribution: group docs by their CC
    //      canonical representative, histogram the cluster sizes — the
    //      "how big do dup families get" observability that decides
    //      whether dedup keeps one-per-cluster or caps per-cluster ----
    "q_dedup_cluster_stats" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        val pairs = SharedIntermediates.verifiedPairs(s, d)
        val kl = Dedup.keepList(docs, "doc_id", pairs.select("id_a", "id_b"), iterations = 4)
        kl.groupBy("canonical_id").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), sh AS (
             |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) g
             |),
             |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |pr AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), pairs AS (
             |  SELECT id_a, id_b FROM pr
             |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
             |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4
             |), e AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
             |l1 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l0 l LEFT JOIN e ON e.src = l.node LEFT JOIN l0 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l2 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l1 l LEFT JOIN e ON e.src = l.node LEFT JOIN l1 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l3 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l2 l LEFT JOIN e ON e.src = l.node LEFT JOIN l2 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l4 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l3 l LEFT JOIN e ON e.src = l.node LEFT JOIN l3 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |cl AS (
             |  SELECT COALESCE(cc.label, d.doc_id) AS canonical_id, COUNT(*) AS cluster_size
             |  FROM documents d LEFT JOIN l4 cc ON cc.node = d.doc_id
             |  GROUP BY 1)
             |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
             |       CAST(COUNT(*) AS BIGINT) AS n_clusters
             |FROM cl GROUP BY 1""".stripMargin),
      "near-dup family size histogram over the CC keep-list"
    ),

    // ---- per-source quality calibration: z-score the hash-classifier
    //      score WITHIN each source (exact integer moments, identical
    //      IEEE formula both engines) — classifier scores from different
    //      feeds become comparable before a global quality cut ----
    "text_quality_calibrated" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        val scores = TextOps.hashClassifier(docs, "doc_id", "text")
          .join(docs.select("doc_id", "source"), "doc_id")
          .select(col("doc_id"), col("source"), col("score_raw"))
        val stats = scores
          .groupBy("source")
          .agg(
            count(lit(1)).as("n"),
            sum(col("score_raw").cast("decimal(38,0)")).cast("double").as("sy"),
            sum((col("score_raw") * col("score_raw")).cast("decimal(38,0)")).cast("double").as("syy"))
        // nullif(sd, 0): a zero-variance source yields NULL z, not NaN/Inf —
        // engine-identical regardless of DuckDB's IEEE-division setting.
        scores
          .join(broadcast(stats), "source")
          .select(
            col("doc_id"), col("source"), col("score_raw"),
            ((col("score_raw").cast("double") - col("sy") / col("n")) /
              nullif(sqrt(col("n") * col("syy") - col("sy") * col("sy")) / col("n"), lit(0.0))).as("z_source"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '')) AS t
             |  FROM documents
             |), w AS (
             |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 13)) AS BIGINT) % 4096 AS b FROM toks
             |), sc AS (
             |  SELECT doc_id,
             |    SUM(CAST(('0x' || substr(md5('graft-clf:' || CAST(b AS VARCHAR)), 1, 13)) AS BIGINT) % 2001 - 1000) AS score_raw
             |  FROM w GROUP BY 1
             |), sj AS (
             |  -- LEFT JOIN: zero-token docs carry score 0 and stay in
             |  -- their source's moment statistics, as on the Spark side
             |  SELECT d.doc_id, d.source, COALESCE(sc.score_raw, 0) AS score_raw
             |  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
             |), st AS (
             |  SELECT source, COUNT(*) AS n,
             |    CAST(SUM(CAST(score_raw AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(score_raw * score_raw AS DECIMAL(38,0))) AS DOUBLE) AS syy
             |  FROM sj GROUP BY 1)
             |SELECT sj.doc_id, sj.source, CAST(sj.score_raw AS BIGINT) AS score_raw,
             |  (CAST(sj.score_raw AS DOUBLE) - st.sy / st.n) /
             |    nullif(sqrt(st.n * st.syy - st.sy * st.sy) / st.n, 0) AS z_source
             |FROM sj JOIN st USING (source)""".stripMargin),
      "within-source z-scored classifier quality via exact integer moments"
    ),

    // ---- mutual-kNN graph: edges where each endpoint ranks the other
    //      in its cosine top-5 — the symmetrized neighbor graph that
    //      graph-based clustering/dedup consumes (mutuality prunes
    //      hub-induced false edges). Subgraph over vec_id < 100; ranks
    //      computed against the FULL corpus ----
    "emb_mutual_knn" -> QueryDef(
      (s, d) => {
        val knn = Similarity.cosineTopK(
          t(s, d, "embeddings"), "vec_id", "embedding",
          k = 5, queryPred = col("cid") < 100
        ).filter(col("neighbor_id") < 100)
        val fwd = knn.select(
          col("query_id").as("id_a"), col("neighbor_id").as("id_b"),
          col("rank").cast("long").as("rank_ab"))
        val rev = knn.select(
          col("neighbor_id").as("id_a"), col("query_id").as("id_b"),
          col("rank").cast("long").as("rank_ba"))
        fwd.join(rev, Seq("id_a", "id_b")).filter(col("id_a") < col("id_b"))
      },
      Some("""WITH r AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS nid,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
             |               c.vec_id) AS rank
             |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
             |  WHERE q.vec_id < 100),
             |k AS (SELECT qid, nid, rank FROM r WHERE rank <= 5 AND nid < 100)
             |SELECT a.qid AS id_a, a.nid AS id_b,
             |  CAST(a.rank AS BIGINT) AS rank_ab, CAST(b.rank AS BIGINT) AS rank_ba
             |FROM k a JOIN k b ON b.qid = a.nid AND b.nid = a.qid
             |WHERE a.qid < a.nid""".stripMargin),
      "symmetrized cosine top-5 edges — the mutual-kNN dedup/cluster graph"
    ),

    // ---- shingle novelty: per doc, the fraction of its distinct word
    //      3-grams whose corpus-wide FIRST owner (min doc id) it is —
    //      "how much new content does this doc add", the contribution
    //      score an ordered-ingest curation pass ranks by. JOIN-FREE
    //      shape: numerators fall out of grouping the per-shingle argmin
    //      frame BY ITS WINNER (no rejoin of the exploded corpus — the
    //      earlier join-back shuffled the shingle stream twice and
    //      spilled 50 GB at sf1), denominators are a per-doc count, and
    //      the final join touches |docs| rows. Shingles shuffle as 52-bit
    //      md5 chunks (8-byte keys, replayed exactly by the oracle), the
    //      same primitive as the LSH band keys. Per-doc distinctness is
    //      taken on the HASH (dropDuplicates after hashing) so both
    //      engines dedupe on the same domain — distincting on the string
    //      here while the oracle distincts on h would diverge on a
    //      within-doc 52-bit collision ----
    "q_shingle_novelty" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        val shd = docs
          .select(col("doc_id"), TextOps.tokens(trim(col("text"))).as("__ts"))
          .select(col("doc_id"), explode(TextOps.shinglesFromTokens(col("__ts"), 3)).as("s"))
          .select(col("doc_id"),
            conv(substring(md5(col("s")), 1, 13), 16, 10).cast("long").as("h"))
          .dropDuplicates("doc_id", "h")
        val den = shd.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        val num = shd.groupBy("h").agg(min("doc_id").as("first_doc"))
          .groupBy(col("first_doc").as("doc_id"))
          .agg(count(lit(1)).as("n_novel"))
        den.join(num, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("n_shingles"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"),
            (coalesce(col("n_novel"), lit(0L)).cast("double") /
              col("n_shingles").cast("double")).as("novelty"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), sh AS (
             |  SELECT DISTINCT doc_id,
             |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 13)) AS BIGINT) AS h
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) g
             |), den AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
             |fo AS (SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
             |num AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel FROM fo GROUP BY 1)
             |SELECT den.doc_id,
             |  CAST(den.n_shingles AS BIGINT) AS n_shingles,
             |  CAST(COALESCE(num.n_novel, 0) AS BIGINT) AS n_novel,
             |  CAST(COALESCE(num.n_novel, 0) AS DOUBLE) / den.n_shingles AS novelty
             |FROM den LEFT JOIN num USING (doc_id)""".stripMargin),
      "per-doc fraction of corpus-first n-grams — ordered-ingest novelty"
    ),

    // ---- directional containment dedup: |A∩B|/|A| ≥ 0.8 over word
    //      3-grams — catches short docs embedded in long ones (quotes,
    //      excerpts) that symmetric Jaccard misses at size skew ----
    "dedup_containment" -> QueryDef(
      (s, d) =>
        // r14 measured the bare prefix form as a NEGATIVE (60-92 s vs
        // ~40 s dense at the same ~4 GB shuffle — the container side
        // admits no prefix bound, so candidates stayed dense-sized).
        // r15 added the PPJoin POSITIONAL filter, which kills the
        // late-position (hot-shingle) candidates map-side BEFORE the
        // distinct: alternating sf10 triples now read wall PARITY with
        // dense (33.1 vs 31.6 s medians) at 22% less shuffle (3.25 vs
        // 4.13 GB) and 97% less spill (31 MB vs 1.1 GB) — the better
        // 100 TB shape, so the prefix+positional form is registered.
        // Output row-identical (DedupSpec parity + same sf10 row count),
        // oracle unchanged. Cost at tiny scale: ~+0.5 s fixed (per-doc
        // array build) at sf0.1 — recorded in bench/r15_notes.md.
        Dedup.prefixContainmentPairsFromShingles(
          SharedIntermediates.shingles(s, d),
          thresholdNum = 4, thresholdDen = 5, maxShingleFreq = Some(50)),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), sh0 AS (
             |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) g
             |), keep AS (SELECT s FROM (SELECT s, COUNT(*) AS c FROM sh0 GROUP BY 1) WHERE c <= 50),
             |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)),
             |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |pr AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), ws AS (
             |  SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b
             |  FROM pr JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b)
             |SELECT id_a AS contained_id, id_b AS container_id, inter,
             |       sz_a AS size_contained, sz_b AS size_container
             |FROM ws WHERE inter * 5 >= sz_a * 4
             |UNION ALL
             |SELECT id_b, id_a, inter, sz_b, sz_a
             |FROM ws WHERE inter * 5 >= sz_b * 4""".stripMargin),
      "asymmetric n-gram containment pairs via the shared inverted index"
    ),

    // ---- fixed-point BM25 retrieval: rational idf (the ln argument, a
    //      monotone stand-in — ln itself is libm-dependent) and per-term
    //      contributions quantized to floor(1e9·x) BEFORE the pair sum,
    //      so scoring is an order-free BIGINT aggregation. Expression
    //      tree mirrored verbatim in the oracle ----
    "text_bm25_topk" -> QueryDef(
      (s, d) => TextOps.bm25TopK(t(s, d, "documents"), "doc_id", "text", k = 5, maxDf = 50),
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '')) AS t
             |  FROM documents
             |), tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
             |st AS (
             |  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             |    CAST((SELECT SUM(dl) FROM dl) AS DOUBLE) / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl),
             |kept AS (SELECT t, COUNT(*) AS df_docs FROM tf GROUP BY 1 HAVING COUNT(*) <= 50),
             |sc AS (
             |  SELECT q.doc_id AS qid, c.doc_id AS nid,
             |    SUM(CAST(FLOOR(1000000000.0 * (
             |      (CAST(st.n_docs - k2.df_docs AS DOUBLE) + 0.5) / (CAST(k2.df_docs AS DOUBLE) + 0.5)
             |      * (CAST(c.tf AS DOUBLE) * 2.2)
             |      / (CAST(c.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(d2.dl AS DOUBLE) / st.avgdl))
             |    )) AS BIGINT)) AS score_fp
             |  FROM tf q
             |  JOIN kept k2 ON k2.t = q.t
             |  JOIN tf c ON c.t = q.t AND c.doc_id <> q.doc_id
             |  JOIN dl d2 ON d2.doc_id = c.doc_id, st
             |  GROUP BY 1, 2)
             |SELECT qid AS doc_id, nid AS neighbor_id,
             |  CAST(score_fp AS BIGINT) AS score_fp, CAST(rank AS BIGINT) AS rank
             |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score_fp DESC, nid) AS rank FROM sc)
             |WHERE rank <= 5""".stripMargin),
      "BM25-weighted top-k lexical neighbors, fixed-point and order-free"
    ),

    // ---- collocation mining: top token pairs by lift (the exp(PMI)
    //      co-occurrence ratio n_ab·N / (n_a·n_b)) over per-doc distinct
    //      tokens with a minimum support. All counts exact integers; the
    //      one division is deterministic IEEE; the global top-20 plans as
    //      a per-partition TakeOrdered merge, not a full sort ----
    "q_token_lift" -> QueryDef(
      (s, d) => {
        val docs = t(s, d, "documents")
        // deliberately NOT a single-pass substrate: the r21 scan audit
        // flagged 4 executed corpus scans (the aliased self-join sides
        // are not identical subtrees, so exchange reuse cannot collapse
        // them), but materializing the token frame once was MEASURED
        // 2.7× WORSE at sf10 (10.8 → 29.5 s median-of-3) — the substrate
        // EXPANDS ~10× under the distinct-token explode, so the
        // checkpoint write+read dwarfs the three saved re-tokenizations.
        // The multi-scan lazy form is the right shape for an exploding
        // substrate; contrast incrementalVerdicts/semanticDedup, whose
        // substrates are row-preserving projections and DO persist.
        val toks = docs.select(
          col("doc_id"),
          explode(array_distinct(TextOps.normTokens(col("text")))).as("t"))
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val dfq = toks.groupBy("t").agg(count(lit(1)).as("n_t"))
        val pr = toks.select(col("doc_id"), col("t").as("ta"))
          .join(toks.select(col("doc_id"), col("t").as("tb")), "doc_id")
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
        val out = pr
          .join(dfq.select(col("t").as("ta"), col("n_t").as("n_a")), "ta")
          .join(dfq.select(col("t").as("tb"), col("n_t").as("n_b")), "tb")
          .crossJoin(broadcast(nDocs))
          .select(
            col("ta").as("token_a"), col("tb").as("token_b"), col("n_ab"),
            (col("n_ab").cast("double") * col("n_docs").cast("double") /
              (col("n_a") * col("n_b")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("token_a").asc, col("token_b").asc)
          .limit(20)
        out
      },
      Some("""WITH toks AS (
             |  SELECT DISTINCT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '')) AS t
             |  FROM documents
             |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
             |dfq AS (SELECT t, COUNT(*) AS n_t FROM toks GROUP BY 1),
             |pr AS (
             |  SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_ab
             |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.t < b.t
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
             |SELECT ta AS token_a, tb AS token_b, CAST(n_ab AS BIGINT) AS n_ab,
             |  CAST(n_ab AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(da.n_t * db.n_t AS DOUBLE) AS lift
             |FROM pr, n
             |JOIN dfq da ON da.t = ta
             |JOIN dfq db ON db.t = tb
             |ORDER BY lift DESC, token_a, token_b LIMIT 20""".stripMargin),
      "top token-pair collocations by integer-exact lift with min support"
    ),

    // ---- per-source corpus observability: volume, exact-dup rate, size,
    //      language spread — the report a curation run publishes ----
    "q_corpus_report" -> QueryDef(
      (s, d) =>
        t(s, d, "documents")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_distinct"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("lang")).as("n_langs")
          )
          .select(
            col("source"),
            col("n_docs"),
            col("n_distinct"),
            ((col("n_docs") - col("n_distinct")).cast("double") / col("n_docs").cast("double"))
              .as("dup_rate"),
            (col("sum_chars").cast("double") / col("n_docs").cast("double")).as("avg_chars"),
            col("n_langs")
          ),
      Some("""SELECT source,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
             |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*) AS dup_rate,
             |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
             |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
             |FROM documents GROUP BY 1""".stripMargin),
      "per-source curation report: volume, dup rate, size, language spread"
    ),

    // ---- exact duplicated-SPAN dedup (the suffix-array modality of
    //      Lee et al., relationally: positioned 4-gram match → constant-
    //      alignment islands → maximal spans ≥ 8 tokens). Catches the
    //      shared-boilerplate case every set-level method (Jaccard/
    //      MinHash/SimHash) misses at low set overlap ----
    "dedup_span" -> QueryDef(
      (s, d) => SharedIntermediates.spans(s, d),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), g AS MATERIALIZED (
             |  SELECT doc_id, CAST(i AS BIGINT) AS p,
             |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]), 1, 13)) AS BIGINT) AS h
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 3, 0))) AS i) sq
             |), keep AS (SELECT h FROM (SELECT h, COUNT(*) AS occ FROM g GROUP BY 1) WHERE occ <= 50),
             |gk AS MATERIALIZED (SELECT g.doc_id, g.p, g.h FROM g JOIN keep USING (h)),
             |m AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb, a.p - b.p AS delta
             |  FROM gk a JOIN gk b ON a.h = b.h AND a.doc_id < b.doc_id
             |), isl AS (
             |  SELECT id_a, id_b, delta, pa, pb,
             |    pa - row_number() OVER (PARTITION BY id_a, id_b, delta ORDER BY pa) AS grp
             |  FROM m
             |), sp AS (
             |  SELECT id_a, id_b, MIN(pa) AS start_a, MIN(pb) AS start_b,
             |         MAX(pa) - MIN(pa) + 4 AS span_len
             |  FROM isl GROUP BY id_a, id_b, delta, grp
             |)
             |SELECT id_a, id_b, CAST(start_a AS BIGINT) AS start_a,
             |       CAST(start_b AS BIGINT) AS start_b, CAST(span_len AS BIGINT) AS span_len
             |FROM sp WHERE span_len >= 8""".stripMargin),
      "maximal exact duplicated token spans (>=8 tokens) per doc pair"
    ),

    // ---- per-doc duplicated-token mass: fraction of tokens covered by
    //      at least one duplicated span (interval union via running-max
    //      islands) — the "drop docs >X% duplicated" curation metric ----
    "q_span_mass" -> QueryDef(
      (s, d) =>
        graft.ops.SpanDedup.spanMassFromSpans(
          t(s, d, "documents"), "doc_id", "text",
          SharedIntermediates.spans(s, d)),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), g AS MATERIALIZED (
             |  SELECT doc_id, CAST(i AS BIGINT) AS p,
             |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]), 1, 13)) AS BIGINT) AS h
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 3, 0))) AS i) sq
             |), keep AS (SELECT h FROM (SELECT h, COUNT(*) AS occ FROM g GROUP BY 1) WHERE occ <= 50),
             |gk AS MATERIALIZED (SELECT g.doc_id, g.p, g.h FROM g JOIN keep USING (h)),
             |m AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb, a.p - b.p AS delta
             |  FROM gk a JOIN gk b ON a.h = b.h AND a.doc_id < b.doc_id
             |), isl AS (
             |  SELECT id_a, id_b, delta, pa, pb,
             |    pa - row_number() OVER (PARTITION BY id_a, id_b, delta ORDER BY pa) AS grp
             |  FROM m
             |), sp2 AS MATERIALIZED (
             |  SELECT id_a, id_b, MIN(pa) AS start_a, MIN(pb) AS start_b,
             |         MAX(pa) - MIN(pa) + 4 AS span_len
             |  FROM isl GROUP BY id_a, id_b, delta, grp
             |  HAVING MAX(pa) - MIN(pa) + 4 >= 8
             |), iv AS (
             |  SELECT DISTINCT doc_id, s, e FROM (
             |    SELECT id_a AS doc_id, start_a AS s, start_a + span_len AS e FROM sp2
             |    UNION ALL
             |    SELECT id_b, start_b, start_b + span_len FROM sp2)
             |), isl2 AS (
             |  SELECT doc_id, s, e,
             |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |           OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
             |                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |         THEN 1 ELSE 0 END AS new_island
             |  FROM iv
             |), isl3 AS (
             |  SELECT doc_id, s, e,
             |    SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
             |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM isl2
             |), cov AS (
             |  SELECT doc_id, SUM(c) AS covered FROM (
             |    SELECT doc_id, island, MAX(e) - MIN(s) AS c FROM isl3 GROUP BY 1, 2) q
             |  GROUP BY 1
             |), tot AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM toks)
             |SELECT tot.doc_id, n_tokens,
             |  CAST(COALESCE(covered, 0) AS BIGINT) AS covered_tokens,
             |  CASE WHEN n_tokens > 0
             |       THEN CAST(COALESCE(covered, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             |       ELSE 0.0 END AS dup_mass
             |FROM tot LEFT JOIN cov USING (doc_id)""".stripMargin),
      "per-doc fraction of tokens covered by duplicated spans"
    ),

    // ---- span excision: the corpus rewrite — cut every duplicated span
    //      from the higher-id doc of its pair (keep-first-by-id) and
    //      re-join the surviving tokens. (doc, position) anti-join, not
    //      a range join; intervals explode bounded by doc length ----
    "q_span_excise" -> QueryDef(
      (s, d) =>
        graft.ops.SpanDedup.spanExciseFromSpans(
          t(s, d, "documents"), "doc_id", "text",
          SharedIntermediates.spans(s, d)),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), g AS MATERIALIZED (
             |  SELECT doc_id, CAST(i AS BIGINT) AS p,
             |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]), 1, 13)) AS BIGINT) AS h
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 3, 0))) AS i) sq
             |), keep AS (SELECT h FROM (SELECT h, COUNT(*) AS occ FROM g GROUP BY 1) WHERE occ <= 50),
             |gk AS MATERIALIZED (SELECT g.doc_id, g.p, g.h FROM g JOIN keep USING (h)),
             |m AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb, a.p - b.p AS delta
             |  FROM gk a JOIN gk b ON a.h = b.h AND a.doc_id < b.doc_id
             |), isl AS (
             |  SELECT id_a, id_b, delta, pa, pb,
             |    pa - row_number() OVER (PARTITION BY id_a, id_b, delta ORDER BY pa) AS grp
             |  FROM m
             |), sp2 AS MATERIALIZED (
             |  SELECT id_a, id_b, MIN(pa) AS start_a, MIN(pb) AS start_b,
             |         MAX(pa) - MIN(pa) + 4 AS span_len
             |  FROM isl GROUP BY id_a, id_b, delta, grp
             |  HAVING MAX(pa) - MIN(pa) + 4 >= 8
             |), covered AS (
             |  SELECT DISTINCT id_b AS doc_id, cp.p
             |  FROM sp2, LATERAL (SELECT unnest(generate_series(start_b, start_b + span_len - 1)) AS p) cp
             |), tp AS (
             |  SELECT doc_id, CAST(i AS BIGINT) AS p, ts[i] AS t
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) sq
             |), kept AS (
             |  SELECT tp.doc_id, tp.p, tp.t FROM tp
             |  LEFT JOIN covered c ON c.doc_id = tp.doc_id AND c.p = tp.p
             |  WHERE c.p IS NULL
             |), rebuilt AS (
             |  SELECT doc_id, COUNT(*) AS n_kept,
             |         string_agg(t, ' ' ORDER BY p) AS text_clean
             |  FROM kept GROUP BY 1
             |)
             |SELECT toks.doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
             |  CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
             |  COALESCE(text_clean, '') AS text_clean
             |FROM toks LEFT JOIN rebuilt USING (doc_id)""".stripMargin),
      "cut duplicated spans from the higher-id doc and rebuild the clean text"
    ),

    // ---- span drop verdict: docs ≥ 1/2 span-covered by a partner form
    //      an edge; CC over edges → one canonical survivor per cluster
    //      (same keep-list contract as the set-similarity family) ----
    "dedup_span_keep_list" -> QueryDef(
      (s, d) =>
        graft.ops.SpanDedup.spanKeepListFromSpans(
          t(s, d, "documents"), "doc_id", "text",
          SharedIntermediates.spans(s, d),
          thresholdNum = 1, thresholdDen = 2),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), g AS MATERIALIZED (
             |  SELECT doc_id, CAST(i AS BIGINT) AS p,
             |    CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]), 1, 13)) AS BIGINT) AS h
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 3, 0))) AS i) sq
             |), keep AS (SELECT h FROM (SELECT h, COUNT(*) AS occ FROM g GROUP BY 1) WHERE occ <= 50),
             |gk AS MATERIALIZED (SELECT g.doc_id, g.p, g.h FROM g JOIN keep USING (h)),
             |m AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb, a.p - b.p AS delta
             |  FROM gk a JOIN gk b ON a.h = b.h AND a.doc_id < b.doc_id
             |), isl AS (
             |  SELECT id_a, id_b, delta, pa, pb,
             |    pa - row_number() OVER (PARTITION BY id_a, id_b, delta ORDER BY pa) AS grp
             |  FROM m
             |), sp2 AS MATERIALIZED (
             |  SELECT id_a, id_b, MIN(pa) AS start_a, MIN(pb) AS start_b,
             |         MAX(pa) - MIN(pa) + 4 AS span_len
             |  FROM isl GROUP BY id_a, id_b, delta, grp
             |  HAVING MAX(pa) - MIN(pa) + 4 >= 8
             |), iv AS (
             |  SELECT DISTINCT id_a, id_b, start_b AS s, start_b + span_len AS e FROM sp2
             |), i2 AS (
             |  SELECT id_a, id_b, s, e,
             |    CASE WHEN max(e) OVER (PARTITION BY id_a, id_b ORDER BY s, e
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |           OR s > max(e) OVER (PARTITION BY id_a, id_b ORDER BY s, e
             |                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |         THEN 1 ELSE 0 END AS ni
             |  FROM iv
             |), i3 AS (
             |  SELECT id_a, id_b, s, e,
             |    SUM(ni) OVER (PARTITION BY id_a, id_b ORDER BY s, e
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM i2
             |), cb AS (
             |  SELECT id_a, id_b, SUM(c) AS covered_b FROM (
             |    SELECT id_a, id_b, island, MAX(e) - MIN(s) AS c FROM i3 GROUP BY 1, 2, 3) q
             |  GROUP BY 1, 2
             |), nt AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM toks),
             |pairs AS (
             |  SELECT id_a, id_b FROM cb JOIN nt ON nt.doc_id = id_b
             |  WHERE covered_b * 2 >= n * 1
             |), e AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs
             |), l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
             |l1 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l0 l LEFT JOIN e ON e.src = l.node LEFT JOIN l0 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l2 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l1 l LEFT JOIN e ON e.src = l.node LEFT JOIN l1 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l3 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l2 l LEFT JOIN e ON e.src = l.node LEFT JOIN l2 r ON r.node = e.dst
             |  GROUP BY l.node, l.label),
             |l4 AS (
             |  SELECT l.node, least(l.label, coalesce(min(r.label), l.label)) AS label
             |  FROM l3 l LEFT JOIN e ON e.src = l.node LEFT JOIN l3 r ON r.node = e.dst
             |  GROUP BY l.node, l.label)
             |SELECT d.doc_id,
             |  COALESCE(l4.label, d.doc_id) AS canonical_id,
             |  COALESCE(l4.label, d.doc_id) = d.doc_id AS is_canonical
             |FROM documents d LEFT JOIN l4 ON l4.node = d.doc_id""".stripMargin),
      "span-coverage drop verdict: CC over >=1/2-covered pairs, min-id survivor"
    )
  )
}
