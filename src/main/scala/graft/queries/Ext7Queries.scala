package graft.queries

import graft.ops.{Dedup, Multimodal, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Seventh wave — the round-20 index-maintenance + pipeline-composition
  * tier: delta-APPEND for the persisted fuzzy-dedup and ANN index
  * artifacts (the daily-ingest maintenance step the r19 verdict ranked
  * first), shelf bin-packing, streaming incremental curation, and audio
  * near-dup.
  */
object Ext7Queries {
  import Tables.t

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- fuzzy-dedup index APPEND: two consecutive ingests against ONE
    //      persisted LSH band-key artifact. Day-1 bands only itself and
    //      joins the snapshot index, then its keys are APPENDED to the
    //      artifact; day-2 repeats against the GROWN index, so its
    //      candidates reach back to snapshot ∪ day-1 without any rebuild.
    //      The oracle replays rebuilt-from-scratch banding semantics over
    //      the full corpus (each day vs every earlier lane), so a green
    //      row PROVES index-after-append ≡ rebuilt-from-scratch — band
    //      keys are a pure per-document function of (text, params), and
    //      the params ride the artifact (ArtifactParams). Per ingest the
    //      signature work is O(delta); the snapshot is touched only as
    //      the reloaded keys parquet ----
    "dedup_index_append" -> QueryDef(
      (s, d) => {
        val dir = s"/tmp/graft-lshappend/${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        val docs = t(s, d, "documents")
        val lane = Sampling.hashBucket(col("doc_id"), "inc2", 100)
        try {
          Dedup.lshBuildIndex(docs.filter(lane < 60), "doc_id", "text", dir)
          // both ingests materialize eagerly inside lshIngestAppend (the
          // candidate join runs BEFORE that day's keys are absorbed), so
          // the finally-delete never races a lazy consumer
          val day1 = Dedup.lshIngestAppend(docs.filter(lane >= 60 && lane < 80), "doc_id", "text", dir)
          val day2 = Dedup.lshIngestAppend(docs.filter(lane >= 80), "doc_id", "text", dir)
          day1.withColumn("day", lit(1L)).unionByName(day2.withColumn("day", lit(2L)))
        } finally {
          try fs.delete(p, true)
          catch {
            case scala.util.control.NonFatal(e) =>
              graft.util.JsonLog.warning(s"lsh append artifact cleanup failed for $dir: $e")
          }
        }
      },
      Some(s"""WITH ${ExtQueries.minhashCtes(64, 16)},
              |ingest_lanes AS (
              |  SELECT doc_id,
              |    CASE
              |      WHEN CAST(('0x' || substr(md5('inc2:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 60 THEN 0
              |      WHEN CAST(('0x' || substr(md5('inc2:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 1
              |      ELSE 2
              |    END AS lane
              |  FROM documents)
              |SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_snap, CAST(ln.lane AS BIGINT) AS day
              |FROM bnd n
              |JOIN ingest_lanes ln ON ln.doc_id = n.doc_id AND ln.lane >= 1
              |JOIN bnd o ON o.band = n.band AND o.bh = n.bh
              |JOIN ingest_lanes lo ON lo.doc_id = o.doc_id AND lo.lane < ln.lane""".stripMargin),
      "fuzzy-dedup index delta-append: two consecutive ingests absorb into one persisted LSH artifact; oracle replays rebuilt-from-scratch semantics"
    ),

    // ---- ANN index APPEND: new vectors' codes absorbed into the
    //      persisted IVF-PQ artifact under the FROZEN codebooks (coarse
    //      centroids + pqbook both ride the artifact). The build slice
    //      keeps the codebook prefix (vec_id < 64), so the frozen books
    //      equal a full-corpus rebuild's and every code row — a pure
    //      function of (vector, book) — lands identically: the oracle is
    //      the plain full-corpus IVF-PQ pipeline, and a green row proves
    //      query-over-appended-index ≡ query-over-rebuilt-index exactly
    //      (same rows ⇒ equal recall). Append cost is O(delta) encode +
    //      one parquet append; nothing indexed is recomputed ----
    "ann_ivfpq_append" -> QueryDef(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val dir = s"/tmp/graft-annappend/${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        val isDelta =
          col("vec_id") >= 64 && Sampling.hashBucket(col("vec_id"), "annapp", 100) >= 80
        try {
          Similarity.buildIvfPqIndex(emb.filter(!isDelta), "vec_id", "embedding",
            nClusters = 8, subspaces = 16, subDim = 4, nCodes = 64, dir)
          Similarity.appendToIvfPqIndex(emb.filter(isDelta), "vec_id", "embedding", dir)
          // result materializes (eager checkpoint) inside
          // ivfPqTopKWithIndex — the finally-delete never races it
          Similarity.ivfPqTopKWithIndex(emb, "vec_id", "embedding", dir,
            k = 4, queryPred = col("cid") < 50, nProbe = 6,
            subspaces = 16, subDim = 4, nCodes = 64)
            .withColumn("rank", col("rank").cast("long"))
        } finally {
          try fs.delete(p, true)
          catch {
            case scala.util.control.NonFatal(e) =>
              graft.util.JsonLog.warning(s"ann append artifact cleanup failed for $dir: $e")
          }
        }
      },
      Some {
        s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |${Ext6Queries.ivfPqTopkCtes(
            nClusters = 8, nProbe = 6, subspaces = 16, subDim = 4, nCodes = 64,
            rerankSql = ExtQueries.pqAdaptiveRerankSql, k = 4, queryBound = 50)}
           |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM pq""".stripMargin
      },
      "IVF-PQ index delta-append under frozen codebooks: query over the appended artifact ≡ full-corpus rebuild (k=4)"
    ),

    // ---- DOCUMENT-INTACT shelf bin packing (the r19 verdict's
    //      best-fit-packing ask, distributed form): whole docs packed
    //      into fixed 80-token windows via harmonic classes — class
    //      k = ⌊L/m⌋ pieces sort (m desc, doc_id, piece) and land k per
    //      bin, so per-bin padding is < L/(k+1) by construction. The
    //      sequential best-fit-decreasing loop this approximates is a
    //      driver-side anti-pattern at any scale; the shelf assignment
    //      is ONE ranged sort (GlobalRank) + a ≤L-row broadcast of class
    //      offsets. Window length 80 ≠ 128/96/112 keeps this gate's
    //      result set independent of the three stream-cut gates ----
    "text_pack_bins" -> QueryDef(
      (s, d) =>
        graft.ops.TokenPack.packBins(
          t(s, d, "documents"), "doc_id", "text", numMerges = 8, contextLen = 80),
      Some(s"""WITH ${Ext6Queries.packIdCtes(8)},
              |dseq AS (SELECT doc_id, list(id ORDER BY tpos, spos) AS ids FROM stream GROUP BY 1),
              |pieces AS (
              |  SELECT doc_id, j.p AS pidx,
              |    ids[CAST(j.p * 80 + 1 AS BIGINT) : CAST(least((j.p + 1) * 80, len(ids)) AS BIGINT)] AS piece
              |  FROM dseq, LATERAL (SELECT unnest(generate_series(0, (len(ids) - 1) // 80)) AS p) j),
              |cls AS (
              |  SELECT doc_id, pidx, piece, len(piece) AS m, 80 // len(piece) AS k FROM pieces),
              |rnk AS (
              |  SELECT doc_id, pidx, piece, m, k,
              |    row_number() OVER (PARTITION BY k ORDER BY m DESC, doc_id, pidx) - 1 AS r
              |  FROM cls),
              |binned AS (
              |  SELECT k, r // k AS bin, r, m,
              |    array_to_string(list_transform(piece, x -> CAST(x AS VARCHAR)), ',') AS ps
              |  FROM rnk)
              |SELECT CAST(k AS BIGINT) AS bin_class, CAST(bin AS BIGINT) AS bin,
              |  CAST(COUNT(*) AS BIGINT) AS n_pieces, CAST(SUM(m) AS BIGINT) AS n_tokens,
              |  CAST(80 - SUM(m) AS BIGINT) AS padding,
              |  CAST(('0x' || substr(md5(string_agg(ps, ',' ORDER BY r)), 1, 15)) AS BIGINT) AS content_fp
              |FROM binned GROUP BY 1, 2""".stripMargin),
      "document-intact shelf bin packing into 80-token windows: harmonic classes, distributed rank, padding < L/(k+1) per bin"
    ),

    // ---- STREAMING incremental curation (r19 verdict #6): the
    //      gopher → dedup-vs-snapshot → decontam funnel inside a
    //      foreachBatch drain — every micro-batch of the document stream
    //      gets its verdicts while the ingest drains; the snapshot is
    //      touched only as two bounded batch-side indexes. The funnel is
    //      batch-slicing independent by construction (per-doc pure
    //      fields per batch; the within-delta duplicate representative
    //      resolves as an associative min over the accumulated rows —
    //      see EventStream.curationRunOnce), so the BATCH funnel is the
    //      oracle. Salts "sinc"/"sbench" ≠ q_curation_incremental's keep
    //      the two gates' result sets independent ----
    "q_stream_curation" -> QueryDef(
      (s, d) =>
        graft.streaming.EventStream.curationRunOnce(
          s, s"$d/documents.parquet",
          isNewCol = Sampling.hashBucket(col("doc_id"), "sinc", 100) >= 70,
          isBenchCol = Sampling.hashBucket(col("doc_id"), "sbench", 100) < 10),
      Some("""WITH docs AS (
             |  SELECT doc_id, text,
             |    CAST(('0x' || substr(md5('sinc:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 >= 70 AS is_new,
             |    CAST(('0x' || substr(md5('sbench:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10 AS is_bench
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
      "streaming incremental curation: the gopher→dedup→decontam funnel per micro-batch in a foreachBatch drain; oracle = the batch funnel"
    ),

    // ---- AUDIO near-dup (r19 verdict #7 — the mm_phash_dedup recipe
    //      over WAV): real JDK decode of planted 912-frame PCM clips →
    //      56-bit sign-of-delta-energy fingerprint → the SAME 4×14-bit
    //      Hamming banding as the image path (fpBandCandidates) → exact
    //      ≤12 verify on candidates only. Same completeness contract as
    //      the image gate: guaranteed candidates at Hamming ≤ 3
    //      (pigeonhole over 4 bands); the planted near-dups perturb ≤ 6
    //      bits confined to bands 0–2, so band 3 always recovers them;
    //      the probabilistic tail is measured by RecallProbe's
    //      audio_band_recall mode. Candidates are Σ_buckets |bucket|² —
    //      NEVER all-pairs. doc_id % 10 == 5 keeps the clip set disjoint
    //      from the image gate's % 10 == 0 ----
    "mm_audio_dedup" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "documents")
          .select(col("doc_id").cast("long"))
          .filter(col("doc_id") % 10 === 5)
          .as[Long]
          .repartition(s.sparkContext.defaultParallelism) // CPU-bound decode below
        // decode once, read thrice (two band-join sides + the verify):
        // materialize the fingerprint table rather than re-decoding
        val fps = ids.mapPartitions { it =>
          it.map { id =>
            val sid = id / 10
            (id, Multimodal.audioFp56(Multimodal.synthToneWav(sid / 2, sid % 2)))
          }
        }.toDF("doc_id", "afp").localCheckpoint(true)
        val cand = Multimodal.fpBandCandidates(fps, "afp")
        val out = cand
          .join(fps.select(col("doc_id").as("id_a"), col("afp").as("fa")), "id_a")
          .join(fps.select(col("doc_id").as("id_b"), col("afp").as("fb")), "id_b")
          .select(
            col("id_a"), col("id_b"),
            expr("bit_count(fa ^ fb)").cast("long").as("hamming"))
          .filter(col("hamming") <= 12)
          .select("id_a", "id_b", "hamming")
        graft.ops.Caching.materializeAndRelease(out, fps)
      },
      Some("""WITH p AS (
             |  SELECT doc_id, (doc_id // 10) // 2 AS grp, (doc_id // 10) % 2 AS vr
             |  FROM documents WHERE doc_id % 10 = 5),
             |wk AS (
             |  SELECT doc_id, grp, vr, wi.w AS w,
             |    CASE WHEN vr = 1 AND grp % 2 = 1
             |      THEN (grp * 95 + wi.w * 37 + 17) % 251
             |      ELSE (grp * 63 + wi.w * 11) % 251
             |    END AS k
             |  FROM p, LATERAL (SELECT unnest(generate_series(0, 56)) AS w) wi),
             |amp AS (
             |  SELECT doc_id, w,
             |    CASE WHEN vr = 1 AND grp % 2 = 0 AND w % 19 = 3
             |      THEN (k * k * k % 251 + 60) % 251
             |      ELSE k * k * k % 251
             |    END AS a
             |  FROM wk),
             |bits AS (
             |  SELECT doc_id, w,
             |    CASE WHEN lead(a) OVER (PARTITION BY doc_id ORDER BY w) > a THEN 1 ELSE 0 END AS bit
             |  FROM amp),
             |fp AS (
             |  SELECT doc_id, SUM(CAST(bit AS BIGINT) << w) AS afp
             |  FROM bits WHERE w <= 55 GROUP BY 1),
             |bands AS (
             |  SELECT doc_id, afp, b.b AS band, (afp >> (14 * b.b)) & 16383 AS bkey
             |  FROM fp, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) b),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM bands a JOIN bands c ON c.band = a.band AND c.bkey = a.bkey AND a.doc_id < c.doc_id)
             |SELECT id_a, id_b, CAST(bit_count(xor(fa.afp, fb.afp)) AS BIGINT) AS hamming
             |FROM cand
             |JOIN fp fa ON fa.doc_id = id_a
             |JOIN fp fb ON fb.doc_id = id_b
             |WHERE bit_count(xor(fa.afp, fb.afp)) <= 12""".stripMargin),
      "audio near-dup: real WAV decode, 56-bit delta-energy fingerprint, Hamming-banded candidates, exact verify"
    )
  )
}
