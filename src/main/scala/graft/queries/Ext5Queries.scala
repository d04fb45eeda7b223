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

  /** Deterministic multibyte plant for the byte-level BPE gate: the
    * fixture corpus is ASCII, so 30% of docs get a suffix containing a
    * 2-byte (é, ü), three 3-byte (日本語) and one 4-byte non-BMP (😀,
    * a Java surrogate PAIR — the case char-level BPE cannot represent)
    * UTF-8 code point; the oracle replays the plant via chr() so the
    * SQL stays pure ASCII. The `text_pii_audit` planting pattern.
    */
  private val MultibytePlant = " café über 日本語 😀tok"

  private[queries] val MultibytePlantSql =
    "CASE WHEN doc_id % 10 < 3 THEN text || ' caf' || chr(233) || ' ' || chr(252) || " +
      "'ber ' || chr(26085) || chr(26412) || chr(35486) || ' ' || chr(128512) || 'tok' " +
      "ELSE text END"

  private[queries] def plantedMultibyteDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 10 < 3, concat(col("text"), lit(MultibytePlant)))
        .otherwise(col("text")).as("text"))

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
    ),

    // ---- FUZZY benchmark decontamination: the near-dup complement of
    //      the exact 13-gram gate above — paraphrased/format-shifted
    //      eval leakage shares high Jaccard with a benchmark doc without
    //      sharing any verbatim 13-gram. Reuses the ONE corpus-wide
    //      MinHash-LSH verified-pair build (SharedIntermediates — built
    //      once, read by eight queries) restricted to cross-(bench,
    //      corpus) pairs; verdicts in the q_decontam_keep_list contract ----
    "q_decontam_fuzzy" -> QueryDef(
      (s, d) => {
        val flags = splitDocs(s, d).select(col("doc_id"), col("is_bench"))
        val pairs = SharedIntermediates.verifiedPairs(s, d).select("id_a", "id_b")
        val fa = flags.select(col("doc_id").as("id_a"), col("is_bench").as("bench_a"))
        val fb = flags.select(col("doc_id").as("id_b"), col("is_bench").as("bench_b"))
        // the corpus-side doc of every cross-split verified pair; the
        // pair set is tiny relative to the corpus (near-dups only), so
        // the hit list broadcasts back onto the full verdict frame
        val hits = pairs
          .join(fa, "id_a").join(fb, "id_b")
          .filter(col("bench_a") =!= col("bench_b"))
          .select(when(col("bench_a"), col("id_b")).otherwise(col("id_a")).as("doc_id"))
          .distinct()
          .select(col("doc_id"), lit(true).as("__hit"))
        flags
          .join(hits, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            col("is_bench"),
            coalesce(col("__hit"), lit(false)).as("contaminated"),
            (!col("is_bench") && !coalesce(col("__hit"), lit(false))).as("keep"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substr(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10 AS is_bench,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), sh AS (
             |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) g
             |), sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
             |pr AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), pairs AS (
             |  SELECT id_a, id_b FROM pr
             |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
             |  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 4
             |), hits AS (
             |  SELECT DISTINCT CASE WHEN fa.is_bench THEN p.id_b ELSE p.id_a END AS doc_id
             |  FROM pairs p
             |  JOIN toks fa ON fa.doc_id = p.id_a
             |  JOIN toks fb ON fb.doc_id = p.id_b
             |  WHERE fa.is_bench <> fb.is_bench)
             |SELECT t.doc_id, t.is_bench,
             |  (t.doc_id IN (SELECT doc_id FROM hits)) AS contaminated,
             |  (NOT t.is_bench AND t.doc_id NOT IN (SELECT doc_id FROM hits)) AS keep
             |FROM toks t""".stripMargin),
      "near-dup (MinHash-LSH verified) benchmark contamination verdicts per document"
    ),

    // ---- BYTE-level BPE training: symbols are hex-coded UTF-8 bytes,
    //      exact on all text incl. non-BMP (planted multibyte suffix —
    //      the fixture corpus is ASCII). Same loop, same oracle replay;
    //      only seq0 changes ----
    "text_bpe_train_bytes" -> QueryDef(
      (s, d) =>
        Bpe.trainMergesBytes(plantedMultibyteDocs(s, d), "text", numMerges = BpeMerges),
      Some(bpeBytesOracle(BpeMerges)),
      s"byte-level BPE training (hex-coded UTF-8 byte symbols) on multibyte-planted text, top-$BpeMerges merges"
    ),

    // ---- tokenizer inference under the BYTE-LEVEL trainer: per-doc
    //      whitespace vs BPE-byte-symbol token counts on the same
    //      multibyte-planted corpus — the production tokenizer's token
    //      budget, exact on non-BMP text ----
    "text_bpe_encode_bytes" -> QueryDef(
      (s, d) =>
        Bpe.encodeTokenCountsBytes(
          plantedMultibyteDocs(s, d), "doc_id", "text", numMerges = BpeMerges),
      Some(bpeEncodeBytesOracle(BpeMerges)),
      s"per-doc token counts under the byte-level top-$BpeMerges-merge BPE tokenizer (multibyte-planted text)"
    ),

    // ---- add-1-smoothed bigram LM perplexity scoring in EXACT
    //      arithmetic: integer bit costs via bitlen(den div num) - 1 =
    //      floor(log2(1/p)) (no math-library log anywhere), fixed-point
    //      probabilities in DECIMAL/HUGEINT, one final IEEE-exact double
    //      division — the CCNet-style quality filter the curation stack
    //      was missing ----
    "text_lm_perplexity" -> QueryDef(
      (s, d) => TextOps.lmPerplexity(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH d AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), bt AS (
             |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg, ts[i] AS w1
             |  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i) g
             |), bgc AS (SELECT bg, COUNT(*) AS c12 FROM bt GROUP BY 1),
             |ctx AS (SELECT split_part(bg, ' ', 1) AS cw, SUM(c12) AS c1 FROM bgc GROUP BY 1),
             |vv AS (SELECT COUNT(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM d)),
             |sc AS (
             |  SELECT bt.doc_id, (c12 + 1) AS num, (c1 + v) AS den
             |  FROM bt JOIN bgc USING (bg) JOIN ctx ON ctx.cw = bt.w1, vv)
             |SELECT doc_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(length(bin(den // num)) - 1) AS BIGINT) AS nll_bits,
             |  CAST(SUM(CAST(num AS HUGEINT) * 1000000000000 // den) AS BIGINT) AS sum_p_fp,
             |  CAST(SUM(length(bin(den // num)) - 1) AS DOUBLE) / COUNT(*) AS avg_bits
             |FROM sc GROUP BY 1""".stripMargin),
      "add-1 bigram LM scoring: exact integer bit costs + fixed-point probabilities per doc"
    ),

    // ---- the two-frame (train/score) form: model FROZEN on the 90%
    //      training split, the held-out 10% scored under it — the
    //      production CCNet shape (self-scoring can't flag text as
    //      unlike the reference corpus). Unseen bigrams LEFT-join to
    //      c12=0; unseen contexts floor at the add-1 uniform 1/V; V is
    //      the MODEL vocabulary ----
    "text_lm_ppl_holdout" -> QueryDef(
      (s, d) => {
        val split = splitDocs(s, d)
        TextOps.lmPerplexityScored(
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
             |ctx AS (SELECT split_part(bg, ' ', 1) AS cw, SUM(c12) AS c1 FROM bgc GROUP BY 1),
             |vv AS (SELECT COUNT(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM d WHERE NOT is_bench)),
             |st AS (
             |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg, ts[i] AS w1
             |  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i) g
             |  WHERE is_bench
             |), sc AS (
             |  SELECT st.doc_id, (COALESCE(c12, 0) + 1) AS num, (COALESCE(c1, 0) + v) AS den
             |  FROM st LEFT JOIN bgc USING (bg) LEFT JOIN ctx ON ctx.cw = st.w1, vv)
             |SELECT doc_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(length(bin(den // num)) - 1) AS BIGINT) AS nll_bits,
             |  CAST(SUM(CAST(num AS HUGEINT) * 1000000000000 // den) AS BIGINT) AS sum_p_fp,
             |  CAST(SUM(length(bin(den // num)) - 1) AS DOUBLE) / COUNT(*) AS avg_bits
             |FROM sc GROUP BY 1""".stripMargin),
      "held-out perplexity: add-1 bigram model frozen on the training split, 10% slice scored under it"
    ),

    // ---- interpolated Kneser-Ney (d = 3/4) in exact integer arithmetic
    //      over the common denominator 4*c1*B: discounted seen mass +
    //      continuation backoff (N1m = how many distinct contexts a word
    //      follows). Sums to 1 per context by construction ----
    "text_lm_kn_perplexity" -> QueryDef(
      (s, d) => TextOps.lmKnPerplexity(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH d AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'), x -> x <> '') AS ts
             |  FROM documents
             |), bt AS (
             |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg
             |  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i) g
             |), bgc AS (SELECT bg, COUNT(*) AS c12 FROM bt GROUP BY 1),
             |ctx AS (SELECT split_part(bg, ' ', 1) AS cw, SUM(c12) AS c1, COUNT(*) AS n1p FROM bgc GROUP BY 1),
             |cont AS (SELECT split_part(bg, ' ', 2) AS vw, COUNT(*) AS n1m FROM bgc GROUP BY 1),
             |bb AS (SELECT CAST(COUNT(*) AS HUGEINT) AS b FROM bgc),
             |sc AS (
             |  SELECT bt.doc_id,
             |    (4 * CAST(c12 AS HUGEINT) - 3) * b + 3 * CAST(n1p AS HUGEINT) * n1m AS num,
             |    4 * CAST(c1 AS HUGEINT) * b AS den
             |  FROM bt JOIN bgc USING (bg)
             |  JOIN ctx ON ctx.cw = split_part(bt.bg, ' ', 1)
             |  JOIN cont ON cont.vw = split_part(bt.bg, ' ', 2), bb)
             |SELECT doc_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(length(bin(CAST(den // num AS BIGINT))) - 1) AS BIGINT) AS nll_bits,
             |  CAST(SUM(num * 1000000000000 // den) AS BIGINT) AS sum_p_fp,
             |  CAST(SUM(length(bin(CAST(den // num AS BIGINT))) - 1) AS DOUBLE) / COUNT(*) AS avg_bits
             |FROM sc GROUP BY 1""".stripMargin),
      "interpolated Kneser-Ney bigram scoring (d=3/4): exact integer discount + continuation backoff"
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
  private[queries] def bpeCtes(m: Int, textSql: String, seq0Sql: String): String = {
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
       |    SELECT unnest(list_filter(regexp_split_to_array(trim($textSql), '\\s+'), x -> x <> '')) AS t
       |    FROM documents) GROUP BY 1),
       |seq0 AS (SELECT w, freq, $seq0Sql AS s FROM v),
       |$iters""".stripMargin
  }

  /** Char-level seq0: unicode code points + the end-of-word marker. */
  private[queries] def CharSeq0Sql: String = "list_append(regexp_split_to_array(w, ''), '</w>')"

  /** Byte-level seq0: the word's UTF-8 bytes as 2-hex-digit symbols
    * (`hex(encode(w))` is uppercase on both engines, sliced into pairs)
    * + the end-of-word marker — replays
    * [[graft.ops.Bpe.initialByteSeqs]].
    */
  private[queries] def ByteSeq0Sql: String =
    "list_append(list_transform(generate_series(1, length(hex(encode(w))) // 2), " +
      "i -> substr(hex(encode(w)), i * 2 - 1, 2)), '</w>')"

  private[queries] def mergeRowsSql(m: Int): String =
    (1 to m).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS merge_rank,
         |  split_part(pair, ' ', 1) AS sym_a, split_part(pair, ' ', 2) AS sym_b,
         |  replace(pair, ' ', '') AS merged, CAST(cnt AS BIGINT) AS pair_count FROM m$i""".stripMargin
    }.mkString("\nUNION ALL\n")

  private def bpeOracle(m: Int): String =
    s"""WITH ${bpeCtes(m, "text", CharSeq0Sql)}
       |${mergeRowsSql(m)}""".stripMargin

  private def bpeBytesOracle(m: Int): String =
    s"""WITH ${bpeCtes(m, MultibytePlantSql, ByteSeq0Sql)}
       |${mergeRowsSql(m)}""".stripMargin

  /** Encode oracle: the same training replay, then per-document token
    * counts — whitespace tokens joined to the trained word → |symbols|
    * table.
    */
  private def bpeEncodeOracle(m: Int): String =
    bpeEncodeOracleFor(m, "text", CharSeq0Sql)

  private def bpeEncodeBytesOracle(m: Int): String =
    bpeEncodeOracleFor(m, MultibytePlantSql, ByteSeq0Sql)

  private def bpeEncodeOracleFor(m: Int, textSql: String, seq0Sql: String): String =
    s"""WITH ${bpeCtes(m, textSql, seq0Sql)},
       |wl AS (SELECT w, len(s) AS n_sym FROM seq$m),
       |dt AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(trim($textSql), '\\s+'), x -> x <> '')) AS w
       |  FROM documents)
       |SELECT dt.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens_ws,
       |  CAST(SUM(n_sym) AS BIGINT) AS n_tokens_bpe
       |FROM dt JOIN wl USING (w) GROUP BY 1""".stripMargin
}
