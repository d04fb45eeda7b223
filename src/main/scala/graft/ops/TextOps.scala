package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprBridge

/** Text-analysis operators for a large-scale training-data pipeline
  * (SURVEY.md §2.11). All pure Catalyst expressions — codegen-friendly,
  * shuffle-free per-row maps that pipeline with the parquet scan; at 100 TB
  * these run at scan speed with full column pruning.
  */
object TextOps {

  /** Canonical normalization: lowercase, collapse non-alphanumerics to a
    * single space, trim. Shared by fingerprinting and dedup so both sides
    * of any comparison agree on the token stream. Kept as the regex form
    * for sites that need the normalized STRING; tokenizing consumers use
    * [[normTokens]], which fuses this with the split in one scan.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokenization with empty-token removal (totality on empty
    * and all-space strings): maximal non-whitespace runs via the
    * single-pass [[graft.functions.TokenRuns]] expression — value-equal
    * to `filter(split(trim(c), "\\s+"), _ != "")` (TokenRunsSpec pins
    * the equivalence; the oracles replay the regex form).
    */
  def tokens(c: Column): Column =
    ExprBridge.column(
      graft.functions.TokenRuns(ExprBridge.expression(c), alnumOnly = false))

  /** `tokens(normalize(c))` fused into `lower` + one byte scan: maximal
    * `[a-z0-9]` runs of the lowered text. The regex chain it replaces is
    * the engine's hottest per-document projection (every shingle/token
    * consumer pays it); case mapping stays Spark's `lower`, so Unicode
    * lowering is identical by construction.
    */
  def normTokens(c: Column): Column =
    ExprBridge.column(
      graft.functions.TokenRuns(ExprBridge.expression(lower(c)), alnumOnly = true))

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token array column.
    *
    * IMPORTANT: pass an attribute (a projected column), not an inline
    * `tokens(text)` expression — an expression embedded in the lambda is
    * re-evaluated per element by the interpreted HOF path, turning the
    * shingling quadratic (the regex split would run 3× per shingle).
    * Empty when the document has fewer than n tokens. ANSI-safe: the
    * sequence bound keeps element_at in range, and short docs
    * short-circuit to an empty array (Spark's sequence(1,0) would
    * otherwise count *down*).
    */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    array_distinct(shingleOccurrencesFromTokens(ts, n))

  /** Every n-gram occurrence in sequence order (duplicates kept) — the
    * multiset the corpus-level repetition-mass statistics count. One
    * native [[graft.functions.ShingleRuns]] pass; the HOF chain it
    * replaces ran an interpreted lambda per shingle (a sequence
    * materialization, n element_ats, and a concat_ws allocation each).
    * Same attribute-not-expression warning as [[shinglesFromTokens]].
    */
  def shingleOccurrencesFromTokens(ts: Column, n: Int): Column =
    ExprBridge.column(graft.functions.ShingleRuns(ExprBridge.expression(ts), n))

  /** Convenience form for small inputs / tests; on hot paths project
    * `tokens(c)` first and use `shinglesFromTokens` (see warning there).
    */
  def wordShingles(c: Column, n: Int): Column = shinglesFromTokens(tokens(c), n)

  /** Token statistics per document: counts only (exact integers — oracle
    * comparable with no FP drift).
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), length(col(textCol)).as("n_chars"), tokens(col(textCol)).as("__ts"))
      .select(
        col(idCol),
        col("n_chars"),
        size(col("__ts")).as("n_tokens"),
        size(array_distinct(col("__ts"))).as("n_uniq_tokens"),
        array_max(transform(col("__ts"), x => length(x))).as("max_token_len")
      )

  /** BPE-ish subword segmentation by regex — letter runs, digit runs, and
    * punctuation runs each count as one token, the cheap engine-agnostic
    * approximation of a real tokenizer's pre-tokenization pass. The char
    * classes are ASCII-explicit so every regex engine agrees (Unicode
    * classes differ between engines).
    */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"), lit(0))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  /** Quality signals as exact integer counts; a downstream consumer divides
    * into ratios. Stopword density + digit density + short-token density are
    * the classic cheap quality heuristics for pretraining corpora.
    */
  def qualityCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String] = defaultStopwords
  ): DataFrame =
    df.select(col(idCol), length(col(textCol)).as("n_chars"), tokens(col(textCol)).as("__ts"))
      .select(
        col(idCol),
        size(col("__ts")).as("n_tokens"),
        size(filter(col("__ts"), x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*))).as("n_stop"),
        size(filter(col("__ts"), x => x.rlike("^[0-9]+$"))).as("n_digit_tokens"),
        size(filter(col("__ts"), x => length(x) <= 2)).as("n_short_tokens"),
        col("n_chars")
      )

  /** Gopher-style document quality gate (Rae et al. 2021, "Scaling
    * Language Models", table A1 — the public word-count / word-length /
    * stopword rules, plus a top-token-dominance repetition rule in the
    * spirit of its duplicate-n-gram filters). Everything is computed from
    * ONE token explode + two hash aggregations; all signals are exact
    * integer counts until a single final double division each, so the
    * verdicts are bitwise-portable across engines.
    *
    * Emitted per document: word count, mean word length, type-token
    * ratio, top-token mass fraction, stopword count, and the composite
    * `keep` verdict. Documents with zero tokens emit no row (nothing to
    * measure — same totality rule as [[lmQuality]]).
    */
  def gopherQuality(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minStopwords: Int = 2,
      maxTopFrac: Double = 0.1,
      stopwords: Seq[String] = defaultStopwords
  ): DataFrame = {
    val tf = df
      .select(col(idCol).as("sid"), explode(tokens(col(textCol))).as("t"))
      .groupBy("sid", "t")
      .agg(count(lit(1)).as("c"))
    val perDoc = tf
      .groupBy("sid")
      .agg(
        sum(col("c")).as("n_words"),
        sum(col("c") * length(col("t"))).as("word_chars"),
        count(lit(1)).as("n_types"),
        max(col("c")).as("top_count"),
        sum(when(col("t").isin(stopwords.map(_.asInstanceOf[Any]): _*), col("c")).otherwise(0L))
          .as("n_stop")
      )
    val meanLen = col("word_chars").cast("double") / col("n_words").cast("double")
    val topFrac = col("top_count").cast("double") / col("n_words").cast("double")
    perDoc.select(
      col("sid").as(idCol),
      col("n_words"),
      meanLen.as("mean_word_len"),
      (col("n_types").cast("double") / col("n_words").cast("double")).as("ttr"),
      topFrac.as("top_frac"),
      col("n_stop"),
      (col("n_words") >= minWords && col("n_words") <= maxWords &&
        meanLen >= minMeanLen && meanLen <= maxMeanLen &&
        col("n_stop") >= minStopwords && topFrac <= maxTopFrac).as("keep")
    )
  }

  /** Unigram-LM quality proxy with bitwise-portable arithmetic: per
    * document, the total and average corpus document-frequency of its
    * tokens, plus the rare-token count. High avg_df ⇒ the doc is made of
    * corpus-common vocabulary (high unigram likelihood); many df ≤
    * `rareDfMax` tokens ⇒ OOV-heavy/noisy text. This is the perplexity-
    * proxy quality filter without log(): log-prob sums are not bitwise
    * portable across engines, while integer document frequencies summed
    * exactly plus ONE final double division are. Shape: token explode →
    * distinct → df aggregation → hash join on the token key (the standard
    * TF-IDF build: one shuffle each, no corpus² anywhere). Documents with
    * zero tokens produce no row.
    */
  def lmQuality(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rareDfMax: Int = 1
  ): DataFrame = {
    // Each token OCCURRENCE contributes df(t) to its document, so the
    // per-doc sums factor through the (doc, term, tf) frame:
    //   n_tokens = Σ_t tf,  sum_df = Σ_t tf·df(t),  n_rare = Σ_{df≤max} tf.
    // Aggregate to tf FIRST (map-side combine collapses repeats before
    // the only corpus-sized exchange), attach df as a count-over-term
    // window on the SAME frame (one exchange on the term key, the
    // sparseTopK shape), then fold per doc. The previous shape persisted
    // the raw exploded token frame and joined all of it back to the df
    // table by term — at sf10 that was a 100M-row cache fill plus a
    // 100M-row join exchange for the same integer sums.
    val wT = org.apache.spark.sql.expressions.Window.partitionBy("t")
    val tf = df
      .select(col(idCol).as("sid"), explode(normTokens(col(textCol))).as("t"))
      .groupBy("sid", "t")
      .agg(count(lit(1)).as("tf"))
      .withColumn("df_docs", count(lit(1)).over(wT))
    tf
      .groupBy("sid")
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("df_docs")).as("sum_df"),
        sum(when(col("df_docs") <= rareDfMax, col("tf")).otherwise(0L)).as("n_rare")
      )
      .select(
        col("sid").as(idCol),
        col("n_tokens"),
        col("sum_df"),
        col("n_rare"),
        (col("sum_df").cast("double") / col("n_tokens")).as("avg_df")
      )
  }

  /** Sparse lexical retrieval: for each document, the k most similar other
    * documents by integer term-frequency dot product over an inverted
    * index — the exact-arithmetic core of TF-IDF/BM25 retrieval (scores
    * stay BIGINT, so ranking is bitwise-portable across engines; ties
    * break on neighbor id). Tokens with document frequency above `maxDf`
    * are dropped from the index: stopword postings are what make pair
    * volume quadratic, and capping df bounds candidate pairs by
    * Σ_t df(t)² ≤ maxDf × |postings| — the same df-cap discipline as the
    * Jaccard dedup path. Plan: one (doc,term) aggregate, one df aggregate,
    * an index self-join on the term key, a pair aggregate, then a bounded
    * per-doc top-k. Every join is a hash join on the term/doc key.
    */
  def sparseTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      maxDf: Int = 50
  ): DataFrame = {
    // df-filter FUSED into the index build as a count-over-term window on
    // the tf frame (one exchange on the term key) instead of a separate
    // df aggregate joined back — two fewer exchanges per index build
    // (VERDICT r10 #5: at gate scale this query's cost was pure stage
    // scheduling). The index is persisted once and self-joined.
    val wT = org.apache.spark.sql.expressions.Window.partitionBy("t")
    val idx = df
      .select(col(idCol).as("sid"), explode(normTokens(col(textCol))).as("t"))
      .groupBy("sid", "t").agg(count(lit(1)).as("tf"))
      .withColumn("df_docs", count(lit(1)).over(wT))
      .filter(col("df_docs") <= maxDf)
    // No persist/checkpoint: the self-join's query side is COLUMN-PRUNED
    // by Catalyst to just the (t, sid) pipeline, so the lazy recompute
    // costs one extra tokenize pass while the whole query collapses into
    // a single job — the old persist+localCheckpoint pair scheduled more
    // stages than the query itself once the df cap emptied the index at
    // gate scale (measured: 2.4 s → 1.2 s in-sweep at sf0.1, and not
    // worse at sf10 where the extra pass is real: 40 s vs the 49 s r10
    // cached shape).
    val scored = idx.select(col("t"), col("sid").as("qid"), col("tf").as("tf_a"))
      .join(idx.select(col("t"), col("sid").as("nid"), col("tf").as("tf_b")), "t")
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid")
      .agg(sum(col("tf_a") * col("tf_b")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("qid").as(idCol),
        col("nid").as("neighbor_id"),
        col("score"),
        col("rank").cast("long").as("rank"))
  }

  /** Fixed-point BM25 lexical retrieval: per-doc top-k neighbors scored
    * by the BM25 term formula with two portability substitutions that
    * keep the ranking engine-exact:
    *
    *  - the idf factor is the RATIONAL (N − df + 0.5)/(df + 0.5) (the
    *    argument of BM25's ln, a strictly monotone stand-in) — ln()
    *    itself is libm-dependent and not bitwise-portable;
    *  - each term's contribution is quantized to floor(1e9 · contrib)
    *    BEFORE the per-pair sum, so the aggregation is an order-free
    *    BIGINT sum instead of a shuffle-order-dependent FP sum.
    *
    * Every input to the contribution (tf, df, dl, N, avgdl) is an exact
    * integer or a single division of exact integers, and the expression
    * tree is mirrored verbatim in the oracle — deterministic doubles,
    * deterministic floor, deterministic ranking.
    *
    * Scale shape: identical to [[sparseTopK]] — df-capped inverted-index
    * join (blocking on shared terms, never the doc-pair space), one
    * aggregation per candidate pair, bounded per-query window.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      maxDf: Int = 50
  ): DataFrame = {
    // standard constants k1=1.2, b=0.75, written as the SAME decimal
    // literals the oracle uses: a Scala-side `k1 + 1.0` can land one ulp
    // away from the SQL literal 2.2 (round-half-even at the binade
    // boundary), which would shift quantized contributions
    val k1 = lit(1.2); val onePlusK1 = lit(2.2); val b75 = lit(0.75); val oneMinusB = lit(0.25)
    // Index build collapsed to one pipeline (VERDICT r10 #5): dl and df
    // are WINDOW aggregates over the tf frame (one exchange by doc key,
    // one by term key) instead of separate aggregate frames joined back
    // by doc/term — three fewer exchanges, and the self-join consumes
    // the carried columns directly. At gate scale (31-token fixture
    // vocabulary → empty index past the df cap) the old shape's cost was
    // ~10 small stages of pure scheduling latency.
    val wSid = org.apache.spark.sql.expressions.Window.partitionBy("sid")
    val wT = org.apache.spark.sql.expressions.Window.partitionBy("t")
    // No persist/checkpoint — same pruned-recompute rationale as
    // sparseTopK (measured at sf10: 51.4 s vs the 49.4 s r10 cached
    // shape — the extra tokenize pass trades even against the cache
    // write+read+checkpoint it replaces).
    val idx = df
      .select(col(idCol).as("sid"), explode(normTokens(col(textCol))).as("t"))
      .groupBy("sid", "t").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(wSid))
      .withColumn("df_docs", count(lit(1)).over(wT))
      .filter(col("df_docs") <= maxDf)
    // n_docs counts ALL docs (explode_outer keeps zero-token ones, and
    // doc ids are unique so the distinct count IS the doc count);
    // tot_tok = token-instance count = Σ dl. ONE aggregate pass → one
    // 1-row frame, so the only nested-loop in the plan stays the
    // broadcast stats row (plan-asserted in ScalePlanSpec).
    val stats = df
      .select(col(idCol).as("sid"), explode_outer(normTokens(col(textCol))).as("t"))
      .agg(countDistinct(col("sid")).as("n_docs"), count(col("t")).as("tot_tok"))
      .select(
        col("n_docs"),
        (col("tot_tok").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    val contrib =
      ((col("n_docs") - col("df_docs")).cast("double") + lit(0.5)) /
        (col("df_docs").cast("double") + lit(0.5)) *
        (col("tf").cast("double") * onePlusK1) /
        (col("tf").cast("double") +
          k1 * (oneMinusB + b75 * col("dl").cast("double") / col("avgdl")))
    val scored = idx.select(col("t"), col("sid").as("qid"))
      .join(
        idx.select(col("t"), col("sid").as("nid"), col("tf"), col("df_docs"), col("dl")),
        "t")
      .filter(col("qid") =!= col("nid"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("nid"), floor(lit(1e9) * contrib).cast("long").as("c"))
      .groupBy("qid", "nid")
      .agg(sum(col("c")).as("score_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score_fp").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("qid").as(idCol),
        col("nid").as("neighbor_id"),
        col("score_fp"),
        col("rank").cast("long").as("rank"))
  }

  /** Repetition statistics: per document, total / distinct word-n-gram
    * counts, the hottest n-gram's frequency, and the repetition ratio
    * (1 − distinct/total) — the Gopher-style "repeated n-gram" quality
    * signal that catches looping/boilerplate text. Multiplicity is
    * preserved (unlike [[shinglesFromTokens]], which distincts for dedup):
    * shingles are generated from a PROJECTED token array by index explode,
    * so the plan stays linear in token count. All counts are exact
    * integers; the ratio is one final IEEE division of two exact ints —
    * engine-portable. Documents with fewer than n tokens yield no row.
    */
  def repetitionStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    val sh = df
      .select(col(idCol).as("sid"), normTokens(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) >= n)
      .select(
        col("sid"),
        col("__ts"),
        explode(sequence(lit(1), size(col("__ts")) - (n - 1))).as("__i"))
      .select(
        col("sid"),
        concat_ws(" ", (0 until n).map(o => element_at(col("__ts"), col("__i") + o)): _*).as("s"))
    sh.groupBy("sid", "s").agg(count(lit(1)).as("f"))
      .groupBy("sid")
      .agg(
        sum(col("f")).as("n_shingles"),
        count(lit(1)).as("n_distinct"),
        max(col("f")).as("max_freq"))
      .select(
        col("sid").as(idCol),
        col("n_shingles"),
        col("n_distinct"),
        col("max_freq"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_shingles")).as("rep_ratio"))
  }

  /** PII scrubbing: replace email addresses, long digit runs (cards/ids),
    * and phone-shaped sequences with typed placeholder tokens — the
    * standard redaction pass before text enters a training mix. Pure
    * `regexp_replace` chain (codegen'd, scan-speed, zero shuffle). The
    * patterns use only portable regex constructs (explicit classes,
    * bounded repetition — no lookaround, no inline flags) so the DuckDB
    * oracle replays them byte-identically. Order matters: emails first
    * (their local part would otherwise partially match the digit rules).
    */
  def scrubPii(c: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val longDigits = "[0-9]{12,19}" // card/account-shaped runs
    val phone = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}"
    regexp_replace(
      regexp_replace(
        regexp_replace(c, email, "<EMAIL>"),
        longDigits,
        "<NUM>"),
      phone,
      "<PHONE>")
  }

  /** Context-window chunking: split each document's token stream into
    * overlapping fixed-size chunks (size `chunkTokens`, stride
    * `chunkTokens - overlap`) — how long documents become training
    * examples. All integer index math over one `sequence`+`explode` per
    * document: chunk count = max(1, ceil((n - overlap) / stride)), chunk i
    * = tokens[i·stride, i·stride + chunkTokens). Per-row generation, no
    * shuffle; the last chunk is never fully contained in its predecessor.
    * Empty documents produce no chunks.
    */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int
  ): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens: chunk=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    val ts = normTokens(col(textCol))
    // integer ceil((n - overlap) / stride), at least 1 for non-empty docs
    val nChunks = greatest(lit(1), expr(s"(size(__ts) - $overlap + $stride - 1) div $stride"))
    df.select(col(idCol), ts.as("__ts"))
      .filter(size(col("__ts")) > 0)
      .select(col(idCol), col("__ts"), explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        slice(col("__ts"), col("chunk_idx") * stride + 1, lit(chunkTokens)).as("__chunk"))
      .select(
        col(idCol),
        col("chunk_idx"),
        size(col("__chunk")).as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Document fingerprint: md5 of the normalized text (exact-dup key), plus
    * the minimum shingle fingerprint (a 1-hash MinHash — stable under small
    * edits, the building block of winnowing). Both deterministic hex
    * strings, so oracle-comparable across engines.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, shingleN: Int = 5): DataFrame =
    df.select(col(idCol), normalize(col(textCol)).as("__nt"))
      .select(col(idCol), col("__nt"), tokens(col("__nt")).as("__ts"))
      .select(
        col(idCol),
        substring(md5(col("__nt")), 1, 16).as("fp"),
        array_min(transform(shinglesFromTokens(col("__ts"), shingleN), s => md5(s))).as("fp_min_shingle")
      )

  /** Winnowing fingerprints (the rolling-hash document signature of
    * Schleimer et al. / MOSS): hash every character k-gram of the
    * normalized text, slide a window of `w` consecutive hashes, keep each
    * window's minimum, dedupe. Matching documents share selected hashes
    * even after local edits — the plagiarism/near-dup signature that is
    * robust where whole-document hashes are brittle.
    *
    * Pure Catalyst HOFs over a materialized normalized column (attribute
    * access inside the lambdas — the quadratic-HOF trap does not apply),
    * O(len × w) per document, shuffle-free scan-speed. Hashes are the
    * first 8 hex chars of md5 as integers, so any md5-bearing engine
    * reproduces them bit-for-bit.
    */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4
  ): DataFrame = {
    // one native pass per document (md5 window hashes + sliding min +
    // ordered dedup — see WinnowRuns); coalesce keeps the legacy
    // null-text → empty-array contract of the HOF chain it replaces
    val emptyLongs = array().cast("array<bigint>")
    df.select(
      col(idCol),
      coalesce(
        ExprBridge.column(graft.functions.WinnowRuns(
          ExprBridge.expression(normalize(col(textCol))), k, w)),
        emptyLongs).as("fps"))
  }

  /** Language-ID n-gram/stopword heuristic: score each candidate language
    * by its marker-token hit count, pick the argmax (ties → lexicographic).
    * Markers are tiny driver-side lists → the whole thing folds into one
    * codegen'd projection; no shuffle, no UDF.
    */
  val defaultLangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "por"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "que")
  )

  def langId(
      df: DataFrame,
      idCol: String,
      textCol: String,
      markers: Map[String, Seq[String]] = defaultLangMarkers
  ): DataFrame = {
    val t = normTokens(col(textCol))
    val ordered = markers.toSeq.sortBy(_._1)
    val n = ordered.size
    val scored = ordered.zipWithIndex.map { case ((lang, ms), idx) =>
      struct(
        size(filter(t, x => x.isin(ms.map(_.asInstanceOf[Any]): _*))).as("score"),
        // descending index as second sort key: among equal scores,
        // array_max picks the lexicographically FIRST language
        lit(n - idx).as("inv_rank"),
        lit(lang).as("lang")
      )
    }
    val best = array_max(array(scored: _*))
    df.select(
      col(idCol),
      best.getField("lang").as("pred_lang"),
      best.getField("score").as("lang_score")
    )
  }

  /** Hashing-trick linear text classifier — the fastText-style scoring
    * stage of a quality-filter pipeline, with a deterministic md5-derived
    * weight table so the score replays exactly in any engine. Each token
    * occurrence hashes into one of `buckets` weight slots
    * (52-bit md5 chunk mod buckets); the slot's weight is itself an
    * md5-derived integer in [-1000, 1000]. Document score = exact BIGINT
    * sum over occurrences; label = score > 0.
    *
    * Production swaps the derived table for trained weights via a
    * broadcast join on the bucket id — the plumbing (hash → bucket →
    * weight → map-side sum) is identical. Pure per-row Catalyst: one
    * scan, zero shuffle, codegen'd; at 100 TB this scores at scan speed
    * alongside the other per-document text metrics.
    */
  def hashClassifier(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 4096
  ): DataFrame = {
    def chunk52(c: Column): Column =
      conv(substring(md5(c), 1, 13), 16, 10).cast("long")
    def weight(t: Column): Column = {
      val b = pmod(chunk52(t), lit(buckets.toLong))
      pmod(chunk52(concat(lit("graft-clf:"), b.cast("string"))), lit(2001L)) - 1000L
    }
    df.select(col(idCol), normTokens(col(textCol)).as("__ts"))
      .select(
        col(idCol),
        size(col("__ts")).cast("long").as("n_tokens"),
        aggregate(col("__ts"), lit(0L), (acc, t) => acc + weight(t)).as("score_raw"))
      .withColumn("label", col("score_raw") > 0)
  }

  /** Email pattern for [[piiAudit]] — deliberately the COMMON dialect
    * subset (char classes, `{m,}` bounds, no lookaround/backrefs), so
    * Java regex (Spark) and RE2 (DuckDB) match identically and the
    * oracle replays the scrub byte-for-byte.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 pattern, word-bounded (`\b` agrees between Java
    * and RE2: a transition between `\w` and non-`\w`).
    */
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII audit — redaction OBSERVABILITY (the plain redaction pass is
    * [[scrubPii]]): per-document counts per PII class (emails and IPv4
    * literals, the class scrubPii lacks) plus the scrubbed text. One
    * projection, no shuffle: counts come from `regexp_extract_all` on
    * the raw text and the scrub is two chained `regexp_replace` (emails
    * first — an address can contain a dotted host the IP pass would
    * otherwise split). At 100 TB this is a map-only pass that pipelines
    * into whatever scan feeds it.
    *
    * Output: (doc_id, n_emails, n_ips, scrubbed). Counts are BIGINT;
    * `scrubbed` is the redacted text for downstream stages.
    */
  def piiAudit(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(0)))
        .cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>").as("scrubbed"))

  /** Add-1-smoothed bigram LM scoring — the CCNet-style perplexity
    * quality filter, in EXACT arithmetic (the `q_stats_corr` discipline:
    * integer/fixed-point per-row quantities, order-free integer sums,
    * one final IEEE-exact double division; `ln`/`log` never appears —
    * math-library logs are not bitwise-portable across engines).
    *
    * Model (built from the corpus itself, the usual self-scoring pass):
    * c12 = count(w1 w2), c1 = Σ_w2 c12 (context total), V = |distinct
    * tokens|; p(w2|w1) = (c12+1)/(c1+V). Per bigram occurrence, two
    * exact integer costs:
    *  - `bits` = floor(log2(1/p)) computed WITHOUT log: for integers
    *    num ≤ den, floor(log2(den/num)) = bitlen(den div num) − 1 —
    *    proof: q = den div num ⇒ den/num ∈ [q, q+1) and
    *    q + 1 ≤ 2^bitlen(q), so floor(log2) is constant on the interval
    *    and equals bitlen(q) − 1. `bin()` exists and agrees on both
    *    engines.
    *  - `p_fp` = (num·10¹²) div den — the probability in 1e-12 fixed
    *    point (integral divide; the product runs in DECIMAL(38,0) /
    *    HUGEINT so no 64-bit overflow at any corpus scale).
    * Per document: n_bigrams, nll_bits = Σ bits (total floor-quantized
    * negative log-likelihood in bits — the perplexity readout:
    * 2^(nll_bits/n) lower-bounds the true PPL within 2×), sum_p_fp, and
    * avg_bits = nll_bits / n_bigrams as the one final double op.
    *
    * 100 TB shape: one token scan → bigram-occurrence frame; the model
    * is built entirely on the DISTINCT-bigram side (c12 by bigram, then
    * the context total c1 attached to the MODEL frame via its own small
    * w1 reshuffle — distinct-bigram-sized, never corpus-sized), so the
    * corpus-sized occurrence frame is hash-partitioned on the bigram
    * key exactly ONCE, an exchange shared between the c12 aggregate and
    * the scoring join (AQE exchange reuse); a pre-aggregation to
    * per-(doc, bigram) counts was measured WORSE (natural-text bigrams
    * rarely repeat within a document, so the extra shuffle bought no
    * compression: sf10 shuffle 1.1 → 2.2 GB). One broadcast scalar (V)
    * closes the plan. No windows, no driver state. Documents with fewer
    * than two tokens have no bigrams and drop out (both engines, by
    * construction of the grouping).
    */
  /** Interpolated Kneser-Ney bigram scoring with the fixed discount
    * d = 3/4 — the production-grade smoother ([[lmPerplexity]]'s add-1 is
    * the floor; KN replaces "add mass everywhere" with "discount seen
    * events, back off to how PROMISCUOUSLY a word continues"):
    *
    *   p(w2|w1) = max(c12 − d, 0)/c1 + d·N1p(w1)/c1 · N1m(w2)/B
    *
    * where N1p(w1) = |{w2 : c(w1 w2) > 0}| (continuation fan-out of the
    * context), N1m(w2) = |{w1 : c(w1 w2) > 0}| (how many distinct
    * contexts w2 follows — the Kneser-Ney continuation count), and
    * B = |distinct bigrams|. With d = 3/4 everything is EXACT over the
    * common denominator 4·c1·B:
    *
    *   num = (4·c12 − 3)·B + 3·N1p(w1)·N1m(w2),   den = 4·c1·B
    *
    * (self-scored ⇒ c12 ≥ 1 ⇒ the max() never binds). Σ_w2 p = 1 by
    * construction, and num ≤ den per event, so the [[lmPerplexity]] bit
    * cost applies: bits = bitlen(den div num) − 1. The quotient is
    * bounded by 4·c1 (num ≥ B + 3), so it fits a BIGINT at any corpus
    * scale even though num/den themselves need DECIMAL(38,0)/HUGEINT.
    *
    * 100 TB shape: identical to [[lmPerplexity]] — all three model
    * statistics (c1/N1p by context, N1m by continuation, B) are
    * aggregates of the DISTINCT-bigram frame and join back to IT, never
    * to the corpus-sized occurrence frame, which hash-partitions on the
    * bigram key exactly once; B broadcasts as one row.
    *
    * Exactness headroom: the fixed-point term computes `num · 10¹²` in
    * DECIMAL(38,0) with num ≤ den = 4·c1·B, so the product stays inside
    * the 38-digit cap while c1·B ≤ ~2.5·10²⁵ — e.g. a 10¹²-token context
    * against 2.5·10¹³ distinct bigrams. Beyond that regime (far past any
    * published corpus) the non-ANSI decimal overflow would null the
    * product and silently drop rows from `sum_p_fp`; the bit-cost column
    * (`den div num`, bounded by 4·c1) is immune at any scale.
    */
  def lmKnPerplexity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), normTokens(col(textCol)).as("ts"))
    val bt = d
      .select(col("doc_id"), explode(shingleOccurrencesFromTokens(col("ts"), 2)).as("bg"))
    val bgc = bt.groupBy("bg").agg(count(lit(1)).as("c12"))
    val ctx = bgc
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cont = bgc
      .groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("n1m"))
    val btot = bgc.agg(count(lit(1)).as("b"))
    val model = bgc
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(ctx, "w1")
      .join(cont, "w2")
      .select(col("bg"), col("c12"), col("c1"), col("n1p"), col("n1m"))
    bt
      .join(model, "bg")
      .crossJoin(broadcast(btot))
      .select(
        col("doc_id"),
        expr("CAST(4 * c12 - 3 AS DECIMAL(38,0)) * b + CAST(3 * n1p AS DECIMAL(38,0)) * n1m")
          .as("num"),
        expr("CAST(4 * c1 AS DECIMAL(38,0)) * b").as("den"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(length(bin(expr("CAST(den div num AS BIGINT)"))) - 1).cast("long").as("nll_bits"),
        sum(expr("(num * 1000000000000) div den")).cast("long").as("sum_p_fp"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        col("nll_bits"),
        col("sum_p_fp"),
        (col("nll_bits").cast("double") / col("n_bigrams").cast("double")).as("avg_bits"))
  }

  /** [[lmPerplexity]]'s two-frame form — the model is built from
    * `modelDocs` ONLY and the `scoreDocs` slice is scored under that
    * FROZEN model: the production shape (CCNet scores candidate data
    * under a reference-corpus LM; a self-scored pass can't flag text as
    * unlike the reference). Same exact arithmetic; the two differences:
    *  - unseen events LEFT-join to the model — an unseen bigram keeps
    *    its context total (c12=0, c1 real), an unseen context floors at
    *    the add-1 uniform (c12=0, c1=0 → p = 1/V);
    *  - V is the MODEL vocabulary (the probability denominator must be
    *    the frozen model's event space, not the scored text's).
    * 100 TB shape: the model aggregates are one corpus scan each
    * (distinct-bigram / distinct-context bounded); the score side is
    * the candidate slice — benchmark/holdout-sized, NOT corpus-sized —
    * so its two model joins shuffle the small frame against the big
    * aggregates' existing key layouts. No windows, no driver state.
    */
  def lmPerplexityScored(
      modelDocs: DataFrame,
      scoreDocs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val md = modelDocs.select(normTokens(col(textCol)).as("ts"))
    val bgc = md
      .select(explode(shingleOccurrencesFromTokens(col("ts"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    val ctx = bgc
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = md.select(explode(col("ts")).as("t")).agg(countDistinct(col("t")).as("v"))
    scoreDocs
      .select(col(idCol).as("doc_id"), normTokens(col(textCol)).as("ts"))
      .select(col("doc_id"), explode(shingleOccurrencesFromTokens(col("ts"), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(bgc, Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(
        col("doc_id"),
        (coalesce(col("c12"), lit(0L)) + 1).as("num"),
        (coalesce(col("c1"), lit(0L)) + col("v")).as("den"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(length(bin(expr("den div num"))) - 1).cast("long").as("nll_bits"),
        sum(expr("(CAST(num AS DECIMAL(38,0)) * 1000000000000) div den"))
          .cast("long").as("sum_p_fp"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        col("nll_bits"),
        col("sum_p_fp"),
        (col("nll_bits").cast("double") / col("n_bigrams").cast("double")).as("avg_bits"))
  }

  /** [[lmKnPerplexity]]'s two-frame form — the interpolated Kneser-Ney
    * model FROZEN on `modelDocs`, the `scoreDocs` slice scored under it
    * (the production decontamination/quality filter: candidate data
    * scored under a reference-corpus LM, [[lmPerplexityScored]]'s shape
    * under the production-grade smoother). Exact integer arithmetic
    * throughout; every unseen-event case is pinned:
    *
    *  - SEEN bigram: the self-scored KN term with the continuation
    *    distribution add-1-grounded over the model event space —
    *    p = [max(4·c12−3, 0)·(B+V) + 3·N1p(w1)·(N1m(w2)+1)] / [4·c1·(B+V)]
    *    (Σ_{w2 ∈ model vocab} p(w2|w1) = 1 EXACTLY for every seen
    *    context: Σ(4·c12−3) = 4·c1−3·N1p and Σ(N1m+1) = B+V);
    *  - UNSEEN bigram, seen context: c12 = 0 ⇒ the discounted term is 0
    *    (the max clamps) and only the continuation backoff remains,
    *    num = 3·N1p(w1)·(N1m(w2)+1) — for a w2 the model never saw,
    *    N1m = 0 and the +1 grounding keeps the probability positive;
    *  - UNSEEN context: back off entirely to the add-1 continuation
    *    distribution, p = (N1m(w2)+1)/(B+V) — a fully-novel event floors
    *    at 1/(B+V), the uniform over the model event space;
    *  - PER-EVENT FLOOR: every seen-context probability is floored at
    *    that same uniform 1/(B+V) (binds iff num < 4·c1 — an exact
    *    integer test because den = 4·c1·(B+V)). The floor is a SCORING
    *    clamp, standard for frozen-model filters: without it a rare
    *    continuation under a heavy context can cost arbitrarily many
    *    bits, and the bit quotient `den div num` would outgrow BIGINT at
    *    corpus scale. With it the quotient is bounded by B+V at ANY
    *    scale. (Mass conservation holds for the unfloored model; the
    *    floor only adds mass, never removes.)
    *
    * Fixed-point headroom: `num · 10¹²` shares [[lmKnPerplexity]]'s
    * DECIMAL(38,0) bound (exact while c1·(B+V) ≤ ~2.5·10²⁵; overflow is
    * non-ANSI-null there, documented). The bits column is exact at any
    * scale where B+V fits BIGINT.
    *
    * 100 TB shape: [[lmPerplexityScored]]'s — the model statistics are
    * aggregates of the model corpus's DISTINCT-bigram frame; the scored
    * slice (benchmark/holdout-sized) LEFT-joins them; B and V broadcast
    * as one row.
    */
  def lmKnPerplexityScored(
      modelDocs: DataFrame,
      scoreDocs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val md = modelDocs.select(normTokens(col(textCol)).as("ts"))
    val bgc = md
      .select(explode(shingleOccurrencesFromTokens(col("ts"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    val ctx = bgc
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cont = bgc
      .groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("n1m"))
    val scal = bgc.agg(count(lit(1)).as("b"))
      .crossJoin(md.select(explode(col("ts")).as("t")).agg(countDistinct(col("t")).as("v")))
    scoreDocs
      .select(col(idCol).as("doc_id"), normTokens(col(textCol)).as("ts"))
      .select(col("doc_id"), explode(shingleOccurrencesFromTokens(col("ts"), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(bgc, Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(scal))
      .select(
        col("doc_id"),
        expr("""CASE
                |  WHEN c1 IS NULL THEN CAST(coalesce(n1m, 0) + 1 AS DECIMAL(38,0))
                |  WHEN (CASE WHEN c12 IS NULL THEN CAST(0 AS DECIMAL(38,0))
                |             ELSE CAST(4 * c12 - 3 AS DECIMAL(38,0)) END) * (b + v)
                |       + CAST(3 * n1p AS DECIMAL(38,0)) * (coalesce(n1m, 0) + 1)
                |       < CAST(4 * c1 AS DECIMAL(38,0))
                |    THEN CAST(1 AS DECIMAL(38,0))
                |  ELSE (CASE WHEN c12 IS NULL THEN CAST(0 AS DECIMAL(38,0))
                |             ELSE CAST(4 * c12 - 3 AS DECIMAL(38,0)) END) * (b + v)
                |       + CAST(3 * n1p AS DECIMAL(38,0)) * (coalesce(n1m, 0) + 1)
                |END""".stripMargin).as("num"),
        expr("""CASE
                |  WHEN c1 IS NULL THEN CAST(b + v AS DECIMAL(38,0))
                |  WHEN (CASE WHEN c12 IS NULL THEN CAST(0 AS DECIMAL(38,0))
                |             ELSE CAST(4 * c12 - 3 AS DECIMAL(38,0)) END) * (b + v)
                |       + CAST(3 * n1p AS DECIMAL(38,0)) * (coalesce(n1m, 0) + 1)
                |       < CAST(4 * c1 AS DECIMAL(38,0))
                |    THEN CAST(b + v AS DECIMAL(38,0))
                |  ELSE CAST(4 * c1 AS DECIMAL(38,0)) * (b + v)
                |END""".stripMargin).as("den"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(length(bin(expr("CAST(den div num AS BIGINT)"))) - 1).cast("long").as("nll_bits"),
        sum(expr("(num * 1000000000000) div den")).cast("long").as("sum_p_fp"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        col("nll_bits"),
        col("sum_p_fp"),
        (col("nll_bits").cast("double") / col("n_bigrams").cast("double")).as("avg_bits"))
  }

  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), normTokens(col(textCol)).as("ts"))
    // occurrences, NOT distinct shingles: LM counts are multiset counts
    val bt = d
      .select(col("doc_id"), explode(shingleOccurrencesFromTokens(col("ts"), 2)).as("bg"))
    val bgc = bt.groupBy("bg").agg(count(lit(1)).as("c12"))
    val ctx = bgc
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val model = bgc
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, "w1")
      .select(col("bg"), col("c12"), col("c1"))
    val vocab = d.select(explode(col("ts")).as("t")).agg(countDistinct(col("t")).as("v"))
    bt
      .join(model, "bg")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), (col("c12") + 1).as("num"), (col("c1") + col("v")).as("den"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(length(bin(expr("den div num"))) - 1).cast("long").as("nll_bits"),
        sum(expr("(CAST(num AS DECIMAL(38,0)) * 1000000000000) div den"))
          .cast("long").as("sum_p_fp"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        col("nll_bits"),
        col("sum_p_fp"),
        (col("nll_bits").cast("double") / col("n_bigrams").cast("double")).as("avg_bits"))
  }
}
