package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprBridge

import graft.functions.BpeMergeRuns

/** Token-ID sequence emission + fixed-context packing — the TERMINAL
  * operator of an LM training-data pipeline: after curation, dedup and
  * tokenizer training, every document becomes a sequence of integer
  * token ids, documents are concatenated in a deterministic order with a
  * separator token between them, and the stream is chopped into
  * fixed-length context windows (the training examples a dataloader
  * reads). The reference ETL stops at tabular loads; this is the
  * extension-tier op the curation stack feeds.
  *
  * Token-id assignment (both engines replay it exactly):
  *  - id 0 is the document separator;
  *  - the initial alphabet (every distinct symbol of the UNMERGED
  *    sequences, end-of-word marker included) takes ids 1..A in binary
  *    sort order — bounded by the charset, never the corpus, so the
  *    driver-side collect is the sanctioned bounded-codebook pattern;
  *  - merged symbols take id A + merge_rank (the merge table IS the
  *    vocabulary order a BPE tokenizer ships);
  *  - a merged string that collides with an existing symbol string
  *    (possible: "a"+"bc" and "ab"+"c" both spell "abc") resolves to the
  *    MIN id on both engines.
  *
  * 100 TB shape — tokenize-in-place, pack by prefix sum:
  *  - the TOKENIZER ships to the executors, the corpus never reshapes
  *    for it: per-doc token-id emission is ONE projection — each token
  *    runs the learned merges (M chained codegen [[BpeMergeRuns]] passes
  *    inside a `transform` lambda, exactly how production tokenizers
  *    apply a merge table) and maps symbols through the BOUNDED
  *    (|charset| + M entries) symbol-id literal. This is the production
  *    deployment shape: the merge table is the artifact that ships, and
  *    it is bounded by construction — unlike the word → ids dictionary
  *    (distinct words, Heaps-unbounded), which is exactly the
  *    [[Bpe.VocabBroadcastMaxTextBytes]] defect class. Two earlier
  *    shapes measured at sf10: one row per SYMBOL through a global rank
  *    (915 s / 28 GB spill), per-doc regroup of symbol rows (261 s /
  *    9 GB spill); tokenize-in-place removes both the explode and the
  *    regroup shuffle entirely;
  *  - stream offsets come from [[GlobalRank.globalCumSum]] over the
  *    per-doc token COUNTS only (a doc-count-sized distributed prefix
  *    sum over 2-long rows — the Packing.packShards substrate), joined
  *    back onto the id arrays by doc id;
  *  - each document then emits one row per context window it touches
  *    (⌈n/contextLen⌉+1 rows — document-count-shaped, ids sliced as
  *    array payload) and window assembly groups those slices; per-group
  *    state is bounded by the context length plus the slice count.
  */
object TokenPack {

  /** Separator token id (doc boundary marker in the packed stream). */
  val SepId: Long = 0L

  /** sym → id: alphabet ids 1..A in binary order, merged ids
    * A + merge_rank, min-id on string collisions. Bounded: |charset| + M
    * entries (the driver collect is over DISTINCT INITIAL SYMBOLS —
    * single UTF-16 units plus the end-of-word marker — never words).
    */
  private[graft] def symbolIdMap(
      seq0: DataFrame,
      merges: Seq[Bpe.Merge]): Map[String, Long] = {
    val alphabet = seq0
      .select(explode(col("s")).as("sym"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .sorted
    symbolIdsFromAlphabet(alphabet, merges)
  }

  /** The id-assembly half of [[symbolIdMap]], shared with the
    * local-training path so the two cannot drift: alphabet ids 1..A in
    * the caller-sorted order, merged ids A + merge_rank, min-id on
    * string collisions.
    */
  private def symbolIdsFromAlphabet(
      alphabet: Array[String],
      merges: Seq[Bpe.Merge]): Map[String, Long] = {
    val ids =
      alphabet.toSeq.zipWithIndex.map { case (s, i) => (s, (i + 1).toLong) } ++
        merges.map(m => (m.merged, alphabet.length + m.mergeRank))
    ids.groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).min) }
  }

  /** The tokenizer-inference column for one whitespace token: initial
    * symbols + end-of-word marker, then the learned merges applied in
    * rank order — M chained codegen'd [[BpeMergeRuns]] passes, the same
    * kernel training used, composed INSIDE the per-token lambda.
    * `byteLevel` swaps the seq0: char-level splits UTF-16 units;
    * byte-level hexes the token's UTF-8 bytes into 2-hex-digit symbols
    * (the [[Bpe.initialByteSeqs]] recipe — exact on ALL text incl.
    * non-BMP, and hex symbols sort identically under UTF-16 and binary
    * UTF-8 collation, so the symbol-id assignment is engine-portable).
    */
  private def mergedSymsCol(tok: Column, merges: Seq[Bpe.Merge], byteLevel: Boolean): Column = {
    val seq0 =
      if (byteLevel) {
        val h = hex(encode(tok, "UTF-8"))
        concat(
          transform(
            sequence(lit(1), (length(h) / lit(2)).cast("int")),
            i => h.substr(i * lit(2) - lit(1), lit(2))),
          array(lit(Bpe.EndOfWord)))
      } else concat(split(tok, ""), array(lit(Bpe.EndOfWord)))
    merges.sortBy(_.mergeRank).foldLeft(seq0) { (c, m) =>
      ExprBridge.column(BpeMergeRuns(ExprBridge.expression(c), m.symA, m.symB))
    }
  }

  /** Packed fixed-length context windows over the whole corpus:
    * `(window_id, n_tokens, n_seps, content_fp)` — one row per window,
    * `n_tokens` = contextLen except for the final partial window,
    * `n_seps` = documents ENDING inside the window, `content_fp` = 60-bit
    * md5 chunk of the comma-joined id sequence in stream order (the
    * exact-content gate a dataloader shard can be checksummed against).
    *
    * Trains the char-level `numMerges`-merge BPE on the corpus itself
    * (the [[Bpe.encodeTokenCounts]] composition), then streams
    * doc-by-doc in `idCol` order with a separator token after every
    * document (empty and NULL documents still emit their separator).
    *
    * BMP-only contract (inherited from [[Bpe.trainMergeSeq]]'s char-level
    * split): supplementary-plane characters split into lone UTF-16
    * surrogates, and [[symbolIdMap]] assigns alphabet ids in Scala's
    * UTF-16 code-unit order while a UTF-8-binary-collating oracle
    * (DuckDB) sorts the same symbols differently — id assignments
    * diverge above U+FFFF. For corpora beyond the BMP pass
    * `byteLevel = true`: training, symbol-id assignment and the
    * per-token inference all run on hex-coded UTF-8 byte symbols
    * ([[Bpe.trainMergesBytes]] / [[Bpe.initialByteSeqs]]), which sort
    * identically on both engines — exact on ALL text.
    */
  def packTokenWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      contextLen: Int,
      // prefix-sum parallelism; <= 0 resolves to the session's shuffle
      // partitions (the q_vocab_growth convention — offsets are
      // parts-independent, so the oracle is unaffected)
      parts: Int = 0,
      // byte-level escape hatch for corpora beyond the BMP (see the
      // contract note above): hex-coded UTF-8 byte symbols end to end
      byteLevel: Boolean = false
  ): DataFrame = {
    val (merges, symIds) = trainTokenizer(docs, textCol, numMerges, byteLevel)
    packTokenWindowsWith(docs, idCol, textCol, merges, symIds, contextLen, parts, byteLevel)
  }

  /** Train the BPE and derive its bounded symbol-id map — the TOKENIZER
    * ARTIFACT pair ([[saveTokenizer]]/[[loadTokenizer]] persist and
    * reload exactly these two values). Split out of [[packTokenWindows]]
    * so production deployments can train once, ship the artifact, and
    * pack many corpora without re-training. `byteLevel` trains on
    * hex-coded UTF-8 byte symbols ([[Bpe.trainMergesBytes]]) — exact on
    * all text including non-BMP code points.
    */
  def trainTokenizer(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      byteLevel: Boolean = false): (Seq[Bpe.Merge], Map[String, Long]) =
    // r21 (opt guide §1.2 step 1): under the local-train gate the ONE
    // collected seq0 frame feeds both training and the symbol-id map —
    // one distributed job total where the previous shape ran ~2 jobs
    // per merge plus a distinct-symbols job. Alphabet ids use the same
    // Scala `.sorted` order as the distributed symbolIdMap, and the
    // symbols come from the engine's own initialSeqs projection, so the
    // assignment is identical by construction (spec-pinned parity).
    Bpe.collectedSeq0(docs, textCol, byteLevel) match {
      case Some(rows) =>
        val merges = Bpe.trainMergeSeqLocal(rows, numMerges)
        val alphabet = rows.iterator.flatMap(_._2).toSet.toArray.sorted
        (merges, symbolIdsFromAlphabet(alphabet, merges))
      case None =>
        val merges = Bpe.trainMergeSeq(docs, textCol, numMerges, byteLevel)
        val vocab = Bpe.wordVocab(docs, textCol)
        val seq0 = if (byteLevel) Bpe.initialByteSeqs(vocab) else Bpe.initialSeqs(vocab)
        (merges, symbolIdMap(seq0, merges))
    }

  /** Persist a trained tokenizer as a parquet artifact: `dir/merges`
    * (merge_rank, sym_a, sym_b, merged, pair_count — the [[Bpe]] merge
    * table schema) and `dir/symbols` (sym, id). Single-file writes: the
    * artifact is bounded (|charset| + M rows), and one file per side
    * keeps the reload a footer-cheap scan.
    */
  def saveTokenizer(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      merges: Seq[Bpe.Merge],
      symIds: Map[String, Long],
      byteLevel: Boolean = false): Unit = {
    import spark.implicits._
    // build-time hyperparameters travel WITH the artifact (r19 advice):
    // packing a corpus with a byteLevel that differs from how the merges
    // were trained would tokenize garbage silently — loadTokenizer
    // validates, and [[packTokenWindowsWithArtifact]] takes byteLevel
    // FROM the artifact so there is nothing to mis-repeat.
    // the three bounded artifact writes are independent — overlap their
    // job + commit latencies (opt guide §2.6)
    graft.util.Par.run(
      () => graft.util.ArtifactParams.write(
        spark, s"$dir/params",
        Seq(
          "kind" -> "bpe_tokenizer",
          "num_merges" -> merges.size.toString,
          "byte_level" -> byteLevel.toString)),
      () => merges.toDF()
        .select(
          col("mergeRank").as("merge_rank"),
          col("symA").as("sym_a"),
          col("symB").as("sym_b"),
          col("merged"),
          col("pairCount").as("pair_count"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/merges"),
      () => symIds.toSeq.toDF("sym", "id")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/symbols"))
  }

  /** Reload a [[saveTokenizer]] artifact. The collects are the sanctioned
    * bounded-codebook pattern — the artifact is |charset| + M rows by
    * construction, never corpus-sized.
    */
  def loadTokenizer(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[Bpe.Merge], Map[String, Long]) = {
    val (m, s, _) = loadTokenizerChecked(spark, dir)
    (m, s)
  }

  /** [[loadTokenizer]] plus the artifact's build-time `byteLevel` flag,
    * with the params table validated against the loaded merge table —
    * a truncated/mismatched artifact fails loudly here instead of
    * tokenizing garbage downstream.
    */
  def loadTokenizerChecked(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[Bpe.Merge], Map[String, Long], Boolean) = {
    // the three bounded artifact reads are independent — overlap them
    // (opt guide §2.6); validation still runs before anything is returned
    val (params, merges, symIds) = graft.util.Par.run3(
      graft.util.ArtifactParams.read(spark, s"$dir/params"),
      spark.read.parquet(s"$dir/merges")
        .select("merge_rank", "sym_a", "sym_b", "merged", "pair_count")
        .collect()
        .map(r => Bpe.Merge(r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_.mergeRank)
        .toSeq,
      spark.read.parquet(s"$dir/symbols")
        .select("sym", "id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toMap)
    require(
      params.get("kind").contains("bpe_tokenizer"),
      s"artifact at $dir is not a BPE tokenizer (kind=${params.get("kind")})")
    val byteLevel = params("byte_level").toBoolean
    require(
      merges.size == params("num_merges").toInt,
      s"tokenizer artifact at $dir is corrupt: params say ${params("num_merges")} merges, " +
        s"merge table has ${merges.size}")
    (merges, symIds, byteLevel)
  }

  /** [[packTokenWindowsWith]] straight off a persisted artifact: the
    * merge table, symbol-id map AND the byte-level flag all come from
    * the artifact (validated on load) — the deployment entry point with
    * no caller-repeated hyperparameters.
    */
  def packTokenWindowsWithArtifact(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      contextLen: Int,
      parts: Int = 0): DataFrame = {
    val (merges, symIds, byteLevel) = loadTokenizerChecked(docs.sparkSession, dir)
    packTokenWindowsWith(docs, idCol, textCol, merges, symIds, contextLen, parts, byteLevel)
  }

  /** DOCUMENT-INTACT packing: [[packBinsShelf]] under a freshly trained
    * tokenizer — the [[packTokenWindows]] twin for the fine-tuning data
    * shape where sequences must not cross document boundaries.
    */
  def packBins(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      contextLen: Int,
      parts: Int = 0,
      byteLevel: Boolean = false
  ): DataFrame = {
    val (merges, symIds) = trainTokenizer(docs, textCol, numMerges, byteLevel)
    packBinsShelf(docs, idCol, textCol, merges, symIds, contextLen, parts, byteLevel)
  }

  /** Shelf (harmonic-class) bin packing of whole documents into
    * fixed-`contextLen` windows — the padding-minimizing packer for
    * training shapes where a document must stay INTACT within one window
    * (no cross-document attention), as opposed to [[packTokenWindows]]'s
    * zero-padding stream cut that splits documents at window boundaries.
    *
    * Algorithm — the classic PARALLEL bin-packing approximation (shelf /
    * harmonic-class first-fit; the distributed stand-in for sequential
    * best-fit-decreasing, which is a driver-side loop at any scale):
    *  1. tokenize each doc in place (ids + trailing separator, size n);
    *  2. docs longer than the window split into ⌈n/L⌉ pieces of ≤ L
    *     (a piece per window — an over-long doc cannot stay intact);
    *  3. each piece of size m joins harmonic class k = ⌊L/m⌋: every
    *     class-k piece has m ∈ (L/(k+1), L/k], so EXACTLY k of them are
    *     guaranteed to fit one window;
    *  4. within a class, pieces sort (m desc, doc_id, piece) and rank r
    *     (0-based) lands in bin ⌊r/k⌋ — k consecutive ranked pieces per
    *     window.
    * Per-bin padding is < L/(k+1) by construction (k pieces each
    * > L/(k+1) leave less than one class-k piece of headroom), and the
    * only unbounded-waste bins are the ≤ one partial tail bin per class.
    * Against sequential BFD this trades a bounded extra-waste factor for
    * full parallelism: the whole assignment is one ranged sort (the
    * [[GlobalRank]] distributed rank — no single-partition window, no
    * driver loop, no sequential state), so it scales to any corpus.
    *
    * Deterministic end to end ((doc_id, piece) tie-breaks), so a SQL
    * oracle replays classing, ranking, binning and the per-bin content
    * fingerprint exactly. Output: one row per bin —
    * `(bin_class, bin, n_pieces, n_tokens, padding, content_fp)` with
    * `padding = contextLen − n_tokens`.
    */
  def packBinsShelf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Bpe.Merge],
      symIds: Map[String, Long],
      contextLen: Int,
      parts: Int = 0,
      byteLevel: Boolean = false
  ): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val effParts =
      if (parts > 0) parts else docs.sparkSession.sessionState.conf.numShufflePartitions
    val L = contextLen
    // pieces: whole docs of ≤ L tokens, or the L-sized slices of longer
    // docs — m ∈ [1, L] always (every doc carries at least its separator).
    // Checkpointed (r21, opt guide §1.2): globalRank's
    // repartitionByRange SAMPLES its child for range bounds before the
    // exchange, so fed lazily the tokenize-in-place projection (the
    // expensive per-doc merge inference) ran twice — once for the
    // sampler, once for the exchange map side. The checkpoint makes
    // tokenization run exactly once per pack; its blocks are released
    // with the ranked layout below.
    val pieces = docIdSeqs(docs, idCol, textCol, merges, symIds, byteLevel)
      .select(
        col("doc_id"), col("ids"), col("n"),
        explode(expr(s"sequence(0L, (n - 1) div ${L}L)")).as("pidx"))
      .select(
        col("doc_id"), col("pidx"),
        expr(s"slice(ids, CAST(pidx * ${L}L + 1 AS INT), $L)").as("piece"))
      .withColumn("m", size(col("piece")).cast("long"))
      .withColumn("bin_class", expr(s"${L}L div m"))
      // durability: Caching.eagerCheckpoint — local by default, reliable
      // under spark.graft.checkpoint.dir (the r22 checkpoint rule)
      .transform(Caching.eagerCheckpoint)
    // the distributed per-class rank: ONE ranged sort over
    // (class, m desc, doc_id, piece); per-class 0-based ranks fall out by
    // subtracting each class's first global rank (a ≤L-row broadcast)
    val ranked = GlobalRank.globalRank(
      pieces,
      Seq(col("bin_class"), col("m").desc, col("doc_id"), col("pidx")),
      "__r", effParts)
    Caching.release(pieces)
    val classStart = ranked.groupBy("bin_class").agg(min(col("__r")).as("__start"))
    val binned = ranked
      .join(broadcast(classStart), "bin_class")
      .withColumn("bin", expr("(__r - __start) div bin_class"))
    val out = binned
      .groupBy(col("bin_class"), col("bin"))
      .agg(
        count(lit(1)).as("n_pieces"),
        sum(col("m")).as("n_tokens"),
        // pieces in rank order, flattened — bounded by L tokens per bin
        flatten(transform(
          array_sort(collect_list(struct(col("__r"), col("piece")))),
          e => e.getField("piece"))).as("__ids"))
      .select(
        col("bin_class"),
        col("bin"),
        col("n_pieces"),
        col("n_tokens"),
        (lit(L.toLong) - col("n_tokens")).as("padding"),
        conv(
          substring(
            md5(concat_ws(",", transform(col("__ids"), _.cast("string")))),
            1, 15),
          16, 10).cast("long").as("content_fp"))
    Caching.materializeAndRelease(out, ranked)
  }

  /** Per-doc token-id sequences `(doc_id, ids, n)` — tokenize-in-place:
    * one projection over the scan (no explode, no vocab join, no
    * regroup), each doc's ids terminated by the separator token. Shared
    * by the stream packer and the shelf bin-packer.
    */
  private def docIdSeqs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Bpe.Merge],
      symIds: Map[String, Long],
      byteLevel: Boolean): DataFrame = {
    val idMapLit = typedLit(symIds)
    // under-split scans would run the merge-inference projection (the
    // pack family's dominant CPU) on one task — spread first (identity
    // at real scale; see Caching.spreadToParallelism)
    Caching.spreadToParallelism(docs)
      .select(
        col(idCol).cast("long").as("doc_id"),
        // NULL text degenerates to the documented empty-doc case (its
        // separator token still ships): without the coalesce a null doc
        // yields a NULL `ids` array, size(NULL) = -1, and the -1 silently
        // corrupts the global prefix sum — every downstream doc's stream
        // offset shifts instead of the job failing loudly.
        TextOps.tokens(coalesce(col(textCol), lit(""))).as("__ts"))
      .select(
        col("doc_id"),
        concat(
          flatten(transform(
            col("__ts"),
            w => transform(mergedSymsCol(w, merges, byteLevel), s => element_at(idMapLit, s)))),
          array(lit(SepId))).as("ids"))
      .withColumn("n", size(col("ids")).cast("long"))
  }

  /** [[packTokenWindows]] under an ALREADY-TRAINED tokenizer — the
    * production runtime shape: the merge table + symbol-id map arrive as
    * driver values (freshly trained or [[loadTokenizer]]-reloaded) and
    * ship to the executors as plan literals; the corpus is tokenized in
    * place exactly as in the train-in-job path, so the two paths are
    * output-identical by construction.
    */
  def packTokenWindowsWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Bpe.Merge],
      symIds: Map[String, Long],
      contextLen: Int,
      parts: Int = 0,
      byteLevel: Boolean = false
  ): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val effParts =
      if (parts > 0) parts else docs.sparkSession.sessionState.conf.numShufflePartitions
    val docSeqs = docIdSeqs(docs, idCol, textCol, merges, symIds, byteLevel)
    var counts: DataFrame = null
    var offsets: DataFrame = null
    try {
      // exclusive stream offset per doc: the distributed prefix sum runs
      // over (doc_id, n) ONLY — 2-long rows, never the id payload.
      // The counts frame is checkpointed FIRST (r21, opt guide §1.2):
      // globalCumSum's repartitionByRange SAMPLES its child for range
      // bounds and then exchanges it — fed lazily, the tokenize-in-place
      // projection (the expensive per-doc merge inference) re-ran once
      // for the sampler and once for the exchange. The checkpoint is
      // 2 longs per doc at any scale; tokenization now runs exactly
      // twice per pack (counts + payload) instead of 3-4×.
      counts = Caching.eagerCheckpoint(docSeqs.select(col("doc_id"), col("n")))
      offsets = GlobalRank.globalCumSum(
        counts, Seq(col("doc_id")), col("n"), "cum", effParts)
      val withOff = docSeqs
        .join(offsets.select(col("doc_id"), (col("cum") - col("n")).as("start")), "doc_id")
      // one row per (doc, touched window): the id sub-array destined for
      // that window plus its stream position — ⌈n/contextLen⌉+1 rows per
      // doc, arrays as payload
      val slices = withOff
        .select(
          col("ids"), col("n"), col("start"),
          explode(sequence(
            expr(s"start div ${contextLen}L"),
            expr(s"(start + n - 1) div ${contextLen}L"))).as("window_id"))
        .select(
          col("window_id"),
          greatest(col("window_id") * contextLen, col("start")).as("slice_start"),
          expr(
            s"slice(ids, CAST(greatest(window_id * ${contextLen}L, start) - start + 1 AS INT), " +
              s"CAST(least((window_id + 1) * ${contextLen}L, start + n) - " +
              s"greatest(window_id * ${contextLen}L, start) AS INT))").as("chunk"))
      // window assembly: slices ordered by stream position, flattened —
      // per-group state bounded by contextLen plus the slice count
      val out = slices
        .groupBy("window_id")
        .agg(
          flatten(transform(
            array_sort(collect_list(struct(col("slice_start"), col("chunk")))),
            e => e.getField("chunk"))).as("__ids"))
        .select(
          col("window_id"),
          size(col("__ids")).cast("long").as("n_tokens"),
          size(filter(col("__ids"), x => x === SepId)).cast("long").as("n_seps"),
          conv(
            substring(
              md5(concat_ws(",", transform(col("__ids"), _.cast("string")))),
              1, 15),
            16, 10).cast("long").as("content_fp"))
      Caching.materializeAndRelease(out)
    } finally {
      if (offsets != null) Caching.release(offsets)
      if (counts != null) Caching.release(counts)
    }
  }
}
