package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.storage.StorageLevel

import graft.functions.BpeMergeRuns

/** Distributed BPE merge training (Sennrich et al. 2016, the word-level
  * formulation every tokenizer trainer uses): start from per-word
  * character sequences with an end-of-word marker, then repeatedly
  * (1) count adjacent symbol pairs weighted by word frequency,
  * (2) take the most frequent pair (ties broken lexicographically),
  * (3) replace its leftmost non-overlapping occurrences in every
  * sequence with the concatenated symbol.
  *
  * 100 TB shape — the [[Similarity]] Lloyd-step recipe applied to text:
  *  - ONE corpus-wide shuffle builds the word-frequency vocab; every
  *    training iteration after that runs over the vocab frame (bounded
  *    by DISTINCT words, not corpus tokens — the classic reason
  *    word-level BPE scales);
  *  - the per-iteration pair aggregate is map-side combinable and its
  *    output is bounded by the distinct adjacent-pair count; only the
  *    ARGMAX row crosses to the driver (`orderBy.limit(1)` plans
  *    TakeOrdered — no global sort), so the driver holds M merge rows
  *    total, exactly the sanctioned bounded-codebook pattern;
  *  - re-tokenization is a narrow codegen'd projection
  *    ([[BpeMergeRuns]]) with the merge stamped in as literals — M
  *    chained projections stay one whole-stage-codegen span over the
  *    persisted vocab.
  *
  * Everything is count arithmetic + binary string order, so a SQL
  * oracle replays the merge sequence exactly (the greedy-leftmost merge
  * is replayed via match-run parity: overlapping matches only occur
  * inside runs of the same pair, where greedy keeps even offsets).
  *
  * Char-level caveat: [[initialSeqs]] symbols are Java chars (UTF-16
  * units) on the Spark side and unicode code points in DuckDB replay —
  * identical on BMP text. [[initialByteSeqs]]/[[trainMergesBytes]] is
  * the production-grade variant: symbols are UTF-8 BYTES (hex-coded),
  * exact on all text including non-BMP code points.
  */
object Bpe {

  /** End-of-word marker symbol (its own trailing symbol, so merges can
    * learn word-final units without gluing the marker onto characters).
    */
  val EndOfWord = "</w>"

  /** (w, freq): the one corpus-wide aggregation. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))

  /** (w, freq, s): initial symbol sequences — characters plus the
    * end-of-word marker.
    */
  def initialSeqs(vocab: DataFrame): DataFrame =
    vocab.select(
      col("w"),
      col("freq"),
      concat(split(col("w"), ""), array(lit(EndOfWord))).as("s"))

  /** (w, freq, s): BYTE-level initial sequences — each UTF-8 byte of the
    * word as a 2-hex-digit symbol ("63","61","66","C3","A9" for "café"),
    * plus the end-of-word marker. This closes the char-level caveat
    * above: symbols are bytes, so training is exact on ALL text — a
    * non-BMP code point (a Java surrogate PAIR) encodes to its 4 UTF-8
    * bytes before hexing, where the char-level splitter would produce
    * two lone surrogates. Hex-coded bytes keep every downstream
    * invariant: symbols never contain whitespace (pair keys stay "a b"
    * strings), merged symbols are plain concatenations, and binary
    * string order over [0-9A-F] is the same deterministic tiebreak on
    * both engines (Spark `hex` and DuckDB `hex(encode(...))` are both
    * uppercase).
    */
  def initialByteSeqs(vocab: DataFrame): DataFrame =
    vocab
      .select(col("w"), col("freq"), hex(encode(col("w"), "UTF-8")).as("__h"))
      .select(
        col("w"),
        col("freq"),
        concat(
          expr("transform(sequence(1, length(__h) div 2), i -> substring(__h, i * 2 - 1, 2))"),
          array(lit(EndOfWord))).as("s"))

  /** One learned merge: rank order, the pair, the merged symbol, and the
    * weighted pair count that won the argmax.
    */
  final case class Merge(
      mergeRank: Long,
      symA: String,
      symB: String,
      merged: String,
      pairCount: Long)

  /** Train `numMerges` merges over the corpus; returns the merge table
    * (merge_rank, sym_a, sym_b, merged, pair_count), merge_rank
    * ascending — the artifact a tokenizer ships.
    */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    mergesDf(docs, trainMergeSeq(docs, textCol, numMerges))

  /** Byte-level training ([[initialByteSeqs]]): same loop, same merge
    * table schema — `sym_a`/`sym_b`/`merged` are hex-coded UTF-8 byte
    * sequences. Exact on all text including non-BMP code points.
    */
  def trainMergesBytes(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    mergesDf(docs, trainMergeSeq(docs, textCol, numMerges, byteLevel = true))

  private def mergesDf(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    merges.toDF()
      .select(
        col("mergeRank").as("merge_rank"),
        col("symA").as("sym_a"),
        col("symB").as("sym_b"),
        col("merged"),
        col("pairCount").as("pair_count"))
  }

  /** The training loop itself — the collected (bounded: `numMerges`-row)
    * merge list, for callers that APPLY the table rather than ship it.
    */
  private[graft] def trainMergeSeq(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      byteLevel: Boolean = false): Seq[Merge] = {
    val vocab = wordVocab(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var seqs = if (byteLevel) initialByteSeqs(vocab) else initialSeqs(vocab)
      val merges = ArrayBuffer.empty[Merge]
      var rank = 1
      var exhausted = false
      while (rank <= numMerges && !exhausted) {
        // pair = "a b" (symbols never contain whitespace — they are
        // non-space characters and concatenations thereof), so the
        // 2-shingle string IS the pair key and its binary order is the
        // deterministic tiebreak on both engines. OCCURRENCES, not
        // distinct-per-word: Sennrich pair statistics count every
        // adjacent position ("banana" has 'a n' twice), which is also
        // exactly what the oracle's per-position LATERAL replays
        val top = seqs
          .select(
            col("freq"),
            explode(TextOps.shingleOccurrencesFromTokens(col("s"), 2)).as("pair"))
          .groupBy("pair")
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(1)
          .collect()
        if (top.isEmpty) {
          // every word fully merged into one symbol — nothing left to learn
          exhausted = true
        } else {
          val pair = top(0).getString(0)
          val cnt = top(0).getLong(1)
          val sep = pair.indexOf(' ')
          val (a, b) = (pair.substring(0, sep), pair.substring(sep + 1))
          merges += Merge(rank.toLong, a, b, a + b, cnt)
          seqs = seqs.select(
            col("w"),
            col("freq"),
            ExprBridge.column(
              BpeMergeRuns(ExprBridge.expression(col("s")), a, b)).as("s"))
          rank += 1
        }
      }
      merges.toSeq
    } finally vocab.unpersist(blocking = false)
  }

  /** Apply a learned merge list to a vocab's initial sequences — a pure
    * chained-projection replay (one codegen'd [[BpeMergeRuns]] per merge,
    * rank order; no jobs). The tokenizer-inference half of BPE.
    * `byteLevel` must match the regime the merges were trained under
    * (char symbols vs hex-coded UTF-8 byte symbols).
    */
  def applyMerges(
      vocab: DataFrame,
      merges: Seq[Merge],
      byteLevel: Boolean = false): DataFrame = {
    val seq0 = if (byteLevel) initialByteSeqs(vocab) else initialSeqs(vocab)
    merges.sortBy(_.mergeRank).foldLeft(seq0) { (df, m) =>
      df.select(
        col("w"),
        col("freq"),
        ExprBridge.column(
          BpeMergeRuns(ExprBridge.expression(col("s")), m.symA, m.symB)).as("s"))
    }
  }

  /** Pruned-scan bytes of the text column past which the word → symbol
    * table is no longer assumed driver/broadcast-safe. The distinct-word
    * vocab grows sublinearly (Heaps' law) but UNBOUNDEDLY with the
    * corpus — a forced broadcast of it is the exact defect class that
    * drove the r8 keep-list driver OOM at 100× data. 1 GiB of pruned
    * text keeps the gate far above every bench fixture regime (sf10
    * documents.text reads ~0.7 GB of a multi-GB file) while tripping
    * well before a web-scale vocab approaches driver limits.
    */
  private[graft] val VocabBroadcastMaxTextBytes: Long = 1L << 30

  /** Encode the corpus under a freshly-trained merge table: per-document
    * whitespace-token and BPE-token counts — the tokens-per-document
    * metric a pretraining pipeline budgets shards and context windows
    * with (the compression ratio n_tokens_bpe / n_chars is the classic
    * tokenizer-quality readout). Plan: train (bounded argmax collects),
    * replay the merges over the vocab (chained codegen projections),
    * then ONE corpus token scan joined against the vocab-bounded word →
    * symbol-count table. The join side is STATS-GATED (the
    * `q_basket_lift` shape-pick discipline): below
    * [[VocabBroadcastMaxTextBytes]] of column-pruned text the vocab is
    * hinted broadcast (one map-side hash join, no shuffle of the corpus
    * tokens); above it the hint is dropped — the join plans as a
    * shuffle join on `w`, and AQE may still convert back to broadcast
    * at runtime if the built side proves small, but nothing FORCES a
    * corpus-proportional table through the driver.
    */
  def encodeTokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int): DataFrame = {
    val merges = trainMergeSeq(docs, textCol, numMerges)
    val broadcastVocab =
      docs.select(col(textCol)).queryExecution.optimizedPlan.stats.sizeInBytes <=
        VocabBroadcastMaxTextBytes
    encodeWithMerges(docs, idCol, textCol, merges, broadcastVocab)
  }

  /** [[encodeTokenCounts]] under the BYTE-LEVEL trainer
    * ([[trainMergesBytes]]): `n_tokens_bpe` counts hex-coded UTF-8 byte
    * symbols after the learned merges — the production tokenizer's
    * token budget, exact on all text incl. non-BMP. Same stats-gated
    * vocab join, same plan shape; on pure-ASCII text the counts equal
    * the char-level encode (2-digit uppercase hex is order-preserving
    * on bytes, so the training argmax and every tiebreak correspond
    * 1:1 — spec-pinned).
    */
  def encodeTokenCountsBytes(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int): DataFrame = {
    val merges = trainMergeSeq(docs, textCol, numMerges, byteLevel = true)
    val broadcastVocab =
      docs.select(col(textCol)).queryExecution.optimizedPlan.stats.sizeInBytes <=
        VocabBroadcastMaxTextBytes
    encodeWithMerges(docs, idCol, textCol, merges, broadcastVocab, byteLevel = true)
  }

  /** The encode plan under an already-trained merge list, with the vocab
    * join strategy explicit — exposed for the plan spec that pins BOTH
    * regimes ([[encodeTokenCounts]] picks `broadcastVocab` from scan
    * stats).
    */
  private[graft] def encodeWithMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge],
      broadcastVocab: Boolean,
      byteLevel: Boolean = false): DataFrame = {
    val wl = applyMerges(wordVocab(docs, textCol), merges, byteLevel)
      .select(col("w"), size(col("s")).as("n_sym"))
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("w"))
      .join(if (broadcastVocab) broadcast(wl) else wl, "w")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens_ws"),
        sum(col("n_sym").cast("long")).as("n_tokens_bpe"))
  }
}
