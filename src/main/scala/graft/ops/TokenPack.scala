package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * 100 TB shape:
  *  - word → id-sequence is derived on the VOCAB frame (distinct words,
  *    not corpus tokens): explode the trained symbol sequences, join the
  *    tiny symbol-id table, regroup — one vocab-bounded shuffle;
  *  - the corpus token scan joins that vocab-bounded table (AQE decides
  *    broadcast vs shuffle — nothing corpus-proportional is forced
  *    through the driver, the [[Bpe.VocabBroadcastMaxTextBytes]]
  *    rationale);
  *  - the global token order (doc_id, token position, symbol position)
  *    is ranked by [[GlobalRank.globalRank]] — the two-pass distributed
  *    form, NEVER a bare single-partition `row_number() OVER (ORDER BY)`;
  *  - window assembly groups by `rank div contextLen`: per-group state is
  *    bounded by the context length, and the only corpus-sized exchange
  *    is that final hash partition on window id.
  */
object TokenPack {

  /** Separator token id (doc boundary marker in the packed stream). */
  val SepId: Long = 0L

  /** (sym, id): alphabet ids 1..A in binary order, merged ids
    * A + merge_rank, min-id on string collisions. Bounded: |charset| + M
    * rows.
    */
  private[graft] def symbolIdTable(
      seq0: DataFrame,
      merges: Seq[Bpe.Merge]): DataFrame = {
    val spark = seq0.sparkSession
    import spark.implicits._
    // distinct initial symbols: bounded by the charset (<= 64k UTF-16
    // units char-level, <= 256 hex pairs byte-level) + the end-of-word
    // marker — the sanctioned bounded driver collect
    val alphabet = seq0
      .select(explode(col("s")).as("sym"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .sorted
    val ids =
      alphabet.toSeq.zipWithIndex.map { case (s, i) => (s, (i + 1).toLong) } ++
        merges.map(m => (m.merged, alphabet.length + m.mergeRank))
    ids.groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).min) }.toSeq
      .toDF("sym", "id")
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
    * document (empty documents still emit their separator).
    */
  def packTokenWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      contextLen: Int,
      parts: Int = 32
  ): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val (merges, trained) =
      Bpe.trainMergeSeqWithSeqs(docs, textCol, numMerges)
    var ranked: DataFrame = null
    try {
      val seq0 = Bpe.initialSeqs(Bpe.wordVocab(docs, textCol))
      val symIds = symbolIdTable(seq0, merges)
      // (w, spos, id): vocab-bounded, one small shuffle to regroup order
      val wordIds = trained
        .select(col("w"), posexplode(col("s")).as(Seq("spos", "sym")))
        .join(broadcast(symIds), "sym")
        .select(col("w"), col("spos").cast("long").as("spos"), col("id"))
      val toks = docs.select(
        col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("__ts"))
      val tokenRows = toks
        .select(col("doc_id"), posexplode(col("__ts")).as(Seq("tpos", "w")))
        .select(col("doc_id"), (col("tpos") + 1).cast("long").as("tpos"), col("w"))
        .join(wordIds, "w")
        .select(col("doc_id"), col("tpos"), col("spos"), col("id"))
      // one separator row per document, AFTER its last token (empty docs
      // emit just the separator) — id 0, spos 0
      val sepRows = toks.select(
        col("doc_id"),
        (size(col("__ts")) + 1).cast("long").as("tpos"),
        lit(0L).as("spos"),
        lit(SepId).as("id"))
      val stream = tokenRows.unionByName(sepRows)
      ranked = GlobalRank.globalRank(
        stream,
        Seq(col("doc_id"), col("tpos"), col("spos")),
        "__r",
        parts)
      val out = ranked
        .withColumn("__g", col("__r") - 1)
        .withColumn("window_id", expr(s"__g div ${contextLen}L"))
        .groupBy("window_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("id") === SepId, 1L).otherwise(0L)).as("n_seps"),
          conv(
            substring(
              md5(concat_ws(
                ",",
                transform(
                  array_sort(collect_list(struct(col("__g"), col("id")))),
                  e => e.getField("id").cast("string")))),
              1, 15),
            16, 10).cast("long").as("content_fp"))
      Caching.materializeAndRelease(out)
    } finally {
      if (ranked != null) Caching.release(ranked)
      Caching.release(trained)
    }
  }
}
