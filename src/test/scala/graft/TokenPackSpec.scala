package graft

import graft.ops.TokenPack

import org.apache.spark.sql.functions._

/** Packing invariants for `text_pack_sequences` (the exact per-window
  * content is gated by the DuckDB oracle; these pin the arithmetic the
  * oracle can't see failing loudly — window shapes, totals, id space).
  */
class TokenPackSpec extends SparkSpec {
  import spark.implicits._

  test("packTokenWindows: dense window ids, exact sizes, totals reconcile") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val c = 100
    val got = TokenPack
      .packTokenWindows(docs, "doc_id", "text", numMerges = 4, contextLen = c)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val nDocs = docs.count()
    // every document ends somewhere: separators total the doc count
    assert(got.map(_._3).sum === nDocs)
    // window ids are dense 0..max
    val maxWin = got.map(_._1).max
    assert(got.map(_._1).toSeq === (0L to maxWin))
    // every window except the last holds exactly contextLen tokens; the
    // last holds the remainder (1..contextLen)
    got.dropRight(1).foreach { case (w, n, _, _) => assert(n === c.toLong, s"window $w") }
    assert(got.last._2 >= 1L && got.last._2 <= c.toLong)
    // stream length = whitespace-token-driven BPE total + one separator
    // per doc: reconcile against the encode op's corpus totals
    val bpeTotal = graft.ops.Bpe
      .encodeTokenCounts(docs, "doc_id", "text", numMerges = 4)
      .agg(sum("n_tokens_bpe")).head().getLong(0)
    assert(got.map(_._2).sum === bpeTotal + nDocs)
    // fingerprints are 60-bit md5 chunks: non-negative, and mostly
    // distinct (EQUAL fps are legitimate — the fixture's planted exact
    // duplicate docs can align into content-identical windows; a 60-bit
    // CHANCE collision at ~1.4k windows is ~8e-13)
    assert(got.forall(_._4 >= 0L))
    assert(got.map(_._4).distinct.length >= got.length * 9 / 10)
  }

  test("packTokenWindows: empty documents still emit their separator") {
    val docs = Seq((1L, "x y"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = TokenPack
      .packTokenWindows(docs, "doc_id", "text", numMerges = 1, contextLen = 1000)
      .collect()
    assert(got.length === 1)
    // stream: doc1 symbols + sep, sep (empty doc2), doc3 symbols + sep
    assert(got.head.getLong(2) === 3L) // n_seps = 3 docs
  }

  test("packTokenWindows: NULL documents degrade to the empty-doc case, not a corrupted prefix sum") {
    // pre-fix, a NULL text made size(ids) = -1 and silently shifted every
    // downstream doc's stream offset; now NULL ≡ "" (separator only)
    val withNull = Seq((1L, "x y"), (2L, null: String), (3L, "x")).toDF("doc_id", "text")
    val withEmpty = Seq((1L, "x y"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val a = TokenPack
      .packTokenWindows(withNull, "doc_id", "text", numMerges = 1, contextLen = 4)
      .orderBy("window_id").collect().map(_.toSeq)
    val b = TokenPack
      .packTokenWindows(withEmpty, "doc_id", "text", numMerges = 1, contextLen = 4)
      .orderBy("window_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("byteLevel packing: ASCII counts match char level; non-BMP text packs exactly") {
    // BpeSpec proves the ASCII char<->byte 1:1 correspondence (2-hex
    // symbols are order-preserving on bytes), so on a pure-ASCII corpus
    // the two regimes produce identical window GEOMETRY (ids differ —
    // different alphabets — but every count matches)
    val ascii = Seq((1L, "low lower low"), (2L, "new newer new")).toDF("doc_id", "text")
    val ch = TokenPack.packTokenWindows(ascii, "doc_id", "text", 2, 8)
      .select("window_id", "n_tokens", "n_seps").orderBy("window_id").collect().map(_.toSeq)
    val by = TokenPack.packTokenWindows(ascii, "doc_id", "text", 2, 8, byteLevel = true)
      .select("window_id", "n_tokens", "n_seps").orderBy("window_id").collect().map(_.toSeq)
    assert(ch.toSeq === by.toSeq)
    // non-BMP: the surrogate-pair emoji packs deterministically at byte
    // level (4 UTF-8 bytes -> 4 hex symbols + </w>); every doc's
    // separator arrives (n_seps total = doc count) and repeat runs agree
    val uni = Seq((1L, "café 😀"), (2L, "😀 x")).toDF("doc_id", "text")
    val a = TokenPack.packTokenWindows(uni, "doc_id", "text", 2, 6, byteLevel = true)
      .orderBy("window_id").collect().map(_.toSeq)
    val b = TokenPack.packTokenWindows(uni, "doc_id", "text", 2, 6, byteLevel = true)
      .orderBy("window_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_(2).asInstanceOf[Long]).sum === 2L) // one separator per doc
    // and the byte-level alphabet is pure ASCII (hex pairs + </w>), so
    // the symbol-id assignment is collation-portable by construction
    val (_, symIds) = TokenPack.trainTokenizer(uni, "text", 2, byteLevel = true)
    // alphabet = hex pairs + </w>; merged symbols concatenate those —
    // either way, pure ASCII
    assert(symIds.keys.forall(s => s.nonEmpty && s.matches("([0-9A-F]{2})*(</w>)?")))
  }

  test("tokenizer artifact round-trip: save -> load preserves the tokenizer; packing parity") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "low new low new")).toDF("doc_id", "text")
    val (merges, symIds) = TokenPack.trainTokenizer(docs, "text", numMerges = 3)
    val dir = s"/tmp/graft-test-tokenizer/${spark.sparkContext.applicationId}"
    try {
      TokenPack.saveTokenizer(spark, dir, merges, symIds)
      val (m2, s2) = TokenPack.loadTokenizer(spark, dir)
      // the artifact IS the tokenizer: reload must be value-identical
      assert(m2 === merges)
      assert(s2 === symIds)
      // and packing under the reloaded artifact is output-identical to
      // packing under the freshly trained one (the production contract:
      // ship the artifact, never re-train)
      val a = TokenPack.packTokenWindowsWith(docs, "doc_id", "text", merges, symIds, 8)
        .orderBy("window_id").collect().map(_.toSeq)
      val b = TokenPack.packTokenWindowsWith(docs, "doc_id", "text", m2, s2, 8)
        .orderBy("window_id").collect().map(_.toSeq)
      assert(a.toSeq === b.toSeq)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
