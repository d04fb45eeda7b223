package graft

import graft.functions.BpeMergeRuns
import graft.ops.Bpe

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprBridge

/** BPE merge-training semantics (`text_bpe_train`): the greedy-leftmost
  * merge kernel, determinism of the learned table, and parity with an
  * in-test reference trainer.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def mergeOnce(seq: Seq[String], a: String, b: String): Seq[String] = {
    val df = Seq(Tuple1(seq)).toDF("s")
    df.select(
        ExprBridge.column(BpeMergeRuns(ExprBridge.expression(col("s")), a, b)).as("s"))
      .as[Seq[String]].head()
  }

  test("merge kernel is greedy-leftmost and non-overlapping") {
    assert(mergeOnce(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(mergeOnce(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(mergeOnce(Seq("x", "a", "b", "a", "b", "y"), "a", "b") === Seq("x", "ab", "ab", "y"))
    // a merged element is not reconsidered within the same pass
    assert(mergeOnce(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
    // no match → unchanged
    assert(mergeOnce(Seq("b", "a"), "a", "b") === Seq("b", "a"))
    // short/empty sequences
    assert(mergeOnce(Seq("a"), "a", "b") === Seq("a"))
    assert(mergeOnce(Seq.empty[String], "a", "b") === Seq.empty[String])
  }

  /** Straight-line reference trainer: scala.collection maps, no Spark. */
  private def referenceTrain(words: Seq[String], m: Int): Seq[(String, String, Long)] = {
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var seqs: Map[List[String], Long] =
      freq.groupBy { case (w, _) => w.map(_.toString).toList :+ Bpe.EndOfWord }
        .map { case (s, m2) => s -> m2.values.sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to m) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- seqs; p <- s.sliding(2) if p.size == 2)
        counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, s"$x $y") }
        out += ((a, b, c))
        def apply(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b => (a + b) :: apply(rest)
          case x :: rest                          => x :: apply(rest)
          case Nil                                => Nil
        }
        seqs = seqs.groupBy { case (s, _) => apply(s) }.map { case (s, m2) => s -> m2.values.sum }
      }
    }
    out.toSeq
  }

  test("trained merge table matches the straight-line reference trainer") {
    val words = Seq(
      "low", "low", "low", "lower", "lower", "lowest",
      "new", "new", "newer", "newer", "newer", "wider")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val got = Bpe.trainMerges(docs, "text", numMerges = 6)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(got === referenceTrain(words, 6))
  }

  test("pair statistics count every adjacent position, not distinct pairs per word") {
    // "abab" holds (a,b) TWICE; "xy"×2 holds (x,y) twice total. Sennrich
    // occurrence counting ties them 2–2 and the binary-order tiebreak
    // ("a b" < "x y") elects (a,b); distinct-per-word counting would
    // give (a,b)=1 and elect (x,y) — so the first learned merge is the
    // discriminating observable
    val docs = Seq("abab xy xy").toDF("text")
    val first = Bpe.trainMerges(docs, "text", numMerges = 1).head()
    assert((first.getString(1), first.getString(2), first.getLong(4)) === (("a", "b", 2L)))
    // and the straight-line reference (sliding windows = per-position)
    // agrees on the full table
    val words = Seq("abab", "xy", "xy")
    val got = Bpe.trainMerges(docs, "text", numMerges = 4)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got === referenceTrain(words, 4))
  }

  /** Byte-level reference trainer: same loop as [[referenceTrain]], seq0
    * = the word's UTF-8 bytes as uppercase 2-hex-digit symbols.
    */
  private def referenceTrainBytes(words: Seq[String], m: Int): Seq[(String, String, Long)] = {
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var seqs: Map[List[String], Long] =
      freq.groupBy { case (w, _) =>
        w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").toList :+ Bpe.EndOfWord
      }.map { case (s, m2) => s -> m2.values.sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to m) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- seqs; p <- s.sliding(2) if p.size == 2)
        counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, s"$x $y") }
        out += ((a, b, c))
        def apply(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b => (a + b) :: apply(rest)
          case x :: rest                          => x :: apply(rest)
          case Nil                                => Nil
        }
        seqs = seqs.groupBy { case (s, _) => apply(s) }.map { case (s, m2) => s -> m2.values.sum }
      }
    }
    out.toSeq
  }

  test("byte-level training matches the byte reference trainer on multibyte text") {
    // 2-byte (é C3A9, ü C3BC), 3-byte (日 E697A5 …) and 4-byte non-BMP
    // (😀 F09F9880 — a Java surrogate PAIR, the case the char-level
    // splitter cannot represent as one symbol)
    val words = Seq(
      "café", "café", "café", "über", "über", "日本語", "😀ok", "😀ok", "😀ok", "😀ok")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val got = Bpe.trainMergesBytes(docs, "text", numMerges = 8)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got === referenceTrainBytes(words, 8))
    // every learned symbol is hex bytes and/or the end-of-word marker —
    // whitespace-free, so "a b" pair keys stay unambiguous
    val hexOrEow = "^([0-9A-F]{2})+$|^([0-9A-F]{2})*</w>$".r
    got.foreach { case (a, b, _) =>
      assert(hexOrEow.findFirstIn(a).isDefined, a)
      assert(hexOrEow.findFirstIn(b).isDefined, b)
    }
    // the most frequent word starts with the 4 UTF-8 bytes of 😀; its
    // byte pairs must be learnable — at least one learned merge touches
    // a byte outside ASCII range (>= 0x80)
    val nonAscii = got.exists { case (a, b, _) =>
      (a + b).replace(Bpe.EndOfWord, "").grouped(2)
        .exists(h => Integer.parseInt(h, 16) >= 0x80)
    }
    assert(nonAscii, got.mkString("\n"))
  }

  test("on pure-ASCII text the byte-level trainer corresponds 1:1 to the char-level one") {
    // 2-digit uppercase hex is order-preserving on bytes, so every
    // argmax tiebreak resolves identically: the byte merge table is the
    // char table with each symbol hex-coded, and encode counts agree
    val docs = Seq("low low lower newest ab ab cd").toDF("text")
    // the end-of-word marker stays verbatim (it only ever appears as a
    // suffix — merges can't move it off the word end)
    def hexed(sym: String): String = {
      val (core, eow) =
        if (sym.endsWith(Bpe.EndOfWord))
          (sym.dropRight(Bpe.EndOfWord.length), Bpe.EndOfWord)
        else (sym, "")
      core.flatMap(c => f"${c.toInt}%02X") + eow
    }
    val charT = Bpe.trainMerges(docs, "text", numMerges = 6)
      .collect().map(r => (hexed(r.getString(1)), hexed(r.getString(2)), r.getLong(4))).toSeq
    val byteT = Bpe.trainMergesBytes(docs, "text", numMerges = 6)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(byteT === charT)
    val ids = Seq((1L, "low lower ab"), (2L, "newest cd")).toDF("doc_id", "text")
    val c = Bpe.encodeTokenCounts(ids, "doc_id", "text", numMerges = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val b = Bpe.encodeTokenCountsBytes(ids, "doc_id", "text", numMerges = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(b === c)
  }

  test("training is deterministic and later merges build on earlier merged symbols") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").select("text")
    val t1 = Bpe.trainMerges(docs, "text", numMerges = 8).collect().toSeq
    val t2 = Bpe.trainMerges(docs, "text", numMerges = 8).collect().toSeq
    assert(t1 === t2)
    assert(t1.size === 8)
    // ranks ascend 1..8 and at least one later merge consumes a merged
    // symbol (multi-char sym_a or sym_b) — the defining BPE property
    assert(t1.map(_.getLong(0)) === (1L to 8L))
    val multiLevel = t1.exists(r =>
      (r.getString(1).length > 1 && r.getString(1) != Bpe.EndOfWord) ||
        (r.getString(2).length > 1 && r.getString(2) != Bpe.EndOfWord))
    assert(multiLevel, t1.mkString("\n"))
  }

  test("encodeTokenCounts: per-doc counts match a hand replay; bounds hold") {
    // corpus: "ab ab cd" + "ab". Merges (freq-ranked, M=3):
    //   1: (a,b) cnt 3 → ab | 2: (ab,</w>) cnt 3 → ab</w> | 3: (c,d) cnt 1
    // final |symbols|: "ab" → 1 (ab</w>), "cd" → 2 (cd, </w>)
    val docs = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val got = Bpe.encodeTokenCounts(docs, "doc_id", "text", numMerges = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(1L -> ((3L, 4L)), 2L -> ((1L, 1L))))
  }

  test("encode bounds: ws tokens <= bpe tokens <= chars + words (fixture corpus)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val enc = Bpe.encodeTokenCounts(docs, "doc_id", "text", numMerges = 8)
    // every word is >= 1 symbol (lower bound) and <= len(word)+1 chars+marker
    val bad = enc
      .join(docs, "doc_id")
      .filter(col("n_tokens_bpe") < col("n_tokens_ws") ||
        col("n_tokens_bpe") > length(col("text")) + col("n_tokens_ws"))
      .count()
    assert(bad === 0L)
    // merges actually compress: the corpus total must sit strictly below
    // the un-merged ceiling (chars + markers)
    val row = enc.agg(sum("n_tokens_ws"), sum("n_tokens_bpe")).head()
    assert(row.getLong(1) < spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .agg(sum(length(regexp_replace(col("text"), "\\s+", "")))).head().getLong(0) + row.getLong(0))
  }

  test("both pair-count update paths agree with the reference on a repeat-heavy corpus") {
    // intra-word repeats ("abab", "aaaa") exercise the occurrence
    // (per-position) delta arithmetic; running the SAME training once
    // through the broadcast-delta path (default gate) and once through
    // the union+re-aggregate fallback (gate 0) pins the two maintained
    // count states to each other and to the straight-line recount
    val words = Seq(
      "abab", "abab", "aaaa", "aaab", "banana", "banana", "bandana",
      "xyxyxy", "xyz", "xyz", "xyz", "zzz")
    val docs = Seq(words.mkString(" ")).toDF("text")
    def table(gate: Long): Seq[(String, String, Long)] = {
      val (m, s) = Bpe.trainMergeSeqWithSeqs(
        docs, "text", numMerges = 24, deltaBroadcastMax = gate)
      graft.ops.Caching.release(s)
      m.map(x => (x.symA, x.symB, x.pairCount))
    }
    val viaBroadcast = table(Long.MaxValue)
    val viaUnion = table(0L)
    val viaNaive = Bpe.trainMergeSeqNaive(docs, "text", numMerges = 24)
      .map(x => (x.symA, x.symB, x.pairCount))
    val ref = referenceTrain(words, 24)
    assert(viaBroadcast === ref)
    assert(viaUnion === ref)
    // and the stats-gated naive loop (the shape trainMergeSeq picks at
    // registered scale) produces the same table byte-for-byte
    assert(viaNaive === ref)
  }

  test("plan depth and partition count stay bounded through an M=250 training run") {
    // production merge counts are 30k-50k; the loop must not accrue one
    // plan level — or one partition — per merge (the JIT/janino
    // chained-projection hazard, and the measured 2^13-task stage the
    // un-coalesced filter∪slice update produced by merge 13). 400
    // deterministic pseudo-words give well over 250 learnable pairs; 250
    // is deliberately NOT a multiple of the rebase period, so the
    // returned chain is a real partial-period plan, not a fresh rebase
    val rnd = new scala.util.Random(42)
    val words = (0 until 400).map { _ =>
      val len = 6 + rnd.nextInt(7)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val docs = Seq(words.mkString(" ")).toDF("text")
    val (merges, finalSeqs) =
      Bpe.trainMergeSeqWithSeqs(docs, "text", numMerges = 250)
    try {
      assert(merges.size === 250)
      assert(merges.map(_.mergeRank) === (1L to 250L))
      // tree size, not depth: counts every operator the analyzer must
      // re-walk. One rebase period is <= SeqsCheckpointEveryMerges
      // (filter + union + project + coalesce + checkpoint-scan) levels;
      // an unbounded chain would be > 250 nodes by construction
      val planNodes = finalSeqs.queryExecution.analyzed.collect { case p => p }.size
      assert(planNodes <= 8 * Bpe.SeqsCheckpointEveryMerges,
        s"final seqs plan has $planNodes nodes — lineage not being rebased")
      // partition count bounded by one rebase period, never by M
      val parts = finalSeqs.rdd.getNumPartitions
      val para = spark.sparkContext.defaultParallelism
      assert(parts <= para * (Bpe.SeqsCheckpointEveryMerges + 1),
        s"final seqs has $parts partitions — generations not being coalesced")
      // and the trained table is the real thing: later merges build on
      // earlier merged symbols
      assert(merges.exists(m => m.symA.length > 1 && m.symA != Bpe.EndOfWord))
    } finally graft.ops.Caching.release(finalSeqs)
  }

  test("exhaustion: more requested merges than learnable pairs ends the table early") {
    val docs = Seq("a a a").toDF("text") // one word "a": seq [a, </w>] → 1 learnable merge
    val t = Bpe.trainMerges(docs, "text", numMerges = 10).collect()
    assert(t.length === 1)
    assert((t(0).getString(1), t(0).getString(2)) === ("a", Bpe.EndOfWord))
  }

  test("driver-local trainer: byte-identical table to both distributed loops (repeat-heavy corpus)") {
    // the r21 local path (the shape trainMergeSeq picks under the
    // collected-seq0 gate) against the naive loop, the incremental loop
    // and the straight-line reference — same corpus as the update-path
    // parity test so all four trainers are pinned to one table
    val words = Seq(
      "abab", "abab", "aaaa", "aaab", "banana", "banana", "bandana",
      "xyxyxy", "xyz", "xyz", "xyz", "zzz")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val rows = Bpe.collectedSeq0(docs, "text", byteLevel = false).get
    val viaLocal = Bpe.trainMergeSeqLocal(rows, 24).map(x => (x.symA, x.symB, x.pairCount))
    assert(viaLocal === referenceTrain(words, 24))
    assert(viaLocal ===
      Bpe.trainMergeSeqNaive(docs, "text", 24).map(x => (x.symA, x.symB, x.pairCount)))
    // the collected seq0 rows stay the INITIAL sequences (merge
    // application replaces, never mutates) — a second run over the same
    // rows reproduces the table
    assert(Bpe.trainMergeSeqLocal(rows, 24).map(x => (x.symA, x.symB, x.pairCount)) === viaLocal)
  }

  test("driver-local trainer: byte-level parity on multibyte text (hex symbols)") {
    val docs = Seq("café café naïve 日本語 😀😀 zz yy zz xy xy").toDF("text")
    val rows = Bpe.collectedSeq0(docs, "text", byteLevel = true).get
    val viaLocal = Bpe.trainMergeSeqLocal(rows, 12).map(x => (x.symA, x.symB, x.pairCount))
    val viaNaive = Bpe.trainMergeSeqNaive(docs, "text", 12, byteLevel = true)
      .map(x => (x.symA, x.symB, x.pairCount))
    assert(viaLocal === viaNaive)
  }

  test("trainTokenizer local path: symbol-id map identical to the distributed assembly") {
    val docs = Seq(
      (1L, "abab banana bandana xyz"),
      (2L, "aaab zz café lower lowest")).toDF("doc_id", "text")
    for (byteLevel <- Seq(false, true)) {
      val (merges, symIds) =
        graft.ops.TokenPack.trainTokenizer(docs, "text", 6, byteLevel)
      val vocab = Bpe.wordVocab(docs, "text")
      val seq0 = if (byteLevel) Bpe.initialByteSeqs(vocab) else Bpe.initialSeqs(vocab)
      assert(symIds === graft.ops.TokenPack.symbolIdMap(seq0, merges),
        s"byteLevel=$byteLevel symbol-id maps diverge")
    }
  }
}
