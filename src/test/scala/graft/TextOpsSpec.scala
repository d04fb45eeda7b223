package graft

import graft.ops.{Multimodal, TextOps}
import org.apache.spark.sql.functions._

/** Text-analysis and multimodal-plumbing specs. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("normalize: lowercases, collapses punctuation/whitespace, trims") {
    val out = Seq("  Hello,  WORLD! 42 ").toDF("t")
      .select(TextOps.normalize(col("t"))).as[String].collect().head
    assert(out == "hello world 42")
  }

  test("tokens: empty and all-space strings yield zero tokens") {
    val out = Seq("", "   ", "a  b").toDF("t")
      .select(size(TextOps.tokens(col("t")))).as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 2))
  }

  test("tokenStats counts") {
    val r = TextOps.tokenStats(Seq((1L, "a bb a ccc")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_uniq_tokens") == 3)
    assert(r.getAs[Int]("max_token_len") == 3)
    assert(r.getAs[Int]("n_chars") == 10)
  }

  test("qualityCounts: stopword/digit/short-token tallies") {
    val r = TextOps
      .qualityCounts(Seq((1L, "the cat is 42 ok")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(r.getAs[Int]("n_tokens") == 5)
    assert(r.getAs[Int]("n_stop") == 2)         // the, is
    assert(r.getAs[Int]("n_digit_tokens") == 1) // 42
    assert(r.getAs[Int]("n_short_tokens") == 3) // is, 42, ok
  }

  test("fingerprints: identical normalized texts share fp; small edits share min-shingle sometimes but fp differs") {
    val df = Seq(
      (1L, "Hello, World! one two three four five six"),
      (2L, "hello world one two three four five six"),
      (3L, "completely different")
    ).toDF("doc_id", "text")
    val out = TextOps.fingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == out(2L)._1) // normalization-invariant
    assert(out(1L)._1 != out(3L)._1)
    assert(out(3L)._2 == null) // < 5 tokens → no shingles
  }

  test("winnowing: local edits keep most fingerprints; disjoint texts share none") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox leaps over the lazy dog again and again today" // one word edited
    val c = "completely unrelated content about spark catalyst physical planning"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = graft.ops.TextOps.winnowFingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("fps").toSet).toMap
    val overlapAB = fps(1L).intersect(fps(2L)).size.toDouble / fps(1L).size
    assert(overlapAB > 0.5, s"edit-robustness overlap $overlapAB")
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    // short documents (< k chars) fingerprint to the empty set, not an error
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
    val s0 = graft.ops.TextOps.winnowFingerprints(short, "doc_id", "text")
      .collect().head.getAs[scala.collection.Seq[Long]]("fps")
    assert(s0.isEmpty)
  }

  test("winnowing native expression matches the HOF chain (seeded, 150 strings)") {
    // WinnowRuns replaced a transform/slice HOF chain (r14); pin value
    // AND ORDER parity against the original Spark-expression form —
    // md5/conv/substr/array_min/array_distinct semantics included —
    // over random texts incl. whitespace runs, punctuation, and
    // boundary lengths around k=8 and k+w-1.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(20260814)
    val alphabet = "abcdefghij0123 ,.!-\t\n"
    val texts = (1 to 150).map { i =>
      val len = rnd.nextInt(40) + (if (i % 3 == 0) 0 else 6) // hit <k, ==k, >k+w
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    } :+ (991L, "") :+ (992L, "        ") :+ (993L, null.asInstanceOf[String])
    val df = texts.toDF("doc_id", "text")
    val k = 8
    val w = 4
    val emptyLongs = array().cast("array<bigint>")
    val hofForm = df
      .select(col("doc_id"), graft.ops.TextOps.normalize(col("text")).as("__nt"))
      .withColumn(
        "__hs",
        when(
          length(col("__nt")) >= k,
          transform(
            sequence(lit(1), length(col("__nt")) - (k - 1)),
            i => conv(substring(md5(col("__nt").substr(i, lit(k))), 1, 8), 16, 10).cast("long"))
        ).otherwise(emptyLongs))
      .withColumn(
        "fps",
        array_distinct(
          when(
            size(col("__hs")) >= w,
            transform(
              sequence(lit(1), size(col("__hs")) - (w - 1)),
              j => array_min(slice(col("__hs"), j, lit(w))))
          ).otherwise(emptyLongs)))
      .select(col("doc_id"), col("fps"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("fps").toList).toMap
    val native = graft.ops.TextOps.winnowFingerprints(df, "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("fps").toList).toMap
    assert(native == hofForm)
    assert(native.values.exists(_.nonEmpty))
  }

  test("WinnowRuns interpreted eval equals generated code") {
    val inputs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaa"), (3L, "short"), (4L, ""), (5L, "exactly8"))
    def run(codegen: String): Map[Long, List[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try graft.ops.TextOps.winnowFingerprints(
        inputs.toDF("doc_id", "text"), "doc_id", "text", k = 8, w = 4)
        .collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("fps").toList)
        .toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    assert(gen == run("NO_CODEGEN"))
    assert(gen(1L).nonEmpty && gen(3L).isEmpty)
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el perro y la casa de los gatos"),
      (3L, "der hund und die katze ist nicht da")
    ).toDF("doc_id", "text")
    val out = TextOps.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
  }

  test("multimodal: binary attach + expression metadata + fake decode agree") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val withBin = Multimodal.withBinary(df, "text")
    val meta = Multimodal.metaColumns(withBin, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> (r.getAs[Int]("n_bytes"), r.getAs[Int]("head_code"))).toMap
    assert(meta(1L) == ((3, 97)))  // 'a' = 97
    assert(meta(2L) == ((0, -1)))
    val decoded = Multimodal
      .extractMeta(spark, withBin.select(col("doc_id"), col("media")).as[Multimodal.MediaRecord])
      .collect().map(m => m.doc_id -> m).toMap
    assert(decoded(1L).n_bytes == 3 && decoded(1L).head_code == 97)
    assert(decoded(1L).fake_width == (97 % 64) + 1)
    assert(decoded(2L).fake_width == 0)
  }

  test("multimodal: real JDK image decode runs distributed through extractMeta") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val recs = Seq(
      Multimodal.MediaRecord(1L, png(8, 4)),
      Multimodal.MediaRecord(2L, png(3, 9)),
      Multimodal.MediaRecord(3L, "plain text bytes".getBytes("UTF-8"))
    ).toDS().repartition(2) // >1 partition: decode must work per-executor-task
    val out = Multimodal.extractMeta(spark, recs, Multimodal.ImageIoDecode)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).fake_width == 8 && out(1L).fake_height == 4 && out(1L).format_tag == "png")
    assert(out(2L).fake_width == 3 && out(2L).fake_height == 9 && out(2L).format_tag == "png")
    assert(out(3L).format_tag == "undecodable")
  }

  test("lmQuality: doc-frequency sums, rare counts, and the single-division mean") {
    // corpus: "the" in all 3 docs (df=3), "cat"/"dog" in one each (df=1),
    // "sat" in two (df=2); doc 4 is empty and yields no row
    val df = Seq(
      (1L, "the cat sat"),
      (2L, "the dog sat"),
      (3L, "the the"),   // duplicate token: multiplicity counts, df once
      (4L, "")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.lmQuality(df, "doc_id", "text", rareDfMax = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((3L, 3L + 1L + 2L, 1L, 2.0)))          // the+cat+sat
    assert(out(2L) == ((3L, 3L + 1L + 2L, 1L, 2.0)))          // the+dog+sat
    assert(out(3L) == ((2L, 6L, 0L, 3.0)))                    // the twice, df=3 each
  }

  test("sparseTopK: integer dot-product ranking with df-cap and id tie-break") {
    // "common" appears in all 4 docs → df=4 > maxDf=3, dropped from the
    // index; remaining overlaps: 1∩2 share {x(2·1)} + {y(1·1)} = 3,
    // 1∩3 share {x(2·2)} = 4, 2∩3 share {x(1·2)} = 2; doc 4 shares only
    // the capped token → no scored pairs at all.
    val df = Seq(
      (1L, "common x x y"),
      (2L, "common x y z"),
      (3L, "common x x"),
      (4L, "common only")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.sparseTopK(df, "doc_id", "text", k = 2, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    // doc 1: best neighbor 3 (score 4), then 2 (score 3)
    assert(byDoc(1L).sortBy(_._4).map(t => (t._2, t._3)).toSeq == Seq((3L, 4L), (2L, 3L)))
    // doc 2: neighbor 1 (3) then 3 (2)
    assert(byDoc(2L).sortBy(_._4).map(t => (t._2, t._3)).toSeq == Seq((1L, 3L), (3L, 2L)))
    // doc 4 never appears, as query or neighbor
    assert(!out.exists(t => t._1 == 4L || t._2 == 4L))
  }

  test("repetitionStats: multiplicity-preserving n-gram counts and ratio") {
    val df = Seq(
      (1L, "a b a b a b"),   // trigrams: aba, bab, aba, bab -> 4 total, 2 distinct
      (2L, "w x y z"),       // wxy, xyz -> all unique
      (3L, "one two")        // < 3 tokens -> no row
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.repetitionStats(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((4L, 2L, 2L, 0.5)))
    assert(out(2L) == ((2L, 2L, 1L, 0.0)))
  }

  test("scrubPii replaces emails, long digit runs, and phone shapes; leaves prose alone") {
    val out = Seq(
      (1L, "mail a.b+c@x-corp.io now"),
      (2L, "card 4111111111111111 leaked"),
      (3L, "call +1 555 0134 or 44 201 5550"),
      (4L, "year 2024 has only 4 digits, room 12345 five")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.TextOps.scrubPii(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail <EMAIL> now")
    assert(out(2L) == "card <NUM> leaked")
    assert(out(3L) == "call <PHONE> or <PHONE>")
    assert(out(4L) == "year 2024 has only 4 digits, room 12345 five")
  }

  test("chunkTokens: counts, boundaries, overlap content, empty docs") {
    // stride = 4 (chunk 6, overlap 2)
    val toks = (1 to 11).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, toks), (2L, "a b"), (3L, ""), (4L, "x " * 6)).toDF("doc_id", "text")
    val out = graft.ops.TextOps.chunkTokens(df, "doc_id", "text", chunkTokens = 6, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    // doc 1: n=11 -> ceil(9/4)=3 chunks at 0,4,8
    assert(out((1L, 0L)) == ((6, "t1 t2 t3 t4 t5 t6")))
    assert(out((1L, 1L)) == ((6, "t5 t6 t7 t8 t9 t10"))) // 2-token overlap
    assert(out((1L, 2L)) == ((3, "t9 t10 t11")))          // short tail
    // doc 2: n=2 < chunk -> exactly one whole-doc chunk
    assert(out((2L, 0L)) == ((2, "a b")))
    // doc 3: empty -> no chunks at all
    assert(!out.keySet.exists(_._1 == 3L))
    // doc 4: n=6 == chunk -> exactly one chunk, no empty second chunk
    assert(out((4L, 0L))._1 == 6)
    assert(out.keySet.count(_._1 == 4L) == 1)
  }

  test("frame sampling: ceil(n_bytes/stride) frames with right offsets") {
    val df = Seq((1L, "x" * 130), (2L, "")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.withBinary(df, "text"), "doc_id", "media", 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(frames.count(_._1 == 1L) == 3) // 130 bytes / 64 → 3 frames
    assert(frames.filter(_._1 == 1L).map(_._3).toSet == Set(0, 64, 128))
    assert(!frames.exists(_._1 == 2L))
  }

  test("bm25TopK: rare-term overlap outranks common-term overlap; short docs beat long") {
    val df = (Seq(
      (0L, "rare common"),
      (1L, "rare zzz"),                    // shares the rare term
      (2L, "common yyy xxx"),              // shares only the common term
      (3L, "common rare rare")             // shares both, rare twice
    ) ++ (4L to 9L).map(i => (i, s"common filler$i"))) // inflate df(common)
      .toDF("doc_id", "text")
    val out = TextOps.bm25TopK(df, "doc_id", "text", k = 3, maxDf = 10)
      .filter(col("doc_id") === 0L)
      .orderBy("rank")
      .as[(Long, Long, Long, Long)].collect()
    // doc 3 (rare tf=2 + common) > doc 1 (rare) > doc 4 (common only —
    // among the common-sharers the 2-token docs outrank 3-token doc 2 by
    // length normalization, and the id tie-break picks the lowest)
    assert(out.map(_._2).toSeq == Seq(3L, 1L, 4L), out.mkString(", "))
    // scores strictly ordered (fixed-point BIGINT, no FP ties)
    assert(out.map(_._3).toSeq == out.map(_._3).sortBy(-_).toSeq)
  }

  test("hashClassifier: score equals an independent JVM replay of the md5 weight table") {
    // independent replay (MessageDigest, not Catalyst) of bucket+weight
    def chunk52(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    def weight(tok: String): Long = {
      val b = chunk52(tok) % 4096
      chunk52(s"graft-clf:$b") % 2001 - 1000
    }
    val df = Seq(
      (1L, "The quick brown fox, the lazy dog!"),
      (2L, ""),                       // totality: no tokens
      (3L, "spark spark spark")       // occurrences counted, not types
    ).toDF("doc_id", "text")
    val out = TextOps.hashClassifier(df, "doc_id", "text")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exp1 = Seq("the", "quick", "brown", "fox", "the", "lazy", "dog").map(weight).sum
    assert(out(1L) == ((7L, exp1, exp1 > 0)))
    assert(out(2L) == ((0L, 0L, false)))
    assert(out(3L) == ((3L, 3 * weight("spark"), 3 * weight("spark") > 0)))
  }

  test("lmPerplexity: add-1 smoothing, exact bit costs and fixed-point probs by hand") {
    import spark.implicits._
    // corpus bigrams: "a b"×3 (doc1, doc2, doc3), "b c"×1 (doc1);
    // contexts c1(a)=3, c1(b)=1; V = |{a,b,c,solo}| = 4 — doc4's lone
    // token joins the VOCAB even though it yields no bigram. Hand replay:
    //   p(b|a) = (3+1)/(3+4) = 4/7 → bits = bitlen(7 div 4)−1 = 0,
    //     p_fp = 4e12 div 7 = 571_428_571_428
    //   p(c|b) = (1+1)/(1+4) = 2/5 → bits = bitlen(5 div 2)−1 = 1,
    //     p_fp = 2e12 div 5 = 400_000_000_000
    // doc4 has ONE token → no bigrams → absent from the output
    val rows = Seq((1L, "A b! c"), (2L, "a b"), (3L, "a,b"), (4L, "solo"))
    val got = TextOps.lmPerplexity(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === Map(
      1L -> ((2L, 1L, 971428571428L, 0.5)),
      2L -> ((1L, 0L, 571428571428L, 0.0)),
      3L -> ((1L, 0L, 571428571428L, 0.0))))
  }

  test("lmKnPerplexity: d=3/4 discount + continuation backoff by hand; mass sums to 1") {
    import spark.implicits._
    // model bigrams: "a b"×2, "a c"×1 → B=2; ctx a: c1=3, N1p=2;
    // cont: N1m(b)=1, N1m(c)=1. Common denominator 4·c1·B = 24:
    //   p(b|a) = [(8−3)·2 + 3·2·1]/24 = 16/24 = 2/3 → bits=0, p_fp=666666666666
    //   p(c|a) = [(4−3)·2 + 3·2·1]/24 =  8/24 = 1/3 → bits=1, p_fp=333333333333
    // and p(b|a) + p(c|a) = 1 exactly (KN mass conservation)
    val rows = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
    val got = TextOps.lmKnPerplexity(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === Map(
      1L -> ((1L, 0L, 666666666666L, 0.0)),
      2L -> ((1L, 0L, 666666666666L, 0.0)),
      3L -> ((1L, 1L, 333333333333L, 1.0))))
  }

  test("lmPerplexityScored: frozen model, unseen bigram keeps c1, unseen context floors at 1/V") {
    import spark.implicits._
    // model corpus: one doc "a b c" → c12("a b")=1, c12("b c")=1;
    // c1(a)=1, c1(b)=1; V = |{a,b,c}| = 3. Scored docs:
    //   "a b" seen:            num=2, den=1+3=4 → bits=1, p_fp=5e11
    //   "a z" unseen bigram,
    //         seen context a:  num=1, den=1+3=4 → bits=2, p_fp=2.5e11
    //   "z q" unseen context:  num=1, den=0+3=3 → bits=1, p_fp=333333333333
    val model = Seq((1L, "a b c")).toDF("doc_id", "text")
    val score = Seq((2L, "a b"), (3L, "a z"), (4L, "z q")).toDF("doc_id", "text")
    val got = TextOps.lmPerplexityScored(model, score, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === Map(
      2L -> ((1L, 1L, 500000000000L, 1.0)),
      3L -> ((1L, 2L, 250000000000L, 2.0)),
      4L -> ((1L, 1L, 333333333333L, 1.0))))
  }

  test("lmKnPerplexityScored: frozen KN model — every unseen case pinned, uniform floor, exact mass") {
    import spark.implicits._
    // model corpus: one doc "a b a c" → bigrams (a b), (b a), (a c), each
    // c12=1; B=3; V=|{a,b,c}|=3; B+V=6. ctx a: c1=2, N1p=2; ctx b: c1=1,
    // N1p=1. Continuations N1m: a←1 (b a), b←1 (a b), c←1 (a c).
    // Hand replay (num/den over den = 4·c1·(B+V), floor at 1/(B+V)):
    //   "a b" SEEN:            num=(4−3)·6+3·2·2=18, den=48 → p=3/8,
    //                          bits=bitlen(48 div 18)−1=1, fp=375000000000
    //   "a z" unseen bigram, seen ctx, UNSEEN w2 (N1m=0):
    //                          num0=3·2·1=6 < 4·c1=8 → FLOOR (1, 6) →
    //                          bits=2, fp=166666666666
    //   "b c" unseen bigram, seen ctx, seen w2: num=3·1·2=6 ≥ 4·c1=4,
    //                          den=24 → p=1/4, bits=2, fp=250000000000
    //   "z q" UNSEEN CONTEXT, unseen w2: (N1m+1)/(B+V)=1/6 → bits=2
    //   "z a" unseen context, seen w2:   2/6=1/3 → bits=1, fp=333333333333
    //   "a a" unseen bigram, seen ctx, seen w2: num=3·2·2=12 ≥ 8,
    //                          den=48 → p=1/4, bits=2, fp=250000000000
    //   "a c" SEEN:            num=18/48 (same as "a b")
    val model = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val score = Seq(
      (2L, "a b"), (3L, "a z"), (4L, "b c"), (5L, "z q"),
      (6L, "z a"), (7L, "a a"), (8L, "a c")).toDF("doc_id", "text")
    val got = TextOps.lmKnPerplexityScored(model, score, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === Map(
      2L -> ((1L, 1L, 375000000000L, 1.0)),
      3L -> ((1L, 2L, 166666666666L, 2.0)),
      4L -> ((1L, 2L, 250000000000L, 2.0)),
      5L -> ((1L, 2L, 166666666666L, 2.0)),
      6L -> ((1L, 1L, 333333333333L, 1.0)),
      7L -> ((1L, 2L, 250000000000L, 2.0)),
      8L -> ((1L, 1L, 375000000000L, 1.0))))
    // KN mass conservation on the frozen model, exact to the last
    // fixed-point digit: Σ_{w2 ∈ {a,b,c}} p(w2|a) = 18/48 + 12/48 + 18/48
    // = 1 — the fps of "a b", "a a", "a c" sum to exactly 10¹²
    assert(got(2L)._3 + got(7L)._3 + got(8L)._3 === 1000000000000L)
  }

  test("piiAudit: email/IPv4 redaction counts and exact scrubbed text") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail a.b+c_1%x@sub-domain.example.co.uk please"),
      (2L, "hosts 10.0.0.1 and 192.168.255.254, embedded x1.2.3.4y stays"),
      (3L, "both u@example.com at 8.8.8.8"),
      (4L, "no pii here, just words and 1234 numbers"),
      (5L, "two mails a@b.io c@d.io"))
    val got = graft.ops.TextOps.piiAudit(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, 0L, "mail <EMAIL> please")))
    // embedded digits without word boundaries must NOT redact
    assert(got(2L) == ((0L, 2L, "hosts <IP> and <IP>, embedded x1.2.3.4y stays")))
    assert(got(3L) == ((1L, 1L, "both <EMAIL> at <IP>")))
    assert(got(4L) == ((0L, 0L, "no pii here, just words and 1234 numbers")))
    assert(got(5L) == ((2L, 0L, "two mails <EMAIL> <EMAIL>")))
  }
}
