package graft

import graft.ops.SpanDedup
import org.apache.spark.sql.Row

/** Pins the exact semantics of the duplicated-span operator on
  * constructed documents where every maximal span is known by hand:
  * boundaries, alignment offsets, multiple disjoint spans per pair,
  * sub-threshold runs, and the per-doc interval-union mass.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Range, prefix: String): String =
    n.map(i => s"$prefix$i").mkString(" ")

  test("single shared run becomes one maximal span with exact boundaries") {
    // doc 1: t1..t20; doc 2: x1 x2 x3 then t5..t16 then y1 y2 y3
    // shared run: t5..t16 = 12 tokens, at a=5..16, b=4..15
    val docs = Seq(
      (1L, toks(1 to 20, "t")),
      (2L, toks(1 to 3, "x") + " " + toks(5 to 16, "t") + " " + toks(1 to 3, "y"))
    ).toDF("doc_id", "text")
    val spans =
      SpanDedup.duplicatedSpans(docs, "doc_id", "text", l = 4, minLen = 8, maxGramFreq = 50)
        .collect()
    assert(spans.toSeq == Seq(Row(1L, 2L, 5L, 4L, 12L)))
  }

  test("two disjoint shared runs emit two spans; short runs are dropped") {
    // shared: t1..t10 (10 tokens) and later u1..u9 (9 tokens), plus a
    // 5-token run v1..v5 that is under minLen=8 and must NOT appear
    val docs = Seq(
      (1L,
        toks(1 to 10, "t") + " a1 a2 a3 a4 " + toks(1 to 9, "u") + " a5 a6 a7 a8 " +
          toks(1 to 5, "v")),
      (2L,
        "b1 b2 " + toks(1 to 10, "t") + " c1 c2 c3 c4 " + toks(1 to 5, "v") + " d1 d2 " +
          toks(1 to 9, "u"))
    ).toDF("doc_id", "text")
    val spans =
      SpanDedup.duplicatedSpans(docs, "doc_id", "text", l = 4, minLen = 8, maxGramFreq = 50)
        .collect().toSeq.sortBy(r => r.getLong(2))
    // doc1: t at 1..10, u at 15..23, v at 28..32
    // doc2: t at 3..12, v at 17..21, u at 24..32
    assert(spans == Seq(
      Row(1L, 2L, 1L, 3L, 10L),
      Row(1L, 2L, 15L, 24L, 9L)))
  }

  test("differently-aligned repeats of the same content emit one span per alignment") {
    // doc 2 contains doc 1's 8-token run twice at different offsets: the
    // run aligns at two deltas, one maximal span each
    val docs = Seq(
      (1L, toks(1 to 8, "t")),
      (2L, toks(1 to 8, "t") + " z1 z2 " + toks(1 to 8, "t"))
    ).toDF("doc_id", "text")
    val spans =
      SpanDedup.duplicatedSpans(docs, "doc_id", "text", l = 4, minLen = 8, maxGramFreq = 50)
        .collect().toSeq.sortBy(r => r.getLong(3))
    assert(spans == Seq(
      Row(1L, 2L, 1L, 1L, 8L),
      Row(1L, 2L, 1L, 11L, 8L)))
  }

  test("span mass unions overlapping intervals per doc") {
    // doc 3 shares t1..t12 with doc 1 and t5..t16 with doc 2: doc 3's
    // covered intervals [1,13) ∪ [5,17) union to [1,17) = 16 tokens of 20
    val docs = Seq(
      (1L, toks(1 to 12, "t") + " " + toks(1 to 8, "q")),
      (2L, toks(1 to 8, "r") + " " + toks(5 to 16, "t")),
      (3L, toks(1 to 20, "t"))
    ).toDF("doc_id", "text")
    val mass =
      SpanDedup.spanMass(docs, "doc_id", "text", l = 4, minLen = 8, maxGramFreq = 50)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mass(3L) == (20L, 16L))
    assert(mass(1L) == (20L, 12L)) // t1..t12 shared with doc 3
    assert(mass(2L) == (20L, 12L)) // t5..t16 shared with doc 3
  }

  test("excision cuts spans from the higher-id doc and rebuilds clean text") {
    val docs = Seq(
      (1L, toks(1 to 12, "t") + " " + toks(1 to 8, "q")),
      (2L, toks(1 to 12, "t") + " " + toks(1 to 8, "r"))
    ).toDF("doc_id", "text")
    val out = SpanDedup.spanExcise(docs, "doc_id", "text", l = 4, minLen = 8, maxGramFreq = 50)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 is the canonical owner: untouched
    assert(out(1L) == ((20L, 20L, toks(1 to 12, "t") + " " + toks(1 to 8, "q"))))
    // doc 2 loses t1..t12, keeps r1..r8 in order
    assert(out(2L) == ((20L, 8L, toks(1 to 8, "r"))))
  }

  test("a fully-duplicated doc excises to the empty string") {
    val docs = Seq(
      (1L, toks(1 to 10, "t")),
      (2L, toks(1 to 10, "t"))
    ).toDF("doc_id", "text")
    val out = SpanDedup.spanExcise(docs, "doc_id", "text", l = 4, minLen = 8, maxGramFreq = 50)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((10L, 10L, toks(1 to 10, "t"))))
    assert(out(2L) == ((10L, 0L, "")))
  }

  test("span keep-list drops only docs at least half-covered, transitively clustered") {
    val docs = Seq(
      (1L, toks(1 to 20, "t")),                               // canonical
      (2L, toks(1 to 12, "t") + " " + toks(1 to 8, "z")),     // 12/20 covered -> dropped
      (3L, toks(1 to 8, "t") + " " + toks(1 to 12, "w"))      // 8/20 covered -> kept
    ).toDF("doc_id", "text")
    val out = SpanDedup.spanKeepList(
        docs, "doc_id", "text", l = 4, minLen = 8, maxGramFreq = 50,
        thresholdNum = 1, thresholdDen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)))
    assert(out(3L) == ((3L, true)))
  }

  test("occurrence cap drops boilerplate grams from anchoring spans") {
    // the same 8-token run in 60 docs: every gram in it has 60 ≥ cap=50
    // occurrences → no candidate pairs at all from that run
    val many = (1L to 60L).map(i => (i, toks(1 to 8, "t"))).toDF("doc_id", "text")
    val spans =
      SpanDedup.duplicatedSpans(many, "doc_id", "text", l = 4, minLen = 8, maxGramFreq = 50)
    assert(spans.count() == 0L)
  }
}
