package graft

import graft.ops.Retrieval

/** RRF fusion semantics on a hand-built corpus where the lexical and
  * dense retrievers deliberately disagree.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("hybridRrfTopK: integer RRF fuses disagreeing rank lists; both-list hits win") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta delta"), // lexical rank 1 for query 0 (dot 2)
      (2L, "zzz yyy xxx"),      // lexically unrelated
      (3L, "alpha qqq rrr")     // lexical rank 2 (dot 1)
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),   // dense rank 3 (orthogonal)
      (2L, Seq(0.9f, 0.1f)),   // dense rank 1
      (3L, Seq(0.5f, 0.5f))    // dense rank 2
    ).toDF("vec_id", "embedding")
    val out = Retrieval.hybridRrfTopK(docs, emb, "doc_id", "text",
      "vec_id", "embedding", k = 3, poolK = 3, rrfK = 60, queryMax = 1L, maxDf = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap // rank -> (neighbor, score)
    // doc 1: sparse rs=1, dense rd=3 -> 1e6/61 + 1e6/63 = 16393 + 15873
    // doc 3: sparse rs=2, dense rd=2 -> 1e6/62 × 2      = 16129 + 16129
    // doc 2: dense rd=1 only         -> 1e6/61          = 16393
    assert(out(1L) == ((1L, 16393L + 15873L)))
    assert(out(2L) == ((3L, 2 * 16129L)))
    assert(out(3L) == ((2L, 16393L)))
  }
}
