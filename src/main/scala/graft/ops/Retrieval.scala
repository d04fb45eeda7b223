package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical rank list (inverted-index dot
  * product, [[TextOps.sparseTopK]]) with a dense rank list (exact cosine,
  * [[Similarity.cosineTopK]]) by reciprocal-rank fusion. The standard
  * two-tower + BM25-ish ensemble used for retrieval-augmented data
  * curation.
  */
object Retrieval {

  /** RRF top-k: score(d) = Σ_lists 1e6 ÷ (rrfK + rank_list(d)), summed as
    * exact integers (the 1e6 scaling replaces the usual 1/(k+r) floats so
    * the fusion is engine-portable with zero FP drift; the ordering it
    * induces is identical). Documents missing from one list contribute 0
    * from that list — the usual RRF convention.
    *
    * Scale shape: both rank lists are already top-`poolK` per query
    * (bounded), so the fusion join + window touch at most 2·poolK rows
    * per query — the heavy lifting stays in the two retrievers, each in
    * its own scale shape (df-capped inverted index / broadcast query
    * batch + bounded top-k agg).
    *
    * @param queryMax queries are ids < queryMax on BOTH sides (doc ids
    *                 and embedding ids are aligned in this corpus).
    */
  def hybridRrfTopK(
      docs: DataFrame,
      emb: DataFrame,
      docId: String,
      textCol: String,
      embId: String,
      vecCol: String,
      k: Int,
      poolK: Int,
      rrfK: Int,
      queryMax: Long,
      maxDf: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = TextOps
      .sparseTopK(docs, docId, textCol, k = poolK, maxDf = maxDf)
      .filter(col(docId) < queryMax)
      .select(col(docId).as("query_id"), col("neighbor_id"), col("rank").as("rs"))
    val dense = Similarity
      .cosineTopK(emb, embId, vecCol, poolK, col("cid") < queryMax)
      .select(col("query_id"), col("neighbor_id").as("neighbor_id"), col("rank").cast("long").as("rd"))
    val fused = sparse
      .join(dense, Seq("query_id", "neighbor_id"), "full_outer")
      .select(
        col("query_id"),
        col("neighbor_id"),
        (coalesce(floor(lit(1000000) / (lit(rrfK) + col("rs"))), lit(0L)) +
          coalesce(floor(lit(1000000) / (lit(rrfK) + col("rd"))), lit(0L))).cast("long").as("rrf_score"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_score").desc, col("neighbor_id").asc)
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), col("rrf_score"))
  }
}
