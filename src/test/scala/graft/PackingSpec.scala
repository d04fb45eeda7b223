package graft

import graft.ops.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-sum shard packing: must equal the naive global
  * running sum, independent of the coarse bucket count, without planning
  * the single-partition global window.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val weighted = graft.queries.Tables
    .t(spark, sf("sf0.001"), "documents")
    .select(
      col("doc_id"),
      size(graft.ops.TextOps.tokens(graft.ops.TextOps.normalize(col("text"))))
        .cast("long").as("n_tokens"))

  private def naive = {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weighted
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("shard_id", expr("(cum_tokens - n_tokens) div 500L"))
      .select("doc_id", "n_tokens", "cum_tokens", "shard_id")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("packShards equals the naive global running sum, any bucket count") {
    val expected = naive
    for (buckets <- Seq(1, 7, 64)) {
      val got = Packing.packShards(weighted, "doc_id", "n_tokens", budget = 500L, buckets = buckets)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("packShards plans per-bucket windows, not a single global sort-window") {
    val plan = Packing.packShards(weighted, "doc_id", "n_tokens", budget = 500L, buckets = 16)
      .queryExecution.executedPlan.toString
    // the window must be partitioned (by the coarse bucket): an unkeyed
    // Window would show an empty partition spec before the ORDER BY
    assert(plan.contains("windowspecdefinition(__bkt"), plan.linesIterator.take(40).mkString("\n"))
  }

  test("shard boundaries: a straddling row stays where its first token lands") {
    val df = Seq((1L, 400L), (2L, 300L), (3L, 300L)).toDF("id", "w")
    val out = Packing.packShards(df, "id", "w", budget = 500L, buckets = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(1L) == ((400L, 400L, 0L)))  // prefix 0   -> shard 0
    assert(out(2L) == ((300L, 700L, 0L)))  // prefix 400 -> shard 0 (straddles)
    assert(out(3L) == ((300L, 1000L, 1L))) // prefix 700 -> shard 1
  }
}
