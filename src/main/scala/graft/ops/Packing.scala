package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard assignment by cumulative token budget: walk the corpus
  * in id order, keep a running token total, and start a new shard every
  * `budget` tokens — the packing step that turns a scored/filtered corpus
  * into bounded training files.
  *
  * The naive formulation is a global running sum — `Window.orderBy(id)`
  * with no partition key — which Spark executes in ONE task (a single
  * post-sort partition); at 100 TB that is the whole corpus through one
  * core. This implementation is the textbook distributed prefix sum
  * instead:
  *
  *  1. coarse-bucket each row by id range (monotone in id, so bucket
  *     order == scan order);
  *  2. one small aggregate computes per-bucket totals; the ≤`buckets`-row
  *     result is folded into exclusive running offsets on the driver (a
  *     sanctioned driver materialization, same class as the IVF codebook)
  *     and broadcast-joined back;
  *  3. the running sum inside each bucket is a per-bucket window — every
  *     bucket sums independently in parallel — and the global cumulative
  *     is `bucket offset + within-bucket running sum`.
  *
  * All arithmetic is integer (token counts), so the result is
  * bitwise-portable and the oracle can replay it as a plain SQL window.
  */
object Packing {

  /** @param weightCol integer weight per row (e.g. token count)
    * @param budget    tokens per shard; a row straddling a boundary stays
    *                  in the shard where its first token lands
    *                  (shard = exclusive-prefix div budget)
    * @param buckets   coarse parallelism of the prefix sum; result is
    *                  bucket-count independent
    */
  def packShards(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      buckets: Int = 256
  ): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(buckets > 0, s"buckets must be positive: $buckets")
    // totalize over any integral input type: the getLong reads below and
    // the 0L empty-schema branch assume BIGINT
    val df0 = df.select(col(idCol).cast("long").as(idCol), col(weightCol).cast("long").as(weightCol))
    val bounds = df0.agg(min(col(idCol)).as("mn"), max(col(idCol)).as("mx")).head()
    if (bounds.isNullAt(0)) return df.sparkSession.emptyDataFrame
      .select(lit(0L).as(idCol), lit(0L).as(weightCol), lit(0L).as("cum_tokens"), lit(0L).as("shard_id"))
      .limit(0)
    val mn = bounds.getLong(0)
    val span = (bounds.getLong(1) - mn) / buckets + 1
    val bucketed = df0
      .withColumn("__bkt", expr(s"(`$idCol` - ${mn}L) div ${span}L"))
    // per-bucket totals -> exclusive running offsets (<= `buckets` rows on
    // the driver), broadcast back
    val totals = bucketed.groupBy("__bkt").agg(sum(col(weightCol)).as("__tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((-1L, 0L)) { case ((_, acc), (b, tot)) => (b, acc + tot) }
      .sliding(2).map { case Array((_, prev), (b, _)) => (b, prev) }.toSeq
    import df.sparkSession.implicits._
    val offDf = offsets.toDF("__bkt", "__off")
    val w = Window.partitionBy("__bkt").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offDf), Seq("__bkt"))
      .withColumn("cum_tokens", col("__off") + sum(col(weightCol)).over(w))
      .withColumn("shard_id", expr(s"(cum_tokens - `$weightCol`) div ${budget}L"))
      .select(col(idCol), col(weightCol), col("cum_tokens"), col("shard_id"))
  }
}
