package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking. A bare `row_number() OVER (ORDER BY …)` has an
  * empty PARTITION BY, so Spark plans a SINGLE-partition window — the whole
  * table through one task, the canonical 100 TB anti-pattern (Spark even
  * warns `WindowExec: No Partition Defined`).
  *
  * This is the two-pass form every distributed engine uses instead:
  * range-repartition on the sort key (non-overlapping value ranges, any
  * per-partition parallelism), rank locally within each range, then add
  * per-partition row-count offsets (a |partitions|-row side computed with
  * one tiny window and broadcast back). Output ranks are EXACTLY the
  * global ones — range disjointness makes local rank + preceding-partition
  * counts the global position — and deterministic as long as `orderCols`
  * is a total order (tie-break on a unique key), independent of the
  * sampling RangePartitioner used for bounds.
  */
object GlobalRank {

  /** Append `rankCol` = 1-based global rank under `orderCols`.
    *
    * The pid-stamped range layout feeds TWO consumers (local ranks and
    * the offset counts). They must see the SAME partition bounds — but a
    * re-executed range exchange re-samples its child, and at cluster
    * scale a nondeterministic upstream row order could then shift a
    * boundary between the two subtrees, corrupting the offsets. So the
    * layout is pinned with one eager localCheckpoint (both consumers
    * read the same computed blocks), the result is materialized, and the
    * layout's blocks are released — the same bounded-footprint
    * discipline as the dedup operators.
    */
  def globalRank(df: DataFrame, orderCols: Seq[Column], rankCol: String, parts: Int): DataFrame = {
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val mat = Caching.materializeAndRelease(rankOver(ranged, orderCols, rankCol))
    Caching.release(ranged)
    mat
  }

  /** The rank plan over an already-laid-out pid-stamped frame. Exposed
    * lazily (no checkpoint pinning) for plan inspection in specs; callers
    * other than tests go through [[globalRank]], which guarantees both
    * consumers of the layout see the same bounds.
    */
  private[graft] def globalRankLazy(
      df: DataFrame,
      orderCols: Seq[Column],
      rankCol: String,
      parts: Int
  ): DataFrame =
    rankOver(
      df.repartitionByRange(parts, orderCols: _*).withColumn("__pid", spark_partition_id()),
      orderCols,
      rankCol)

  /** Append `outCol` = inclusive global running sum of `valueCol` under
    * `orderCols` — the cumulative-sum twin of [[globalRank]], same
    * two-level prefix-sum decomposition: range-repartition on the order
    * key, per-partition local running sums, plus an exclusive prefix of
    * per-partition TOTALS (a |partitions|-row side — the only
    * single-partition window, bounded by the partition count, never the
    * data). Replaces the bare `sum(...) OVER (ORDER BY …)` single-task
    * plan wherever a running total is needed over a frame that grows
    * with the corpus. Exact for integer `valueCol` (long sums, order
    * free); same pinned-layout discipline as [[globalRank]] — both
    * consumers of the range layout must see identical bounds.
    *
    * `orderCols` MUST be a total order (tie-break on a unique key, the
    * [[globalRank]] contract): tied rows' relative order inside the
    * per-partition running-sum window is unpinned, so their individual
    * cumulative values are tie-ambiguous even though the sum across the
    * tie group is not — a deterministic oracle comparison needs the
    * unique key.
    */
  def globalCumSum(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: Column,
      outCol: String,
      parts: Int): DataFrame = {
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val mat = Caching.materializeAndRelease(cumSumOver(ranged, orderCols, outCol))
    Caching.release(ranged)
    mat
  }

  /** Lazy twin of [[globalCumSum]] for plan inspection in specs (no
    * checkpoint pinning) — the [[globalRankLazy]] convention.
    */
  private[graft] def globalCumSumLazy(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: Column,
      outCol: String,
      parts: Int
  ): DataFrame =
    cumSumOver(
      df.repartitionByRange(parts, orderCols: _*)
        .withColumn("__v", valueCol.cast("long"))
        .withColumn("__pid", spark_partition_id()),
      orderCols,
      outCol)

  private def cumSumOver(ranged: DataFrame, orderCols: Seq[Column], outCol: String): DataFrame = {
    // |parts| rows: exclusive prefix sum of per-partition value totals
    val offsets = ranged
      .groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__ptot"))
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__ptot")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__ptot")
    val local = Window
      .partitionBy(col("__pid"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__local", sum(col("__v")).over(local))
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol, (col("__offset") + col("__local")).cast("long"))
      .drop("__pid", "__local", "__offset", "__v")
  }

  private def rankOver(ranged: DataFrame, orderCols: Seq[Column], rankCol: String): DataFrame = {
    // |parts| rows: exclusive prefix sum of partition sizes
    val offsets = ranged
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__cnt")
    val local = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    ranged
      .withColumn("__local", row_number().over(local))
      .join(broadcast(offsets), "__pid")
      .withColumn(rankCol, (col("__offset") + col("__local")).cast("long"))
      .drop("__pid", "__local", "__offset")
  }
}
