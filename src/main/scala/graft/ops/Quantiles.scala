package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order-statistic selection — the 100 TB shape for
  * exact (interpolated) percentiles of a HIGH-cardinality measure.
  *
  * The naive exact form sorts each group inside a window partitioned by
  * the group key: with a low-cardinality key (the common case — status,
  * priority, returnflag) the whole fact table funnels into |groups|
  * window partitions, so parallelism is capped at |groups| regardless of
  * cluster size (measured: `q_percentile_cont`'s 5-partition sort was a
  * 13.6× scale ratio at the 100× fixture). `q_quantile_disc`'s histogram
  * identity fixes this for LOW-cardinality values; this operator fixes
  * it for continuous values where the histogram would not compress.
  *
  * Two-phase selection (the classic distributed k-th-element recipe):
  *  1. one fully-parallel scan buckets values by `floor(v / width)` and
  *     counts per (group, bucket) — the counts frame is tiny (groups ×
  *     occupied buckets) regardless of fact-table size;
  *  2. a cumulative sum over that tiny frame locates, for each target
  *     rank, the single bucket containing it and the rank base (rows in
  *     earlier buckets);
  *  3. a second scan touches ONLY rows in located buckets (semi-join on
  *     the broadcast bucket list) and ranks them within their bucket —
  *     partitions of at most a bucket's occupancy, never a group's.
  *
  * Selection is exact because bucketing by `floor(v/width)` is monotone
  * in `v`, so the global (value, tie) order is bucket-major: the rank-r
  * element of a group is the `(r − base)`-th element of its bucket under
  * the same within-bucket order. No FP arithmetic touches the selected
  * values themselves.
  */
object Quantiles {

  /** Bracketing order statistics for interpolated percentiles: for each
    * group and each `p` in `ps`, the continuous rank `k = (n−1)·p` and
    * the order-statistic VALUES at ranks `⌊k⌋+1` (`lo`) and `⌈k⌉+1`
    * (`hi`) under the total order (`valueCol`, `tieCol`). Callers apply
    * the interpolation formula of their choice — the values returned are
    * exact, so any engine computing the same formula reproduces the
    * result bit-for-bit.
    *
    * Output columns: `g` (group), `p`, `k`, `lo`, `hi`.
    *
    * `bucketWidth` only affects performance: smaller buckets mean a
    * larger (still tiny) counts frame and a smaller phase-3 scan.
    */
  def bracketingStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      ps: Seq[Double],
      bucketWidth: Double
  ): DataFrame = {
    require(ps.nonEmpty && bucketWidth > 0)
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile fractions must be in [0, 1]: ${ps.filterNot(p => p >= 0.0 && p <= 1.0).mkString(", ")}")
    val base = df.select(
      col(groupCol).as("g"), col(valueCol).as("v"), col(tieCol).as("tb"))
      .withColumn("b", floor(col("v") / lit(bucketWidth)).cast("long"))

    // phase 1: per-(group, bucket) counts — map-side combined, the only
    // corpus-wide shuffle, and it carries |groups × buckets| rows.
    // Eagerly checkpointed: `cum` feeds targets, ranks, AND the located
    // join — left lazy, every downstream reference re-runs the phase-1
    // fact scan (measured: 15 scans of the fact table in the registry
    // query's plan); checkpointing the tiny counts frame pins the scan
    // count at two (phase 1 here, phase 3 below).
    val counts = base.groupBy("g", "b").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("g").orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("g")))
      .localCheckpoint(true)

    // phase 2: target ranks per (group, p), then the bucket whose
    // cumulative count first reaches each rank
    val pStructs = ps.map(p => struct(lit(p).as("p")))
    val targets = cum.select("g", "n").distinct()
      .select(col("g"), col("n"), explode(array(pStructs: _*)).as("t"))
      .select(col("g"), col("t.p").as("p"), ((col("n") - 1) * col("t.p")).as("k"))
      .withColumn("r_lo", floor(col("k")).cast("long") + 1)
      .withColumn("r_hi", ceil(col("k")).cast("long") + 1)
    val ranks = targets.select(col("g"), col("r_lo").as("r"))
      .union(targets.select(col("g"), col("r_hi").as("r")))
      .distinct()
    val located = ranks.join(cum, Seq("g"))
      .filter(col("cum") >= col("r") && col("cum") - col("c") < col("r"))
      .select(col("g"), col("r"), col("b"), (col("cum") - col("c")).as("base"))

    // phase 3: rank rows inside located buckets only. The bucket list is
    // |ranks| rows at most — always broadcastable.
    val selBuckets = located.select("g", "b").distinct()
    val inBucket = base
      .join(broadcast(selBuckets), Seq("g", "b"), "leftsemi")
      .withColumn("rn", row_number().over(
        Window.partitionBy("g", "b").orderBy(col("v").asc, col("tb").asc)))
      .select(col("g").as("ig"), col("b").as("ib"), col("rn"), col("v"))
    // checkpointed for the same reason as `cum`: rankValue is joined
    // once per target rank column below — lazy, each join re-ranks the
    // phase-3 scan; eager, the fact table is read exactly twice total
    val rankValue = located
      .join(inBucket,
        located("g") === col("ig") && located("b") === col("ib") &&
          col("rn") === located("r") - located("base"))
      .select(located("g").as("g"), col("r"), col("v"))
      .localCheckpoint(true)

    targets
      .join(rankValue.select(col("g"), col("r").as("r_lo"), col("v").as("lo")), Seq("g", "r_lo"))
      .join(rankValue.select(col("g"), col("r").as("r_hi"), col("v").as("hi")), Seq("g", "r_hi"))
      .select("g", "p", "k", "lo", "hi")
  }
}
