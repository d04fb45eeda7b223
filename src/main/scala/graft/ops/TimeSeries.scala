package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification (calendar gap fill + carry-forward) — the
  * missing-days treatment every daily-grained analytics sink needs before
  * rates/rolling windows make sense (the reference's fact tables are
  * daily-grained, `lfm.fact.date_str`).
  *
  * Scale shape: the spine is generated per key from its own [min, max]
  * date bounds (one aggregate + one explode — no global calendar cross
  * join), and the fill is a single partition-ordered window per key. One
  * shuffle on the key for the bounds, one for the window — both on the
  * same key, so Catalyst reuses the exchange.
  */
object TimeSeries {

  /** Per-key daily spine: one row for every calendar day in the key's own
    * observed [min(date), max(date)] range.
    */
  def dateSpine(df: DataFrame, keyCol: String, dateCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__mn"), max(col(dateCol)).as("__mx"))
      .select(
        col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), expr("interval 1 day"))).as(dateCol))

  /** Densify to the daily spine and carry the last non-null observation
    * forward per key in date order. Days before a key's first observation
    * never occur (the spine starts at the key's own min), so no value is
    * ever invented — only carried.
    */
  def fillForward(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val joined = dateSpine(df, keyCol, dateCol).join(df, Seq(keyCol, dateCol), "left")
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Time-proximity join: for each left row, the number of right rows
    * whose timestamp lies within ±`windowUs` microseconds (inclusive).
    *
    * The naive formulation is an inequality join — Spark plans that as a
    * broadcast-nested-loop, |left|×|right| comparisons, which is exactly
    * the plan that dies at 100 TB. And the bucketed equi-join (explode
    * left to 3 window-width buckets, hash-join on the bucket) that
    * replaced it still pairs every probe with every right row in a ±1.5-
    * window span, so its join output grows with probes × TIME DENSITY —
    * at the 100× fixture (same time span, 100× the events) that was a
    * 22.9× wall ratio on a 126 MB shuffle.
    *
    * This implementation is a RANK DIFFERENCE, not a pair expansion:
    *
    *   n_nearby(t) = F(t + w) − F(t − w − 1),  F(x) = #right rows ≤ x
    *
    * (timestamps are integral µs, so the −1 makes the lower bound
    * inclusive). F is evaluated at the 2 probe bounds via fine time
    * buckets (windowUs/16): per-bucket right-row counts prefix-summed
    * TWO-LEVEL (within 4096-bucket segments, then across segment totals
    * — no global single-partition window), plus an equi-join of each
    * bound to its OWN bucket's right rows for the intra-bucket partial
    * count. The bucket inventory is built from right rows AND probe
    * bounds, so every bound finds its bucket by equi-join even when no
    * right row shares it. Join output is probes × (right rows per FINE
    * bucket) — 24× fewer pairs than the bucketed join at any density,
    * and the ratio improves as the window widens. All arithmetic is
    * integral; results are exact.
    *
    * Duplicate left (id, ts) rows are pre-aggregated to a multiplicity
    * weight so every bound row is unique before the rank arithmetic —
    * each occurrence contributes its full count (the pair-join
    * semantics). Left rows with a null timestamp have no defined window;
    * they are kept with n_nearby = 0.
    */
  def proximityCount(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      tsCol: String,
      windowUs: Long
  ): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    val bucketUs = math.max(windowUs / 16, 1L)
    // exact floor-div for any sign: x − pmod(x, B) is an exact multiple
    // of B and both operands stay < 2^53, so the double division below
    // is exact before the cast
    def fdiv(x: Column, b: Long): Column =
      ((x - pmod(x, lit(b))) / lit(b)).cast("long")

    // duplicate (id, ts) left rows collapse to one bound pair with a
    // multiplicity weight — (lid, sign, x) is then a unique bound key,
    // so the partial/cum_before terms below count once per DISTINCT
    // bound and the weight restores per-occurrence semantics
    // checkpoint the two NARROW projections (3-4 longs per row): each
    // feeds two consumers (bucket inventory + the partial term), and the
    // lazy form re-ran both source scans per consumer (r21 scan audit: 5
    // executed scans of the events fixture for one query — at 100 TB, 5
    // corpus passes). The materialized bytes are of the order the
    // downstream exchanges already move; scans drop to one per side.
    val bounds = left
      .select(col(idCol).as("__lid"), unix_micros(col(tsCol)).as("__lus"))
      .groupBy("__lid", "__lus").agg(count(lit(1)).as("__mult"))
      .select(col("__lid"), col("__mult"), explode(array(
        struct((col("__lus") + windowUs).as("x"), lit(1L).as("sign")),
        struct((col("__lus") - windowUs - 1).as("x"), lit(-1L).as("sign"))
      )).as("bd"))
      .select(col("__lid"), col("__mult"), col("bd.x").as("x"), col("bd.sign").as("sign"))
      .withColumn("__b", fdiv(col("x"), bucketUs))
      // durability: local by default, reliable under
      // spark.graft.checkpoint.dir (the r22 checkpoint rule in Caching)
      .transform(Caching.eagerCheckpoint)
    val r = right
      .select(unix_micros(col(tsCol)).as("__rus"))
      .withColumn("__b", fdiv(col("__rus"), bucketUs))
      .transform(Caching.eagerCheckpoint)

    // bucket inventory (right counts per bucket, probe-bound buckets
    // included at weight 0) + two-level prefix sum
    val seg = 4096L
    val inv = r.select(col("__b"), lit(1L).as("wt"))
      .union(bounds.select(col("__b"), lit(0L).as("wt")))
      .groupBy("__b").agg(sum("wt").as("c"))
      .withColumn("__seg", fdiv(col("__b"), seg))
    val wIn = Window.partitionBy("__seg").orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = inv.withColumn("cum_in", sum(col("c")).over(wIn))
    val segBefore = inv.groupBy("__seg").agg(sum(col("c")).as("st"))
      .withColumn("seg_before", coalesce(
        sum(col("st")).over(Window.orderBy(col("__seg").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__seg", "seg_before")
    // right rows in buckets strictly before b
    val cumBefore = withIn.join(segBefore, "__seg")
      .select(col("__b"), (col("seg_before") + col("cum_in") - col("c")).as("cum_before"))

    // partial term: right rows in the bound's own fine bucket with ts ≤ x.
    // Group key includes x (each distinct bound counted once); null-ts
    // bounds have a null bucket, match nothing, and keep part = 0.
    val partial = bounds.join(r, Seq("__b"), "left")
      .groupBy("__lid", "sign", "x", "__b", "__mult")
      .agg(sum(when(col("__rus") <= col("x"), 1L).otherwise(0L)).as("part"))

    // left join: null-bucket bounds (null left ts) have no inventory row
    // — keep them with cum_before = 0 so their id surfaces with 0
    partial.join(cumBefore, Seq("__b"), "left")
      .withColumn("cum_before", coalesce(col("cum_before"), lit(0L)))
      .groupBy(col("__lid").as(idCol))
      .agg(sum(col("sign") * col("__mult") * (col("cum_before") + col("part"))).as("n_nearby"))
  }
}
