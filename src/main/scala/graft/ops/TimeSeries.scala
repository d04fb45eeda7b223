package graft.ops

import org.apache.spark.sql.DataFrame
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
    * the plan that dies at 100 TB. The scale-safe shape used here is
    * BUCKETED: with bucket = µs div windowUs, a right row in bucket b can
    * only be within ±window of left rows whose bucket is in {b-1, b, b+1},
    * so exploding the LEFT side to its 3 candidate buckets and
    * EQUI-joining on the bucket key (hash join, shuffle on a bounded key)
    * finds every qualifying pair exactly once — the right row has ONE
    * bucket, so no pair can match through two exploded copies and no
    * dedup pass is needed. Join input is O(3|left| + |right|) rows instead
    * of the |left|×|right| comparison space. A pathologically hot time
    * bucket is AQE-skew-split or salted like any other hot join key.
    *
    * Left rows with no neighbor keep a 0 count (left join over the
    * exploded copies, counting matched right timestamps only).
    */
  def proximityCount(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      tsCol: String,
      windowUs: Long
  ): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    // exact integral bucket (SQL `div`) — no double rounding in the key
    val l = left
      .select(col(idCol).as("__lid"), unix_micros(col(tsCol)).as("__lus"))
      .select(
        col("__lid"),
        col("__lus"),
        explode(array((-1 to 1).map(k => expr(s"__lus div ${windowUs}L") + k): _*)).as("__b"))
    val r = right
      .select(unix_micros(col(tsCol)).as("__rus"))
      .select(col("__rus"), expr(s"__rus div ${windowUs}L").as("__b"))
    l.join(r, l("__b") === r("__b") && abs(col("__lus") - col("__rus")) <= windowUs, "left")
      .groupBy(col("__lid").as(idCol))
      .agg(count(col("__rus")).as("n_nearby"))
  }
}
