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
}
