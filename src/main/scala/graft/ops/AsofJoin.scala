package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the single most
  * recent right row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no native ASOF JOIN (DuckDB/Pandas do). The scalable
  * composition (brief's preference (a): compose existing ops) is the
  * union-and-carry trick:
  *
  *   1. tag both sides and UNION them on (key, time);
  *   2. one window per key ordered by (time, side-tag) carries the last
  *      non-null right-side payload forward (`last(..., ignoreNulls)`);
  *   3. keep only left rows.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the key (same as a sort-merge
  * join) and no point-in-time self-join explosion — at 100 TB this beats
  * the naive "join all earlier rows then pick max-time" plan, whose
  * intermediate is O(|L|·matches). Ties (rightTime == leftTime) take the
  * right row, matching ASOF `>=` semantics; the side tag orders right
  * rows before left at equal timestamps.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]
  ): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // right side: only key, time, payload; left-only columns null
    val rBase = right.select((rightKey +: rightTime +: payload).distinct.map(col): _*)
    val r = lCols.foldLeft(
      rBase
        .withColumn("__k", col(rightKey))
        .withColumn("__t", col(rightTime))
        .withColumn("__side", lit(0))
    )((df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val lAll = payload.foldLeft(l)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))

    val unioned = lAll
      .select(("__k" +: "__t" +: "__side" +: (lCols.filterNot(Set("__k", "__t", "__side")) ++ payload).distinct.toSeq).map(col): _*)
      .unionByName(
        r.select(("__k" +: "__t" +: "__side" +: (lCols.filterNot(Set("__k", "__t", "__side")) ++ payload).distinct.toSeq).map(col): _*)
      )

    val w = Window
      .partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    carried
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__side")
  }
}
