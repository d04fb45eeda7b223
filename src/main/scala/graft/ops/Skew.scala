package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter group keys (the classic 100 TB
  * failure mode: one key owns 30% of the fact table and one reducer
  * owns the job's tail latency).
  *
  * `saltedSum` demonstrates the two-phase pattern for ALGEBRAIC
  * aggregates: add a random-ish salt to the key, partially aggregate on
  * (key, salt) — spreading a hot key over `salts` reducers — then
  * aggregate the partials on the key alone. The salt must be
  * deterministic for reproducibility here, so it is derived from a
  * uniformly-distributed row attribute rather than rand().
  *
  * Note Spark's own two lines of defense, which this composes with:
  * map-side partial aggregation (always on for sum/count) and AQE skew
  *-join splitting (`spark.sql.adaptive.skewJoin.enabled`). Salting is
  * the remaining tool when a *grouping* key itself is degenerate.
  */
object Skew {

  /** Exact grouped sums with the hot-key spread over `salts` partial
    * groups. `saltSource` must be a column whose value varies within the
    * hot key (a row id, a hash of remaining columns).
    */
  def saltedSum(
      df: DataFrame,
      keyCol: String,
      valueCols: Seq[String],
      saltSource: Column,
      salts: Int
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val partials = salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        valueCols.map(c => sum(col(c).cast("decimal(28,4)")).as(s"__p_$c")).head,
        valueCols.map(c => sum(col(c).cast("decimal(28,4)")).as(s"__p_$c")).tail: _*
      )
    partials
      .groupBy(col(keyCol))
      .agg(
        valueCols.map(c => sum(col(s"__p_$c")).cast("double").as(s"sum_$c")).head,
        valueCols.map(c => sum(col(s"__p_$c")).cast("double").as(s"sum_$c")).tail: _*
      )
  }
}
