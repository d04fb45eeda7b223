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

  /** Salted equi-join for a skewed LEFT side: the hot key's rows land on
    * one reducer in a plain shuffle join, so the left side gets a
    * deterministic salt in [0, salts) and the (small-ish but
    * too-big-to-broadcast) right side is replicated `salts`× via a
    * sequence explode; joining on (key, salt) spreads the hot key over
    * `salts` reducers. Exactly equal to the plain join — each left row
    * meets each matching right row exactly once (at its own salt copy).
    * Right-side cost is |right|×salts rows shuffled: the knob trades
    * replication for tail latency, the same trade AQE skew-join makes
    * per-split at runtime.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      saltSource: Column,
      salts: Int
  ): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(keyCol, "__salt")).drop("__salt")
  }

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
