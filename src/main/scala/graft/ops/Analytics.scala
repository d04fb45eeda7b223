package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators a user of the reference's domain (social
  * analytics ETL, `/root/reference/data_extract.py:44-92`'s metric queries)
  * would run downstream of the extracted fact table: cohort retention,
  * ordered funnels, Markov transitions, and table profiling.
  *
  * Scale posture: every operator is a fixed, small number of hash
  * aggregates/joins keyed on the user id — the natural partitioning key of
  * an event table — so consecutive stages reuse one exchange instead of
  * re-shuffling, and nothing here is driver-side or O(n²).
  */
object Analytics {

  /** Cohort retention: group users by the day of their first event, then
    * count distinct active users per (cohort day, day offset). Two hash
    * aggregates plus one join, all keyed on `userCol` — the firsts frame is
    * |users| rows (≪ events), so Spark broadcasts it when small and
    * co-shuffles on the shared key when not.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firsts = events
      .groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("__cohort_date"))
    events
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .join(firsts, userCol)
      .groupBy(
        date_format(col("__cohort_date"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("__day"), col("__cohort_date")).cast("long").as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Strictly-ordered funnel: how many users reached stage i, where a user
    * advances to stage i only via an event of type `stages(i)` STRICTLY
    * after the time they reached stage i-1 (equivalently: t1 = min time of
    * stage-1 events, t2 = min time of stage-2 events after t1, … — the
    * greedy earliest-advance fold over the time-ordered stream, which is
    * what the nested-min SQL formulation computes).
    *
    * ONE shuffle, O(1) state: only stage-typed events shuffle to their
    * user (the IN filter prunes the rest at the scan), the partition is
    * secondary-sorted on (user, ts, id), and a linear scan folds each
    * user's stream to the deepest stage reached — the same bounded-memory
    * shape as the batch sessionizer, so a hot user with millions of
    * events streams through instead of materializing a per-user list.
    * Simultaneous-timestamp events cannot leapfrog (advance needs
    * ts strictly greater than the current stage time). The per-exact-stage
    * counts (k+1 rows) then turn into cumulative reached-counts with a
    * tiny non-equi join — no second pass over the data.
    */
  def funnelStages(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val k = stages.size
    val stageArr = stages.toArray
    val spark0 = events.sparkSession
    import spark0.implicits._
    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .select(
        col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).cast("long").as("id"),
        col(typeCol).as("et"))
      .repartition(col("u"))
      .sortWithinPartitions("u", "ts_us", "id")
      .as[(Long, Long, Long, String)]
      .mapPartitions { it =>
        var cur = 0L
        var has = false
        var stage = 0
        var stageTs = Long.MinValue
        val main = it.flatMap { case (u, ts, _, et) =>
          var out: Option[(Long, Int)] = None
          if (!has) { has = true; cur = u }
          else if (u != cur) {
            out = Some((cur, stage)); cur = u; stage = 0; stageTs = Long.MinValue
          }
          if (stage < k && et == stageArr(stage) && ts > stageTs) {
            stage += 1; stageTs = ts
          }
          out
        }
        // ++ is lazy: the trailing emitter reads the fold state only after
        // the partition scan is exhausted
        main ++ new Iterator[(Long, Int)] {
          private var done = false
          def hasNext: Boolean = has && !done
          def next(): (Long, Int) = { done = true; (cur, stage) }
        }
      }
      .toDF("user", "reached")
    val exact = perUser.groupBy("reached").agg(count(lit(1)).as("cnt"))
    val stageDf = stages.zipWithIndex
      .map { case (name, i) => (i + 1L, name) }
      .toDF("stage", "stage_name")
    // k rows × (k+1) rows — negligible at any scale; left join so stages
    // nobody reached still report n_users = 0 (matching COUNT(*) = 0 on
    // an empty per-stage set in the SQL formulation)
    stageDf
      .join(exact, col("reached") >= col("stage"), "left")
      .groupBy("stage", "stage_name")
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_users"))
  }

  /** Event-type transition counts (the first-order Markov matrix of the
    * event stream): per user, order events by (time, id) and pair each
    * event with its successor. One window over the user partition — the
    * same sort order a sessionizer needs, so at scale the two share a
    * shuffle — then a hash aggregate on the (from, to) pair space, which is
    * |types|² regardless of corpus size.
    */
  def transitionCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(typeCol).as("from_type"), lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Data-quality profile: per column, null count and distinct count, in
    * long format. ONE scan: all per-column aggregates run in a single
    * hash-aggregate (count-distinct over k columns costs one k-way expand —
    * rows × k, the standard profiling trade — not k scans), then the single
    * result row is unpivoted driver-free via `stack`.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__nn_$c`, `__nd_$c`")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (column_name, n_nulls, n_distinct)")
  }
}
