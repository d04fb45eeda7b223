package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.8).
  *
  * The reference is batch-only — its incremental pattern is re-invocation
  * with WRITE_APPEND over successive date windows
  * (`/root/reference/main.py:31-33`, `data_load.py:44-50`). This module is
  * the engine's native streaming generalization of that pattern: a file
  * (or any) source → event-time tumbling window + watermark → append sink.
  *
  * Scale notes: watermarking bounds state (late events beyond the
  * watermark are dropped, so state size is O(active windows × keys), not
  * O(history)); the aggregation shuffles once on (window, key) exactly
  * like its batch shape, and checkpointing makes re-invocation exactly-once
  * — the property the reference approximates with append dispositions.
  */
/** A closed user session: the custom-state shape the reference has no
  * analogue for (SURVEY.md §2.8) but a streaming engine must offer.
  * Top-level (not nested in the object): Spark's state-encoder codegen
  * cannot instantiate inner case classes (janino fails resolving the
  * synthetic outer reference).
  */
final case class UserSession(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long,
    sum_value: Double
)

/** Per-key session accumulator (top-level for the same codegen reason). */
final case class SessionState(
    startUs: Long,
    lastUs: Long,
    nEvents: Long,
    total: Double
)

object EventStream {

  /** Event-time windowed counts over a streaming source. */
  def windowedCounts(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      watermark: String,
      windowLen: String
  ): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col(keyCol), col("n"))

  /** Event-time sessionization with custom state:
    * `flatMapGroupsWithState` keyed by user, closing a session after
    * `gapMs` of event-time silence or on state timeout. State per key is
    * O(1) (four numbers), so the state store stays bounded by active
    * users regardless of history length — the 100 TB streaming posture.
    */
  def sessionize(
      events: org.apache.spark.sql.Dataset[(Long, Long, Double)],
      gapMs: Long
  ): org.apache.spark.sql.Dataset[UserSession] = {
    // event times are unix MICROseconds; the gap parameter is milliseconds
    val gapUs = gapMs * 1000L
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, it: Iterator[(Long, Long, Double)], state: GroupState[SessionState]) => {
          // sort the batch by event time within the group for determinism
          val evs = it.toSeq.sortBy(_._2)
          var cur = state.getOption
          val closed = Seq.newBuilder[UserSession]
          evs.foreach { case (_, ts, v) =>
            cur match {
              case Some(s) if ts - s.lastUs <= gapUs =>
                cur = Some(s.copy(lastUs = ts, nEvents = s.nEvents + 1, total = s.total + v))
              case Some(s) =>
                closed += UserSession(user, new java.sql.Timestamp(s.startUs / 1000),
                  new java.sql.Timestamp(s.lastUs / 1000), s.nEvents, s.total)
                cur = Some(SessionState(ts, ts, 1, v))
              case None =>
                cur = Some(SessionState(ts, ts, 1, v))
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          closed.result().iterator
        }
      )
  }

  /** Drain a parquet directory as a stream with Trigger.AvailableNow into
    * an in-memory table and return the result — the batch-equivalence
    * harness used by StreamingSpec.
    */
  def runOnce(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      watermark: String,
      windowLen: String
  ): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val agg = windowedCounts(stream, "ts", "event_type", watermark, windowLen)
    val name = s"stream_out_${System.nanoTime()}"
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }
}
