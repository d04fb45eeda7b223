package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Structured Streaming capability (SURVEY.md §2.8: absent from the
  * reference; provided as the engine's incremental path). Verifies the
  * streaming tumbling-window aggregation agrees with its batch shape.
  */
class StreamingSpec extends SparkSpec {

  test("file-stream tumbling window agg matches batch groupBy on the same data") {
    val src = graft.queries.Tables.t(spark, sf("sf0.001"), "events")
      .select("ts", "event_type", "value")
    val dir = Files.createTempDirectory("stream-src").toString
    src.coalesce(1).write.mode("overwrite").parquet(dir)

    val batch = src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val streamed = EventStream
      .runOnce(spark, dir, src.schema, watermark = "2 hours", windowLen = "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
