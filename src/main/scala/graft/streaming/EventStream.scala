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
