package graft

import graft.ops.Cdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming CDC-merge sink: a `foreachBatch` that upserts each
  * micro-batch into a keyed parquet target via [[Cdc.upsert]] — the
  * streaming MERGE pattern warehouses run for incremental refresh (late
  * re-deliveries of a key overwrite by version instead of duplicating).
  */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch upsert sink converges to the batch upsert of all data") {
    val events = graft.queries.Tables.t(spark, sf("sf0.001"), "events")
      .select(col("user_id"), col("ts"), col("value"))
      // one row per key per micro-batch boundary is NOT required by the
      // sink — duplicates within a batch collapse by version too
      .limit(400)

    val srcDir = Files.createTempDirectory("upsert-src").toString
    val tgtDir = Files.createTempDirectory("upsert-tgt").toString
    // two files → at least two micro-batches with maxFilesPerTrigger=1
    val parts = events.randomSplit(Array(0.5, 0.5), seed = 7)
    parts(0).coalesce(1).write.mode("overwrite").parquet(srcDir)
    parts(1).coalesce(1).write.mode("append").parquet(srcDir)

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val incoming = Cdc.upsert(batch, batch.limit(0), "user_id", "ts")
        val merged =
          if (new java.io.File(s"$tgtDir/data").exists()) {
            val existing = spark.read.parquet(s"$tgtDir/data")
            Cdc.upsert(existing, incoming, "user_id", "ts")
          } else incoming
        // write to a fresh dir then swap — the parquet-level analogue of a
        // transactional MERGE commit
        val tmp = s"$tgtDir/tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val target = new java.io.File(s"$tgtDir/data")
        if (target.exists()) {
          val old = new java.io.File(s"$tgtDir/old")
          if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
          target.renameTo(old)
        }
        new java.io.File(tmp).renameTo(target)
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("upsert-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming upsert did not drain in time")

    val streamed = spark.read.parquet(s"$tgtDir/data")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val batchMerged = Cdc.upsert(events, events.limit(0), "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(streamed == batchMerged)
    assert(streamed.nonEmpty)
  }

  test("curationRunOnce: multi-micro-batch drain converges to the batch incremental funnel") {
    val docs = graft.queries.Tables.t(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text")
    // three files → three micro-batches with maxFilesPerTrigger=1, so the
    // slicing-independence contract (per-doc pure fields per batch,
    // associative min-id rep over the accumulated rows) is actually
    // exercised across batch boundaries, not vacuously on one batch
    val srcDir = Files.createTempDirectory("curation-src").toString
    val parts = docs.randomSplit(Array(1.0, 1.0, 1.0), seed = 11)
    parts(0).coalesce(1).write.mode("overwrite").parquet(srcDir)
    parts(1).coalesce(1).write.mode("append").parquet(srcDir)
    parts(2).coalesce(1).write.mode("append").parquet(srcDir)
    val isNew = graft.ops.Sampling.hashBucket(col("doc_id"), "sinc", 100) >= 70
    val isBench = graft.ops.Sampling.hashBucket(col("doc_id"), "sbench", 100) < 10
    def key(r: org.apache.spark.sql.Row) = r.getLong(0)
    val streamed = graft.streaming.EventStream
      .curationRunOnce(spark, srcDir, isNew, isBench, maxFilesPerTrigger = 1)
      .collect().map(r => key(r) -> r.toSeq).toMap
    val batch = graft.ops.Curation
      .incrementalVerdicts(docs, "doc_id", "text", isNew, isBench)
      .collect().map(r => key(r) -> r.toSeq).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // both keep outcomes occur on the fixture (dup specifically is only
    // guaranteed at sf0.01+, where the driver's oracle gate replays it —
    // the sf0.001 slice has no cross-split exact dup under this salt)
    assert(streamed.values.exists(v => v(5) == true), "expected at least one keep verdict")
    assert(streamed.values.exists(v => v(5) == false), "expected at least one drop verdict")
  }
}
