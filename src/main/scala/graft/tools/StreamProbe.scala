package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch lifecycle decomposition for the streaming gates (r22,
  * VERDICT r21 #1): runs one registered query and prints, per
  * micro-batch, the `StreamingQueryProgress` duration breakdown
  * (`triggerExecution` = whole batch, `queryPlanning`, `getBatch`,
  * `latestOffset`, `walCommit`, `commitOffsets`, `addBatch`) plus the
  * per-state-operator commit times — the numbers that separate "RocksDB
  * store lifecycle" from "per-batch planning" from "offset/commit log
  * I/O", which JobProbe's job-span view lumps into jobTime/driverGap.
  *
  * The listener is registered through the SparkConf key
  * `spark.sql.streaming.streamingQueryListeners`, which every
  * `newSession()` re-reads — so the gates' state-scoped sessions are
  * covered without touching the production code path.
  *
  * {{{
  * SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StreamProbe /root/testdata/sf0.1 q_stream_interval_left 3"
  * }}}
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamProbe <sfDir> <queryName> [repeat]")
    val (dir, name) = (args(0), args(1))
    val repeat = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config(
        "spark.sql.streaming.streamingQueryListeners",
        "graft.tools.StreamProbeListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to repeat) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      StreamProbeListener.reset()
      val t0 = System.currentTimeMillis()
      fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
      val t1 = System.currentTimeMillis()
      println(f"[streamprobe] $name run=$i wall=${(t1 - t0) / 1000.0}%.2fs " +
        f"batches=${StreamProbeListener.batches.get} " +
        f"queryStarts=${StreamProbeListener.starts.get} " +
        f"startToFirstProgressMs=${StreamProbeListener.startGapMs.get}")
    }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => }
    spark.stop()
  }
}

/** Companion listener (must be a zero-arg public class for the conf
  * registration). Prints one line per micro-batch with the duration
  * breakdown and per-operator state commit metrics.
  */
object StreamProbeListener {
  val batches = new java.util.concurrent.atomic.AtomicInteger
  val starts = new java.util.concurrent.atomic.AtomicInteger
  /** Sum over queries of (first progress event wall - query start wall):
    * the stream-START overhead (source resolution, checkpoint dir setup,
    * offset log init) that precedes the first trigger.
    */
  val startGapMs = new java.util.concurrent.atomic.AtomicLong
  private[tools] val startedAt =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()
  private[tools] val firstProgress =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
  def reset(): Unit = { batches.set(0); starts.set(0); startGapMs.set(0); startedAt.clear(); firstProgress.clear() }
}

class StreamProbeListener extends StreamingQueryListener {
  import StreamProbeListener._
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    starts.incrementAndGet()
    startedAt.put(e.id, System.currentTimeMillis())
  }
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    batches.incrementAndGet()
    if (firstProgress.add(p.id)) {
      Option(startedAt.get(p.id)).foreach { t0 =>
        startGapMs.addAndGet(System.currentTimeMillis() - t0)
      }
    }
    val dur = p.durationMs
    def d(k: String): Long = Option(dur.get(k)).map(_.longValue()).getOrElse(-1L)
    val ops = p.stateOperators.zipWithIndex.map { case (so, i) =>
      s"""{"op":$i,"name":"${so.operatorName}","stores":${so.numShufflePartitions},""" +
        s""""rowsTotal":${so.numRowsTotal},"commitMs":${so.commitTimeMs},""" +
        s""""updatedMs":${so.allUpdatesTimeMs},"removedMs":${so.allRemovalsTimeMs}}"""
    }.mkString("[", ",", "]")
    println(
      s"""[streamprobe] {"batch":${p.batchId},"name":"${Option(p.name).getOrElse("?")}",""" +
        s""""triggerMs":${d("triggerExecution")},"planMs":${d("queryPlanning")},""" +
        s""""getBatchMs":${d("getBatch")},"latestOffsetMs":${d("latestOffset")},""" +
        s""""walCommitMs":${d("walCommit")},"commitOffsetsMs":${d("commitOffsets")},""" +
        s""""addBatchMs":${d("addBatch")},"stateOps":$ops}""")
  }
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
