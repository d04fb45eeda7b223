package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Stage-level attribution for one registered query — the diagnostic
  * that caught r11's silent JIT pathologies (`explain` prints codegen
  * stars even when the stage runs interpreted; per-stage
  * executorRunTime vs task count vs records does not lie).
  *
  * {{{
  * SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StageProbe /tmp/sf10 q_window_topk_group"
  * }}}
  *
  * Prints each completed stage's run/cpu/gc time, task count, records
  * read, and shuffle bytes, heaviest first, then the total wall time.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      "usage: StageProbe <sfDir> <queryName> [count|force]")
    val (dir, name) = (args(0), args(1))
    // `force` evaluates every column of every row (toRdd.foreach), which
    // defeats count()-pruning: on a LAZY query, .count() lets Catalyst
    // drop computed columns that cannot change the row count (windows,
    // per-row projections), so the probe would time a pruned plan.
    val force = args.length == 3 && args(2) == "force"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // structured stage records (sorted on the Long, never re-parsed out
    // of formatted text), completed by draining the listener bus before
    // the read — a fixed sleep can drop the heaviest stage when the bus
    // delivers late
    final case class StageRec(
        runMs: Long, cpuMs: Long, maxTaskMs: Long, gcMs: Long, tasks: Int,
        recIn: Long, shufReadKb: Long, shufWriteKb: Long, spillMb: Long, name: String)
    @volatile var stages = List.empty[StageRec]
    // per-stage max single-task run time — the skew signal aggregate
    // stage metrics hide (wall ≈ maxTask on an otherwise idle box)
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          maxTask.merge(te.stageId, te.taskMetrics.executorRunTime, (a, b) => math.max(a, b))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages ::= StageRec(
          m.executorRunTime, m.executorCpuTime / 1000000,
          maxTask.getOrDefault(i.stageId, -1L), m.jvmGCTime, i.numTasks,
          m.inputMetrics.recordsRead,
          m.shuffleReadMetrics.totalBytesRead / 1024,
          m.shuffleWriteMetrics.bytesWritten / 1024,
          m.diskBytesSpilled / 1024 / 1024, i.name.take(60))
      }
    })

    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val n =
      if (force) { df.queryExecution.toRdd.count() }
      else df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerBus.drain(spark.sparkContext)
    println(s"[probe] $name rows=$n wall=${f"$wall%.2f"}s stages=${stages.size}")
    stages.sortBy(-_.runMs).take(15).foreach { r =>
      println(f"[probe]   run=${r.runMs}%8d ms cpu=${r.cpuMs}%8d " +
        f"maxTask=${r.maxTaskMs}%8d gc=${r.gcMs}%6d tasks=${r.tasks}%4d " +
        f"recIn=${r.recIn}%10d shufR=${r.shufReadKb}%9d KB " +
        f"shufW=${r.shufWriteKb}%9d KB spill=${r.spillMb}%5d MB  ${r.name}")
    }
    spark.stop()
  }
}
