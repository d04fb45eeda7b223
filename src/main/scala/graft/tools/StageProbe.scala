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
    require(args.length == 2, "usage: StageProbe <sfDir> <queryName>")
    val (dir, name) = (args(0), args(1))
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

    @volatile var stages = List.empty[String]
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
        stages ::= f"run=${m.executorRunTime}%8d ms cpu=${m.executorCpuTime / 1000000}%8d " +
          f"maxTask=${maxTask.getOrDefault(i.stageId, -1L)}%8d " +
          f"gc=${m.jvmGCTime}%6d tasks=${i.numTasks}%4d " +
          f"recIn=${m.inputMetrics.recordsRead}%10d " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}%9d KB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%9d KB " +
          f"spill=${m.diskBytesSpilled / 1024 / 1024}%5d MB  ${i.name.take(60)}"
      }
    })

    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val n = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(s"[probe] $name rows=$n wall=${f"$wall%.2f"}s stages=${stages.size}")
    stages.sortBy(s => -s.split("=")(1).trim.takeWhile(_.isDigit).toLong)
      .take(15).foreach(s => println("[probe]   " + s))
    spark.stop()
  }
}
