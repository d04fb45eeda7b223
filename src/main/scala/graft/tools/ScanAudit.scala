package graft.tools

import org.apache.spark.sql.SparkSession

/** Registry-wide scan fan-out audit (the r14 recipe that caught
  * q_percentile_cont's 15× scan, re-run per the r20 verdict): for every
  * registered query, count how many times each parquet location appears
  * as a Scan node in the FORMATTED plan, and flag any fixture read more
  * than twice. Eager gates (artifact build/reload) execute inside the
  * query fn and return a checkpointed frame whose plan is a bare RDD
  * scan — for those the interesting scans happened during construction.
  * Plan-node counts also OVERSTATE executed scans (AQE/ReuseExchange
  * collapses identical subtrees at runtime), so `--exec` additionally
  * RUNS each query and reports the listener-measured input records —
  * recordsRead ÷ fixture rows ≈ the true executed scan multiplicity.
  *
  * {{{
  * SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.ScanAudit /root/testdata/sf0.001"
  * SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.ScanAudit /root/testdata/sf0.001 --exec q_a q_b"
  * }}}
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScanAudit <sfDir> [query ...]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exec = args.contains("--exec")
    val names =
      if (args.length > 1) args.drop(1).filterNot(_ == "--exec").toSeq
      else graft.SparkEntry.queries.keys.toSeq
    // executed-input listener for --exec: recordsRead across all tasks
    val recIn = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) recIn.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    })
    val scanRe = ("Location: [A-Za-z]*FileIndex(?:\\([0-9]+ paths\\))? *\\[([^,\\]]+)").r
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        if (exec) {
          org.apache.spark.graft.ListenerBus.drain(spark.sparkContext)
          val before = recIn.get
          fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
          org.apache.spark.graft.ListenerBus.drain(spark.sparkContext)
          println(s"[scanaudit] $name execRecordsRead=${recIn.get - before}")
        }
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val counts = scanRe.findAllMatchIn(plan)
          .map(_.group(1))
          .toSeq
          .groupBy(identity)
          .view.mapValues(_.size)
          .toSeq.sortBy(-_._2)
        val total = counts.map(_._2).sum
        val flagged = counts.filter(_._2 > 2)
        val detail = counts
          .map { case (p, c) => s"$c x ${p.split('/').takeRight(1).mkString}" }
          .mkString("; ")
        println(s"[scanaudit] $name scans=$total${if (flagged.nonEmpty) " FLAG" else ""} $detail")
      } catch {
        case e: Throwable =>
          println(s"[scanaudit] $name ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => }
    spark.stop()
  }
}
