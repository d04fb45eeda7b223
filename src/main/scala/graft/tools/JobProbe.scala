package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level attribution for one registered query: per-run, every Spark
  * job's wall span plus the DRIVER-SIDE GAPS between jobs (planning,
  * collects, parquet commit protocol, artifact param reads) that
  * stage-level metrics cannot see. The r21 diagnostic for gates that run
  * many small serial actions (artifact build → append → reload → query):
  * at sf0.1 the per-job latency and inter-job gaps, not executor compute,
  * dominate such gates.
  *
  * {{{
  * SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JobProbe /root/testdata/sf0.1 ann_ivfpq_append 3"
  * }}}
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProbe <sfDir> <queryName> [repeat]")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(id: Int, t0: Long, var t1: Long, desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, Job(e.jobId, e.time, -1L, d))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.t1 = e.time
      }
    })

    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to repeat) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      jobs.clear()
      val t0 = System.currentTimeMillis()
      fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
      val t1 = System.currentTimeMillis()
      org.apache.spark.graft.ListenerBus.drain(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.filter(_.t1 > 0).sortBy(_.t0)
      // merged union of job spans → "some job running" time; the rest of
      // the wall is driver-only gap
      var covered = 0L
      var cursor = t0
      js.foreach { j =>
        val s = math.max(j.t0, cursor)
        if (j.t1 > s) { covered += j.t1 - s; cursor = j.t1 }
        else cursor = math.max(cursor, j.t1)
      }
      val wall = t1 - t0
      println(f"[jobprobe] $name run=$i wall=${wall / 1000.0}%.2fs jobs=${js.size} " +
        f"jobTime=${covered / 1000.0}%.2fs driverGap=${(wall - covered) / 1000.0}%.2fs")
      if (i == repeat) {
        js.foreach { j =>
          println(f"[jobprobe]   job=${j.id}%3d ${(j.t1 - j.t0) / 1000.0}%6.2fs  ${j.desc.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
