package graft.tools

import graft.ops.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

// scratch profiler (current target: dedup_containment candidate mass —
// dense inverted-index vs prefix + PPJoin positional filter, the r15
// verdict-#5 A/B; alternating D/P runs so host drift hits both arms)
object Profile {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sr = new java.util.concurrent.atomic.AtomicLong
    val sp = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          sp.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def shingles() = Dedup.shingleRows(
      graft.queries.Tables.t(spark, dir, "documents"), "doc_id", "text", n = 3)

    def run(tag: String, i: Int)(f: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      org.apache.spark.graft.ListenerBus.drain(spark.sparkContext)
      val (r0, p0) = (sr.get, sp.get)
      val t0 = System.nanoTime()
      val n = f.count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBus.drain(spark.sparkContext)
      println(f"PROF $tag run=$i wall=$wall%.2f s rows=$n " +
        f"shufR=${(sr.get - r0) / 1024 / 1024} MB spill=${(sp.get - p0) / 1024 / 1024} MB")
    }

    // registered shape: t = 4/5, cap = 50 (Ext4Queries dedup_containment)
    for (i <- 1 to 3) {
      run("dense", i)(
        Dedup.containmentPairsFromShingles(shingles(), 4, 5, Some(50)))
      run("prefix+pos", i)(
        Dedup.prefixContainmentPairsFromShingles(shingles(), 4, 5, Some(50)))
    }
    spark.stop()
  }
}
