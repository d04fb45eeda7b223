package graft.tools

import graft.ops.{Caching, Similarity}
import graft.queries.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiler (current target: ann_recall_at_k constituent cost)
object Profile {
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var stages = List.empty[(Int, Long, Long, String)] // id, runMs, tasks, name
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages ::= ((i.stageId, i.taskMetrics.executorRunTime, i.numTasks,
          i.name.take(90)))
      }
    })

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.t(spark, dir, "embeddings")
    val base = Similarity.prepBase(emb, "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("base.count")(base.count())
    val pred = col("cid") < 50
    time("exact")(Caching.materializeAndRelease(
      Similarity.cosineTopKFromBase(base, 5, pred).select("query_id", "neighbor_id")))
    time("lsh")(Caching.materializeAndRelease(
      Similarity.annLshTopKFromBase(base, 5, pred, 4, 12)))
    time("ivf")(Caching.materializeAndRelease(
      Similarity.ivfTopKFromBase(base, 5, pred, 8, 5, 0)))
    stages = Nil
    time("pq")(Caching.materializeAndRelease(
      Similarity.pqAdcTopKFromBase(base, 5, pred, 16, 4, 64, 200)))
    // stage events arrive asynchronously — drain before reading, or the
    // heaviest stage can be missing from the report
    org.apache.spark.graft.ListenerBus.drain(spark.sparkContext)
    println("PQ stages (id, runMs, tasks, name), heaviest first:")
    stages.sortBy(-_._2).take(12).foreach { case (id, ms, n, nm) =>
      println(f"  stage $id%5d run=$ms%7d ms tasks=$n%3d $nm")
    }
    // second pass, warm JVM
    time("exact2")(Caching.materializeAndRelease(
      Similarity.cosineTopKFromBase(base, 5, pred).select("query_id", "neighbor_id")))
    time("lsh2")(Caching.materializeAndRelease(
      Similarity.annLshTopKFromBase(base, 5, pred, 4, 12)))
    time("ivf2")(Caching.materializeAndRelease(
      Similarity.ivfTopKFromBase(base, 5, pred, 8, 5, 0)))
    time("pq2")(Caching.materializeAndRelease(
      Similarity.pqAdcTopKFromBase(base, 5, pred, 16, 4, 64, 200)))
    spark.stop()
  }
}
