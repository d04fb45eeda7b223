package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/codegen/parquet-reader init otherwise lands
    // on whichever query happens to run first (map iteration order — i.e.
    // an arbitrary query absorbs JIT, janino, broadcast-pool, and footer
    // costs). Touch both fact tables and the three executor machineries
    // (hash agg, broadcast join, window) the inventory leans on.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
      val ev = graft.queries.Tables.t(spark, sfDir, "events")
      val dim = ev.groupBy("event_type").count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("event_id")
      ev.join(broadcast(dim), "event_type")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 1).count()
    } catch { case _: Throwable => }
    // optional comma-separated name filter (local iteration only; the
    // driver never sets it and times the full inventory)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // isolate per-query timing: drop caches left by previous queries AND
      // their localCheckpoint result blocks — clearCache() does not touch
      // checkpoint RDD blocks, and leaving their release to the
      // ContextCleaner (GC timing) let block churn bleed multi-second
      // noise into unrelated queries (recorded round-2 outliers). Blocking
      // unpersist so the next timing starts from a clean block manager.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      // failed queries record -1 so the JSON can't masquerade as a fast pass
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
