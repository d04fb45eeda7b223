package graft

import graft.ops.Caching
import org.apache.spark.sql.functions._

/** The r22 checkpoint-durability rule (Caching.eagerCheckpoint): local
  * checkpoint by default, RELIABLE checkpoint when
  * `spark.graft.checkpoint.dir` is set — both modes value-identical, so
  * a deployment can buy executor-loss durability without touching any
  * operator.
  */
class CheckpointModeSpec extends SparkSpec {

  test("eagerCheckpoint: local and reliable modes are value-identical") {
    val df = spark.range(0, 1000).select(
      col("id"), (col("id") % 7).as("k"), (col("id") * 3).as("v"))
    val local = Caching.eagerCheckpoint(df)
    assert(local.queryExecution.analyzed.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])

    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toString
    val ss = spark.newSession()
    ss.conf.set("spark.graft.checkpoint.dir", dir)
    val dfR = ss.range(0, 1000).select(
      col("id"), (col("id") % 7).as("k"), (col("id") * 3).as("v"))
    val reliable = Caching.eagerCheckpoint(dfR)
    assert(local.collect().toSeq.map(_.toSeq).sortBy(_.head.toString) ==
      reliable.collect().toSeq.map(_.toSeq).sortBy(_.head.toString))
    // the reliable mode actually wrote checkpoint data to the configured dir
    assert(ss.sparkContext.getCheckpointDir.exists(_.contains(new java.io.File(dir).getName)))
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "reliable checkpoint wrote no files")
  }

  test("q_vocab_growth is identical in both checkpoint modes") {
    val fn = SparkEntry.queries("q_vocab_growth")
    val base = fn(spark, sf("sf0.001")).collect().map(_.toSeq).sortBy(_.head.toString)
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt2").toString
    val ss = spark.newSession()
    ss.conf.set("spark.graft.checkpoint.dir", dir)
    val rel = fn(ss, sf("sf0.001")).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(base.toSeq == rel.toSeq)
  }
}
