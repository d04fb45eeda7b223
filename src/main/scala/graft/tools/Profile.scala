package graft.tools

import graft.ops.{Dedup, TextOps}
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiler
object Profile {
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.t(spark, "/root/testdata/sf0.1", "documents")
    df.count() // warmup
    time("warm2")(df.count())
    time("tokenStats")(TextOps.tokenStats(df, "doc_id", "text").count())
    val justSplit = df.select(size(split(trim(col("text")), "\\s+")).as("n"))
    time("justSplit")(justSplit.agg(sum("n")).collect())
    val toks = df.select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
    time("tokensOnly")(toks.select(size(col("ts"))).agg(sum("size(ts)")).collect())
    time("distinctOnly")(toks.select(size(array_distinct(col("ts")))).count())
    time("simhash")(Dedup.simhash64(df, "doc_id", "text").count())
    TextOps.tokenStats(df, "doc_id", "text").explain("formatted")
    spark.stop()
  }
}
