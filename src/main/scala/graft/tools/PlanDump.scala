package graft.tools
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: PlanDump <sfDir> <query> [query ...]")
      sys.exit(2)
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("plandump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      println(s"==== $q ====")
      val fn = graft.SparkEntry.queries.getOrElse(q, sys.error(s"unknown query: $q"))
      println(fn(spark, args(0)).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
  }
}
