package graft.tools

/** Machine-readable dump of the query registry for SURVEY §8 generation
  * (`tools/surveygen.py`): one tab-separated row per registered query —
  * name, oracle-backed?, description. Runs without a SparkSession (the
  * defs maps hold lambdas; nothing executes).
  */
object SurveyDump {
  def main(args: Array[String]): Unit = {
    val all: Seq[(String, graft.queries.QueryDef)] =
      graft.queries.CoreQueries.defs ++ graft.queries.SqlQueries.defs ++
        graft.queries.ExtQueries.defs ++ graft.queries.Ext2Queries.defs ++
        graft.queries.Ext3Queries.defs ++ graft.queries.Ext4Queries.defs ++
        graft.queries.Ext5Queries.defs
    all.foreach { case (n, qd) =>
      val d = qd.description.replace("\t", " ").replace("\n", " ")
      println(s"SURVEYROW\t$n\t${qd.oracle.isDefined}\t$d")
    }
    println(s"SURVEYTOTAL\t${all.size}")
  }
}
