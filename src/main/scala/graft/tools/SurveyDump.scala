package graft.tools

/** Machine-readable dump of the query registry for SURVEY §8 generation
  * (`tools/surveygen.py`): one tab-separated row per registered query —
  * name, oracle-backed?, description. Runs without a SparkSession (the
  * defs maps hold lambdas; nothing executes).
  */
object SurveyDump {
  def main(args: Array[String]): Unit = {
    // enumerate the DRIVER'S OWN assembly (SparkEntry.all), never a local
    // copy of the defs concatenation: r18's §8 went stale because this
    // object held its own list and silently missed a new defs object
    graft.SparkEntry.all.foreach { case (n, qd) =>
      val d = qd.description.replace("\t", " ").replace("\n", " ")
      println(s"SURVEYROW\t$n\t${qd.oracle.isDefined}\t$d")
    }
    println(s"SURVEYTOTAL\t${graft.SparkEntry.all.size}")
  }
}
