package graft

import graft.ops.Dedup
import graft.queries.SharedIntermediates

/** The session-scoped shared pair build: one construction per (app, dir),
  * parquet replay for every later consumer, value-identical to a direct
  * build (the property that lets seven registered queries share it
  * without perturbing any oracle hash).
  */
class SharedIntermediatesSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("verifiedPairs memoizes to parquet and equals a direct build") {
    val dir = sf("sf0.001")
    SharedIntermediates.clear()
    try {
      val first = pairSet(SharedIntermediates.verifiedPairs(spark, dir))
      val second = SharedIntermediates.verifiedPairs(spark, dir)
      // the second call must replay the materialized build (a parquet
      // scan), not re-run the LSH pipeline
      val plan = second.queryExecution.executedPlan.toString
      assert(plan.contains("FileScan parquet"), plan.linesIterator.take(10).mkString("\n"))
      assert(pairSet(second) == first)
      val direct = pairSet(
        Dedup.lshVerifiedPairs(
          graft.queries.Tables.t(spark, dir, "documents"), "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = 16,
          thresholdNum = 4, thresholdDen = 5))
      assert(first == direct)
      assert(first.nonEmpty)
    } finally SharedIntermediates.clear()
  }
}
