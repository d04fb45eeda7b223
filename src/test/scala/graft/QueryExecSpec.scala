package graft

import graft.extract.QueryExec
import graft.spec.ExportConfig
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** The spec→extract path: brand filter, date bounds, dim join, metric
  * registry (§3.2 natively in Spark).
  */
class QueryExecSpec extends SparkSpec {
  import spark.implicits._

  private val facts = Seq(
    (1L, "2024-01-01", "a", 10.0),
    (1L, "2024-01-02", "a", 20.0),
    (2L, "2024-01-02", "b", 30.0),
    (3L, "2024-01-09", "a", 40.0) // outside date range
  ).toDF("brand", "d", "k", "v")

  private val dim = Seq((1L, "Alpha"), (2L, "Beta")).toDF("id", "name")

  test("full path: brand IN + BETWEEN + broadcast dim join + sum/count registry") {
    val cfg = ExportConfig(
      "t", "ds",
      metrics = ListMap("sum:v" -> "float64", "count:k" -> "int64"),
      groupBy = ListMap("k" -> "string"),
      metaDimensions = ListMap("name" -> "string"),
      brands = Seq(1L, 2L)
    )
    val out = QueryExec.run(
      facts, cfg,
      brandCol = "brand", dateCol = "d",
      startDate = Some("2024-01-01"), endDate = Some("2024-01-05"),
      dims = Seq(QueryExec.DimJoin(dim, "brand", "id", Seq("name")))
    )
    val rows = out.collect().map(r =>
      (r.getAs[String]("k"), r.getAs[String]("name"),
        r.getAs[java.math.BigDecimal]("sum:v").doubleValue(), r.getAs[Long]("count:k"))
    ).toSet
    assert(rows == Set(("a", "Alpha", 30.0, 2L), ("b", "Beta", 30.0, 1L)))
  }

  test("no brands = no brand filter; open date bounds") {
    val cfg = ExportConfig("t", "ds", ListMap("count:k" -> "int64"), ListMap("k" -> "string"),
      ListMap.empty, Seq.empty)
    val out = QueryExec.run(facts, cfg, "brand", "d", None, None)
    assert(out.agg(sum(col("`count:k`"))).as[Long].collect().head == 4L)
  }

  test("metric registry: min/max/avg/count_distinct resolvable by prefix") {
    val cfg = ExportConfig("t", "ds",
      ListMap("min:v" -> "float64", "max:v" -> "float64", "count_distinct:brand" -> "int64"),
      ListMap.empty, ListMap.empty, Seq.empty)
    val r = QueryExec.run(facts, cfg, "brand", "d", None, None).collect().head
    assert(r.getAs[Double]("min:v") == 10.0)
    assert(r.getAs[Double]("max:v") == 40.0)
    assert(r.getAs[Long]("count_distinct:brand") == 3L)
  }

  test("content-dataset rewrite: request BETWEEN + 365-day lookback, one path") {
    // today = 2024-01-10: {{nDaysAgo 9}}..{{nDaysAgo 8}} = 01-01..01-02,
    // lookback floor 2023-01-10 (inert here — proves composition not harm)
    val cfg = ExportConfig("t", "brand_content_x",
      ListMap("sum:v" -> "float64"), ListMap("k" -> "string"), ListMap.empty, Seq.empty)
    val out = QueryExec.runContent(
      facts, cfg,
      brandCol = "brand", dateStrCol = "d",
      requestStart = "{{nDaysAgo 9}}", requestEnd = "{{nDaysAgo 8}}",
      today = java.time.LocalDate.parse("2024-01-10"))
    val rows = out.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[java.math.BigDecimal]("sum:v").doubleValue())
      .toMap
    // 01-09 row excluded by the request range despite being inside lookback
    assert(rows == Map("a" -> 30.0, "b" -> 30.0))
  }

  test("content-dataset rewrite: non-content config or bad macro throws (E1 path)") {
    val content = ExportConfig("t", "brand_content_x",
      ListMap("sum:v" -> "float64"), ListMap("k" -> "string"), ListMap.empty, Seq.empty)
    val notContent = content.copy(datasetId = "brand_daily")
    intercept[IllegalArgumentException] {
      QueryExec.runContent(facts, notContent, "brand", "d",
        "{{nDaysAgo 1}}", "{{nDaysAgo 0}}", java.time.LocalDate.parse("2024-01-10"))
    }
    intercept[IllegalArgumentException] {
      QueryExec.runContent(facts, content, "brand", "d",
        "not-a-macro", "{{nDaysAgo 0}}", java.time.LocalDate.parse("2024-01-10"))
    }
  }

  test("broadcast dim join plan actually broadcasts") {
    val cfg = ExportConfig("t", "ds", ListMap("sum:v" -> "float64"),
      ListMap("k" -> "string"), ListMap("name" -> "string"), Seq.empty)
    val out = QueryExec.run(facts, cfg, "brand", "d", None, None,
      dims = Seq(QueryExec.DimJoin(dim, "brand", "id", Seq("name"))))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
