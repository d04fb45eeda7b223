package graft

import graft.ops.TimeSeries
import org.apache.spark.sql.functions._

/** Calendar densification + forward-fill semantics. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val sparse = Seq(
    ("a", "2024-01-01", 10.0),
    ("a", "2024-01-04", 40.0), // gap: 02, 03 missing
    ("b", "2024-02-10", 7.0)   // single observation: spine is one day
  ).toDF("k", "d", "v").withColumn("d", to_date(col("d")))

  test("dateSpine covers each key's own [min, max] range, one row per day") {
    val spine = TimeSeries.dateSpine(sparse, "k", "d")
    assert(spine.filter(col("k") === "a").count() == 4)
    assert(spine.filter(col("k") === "b").count() == 1)
  }

  test("fillForward carries the last observation across gaps, never invents") {
    val filled = TimeSeries.fillForward(sparse, "k", "d", Seq("v"))
      .select(col("k"), date_format(col("d"), "yyyy-MM-dd").as("d"), col("v"))
      .as[(String, String, Double)].collect().toSet
    assert(filled == Set(
      ("a", "2024-01-01", 10.0),
      ("a", "2024-01-02", 10.0), // carried
      ("a", "2024-01-03", 10.0), // carried
      ("a", "2024-01-04", 40.0),
      ("b", "2024-02-10", 7.0)))
  }
}
