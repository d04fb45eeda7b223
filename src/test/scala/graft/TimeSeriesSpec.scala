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

  test("proximityCount: inclusive window, cross-bucket matches, zeros kept") {
    def ev(rows: (Long, Long)*) = rows.toSeq
      .toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    // window = 100 µs. Left 1 @1000; rights at 900 (=|Δ|100, inclusive,
    // PREVIOUS bucket 9 vs left bucket 10), 1100 (inclusive, next bucket),
    // 1101 (|Δ|101, same ±1 bucket range but outside the window → filtered)
    // and 5000 (far bucket, never joined). Left 2 @5000 matches only the
    // right at 5000 (Δ0); left 3 @9999 matches nothing → count 0.
    val left = ev(1L -> 1000L, 2L -> 5000L, 3L -> 9999L)
    val right = ev(10L -> 900L, 11L -> 1100L, 12L -> 1101L, 13L -> 5000L)
    val out = TimeSeries.proximityCount(left, right, "id", "ts", windowUs = 100L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
  }

  test("proximityCount never double-counts a pair across exploded buckets") {
    // right row on an exact bucket boundary (us = 200 = 2×window): its
    // single bucket is 2; left @250 explodes to buckets {1,2,3} — the pair
    // must appear exactly once even though |Δ|=50 qualifies via bucket 2
    // only. A duplicate would show as count 2.
    val left = Seq((1L, 250L)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    val right = Seq((9L, 200L)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    val out = TimeSeries.proximityCount(left, right, "id", "ts", windowUs = 100L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L))
  }

  test("proximityCount rank-difference equals brute force on seeded random data") {
    // the r14 rank-difference form (F(t+w) − F(t−w−1) over two-level
    // bucket prefix sums) must agree with the O(n²) definition on data
    // hitting its edges: bounds on exact bucket boundaries, empty
    // buckets between bounds, ties at the window edge, pre-1970
    // (negative µs) timestamps exercising the floor-div
    val rnd = new scala.util.Random(77)
    val ls = (1 to 300).map(i => (i.toLong, rnd.nextLong(4000L) - 2000L))
    val rs = (1 to 500).map(i => (1000L + i, rnd.nextLong(4000L) - 2000L))
    def ev(rows: Seq[(Long, Long)]) = rows
      .toDF("id", "us").select(col("id"), timestamp_micros(col("us")).as("ts"))
    for (w <- Seq(1L, 7L, 100L, 333L)) {
      val expect = ls.map { case (id, t) =>
        id -> rs.count { case (_, r) => math.abs(t - r) <= w }.toLong
      }.toMap
      val got = TimeSeries.proximityCount(ev(ls), ev(rs), "id", "ts", windowUs = w)
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"window $w diverged from brute force")
    }
  }

  test("proximityCount sums per-occurrence counts for duplicate left ids") {
    def ev(rows: (Long, Long)*) = rows.toSeq
      .toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    // id 1 occurs twice at the SAME ts (2 rights in window → 2+2=4) and
    // id 2 twice at near-equal ts in the same fine bucket (3 and 2
    // matches → 5). The r14 form merged bound rows across occurrences —
    // exact duplicates doubled `part` but counted `cum_before` once.
    val left = ev(1L -> 1000L, 1L -> 1000L, 2L -> 5000L, 2L -> 5003L)
    val right = ev(10L -> 950L, 11L -> 1050L, 12L -> 4950L, 13L -> 5001L, 14L -> 5100L)
    val out = TimeSeries.proximityCount(left, right, "id", "ts", windowUs = 100L)
      .as[(Long, Long)].collect().toMap
    // id 1: 950/1050 within ±100 of both occurrences → 2+2; id 2: all of
    // 4950/5001/5100 within ±100 of both 5000 and 5003 → 3+3
    assert(out == Map(1L -> 4L, 2L -> 6L))
  }

  test("proximityCount keeps null-timestamp left rows with n_nearby = 0") {
    val left = Seq((1L, Some(1000L)), (2L, None)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    val right = Seq((10L, 950L)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    val out = TimeSeries.proximityCount(left, right, "id", "ts", windowUs = 100L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 0L))
  }

  test("proximityCount plans as a hash join on the bucket key, never a nested loop") {
    val ev = graft.queries.Tables.t(spark, sf("sf0.001"), "events")
    val plan = TimeSeries
      .proximityCount(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "error"),
        "event_id", "ts", windowUs = 900000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(30).mkString("\n"))
  }
}
