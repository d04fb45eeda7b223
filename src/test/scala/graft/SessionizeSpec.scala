package graft

import graft.ops.Skew
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Custom-state sessionization + skew-salting behavior. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap splits sessions, counts and sums accumulate") {
    // (user, ts_micros, value); 10-minute gap
    val gapMs = 10 * 60 * 1000L
    def us(min: Long) = min * 60 * 1000 * 1000L
    val events = Seq(
      (1L, us(0), 1.0), (1L, us(5), 2.0), (1L, us(8), 3.0), // session 1
      (1L, us(30), 4.0), (1L, us(35), 5.0),                 // session 2 (closed by nothing → stays open)
      (2L, us(1), 10.0)                                     // user 2, single open session
    ).toDS()
    val closed = EventStream.sessionize(events, gapMs).collect()
    // only user 1's first session closes (a later event arrived past the gap)
    assert(closed.length == 1)
    val s = closed.head
    assert(s.user_id == 1L && s.n_events == 3 && s.sum_value == 6.0)
    assert(s.session_end.getTime - s.session_start.getTime == 8 * 60 * 1000)
  }

  test("sessionizeBatch (bounded-memory scan) equals the stateful fold on real data") {
    val src = graft.queries.Tables.t(spark, sf("sf0.001"), "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[(Long, Long, Double)]
    def key(u: graft.streaming.UserSession) =
      (u.user_id, u.session_start.getTime, u.session_end.getTime, u.n_events)
    val gap = 30 * 60 * 1000L
    val scan = EventStream.sessionizeBatch(src, gap).collect().map(key).toSet
    val fold = EventStream.sessionize(src, gap).collect().map(key).toSet
    assert(scan == fold)
    assert(scan.nonEmpty)
  }

  test("sessionizeBatch preserves microsecond precision in session bounds") {
    val gapMs = 1000L
    val events = Seq(
      (7L, 1000001L, 1.0), (7L, 1500001L, 2.0), // closes at 1.500001 s
      (7L, 900000000L, 9.0)                     // far later: opens trailing session
    ).toDS()
    val closed = EventStream.sessionizeBatch(events, gapMs).collect()
    assert(closed.length == 1)
    assert(closed.head.session_start.getNanos == 1000)      // 1 µs kept
    assert(closed.head.session_end.getNanos == 500001000)   // 0.500001 s kept
  }

  test("saltedSum equals plain groupBy sum on a skewed key distribution") {
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "cold" + (i % 7) else "HOT", i.toLong, i * 0.5))
      .toDF("k", "rid", "v")
    val salted = Skew.saltedSum(df, "k", Seq("v"), col("rid"), salts = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = df.groupBy("k").agg(sum(col("v").cast("decimal(28,4)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
    // the hot key really is spread: partial stage has >1 group for HOT
    assert(salted.contains("HOT") && salted.size == 8)
  }
}
