package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

/** As-of join semantics + bucketed-join co-location (shuffle-free join
  * via matching bucketing — the pre-partitioning strategy for repeated
  * large-large joins at scale).
  */
class AsofBucketSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: most recent right row at-or-before each left time, per key") {
    val quotes = Seq( // key, time, px
      (1L, 10L, 100.0), (1L, 20L, 101.0), (1L, 30L, 102.0),
      (2L, 15L, 200.0)
    ).toDF("qk", "qt", "px")
    val trades = Seq( // key, time
      (1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (3L, 50L)
    ).toDF("tk", "tt")
    val out = AsofJoin
      .asofJoin(trades, quotes, "tk", "qk", "tt", "qt", payload = Seq("px"))
      .select("tk", "tt", "px")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(out == Set(
      (1L, 5L, None),          // before first quote
      (1L, 10L, Some(100.0)),  // tie: right row at equal time wins (>= semantics)
      (1L, 25L, Some(101.0)),  // most recent ≤ 25 is t=20
      (2L, 14L, None),         // key 2 quote arrives later
      (3L, 50L, None)          // key never quoted
    ))
  }

  test("bucketed tables join without a shuffle exchange") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    // the metastore is fresh per JVM but the warehouse dirs persist on
    // disk across runs — clear both before writing
    Seq("bk_a", "bk_b").foreach { t =>
      s2.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    import s2.implicits._
    val a = (1 to 10000).map(i => (i.toLong % 500, s"a$i")).toDF("k", "va")
    val b = (1 to 10000).map(i => (i.toLong % 500, s"b$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_b")
    val joined = s2.table("bk_a").join(s2.table("bk_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: SortMergeJoin with NO Exchange on either side
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(joined.count() == 10000L * 20) // 500 keys × 20×20 matches
  }
}
