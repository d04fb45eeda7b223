package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies insert/delete/update and drops unchanged") {
    val oldSnap = Seq(
      (1L, "A", 10.0),
      (2L, "B", 20.0),
      (3L, "C", 30.0),
      (4L, null.asInstanceOf[String], 40.0)
    ).toDF("k", "status", "price")
    val newSnap = Seq(
      (1L, "A", 10.0),   // unchanged
      (2L, "B", 25.0),   // update (value)
      (4L, "D", 40.0),   // update (null -> value)
      (5L, "E", 50.0)    // insert; 3 deleted
    ).toDF("k", "status", "price")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, "k", Seq("status", "price"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "update", 3L -> "delete", 4L -> "update", 5L -> "insert"))
  }

  test("upsert keeps highest version per key; updates win ties (idempotent)") {
    val base = Seq((1L, 10.0, 1), (2L, 20.0, 1), (3L, 30.0, 2)).toDF("k", "v", "ver")
    val updates = Seq((2L, 99.0, 2), (3L, 77.0, 2), (4L, 40.0, 1)).toDF("k", "v", "ver")
    val merged = Cdc.upsert(base, updates, "k", "ver")
    val out = merged.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k=2: update has higher version; k=3: tie -> update wins; k=4: new
    assert(out == Map(1L -> 10.0, 2L -> 99.0, 3L -> 77.0, 4L -> 40.0))
    // re-applying the same batch changes nothing
    val again = Cdc.upsert(merged, updates, "k", "ver")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == out)
  }
}
