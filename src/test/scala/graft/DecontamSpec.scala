package graft

import graft.ops.Decontam

import org.apache.spark.sql.functions._

/** Semantics + plan shape of the benchmark 13-gram decontamination pass
  * (`q_benchmark_decontam` / `q_decontam_keep_list`).
  */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // 13 shared consecutive words = contaminated; 12 = clean
  private val thirteen = (1 to 13).map(i => s"w$i").mkString(" ")
  private val twelve = (1 to 12).map(i => s"w$i").mkString(" ")

  private def frame(rows: (Long, Boolean, String)*) =
    rows.toSeq.toDF("doc_id", "is_bench", "text")

  test("exactly-13 shared words contaminate; 12 do not; bench docs are never flagged") {
    val df = frame(
      (1L, true, s"benchmark question: $thirteen end"),
      (2L, false, s"corpus copy with $thirteen trailing"), // hit
      (3L, false, s"corpus near miss $twelve differs"), // 12-gram only
      (4L, false, "entirely unrelated text with no overlap at all"),
      (5L, true, s"second bench doc sharing $thirteen too")) // bench side, never flagged
    val grams = Decontam.gramRows(df, "doc_id", "text", col("is_bench"), 13)
    val hits = Decontam.contaminatedDocs(grams)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet === Set(2L))
    // the shared run is exactly 13 tokens → exactly one shared 13-gram
    // (windows straddling the differing context words never match)
    assert(hits(2L) === 1L)
  }

  test("overlap count is the DISTINCT shared-gram count") {
    // a 15-token shared run contains three 13-gram windows
    val fifteen = (1 to 15).map(i => s"w$i").mkString(" ")
    val df = frame(
      (1L, true, s"bench $fifteen"),
      (2L, false, s"corpus $fifteen"))
    val hits = Decontam.contaminatedDocs(
      Decontam.gramRows(df, "doc_id", "text", col("is_bench"), 13))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(2L -> 3L))
  }

  test("verdicts partition the corpus: held-out, contaminated, keep") {
    val df = frame(
      (1L, true, s"bench $thirteen"),
      (2L, false, s"dirty $thirteen"),
      (3L, false, "clean unrelated words only"))
    val grams = Decontam.gramRows(df, "doc_id", "text", col("is_bench"), 13)
    val v = Decontam.verdicts(df, "doc_id", col("is_bench"), grams)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toSet
    assert(v === Set(
      (1L, true, false, false), // held out: never trained on
      (2L, false, true, false), // contaminated: dropped
      (3L, false, false, true))) // clean corpus: kept
  }

  test("contamination joins the corpus grams against a BROADCAST benchmark gram set") {
    val plan = graft.SparkEntry
      .queries("q_benchmark_decontam")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    // the benchmark side is tiny at any corpus scale — a shuffle join
    // here would shuffle the full corpus gram explosion at 100 TB
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
