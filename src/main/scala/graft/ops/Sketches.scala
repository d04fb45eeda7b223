package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches (SURVEY.md §2.11 extension family).
  *
  * The count-min sketch is the bounded-state answer to "how often does
  * each of trillions of keys occur": a depth × width counter grid where
  * every occurrence increments one counter per row (bucket = row-salted
  * hash of the key) and a key's estimate is the MIN over its row
  * counters. State is depth × width integers — independent of key
  * cardinality — and the grid is a sum-mergeable aggregate, so it
  * composes map-side (partial aggregation) and across corpus shards
  * exactly like a count. Guarantee: estimate ≥ true count always (every
  * occurrence lands in the key's buckets); overestimate is bounded by
  * collision mass (≤ 2·N/width with probability 1 − 2^−depth).
  *
  * Buckets are md5-chunk arithmetic (`conv(substring(md5('cms<j>:'||key)
  * ,1,13),16,10) % width`), the repo's engine-portable hash primitive —
  * the DuckDB oracle replays the sketch bit-exactly.
  */
object Sketches {

  private def bucket(j: Int, key: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$j:"), key.cast("string"))), 1, 13), 16, 10)
      .cast("long") % width

  /** Build the sketch: one row per non-empty (row, bucket) counter.
    * One hash aggregate over depth × |occurrences| expanded rows with at
    * most depth × width distinct keys — map-side partials collapse each
    * task's contribution to grid size before the shuffle.
    */
  def countMin(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    val rows = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(j, col("__k"), width).as("b")))
    df.select(key.as("__k"))
      .select(explode(array(rows: _*)).as("e"))
      .groupBy(col("e.j").as("j"), col("e.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-query the sketch for each probe key: min over the key's depth
    * counters (missing counter = 0). The sketch is grid-sized —
    * broadcast — so estimation is one map-side join over the probes.
    * `probes` must carry `keyCol`; all its other columns pass through.
    */
  def cmsEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int
  ): DataFrame = {
    val passThrough = probes.columns.filterNot(_ == keyCol).map(col).toSeq
    val rows = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(j, col(keyCol), width).as("b")))
    val pb = probes
      .select(col(keyCol) +: passThrough :+ explode(array(rows: _*)).as("e"): _*)
      .select(col(keyCol) +: passThrough :+ col("e.j").as("j") :+ col("e.b").as("b"): _*)
    pb.join(broadcast(sketch), Seq("j", "b"), "left")
      .groupBy(col(keyCol) +: passThrough: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
  }
}
