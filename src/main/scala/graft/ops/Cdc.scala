package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-load primitives for the sink side of the pipeline
  * (`/root/reference/data_load.py:36-59` only knows APPEND/TRUNCATE; real
  * warehouse maintenance needs change capture and keyed upsert on top).
  *
  * Both operators are single hash-shuffles on the row key — the same
  * partitioning a bucketed warehouse table would already have, so at scale
  * they run shuffle-free against a bucketed base.
  */
object Cdc {

  /** Snapshot delta: classify every key as insert / delete / update /
    * unchanged between two snapshots of the same table. One full outer
    * hash join on the key; value comparison is null-safe (`<=>`) per
    * compared column, so NULL→value and value→NULL edits count as updates.
    * Emits (key, change_type) with `unchanged` rows dropped — the frame an
    * incremental refresh ships downstream.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      compareCols: Seq[String]
  ): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("__k"), struct(compareCols.map(col): _*).as("__ov"))
    val n = newSnap.select(col(keyCol).as("__k2"), struct(compareCols.map(col): _*).as("__nv"))
    o.join(n, col("__k") === col("__k2"), "full_outer")
      .select(
        coalesce(col("__k"), col("__k2")).as(keyCol),
        when(col("__k").isNull, lit("insert"))
          .when(col("__k2").isNull, lit("delete"))
          .when(!(col("__ov") <=> col("__nv")), lit("update"))
          .otherwise(lit("unchanged"))
          .as("change_type"))
      .filter(col("change_type") =!= "unchanged")
  }

  /** Keyed upsert (MERGE): apply `updates` over `base`, keeping per key the
    * row with the highest `versionCol` — updates win version ties (the
    * warehouse MERGE contract: an idempotent re-run of the same batch
    * changes nothing). One shuffle on the key: union the two sides with a
    * source-priority column and keep the first row per key under
    * (version DESC, priority DESC). A same-side same-version duplicate (a
    * dirty input) is resolved by a final whole-row-hash tie-break, so the
    * winner is a pure function of the data rather than shuffle order.
    * Against a base bucketed on the key this is the standard shuffle-free
    * compaction.
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keyCol: String,
      versionCol: String
  ): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      "upsert requires identically-shaped sides")
    val tagged = base.withColumn("__pri", lit(0)).unionByName(updates.withColumn("__pri", lit(1)))
    val rowHash = xxhash64(base.columns.toIndexedSeq.map(c => col(s"`$c`")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("__pri").desc, rowHash.desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")
  }
}
