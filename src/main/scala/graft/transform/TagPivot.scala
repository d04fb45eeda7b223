package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F2 + A2 — nested tag parse and dynamic pivot
  * (`/root/reference/data_transform.py:48-68,102-150`).
  *
  * The reference takes `lfm.content.tags`, an array of `"Key Name: value"`
  * strings, parses each element (split on first ':', key gets spaces→'_'
  * and the field-name prefix; colon-less items → key `<field>.untitled`),
  * folds duplicate keys by joining values with `"//"` in list order, then
  * pivots the union of keys across all rows into top-level columns.
  *
  * Spark-first design (SURVEY.md §2.9/§4): the parse+fold is pure Catalyst
  * higher-order functions — no UDF, fully codegen-friendly, shuffle-free.
  * Only the dynamic column set needs a driver pass (schema must be known at
  * analysis time — the same two-pass trick built-in `pivot()` uses). The
  * distinct-keys job reads one column and aggregates to a handful of rows,
  * so at 100 TB it is a cheap column-pruned scan; the key set is bounded by
  * `maxKeys` with overflow retained in a map column (SURVEY.md §7.5.6).
  */
object TagPivot {

  /** Parse one tag array into an ordered key→value map with `//` dup-fold.
    * Element order is array order, so the fold is deterministic (A2).
    */
  def tagsToMap(tags: Column, fieldPrefix: String): Column = {
    val entries = transform(tags, t => {
      val idx = instr(t, ":")
      val rawKey = trim(substring_index(t, ":", 1))
      val key = when(idx > 0, concat(lit(fieldPrefix + "."), translate(rawKey, " ", "_")))
        .otherwise(lit(fieldPrefix + ".untitled"))
      val value = when(idx > 0, trim(t.substr(idx + 1, length(t))))
        .otherwise(trim(t))
      struct(key.as("k"), value.as("v"))
    })
    aggregate(
      entries,
      map().cast("map<string,string>"),
      (acc, e) => {
        val k = e.getField("k")
        val v = e.getField("v")
        when(
          try_element_at(acc, k).isNotNull,
          map_concat(
            map_filter(acc, (mk, _) => mk =!= k),
            map_from_arrays(array(k), array(concat(try_element_at(acc, k), lit("//"), v)))
          )
        ).otherwise(map_concat(acc, map_from_arrays(array(k), array(v))))
      }
    )
  }

  /** Two-pass dynamic pivot: job 1 collects the (bounded) distinct key set;
    * job 2 selects one literal column per key. Keys beyond `maxKeys` stay in
    * an overflow map column instead of exploding the schema.
    */
  def pivotTags(
      df: DataFrame,
      tagsCol: String,
      maxKeys: Int = 1000
  ): DataFrame = {
    val mapCol = "__tags_map"
    // the parsed map feeds BOTH the key-collection job and the final
    // projection; persist so the HOF parse+fold runs once, not twice
    val withMap = df.withColumn(mapCol, tagsToMap(col(s"`$tagsCol`"), tagsCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Driver pass 1: distinct tag keys (column-pruned scan + partial agg).
    val keys = withMap
      .select(explode(map_keys(col(mapCol))).as("k"))
      .distinct()
      .orderBy("k")
      .limit(maxKeys + 1)
      .collect()
      .map(_.getString(0))
    val (kept, overflowed) = (keys.take(maxKeys), keys.length > maxKeys)
    val keep = df.columns.filter(_ != tagsCol).map(c => col(s"`$c`"))
    val tagCols = kept.map(k => try_element_at(col(mapCol), lit(k)).as(k))
    val overflow =
      if (overflowed)
        Seq(map_filter(col(mapCol), (k, _) => !k.isin(kept.toIndexedSeq.map(lit(_)): _*)).as(s"$tagsCol.overflow"))
      else Seq.empty
    // materialize once and release the parsed-map cache (the pivot output
    // is terminal — it feeds the sink); see Caching for the discipline
    graft.ops.Caching.materializeAndRelease(
      withMap.select((keep ++ tagCols ++ overflow).toSeq: _*),
      withMap)
  }
}
