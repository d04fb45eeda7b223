package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: the Spark implementation plus (where
  * SQL-expressible) a DuckDB oracle that must hash-match it exactly.
  *
  * Determinism contract for oracle-backed queries (SURVEY.md §5):
  *  - FP aggregates are decimal-cast on BOTH sides (exact, order-free);
  *  - computed integer columns are cast to BIGINT on both sides;
  *  - vector math is a sequential double fold on both sides (bitwise equal);
  *  - every ranking has a total order (unique-key tie-breaks).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    description: String = ""
)

object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  /** Fixture loader. The `events` table carries parquet TIMESTAMP(NANOS)
    * which Spark rejects by default; read nanos as long and truncate to
    * microseconds (same truncation DuckDB applies when it reads
    * TIMESTAMP_NS into its µs timestamps, so oracles agree).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Events with a time-range predicate applied to the RAW nanosecond long
    * column, before the µs conversion — so the range reaches the parquet
    * scan as a pushable long comparison (row-group/page pruning at scale).
    * Filtering after `timestamp_micros(ts div 1000)` would defeat pushdown:
    * Catalyst cannot invert the expression. Bounds are UTC `yyyy-MM-dd`
    * (or full timestamps); start inclusive, end exclusive.
    */
  def eventsRanged(
      s: SparkSession,
      dir: String,
      startInclusive: Option[String],
      endExclusive: Option[String]
  ): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    def ns(d: String): Long = {
      val str = if (d.length == 10) s"$d 00:00:00" else d
      java.time.LocalDateTime
        .parse(str.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC)
        .getEpochSecond * 1000000000L
    }
    if (raw.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType)) {
      var df = raw
      startInclusive.foreach(d => df = df.filter(col("ts") >= lit(ns(d))))
      endExclusive.foreach(d => df = df.filter(col("ts") < lit(ns(d))))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      var df = raw
      startInclusive.foreach(d => df = df.filter(col("ts") >= lit(d).cast("timestamp")))
      endExclusive.foreach(d => df = df.filter(col("ts") < lit(d).cast("timestamp")))
      df
    }
  }
}
