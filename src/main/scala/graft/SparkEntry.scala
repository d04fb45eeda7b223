package graft

import graft.queries.{CoreQueries, Ext2Queries, Ext3Queries, Ext4Queries, Ext5Queries, Ext6Queries, Ext7Queries, ExtQueries, QueryDef, SqlQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the §2.11 extensions) is
  * registered here; oracle-backed entries hash-match DuckDB on the same
  * parquet tables, the rest carry rows-only checks plus ScalaTest specs.
  */
object SparkEntry {

  /** The single registry assembly — package-visible so SurveyDump (and
    * any other tooling) enumerates EXACTLY what the driver sees. r18's
    * SURVEY §8 staleness was SurveyDump holding its own copy of this
    * concatenation and silently missing a new defs object; one list, no
    * drift.
    */
  private[graft] val all: Seq[(String, QueryDef)] =
    CoreQueries.defs ++ SqlQueries.defs ++ ExtQueries.defs ++ Ext2Queries.defs ++ Ext3Queries.defs ++ Ext4Queries.defs ++ Ext5Queries.defs ++ Ext6Queries.defs ++ Ext7Queries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the whole spec→extract path: config-driven brand filter,
    * date range, broadcast meta-dimension join, grouped metric aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.analyticExec(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, qd) => name -> qd.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (dynamic pivot, probabilistic sketches, stubbed decoders) → driver
    * records a weaker rows-only check; those have ScalaTest specs instead.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (name, qd) if qd.oracle.isDefined => name -> qd.oracle.get }.toMap
}
