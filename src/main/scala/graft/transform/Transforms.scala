package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's fixed local transform pipeline
  * (`/root/reference/data_transform.py:5-100`), re-expressed as pure
  * `DataFrame => DataFrame` combinators that Catalyst fuses into a single
  * whole-stage-codegen'd project+filter (SURVEY.md §3.3).
  *
  * Every combinator is lazy and shuffle-free: at 100 TB these are pure
  * map-side operations that pipeline with the scan.
  */
object Transforms {

  /** Backtick-quote a column name that may contain dots. */
  private def q(name: String): Column = col(s"`$name`")

  /** P5 — drop rows where ANY column equals "unauthorized"
    * (`/root/reference/data_transform.py:24`). pandas `isin` compares via
    * equality across dtypes; cast-to-string equality reproduces it.
    * Sentinel parameterized for testing on fixtures.
    */
  def dropRowsContaining(df: DataFrame, sentinel: String = "unauthorized"): DataFrame = {
    val anyMatch =
      array_contains(array(df.columns.toIndexedSeq.map(c => q(c).cast("string")): _*), sentinel)
    // array_contains yields null (not false) when no hit but nulls present;
    // coalesce so null-bearing rows are kept, matching pandas ~isin(...).any
    df.filter(!coalesce(anyMatch, lit(false)))
  }

  /** P1 — keep exactly the configured columns, in declaration order
    * (`/root/reference/data_transform.py:31-32`). Catalyst turns this into
    * parquet column pruning — at scale the scan reads only these columns.
    */
  def projectColumns(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.map(q): _*)

  /** F5 — config-declared casts with pandas-coercion parity
    * (`/root/reference/data_transform.py:34-44`; semantics table in
    * SURVEY.md §1.2):
    *   int64:    to_numeric(coerce) → fillna(0) → astype(int64)  ("3.5"→3, "abc"→0, null→0)
    *   float64:  to_numeric(coerce) → fillna(0.0)
    *   datetime: to_datetime(coerce) → NaT on failure (null)
    *   string:   NaN→null, else string
    * ANSI-safe: `try_cast` never throws on malformed input, which is the
    * exact analogue of pandas errors="coerce".
    */
  def castColumn(c: Column, dtype: String): Column = dtype match {
    case "int64"          => coalesce(c.cast("string").try_cast("double"), lit(0.0)).cast("long")
    case "float64"        => coalesce(c.cast("string").try_cast("double"), lit(0.0))
    case "datetime64[ns]" => c.cast("string").try_cast("timestamp")
    case "string"         => c.cast("string")
    case other => throw new IllegalArgumentException(s"unknown dtype '$other'")
  }

  def castColumns(df: DataFrame, dtypes: Map[String, String]): DataFrame = {
    val cols = df.columns.map { name =>
      dtypes.get(name) match {
        case Some(dt) => castColumn(q(name), dt).as(name)
        case None     => q(name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** F3 — date-to-string formatting (`/root/reference/data_transform.py:71-76`):
    * fact dates → `yyyy-MM-dd`, content/window timestamps →
    * `yyyy-MM-dd'T'HH:mm:ss`.
    */
  def formatDates(df: DataFrame, dateCols: Seq[String], timestampCols: Seq[String]): DataFrame = {
    val dSet = dateCols.toSet
    val tSet = timestampCols.toSet
    val cols = df.columns.map {
      case n if dSet(n) => date_format(q(n), "yyyy-MM-dd").as(n)
      case n if tSet(n) => date_format(q(n), "yyyy-MM-dd'T'HH:mm:ss").as(n)
      case n            => q(n)
    }
    df.select(cols.toSeq: _*)
  }

  /** F4 — column-name sanitizer: every '.' becomes '&'
    * (`/root/reference/data_transform.py:152-173`), e.g.
    * `lfm.post.link` → `lfm&post&link`. Pure metadata — free at any scale.
    */
  def sanitizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.replace(".", "&")).toSeq: _*)
}
