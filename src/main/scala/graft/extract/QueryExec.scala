package graft.extract

import graft.spec.{DateMacro, ExportConfig}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native execution of the reference's analytic-query surface.
  *
  * The reference builds `{dataset_id, metrics, group_by, meta_dimensions,
  * filters, start_date, end_date}` and delegates evaluation to the
  * ListenFirst server (`/root/reference/data_extract.py:44-92`); pages come
  * back already filtered/grouped/aggregated. This engine evaluates the same
  * query shape natively over Spark tables:
  *
  *   scan → brand IN filter (P2) → date BETWEEN / lookback (P3/P4)
  *        → broadcast dim joins for meta_dimensions (§2.3)
  *        → groupBy(group_by).agg(metric registry) (A1)
  *
  * Scale notes (100 TB posture):
  *  - The brand/date predicates are plain Catalyst filters → pushed into the
  *    parquet scan (PushedFilters) and prune date-partitioned layouts.
  *  - Dimension tables are small by construction → `broadcast()` hash joins,
  *    no shuffle of the fact table.
  *  - The groupBy hash-aggregates with partial (map-side) combine; the only
  *    shuffle in the plan is on the group keys, which is irreducible.
  */
object QueryExec {

  /** A meta-dimension attach = broadcast left equi-join of facts to a dim
    * table carrying the requested attribute columns.
    */
  final case class DimJoin(dim: DataFrame, factKey: String, dimKey: String, attrs: Seq[String])

  /** Metric registry: metric name → aggregation expression. The reference
    * treats metric functions as opaque server-defined strings
    * (`/root/reference/data_extract.py:45-49`); here each name maps to a
    * Spark aggregate. Doubles are aggregated as decimals for exact,
    * order-independent sums.
    */
  type MetricRegistry = Map[String, String => Column]

  val defaultMetrics: MetricRegistry = Map(
    "sum" -> (c => sum(col(s"`$c`").cast("decimal(28,4)"))),
    "count" -> (c => count(col(s"`$c`"))),
    "count_distinct" -> (c => countDistinct(col(s"`$c`"))),
    "approx_count_distinct" -> (c => approx_count_distinct(col(s"`$c`"))),
    "min" -> (c => min(col(s"`$c`"))),
    "max" -> (c => max(col(s"`$c`"))),
    "avg" -> (c => avg(col(s"`$c`").cast("decimal(28,4)")))
  )

  /** Metric name convention: `"sum:lfm.col"` / `"avg:value"`; bare names
    * default to sum.
    */
  def metricColumn(metric: String, registry: MetricRegistry = defaultMetrics): Column =
    metric.split(":", 2) match {
      case Array(fn, c) if registry.contains(fn) => registry(fn)(c).as(metric)
      case _                                     => registry("sum")(metric).as(metric)
    }

  /** The reference's one piece of conditional query-building logic, as a
    * single path (`/root/reference/data_extract.py:60-73`): when the
    * dataset id contains `"content"`, (a) a `BETWEEN` on the fact date
    * narrows to the REQUESTED range (macros resolved through `format_date`,
    * F1), and (b) the query's own `start_date` is overridden to the
    * `{{nDaysAgo 365}}` lookback — so the effective window is
    * `[max(requestStart, today−365), requestEnd]`. Unresolvable request
    * dates throw (the reference raises; E1 catches per config upstream).
    */
  def runContent(
      facts: DataFrame,
      config: ExportConfig,
      brandCol: String,
      dateStrCol: String,
      requestStart: String,
      requestEnd: String,
      today: java.time.LocalDate,
      dims: Seq[DimJoin] = Seq.empty,
      registry: MetricRegistry = defaultMetrics
  ): DataFrame = {
    require(config.isContentDataset, s"${config.datasetId} is not a content dataset")
    def resolved(which: String, v: String): String =
      DateMacro.resolve(v, today)
        .getOrElse(throw new IllegalArgumentException(s"unresolvable $which: $v"))
    val narrowStart = resolved("start_date", requestStart)
    val narrowEnd = resolved("end_date", requestEnd)
    val narrowed =
      facts.filter(col(s"`$dateStrCol`").between(lit(narrowStart), lit(narrowEnd)))
    val lookbackStart = today.minusDays(365).format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE)
    run(narrowed, config, brandCol, dateStrCol, Some(lookbackStart), Some(narrowEnd), dims, registry)
  }

  def run(
      facts: DataFrame,
      config: ExportConfig,
      brandCol: String,
      dateCol: String,
      startDate: Option[String],
      endDate: Option[String],
      dims: Seq[DimJoin] = Seq.empty,
      registry: MetricRegistry = defaultMetrics
  ): DataFrame = {
    var df = facts
    if (config.brands.nonEmpty)
      df = df.filter(col(s"`$brandCol`").isin(config.brands: _*))
    (startDate, endDate) match {
      case (Some(s), Some(e)) =>
        df = df.filter(col(s"`$dateCol`").between(lit(s), lit(e)))
      case (Some(s), None) => df = df.filter(col(s"`$dateCol`") >= lit(s))
      case (None, Some(e)) => df = df.filter(col(s"`$dateCol`") <= lit(e))
      case _               =>
    }
    dims.foreach { dj =>
      val d = dj.dim.select((dj.dimKey +: dj.attrs).distinct.map(c => col(s"`$c`")): _*)
      df = df.join(broadcast(d), col(s"`${dj.factKey}`") === d(s"`${dj.dimKey}`"), "left")
        .drop(d(s"`${dj.dimKey}`"))
    }
    // Output shape is group_by ∪ meta_dimensions ∪ metrics
    // (`/root/reference/data_transform.py:31-32`): the server groups by the
    // meta-dimensions too — they are dimension attributes of the group keys.
    val groupCols = (config.groupBy.keys ++ config.metaDimensions.keys).toSeq.map(c => col(s"`$c`"))
    val metricCols = config.metrics.keys.toSeq.map(m => metricColumn(m, registry))
    if (groupCols.nonEmpty && metricCols.nonEmpty)
      df.groupBy(groupCols: _*).agg(metricCols.head, metricCols.tail: _*)
    else if (metricCols.nonEmpty) df.agg(metricCols.head, metricCols.tail: _*)
    else if (groupCols.nonEmpty) df.select(groupCols: _*).distinct()
    else df
  }
}
