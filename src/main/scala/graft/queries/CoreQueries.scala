package graft.queries

import graft.extract.QueryExec
import graft.spec.ExportConfig
import graft.transform.{TagPivot, Transforms}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Reference-parity operator inventory (SURVEY.md §2) as registered
  * queries. Each maps a §2 line item to its Spark-first implementation and
  * a DuckDB oracle.
  */
object CoreQueries {
  import Tables.t

  /** §3.2 end-to-end analytic query through the engine's spec→extract path:
    * brand IN filter (P2) + date range (P3) + meta-dimension broadcast join
    * (§2.3) + group-by metric aggregation (A1), driven by an ExportConfig.
    */
  private val analyticConfig = ExportConfig(
    configId = "daily_demo",
    datasetId = "dataset_content_demo",
    metrics = ListMap("sum:value" -> "float64", "count:event_id" -> "int64"),
    groupBy = ListMap("day" -> "datetime64[ns]", "event_type" -> "string"),
    metaDimensions = ListMap("c_mktsegment" -> "string"),
    brands = Seq(3L, 7L, 11L, 19L, 23L, 42L, 57L, 99L, 101L, 148L)
  )

  def analyticExec(s: SparkSession, dir: String): DataFrame = {
    val facts = t(s, dir, "events").withColumn("day", date_trunc("day", col("ts")))
    QueryExec
      .run(
        facts,
        analyticConfig,
        brandCol = "user_id",
        dateCol = "day",
        startDate = Some("2024-01-05"),
        endDate = Some("2024-01-25"),
        dims = Seq(QueryExec.DimJoin(t(s, dir, "customer"), "user_id", "c_custkey", Seq("c_mktsegment")))
      )
      .withColumn("sum_value", col("`sum:value`").cast("double"))
      .withColumn("n_events", col("`count:event_id`"))
      .drop("sum:value", "count:event_id")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    // ---- flagship: the reference's whole query surface in one plan ----
    "q_analytic_exec" -> QueryDef(
      analyticExec,
      Some("""SELECT date_trunc('day', e.ts) AS day, e.event_type, c.c_mktsegment,
             |CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value,
             |COUNT(e.event_id) AS n_events
             |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
             |WHERE e.user_id IN (3,7,11,19,23,42,57,99,101,148)
             |  AND date_trunc('day', e.ts) BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-25'
             |GROUP BY 1, 2, 3""".stripMargin),
      "ExportConfig-driven: P2+P3+dim join+A1"
    ),

    // ---- content-dataset date rewrite as ONE reference-semantic path
    //      (data_extract.py:60-73): request range resolved via nDaysAgo
    //      macros → BETWEEN on the fact date string, plus the 365-day
    //      lookback override; driven end-to-end by a content ExportConfig.
    //      `today` is injected (2024-02-20) for determinism, so
    //      {{nDaysAgo 45}}..{{nDaysAgo 10}} = 2024-01-06..2024-02-10 and
    //      the lookback floor is 2023-02-20 ----
    "q_content_rewrite" -> QueryDef(
      (s, d) => {
        // redundant raw-ts range over the same window ([start, end+1d) in
        // UTC): the string BETWEEN below carries the exact semantics but
        // can't push through date_format, while this long-column range
        // reaches the parquet scan for row-group pruning
        val facts = Tables.eventsRanged(s, d, Some("2024-01-06"), Some("2024-02-11"))
          .withColumn("lfm.fact.date_str", date_format(col("ts"), "yyyy-MM-dd"))
        val cfg = ExportConfig(
          configId = "content_demo",
          datasetId = "brand_content_daily",
          metrics = ListMap("sum:value" -> "float64", "count:event_id" -> "int64"),
          groupBy = ListMap("lfm.fact.date_str" -> "string"),
          metaDimensions = ListMap.empty,
          brands = Seq(2L, 3L, 5L, 7L, 11L, 13L)
        )
        QueryExec
          .runContent(
            facts, cfg,
            brandCol = "user_id", dateStrCol = "lfm.fact.date_str",
            requestStart = "{{nDaysAgo 45}}", requestEnd = "{{nDaysAgo 10}}",
            today = java.time.LocalDate.parse("2024-02-20"))
          .select(
            col("`lfm.fact.date_str`").as("date_str"),
            col("`sum:value`").cast("double").as("sum_value"),
            col("`count:event_id`").as("n_events"))
      },
      Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS date_str,
             |CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value,
             |COUNT(event_id) AS n_events
             |FROM events
             |WHERE user_id IN (2,3,5,7,11,13)
             |  AND strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') BETWEEN '2024-01-06' AND '2024-02-10'
             |  AND strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') >= '2023-02-20'
             |GROUP BY 1""".stripMargin),
      "content-dataset BETWEEN + 365-day lookback rewrite (P3/P4 composed)"
    ),

    // ---- §3.3: the reference's transform pipeline COMPOSED (P5 sentinel
    //      drop → P1 project → F5 coercion casts → F3 date format → F4
    //      name sanitize) — one lazy plan, Catalyst fuses it into a single
    //      codegen'd project+filter over the scan ----
    "q_transform_chain" -> QueryDef(
      (s, d) => {
        val raw = t(s, d, "events")
          .withColumn("lfm.event.k", get_json_object(col("props"), "$.k"))
        val chained =
          Transforms.sanitizeColumnNames(
            Transforms.formatDates(
              Transforms.castColumns(
                Transforms.projectColumns(
                  Transforms.dropRowsContaining(raw, sentinel = "error"),
                  Seq("event_id", "event_type", "ts", "lfm.event.k", "value")),
                Map("lfm.event.k" -> "int64", "value" -> "float64")),
              dateCols = Seq.empty, timestampCols = Seq("ts")))
        chained.withColumnRenamed("lfm&event&k", "lfm_amp_event_amp_k")
      },
      // the rename only exists because parquet column names with '&' are
      // fine but the oracle compare is simpler on a plain identifier; the
      // sanitizer itself is exercised (lfm.event.k → lfm&event&k)
      Some("""SELECT event_id, event_type,
             |strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS ts,
             |CAST(coalesce(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0) AS BIGINT) AS lfm_amp_event_amp_k,
             |coalesce(TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE), 0) AS value
             |FROM events
             |WHERE NOT (coalesce(CAST(event_id AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(ts AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(user_id AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(event_type AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(value AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(props AS VARCHAR) = 'error', false))""".stripMargin),
      "reference 7-stage transform pipeline fused into one plan"
    ),

    // ---- A1: daily metric rollup (§7.3 minimum slice) ----
    "q_daily_rollup" -> QueryDef(
      (s, d) =>
        Tables.eventsRanged(s, d, Some("2024-01-05"), Some("2024-01-20"))
          .filter(col("user_id").isin(2, 3, 5, 7, 11, 13))
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
            count(lit(1)).as("n_events")
          ),
      Some("""SELECT date_trunc('day', ts) AS day, event_type,
             |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             |COUNT(*) AS n_events
             |FROM events
             |WHERE user_id IN (2,3,5,7,11,13)
             |  AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
             |GROUP BY 1, 2""".stripMargin)
    ),

    // ---- P1: projection + reorder ----
    "q_project_reorder" -> QueryDef(
      (s, d) =>
        Transforms.projectColumns(
          t(s, d, "lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        ),
      Some("SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem")
    ),

    // ---- P2: IN-list predicate ----
    "q_in_filter" -> QueryDef(
      (s, d) =>
        t(s, d, "customer")
          .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
          .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE c_mktsegment IN ('AUTOMOBILE','BUILDING')""".stripMargin)
    ),

    // ---- P3: BETWEEN date predicate (pushed to the parquet scan) ----
    "q_between_dates" -> QueryDef(
      (s, d) =>
        t(s, d, "lineitem")
          .filter(
            col("l_shipdate").between(
              lit("1998-01-01").cast("timestamp"),
              lit("1998-12-31").cast("timestamp")
            )
          )
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty")
          ),
      Some("""SELECT l_returnflag, COUNT(*) AS n_items,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-12-31'
             |GROUP BY 1""".stripMargin)
    ),

    // ---- P4: lookback window from an (injected) anchor date ----
    "q_lookback" -> QueryDef(
      // anchor 2024-01-31 − 14 days = 2024-01-17, resolved driver-side
      // (DateMacro-style) so the bound pushes to the scan as a long range
      (s, d) =>
        Tables.eventsRanged(s, d, Some("2024-01-17"), None)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events")),
      Some("""SELECT event_type, COUNT(*) AS n_events FROM events
             |WHERE ts >= TIMESTAMP '2024-01-31' - INTERVAL 14 DAY
             |GROUP BY 1""".stripMargin)
    ),

    // ---- P5: any-column sentinel row filter ----
    "q_drop_sentinel" -> QueryDef(
      (s, d) =>
        Transforms
          .dropRowsContaining(t(s, d, "events"), sentinel = "error")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events")),
      Some("""SELECT event_type, COUNT(*) AS n_events FROM events
             |WHERE NOT (coalesce(CAST(event_id AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(ts AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(user_id AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(event_type AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(value AS VARCHAR) = 'error', false)
             |  OR coalesce(CAST(props AS VARCHAR) = 'error', false))
             |GROUP BY 1""".stripMargin)
    ),

    // ---- F5: pandas-parity cast coercion ("3.5"→3, junk→0, null→0) ----
    "q_cast_coercion" -> QueryDef(
      (s, d) =>
        t(s, d, "events").select(
          col("event_id"),
          Transforms.castColumn(get_json_object(col("props"), "$.k"), "int64").as("k_int"),
          Transforms.castColumn(col("event_type"), "int64").as("junk_int"),
          Transforms.castColumn(col("value"), "float64").as("value_f")
        ),
      Some("""SELECT event_id,
             |CAST(trunc(coalesce(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0)) AS BIGINT) AS k_int,
             |CAST(trunc(coalesce(TRY_CAST(event_type AS DOUBLE), 0)) AS BIGINT) AS junk_int,
             |coalesce(TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE), 0) AS value_f
             |FROM events""".stripMargin)
    ),

    // ---- F3: date-to-string formatting ----
    "q_date_format" -> QueryDef(
      (s, d) =>
        t(s, d, "orders").select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_str")
        ),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d_str,
             |strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS ts_str FROM orders""".stripMargin)
    ),

    // ---- F4: column-name sanitizer ('.' → '&') ----
    "q_sanitize_names" -> QueryDef(
      (s, d) =>
        Transforms.sanitizeColumnNames(
          t(s, d, "lineitem").select(
            col("l_orderkey").as("lfm.fact.orderkey"),
            col("l_quantity").as("lfm.fact.quantity")
          )
        ),
      Some("""SELECT l_orderkey AS "lfm&fact&orderkey", l_quantity AS "lfm&fact&quantity"
             |FROM lineitem""".stripMargin)
    ),

    // ---- §2.3: meta-dimension attach = broadcast snowflake join ----
    "q_dim_join" -> QueryDef(
      (s, d) => {
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            count(lit(1)).as("n_customers"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal")
          )
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_customers,
             |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2""".stripMargin)
    ),

    // ---- large-large equi-join (shuffle join on the fact keys) ----
    "q_join_large" -> QueryDef(
      (s, d) => {
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_items"),
            sum(
              col("l_extendedprice").cast("decimal(18,2)") *
                (lit(1).cast("decimal(8,2)") - col("l_discount").cast("decimal(8,2)"))
            ).cast("double").as("revenue")
          )
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |  (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |GROUP BY 1""".stripMargin)
    ),

    // ---- semi / anti joins ----
    "q_semi_join" -> QueryDef(
      (s, d) => {
        val o = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
        t(s, d, "customer")
          .join(o, col("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""".stripMargin)
    ),
    // Orders side is filtered so the anti-join is non-vacuous on this fixture
    // (every customer has at least one order, but not one above the threshold).
    "q_anti_join" -> QueryDef(
      (s, d) => {
        val o = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
        t(s, d, "customer")
          .join(o, col("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""".stripMargin)
    ),

    // ---- window functions ----
    "q_window_topk_group" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
             |  FROM orders) WHERE rn <= 3""".stripMargin)
    ),
    "q_window_lag" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, d, "orders").select(
          col("o_custkey"),
          col("o_orderkey"),
          lag("o_orderkey", 1).over(w).as("prev_orderkey"),
          lag("o_totalprice", 1).over(w).as("prev_price")
        )
      },
      Some("""SELECT o_custkey, o_orderkey,
             |lag(o_orderkey) OVER w AS prev_orderkey,
             |lag(o_totalprice) OVER w AS prev_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)
    ),
    "q_window_rolling" -> QueryDef(
      (s, d) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(-2, 0)
        t(s, d, "orders").select(
          col("o_custkey"),
          col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("roll_sum")
        )
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum
             |FROM orders""".stripMargin)
    ),

    // ---- global top-k (TakeOrderedAndProject, no full sort at scale) ----
    "q_topk_global" -> QueryDef(
      (s, d) =>
        t(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
    ),

    // ---- set operations (S2 page-union generalized) ----
    "q_union_all" -> QueryDef(
      (s, d) => {
        val c = t(s, d, "customer")
        c.filter(col("c_mktsegment") === "AUTOMOBILE")
          .select(col("c_custkey"), lit("auto").as("src"))
          .unionByName(
            c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"), lit("rich").as("src"))
          )
      },
      Some("""SELECT c_custkey, 'auto' AS src FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |UNION ALL
             |SELECT c_custkey, 'rich' AS src FROM customer WHERE c_acctbal > 5000""".stripMargin)
    ),
    "q_intersect" -> QueryDef(
      (s, d) => {
        val c = t(s, d, "customer")
        c.filter(col("c_mktsegment") === "AUTOMOBILE")
          .select("c_custkey")
          .intersect(c.filter(col("c_acctbal") > 0.0).select("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |INTERSECT
             |SELECT c_custkey FROM customer WHERE c_acctbal > 0""".stripMargin)
    ),
    "q_except" -> QueryDef(
      (s, d) => {
        val c = t(s, d, "customer")
        c.filter(col("c_mktsegment") === "AUTOMOBILE")
          .select("c_custkey")
          .except(c.filter(col("c_acctbal") > 0.0).select("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |EXCEPT
             |SELECT c_custkey FROM customer WHERE c_acctbal > 0""".stripMargin)
    ),

    // ---- distinct / grouping sets ----
    "q_distinct" -> QueryDef(
      (s, d) => t(s, d, "customer").select("c_mktsegment", "c_nationkey").distinct(),
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer")
    ),
    "q_rollup" -> QueryDef(
      (s, d) =>
        t(s, d, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty")
          ),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
    ),
    "q_cube" -> QueryDef(
      (s, d) =>
        t(s, d, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price")
          ),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)
    ),
    "q_count_distinct" -> QueryDef(
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            count(lit(1)).as("n_items")
          ),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_items
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),

    // ---- sketch aggregate: HLL. The sketch value is approximate by
    //      construction, so the oracle asserts its CONTRACT instead of
    //      its value: per group, |approx − exact| ≤ 3·rsd·exact (rsd =
    //      0.05, Spark's default) must hold — Spark emits the measured
    //      verdict, DuckDB emits TRUE from the exact count, and the hash
    //      compare fails iff the sketch ever drifts out of bound. ----
    "q_approx_count_distinct" -> QueryDef(
      (s, d) =>
        // Dedup the (group, value) pairs FIRST, then aggregate plainly:
        // mixing countDistinct with a non-distinct aggregate plans an
        // Expand + value-keyed partial agg (60M rows doubled, 936 MB
        // shuffle, 2 GB spill at the 100× fixture — r14 forced-bench
        // finding). The HLL sketch is insertion-idempotent (registers
        // are maxes), so approx_count_distinct over the deduped pairs is
        // bit-identical to the multiset sketch, the exact count becomes
        // a plain count, and the one shuffle carries the map-side-
        // combined distinct pairs.
        t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_partkey"))
          .distinct()
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_partkey")).as("__approx"),
            count(lit(1)).as("__exact"))
          .select(
            col("l_returnflag"),
            (abs(col("__approx") - col("__exact")).cast("double") <=
              lit(3 * 0.05) * col("__exact").cast("double")).as("within_bound")),
      Some("""SELECT l_returnflag, TRUE AS within_bound
             |FROM lineitem GROUP BY 1""".stripMargin),
      "HLL sketch checked against its 3·rsd error contract per group"
    ),

    // ---- tumbling time window (batch shape of the streaming agg) ----
    "q_tumbling_window" -> QueryDef(
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value")
          )
          .select(col("w.start").as("ws"), col("event_type"), col("n_events"), col("sum_value")),
      Some("""SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n_events,
             |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)
    ),

    // hopping (sliding) windows: duration 10 min, slide 5 min — every
    // event lands in exactly 2 overlapping windows. Spark assigns both
    // memberships in ONE projection (the window generator explodes to
    // duration/slide rows) followed by the same single hash-agg as the
    // tumbling case; the oracle replays membership as floor-div µs math.
    "q_hopping_window" -> QueryDef(
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("w.start").as("ws"), col("event_type"), col("n_events")),
      Some("""WITH e AS (
             |  SELECT make_timestamp(((epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) - g.kk) * 300000000) AS ws,
             |         event_type
             |  FROM events, LATERAL (SELECT unnest([0, 1]) AS kk) g
             |)
             |SELECT ws, event_type, COUNT(*) AS n_events FROM e GROUP BY 1, 2""".stripMargin)
    ),

    // ---- F2+A2+§2.9: nested tag parse + dynamic pivot (golden-tested;
    //      dynamic columns are not DuckDB-expressible — rows-only here) ----
    "q_tag_pivot" -> QueryDef(
      (s, _) => {
        import s.implicits._
        val raw = Seq(
          (1L, Seq("Campaign: holiday", "Campaign: retail", "Franchise: x", "untagged-note")),
          (2L, Seq.empty[String]),
          (3L, Seq("Key Name: v", "Campaign: spring"))
        ).toDF("id", "lfm.content.tags")
        Transforms.sanitizeColumnNames(TagPivot.pivotTags(raw, "lfm.content.tags"))
      },
      // the input is an inline literal (the fixtures carry no tag arrays),
      // so the oracle replays the full parse semantics over the same
      // VALUES: first-colon split, spaces→underscores in keys, colon-less
      // items → untitled, duplicate keys //-joined in list order
      Some("""WITH raw AS (
             |  SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), ['Campaign: holiday', 'Campaign: retail', 'Franchise: x', 'untagged-note']),
             |    (CAST(2 AS BIGINT), CAST([] AS VARCHAR[])),
             |    (CAST(3 AS BIGINT), ['Key Name: v', 'Campaign: spring'])) AS t(id, tags)
             |), kv AS (
             |  SELECT id, g.i AS i,
             |    CASE WHEN instr(tags[g.i], ':') > 0
             |      THEN replace(trim(split_part(tags[g.i], ':', 1)), ' ', '_')
             |      ELSE 'untitled' END AS k,
             |    CASE WHEN instr(tags[g.i], ':') > 0
             |      THEN trim(substr(tags[g.i], instr(tags[g.i], ':') + 1))
             |      ELSE trim(tags[g.i]) END AS v
             |  FROM raw, LATERAL (SELECT unnest(generate_series(1, len(tags))) AS i) g
             |), agg AS (
             |  SELECT id, k, string_agg(v, '//' ORDER BY i) AS vv FROM kv GROUP BY 1, 2
             |)
             |SELECT r.id,
             |  max(CASE WHEN k = 'Campaign' THEN vv END) AS "lfm&content&tags&Campaign",
             |  max(CASE WHEN k = 'Franchise' THEN vv END) AS "lfm&content&tags&Franchise",
             |  max(CASE WHEN k = 'Key_Name' THEN vv END) AS "lfm&content&tags&Key_Name",
             |  max(CASE WHEN k = 'untitled' THEN vv END) AS "lfm&content&tags&untitled"
             |FROM raw r LEFT JOIN agg a ON a.id = r.id
             |GROUP BY r.id""".stripMargin),
      "dynamic-column pivot; golden-file spec in TagPivotSpec"
    )
  )
}

/** SQL-surface queries (`spark.sql` over registered views) — the engine's
  * second query interface next to the DataFrame combinators. Same oracle
  * discipline: decimal math inside, double/bigint at the boundary.
  */
object SqlQueries {
  import Tables.t
  import org.apache.spark.sql.{DataFrame, SparkSession}

  private def withViews(s: SparkSession, d: String, names: String*)(sql: String): DataFrame = {
    names.foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    // correlated EXISTS subquery (Catalyst rewrites to a left semi join)
    "q_sql_exists" -> QueryDef(
      (s, d) =>
        withViews(s, d, "customer", "orders")(
          """SELECT c_custkey, c_name FROM customer c
            |WHERE EXISTS (
            |  SELECT 1 FROM orders o
            |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin),
      "correlated EXISTS → left semi join"
    ),

    // scalar subquery in the predicate (broadcast single-row subplan)
    "q_sql_scalar_subquery" -> QueryDef(
      (s, d) =>
        withViews(s, d, "orders")(
          """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
            |FROM orders
            |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
            |  (SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * CAST(1.8 AS DECIMAL(3,1)) FROM orders)""".stripMargin),
      Some("""SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
             |FROM orders
             |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
             |  (SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * CAST(1.8 AS DECIMAL(3,1)) FROM orders)""".stripMargin),
      "scalar aggregate subquery predicate (decimal-exact threshold)"
    ),

    // explicit cross join (the remaining join type): tiny dims only —
    // a cross join's row count is the product by construction
    "q_sql_cross_join" -> QueryDef(
      (s, d) =>
        withViews(s, d, "region", "nation")(
          """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n""".stripMargin),
      Some("SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n"),
      "cross join of bounded dimension tables"
    ),

    // TPC-H Q3 shape: segment-filtered revenue ranking (join-heavy SQL path)
    "q_sql_revenue_topn" -> QueryDef(
      (s, d) =>
        withViews(s, d, "customer", "orders", "lineitem")(
          """SELECT o_orderkey,
            |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            |  (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
            |FROM customer JOIN orders ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE c_mktsegment = 'BUILDING'
            |  AND o_orderdate < TIMESTAMP '1998-01-01'
            |  AND l_shipdate > TIMESTAMP '1998-01-01'
            |GROUP BY o_orderkey
            |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin
        ),
      Some("""SELECT o_orderkey,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |  (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY o_orderkey
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
    ),
    "q_sql_grouping_sets" -> QueryDef(
      (s, d) =>
        withViews(s, d, "lineitem")(
          """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin
        ),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    ),
    // window-function suite: lead / dense_rank / ntile / running sum over
    // one frame spec
    "q_sql_window_suite" -> QueryDef(
      (s, d) =>
        withViews(s, d, "orders")(
          """SELECT o_custkey, o_orderkey,
            |  lead(o_orderkey) OVER w AS next_orderkey,
            |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
            |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
            |FROM orders
            |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin
        ),
      Some("""SELECT o_custkey, o_orderkey,
             |  lead(o_orderkey) OVER w AS next_orderkey,
             |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)
    ),
    // date arithmetic family (datediff / date_add / calendar extraction)
    "q_date_arith" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions._
        Tables.t(s, d, "orders").select(
          col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1997-01-01").cast("timestamp")).cast("long").as("days_since"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end")
        )
      },
      Some("""SELECT o_orderkey,
             |CAST(date_diff('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
             |strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
             |CAST(year(o_orderdate) AS BIGINT) AS yr,
             |CAST(month(o_orderdate) AS BIGINT) AS mo,
             |CAST(day(o_orderdate) AS BIGINT) AS dom,
             |strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
             |FROM orders""".stripMargin)
    ),
    // conditional aggregation (count_if / filtered sums)
    "q_conditional_agg" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions._
        Tables.t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count_if(col("l_quantity") > 25).as("n_bulk"),
            count_if(col("l_discount") === 0.0).as("n_nodisc"),
            sum(when(col("l_tax") > 0.05, col("l_quantity").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("taxed_qty")
          )
      },
      Some("""SELECT l_returnflag,
             |COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
             |COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
             |CAST(SUM(CASE WHEN l_tax > 0.05 THEN CAST(l_quantity AS DECIMAL(18,2))
             |  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS taxed_qty
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),
    // regexp extraction (group capture)
    "q_regexp_extract" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions._
        Tables.t(s, d, "customer").select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
          regexp_extract(col("c_mktsegment"), "^([A-Z]+)", 1).as("seg_word")
        )
      },
      Some("""SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
             |regexp_extract(c_mktsegment, '^([A-Z]+)', 1) AS seg_word
             |FROM customer""".stripMargin)
    ),
    // JSON struct parse (from_json typed extraction — the engine-native
    // form of the reference's driver-side json.loads)
    "q_json_parse" -> QueryDef(
      (s, d) =>
        Tables.t(s, d, "events").select(
          org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.from_json(
            org.apache.spark.sql.functions.col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")
          ).getField("k").cast("long").as("k_val")
        ),
      Some("""SELECT event_id, CAST(TRY_CAST(json_extract_string(props, '$.k') AS INT) AS BIGINT) AS k_val
             |FROM events""".stripMargin)
    ),
    // static pivot (RelationalGroupedDataset.pivot with a fixed value
    // list — the one-pass variant of the dynamic tag pivot)
    "q_static_pivot" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions._
        Tables.t(s, d, "customer")
          .groupBy("c_nationkey")
          .pivot("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "MACHINERY"))
          .agg(count(lit(1)))
          .select(
            col("c_nationkey"),
            coalesce(col("AUTOMOBILE"), lit(0L)).as("n_auto"),
            coalesce(col("BUILDING"), lit(0L)).as("n_build"),
            coalesce(col("MACHINERY"), lit(0L)).as("n_mach")
          )
      },
      Some("""SELECT c_nationkey,
             |CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS BIGINT) AS n_auto,
             |CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS BIGINT) AS n_build,
             |CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS BIGINT) AS n_mach
             |FROM customer GROUP BY 1""".stripMargin)
    ),
    // deterministic collection aggregate: sorted list per group,
    // stringified at the output boundary — the driver's pandas comparator
    // cannot hash raw array cells, so both engines emit a CSV string
    "q_collect_sorted" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions._
        Tables.t(s, d, "customer")
          .groupBy("c_nationkey")
          .agg(
            array_join(sort_array(collect_list(col("c_custkey"))).cast("array<string>"), ",")
              .as("custkeys_csv"))
      },
      Some("""SELECT c_nationkey, array_to_string(list_sort(list(c_custkey)), ',') AS custkeys_csv
             |FROM customer GROUP BY 1""".stripMargin)
    )
  )
}
