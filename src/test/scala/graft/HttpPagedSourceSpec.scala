package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import graft.auth.CredentialProvider
import graft.sources.{HttpPageClient, PagedSource}

/** Contract spec for the HTTP pager behind the DSv2 source (VERDICT r10
  * #4): a loopback `com.sun.net.httpserver` stub serves the SAME
  * deterministic rows as the in-memory generator (`PagedSource.row` — one
  * source of truth), evaluates the wire-encoded filters/projection/limit/
  * group-by server-side, and the spec drives the full connector over real
  * HTTP: page fetches as InputPartitions, pushdown serialized into the
  * request, results byte-identical to generator mode. JDK-only on both
  * ends — the same seam treatment `BigQuerySink` got in round 8.
  */
class HttpPagedSourceSpec extends SparkSpec {

  private val TotalRows = 5000L
  private val Token = "lf-test-bearer-r12"
  private var server: HttpServer = _
  private var endpoint: String = _
  private var flakyEndpoint: String = _
  private var tokenFile: java.nio.file.Path = _
  /** every request's raw query string, for pushdown-reached-the-wire asserts */
  private val requests = new ConcurrentLinkedQueue[String]()
  /** every request's Authorization header (or "<none>"), for auth asserts */
  private val authHeaders = new ConcurrentLinkedQueue[String]()
  /** per-URI attempt counts on the flaky context (first attempt 500s) */
  private val flakyAttempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  override def beforeAll(): Unit = {
    super.beforeAll()
    tokenFile = java.nio.file.Files.createTempFile("graft-token", ".txt")
    java.nio.file.Files.write(tokenFile, s"$Token\n".getBytes(UTF_8))
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/analytics", new StubHandler(flakyFirst = false))
    server.createContext("/flaky", new StubHandler(flakyFirst = true))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/analytics"
    flakyEndpoint = s"http://127.0.0.1:${server.getAddress.getPort}/flaky"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    if (tokenFile != null) java.nio.file.Files.deleteIfExists(tokenFile)
    super.afterAll()
  }

  /** The stub "LFM server": deterministic corpus, server-side filter /
    * projection / limit / per-page group-by — the reference's execution
    * model over the wire format HttpPageClient speaks. Every request
    * must carry the bearer token (the reference's secret-backed LF auth,
    * `utils.py:78-92`) or is rejected 401; the `/flaky` context
    * additionally 500s the FIRST attempt at each URI to exercise the
    * per-page retry.
    */
  private final class StubHandler(flakyFirst: Boolean) extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      authHeaders.add(if (auth == null) "<none>" else auth)
      if (auth != s"Bearer $Token") {
        ex.sendResponseHeaders(401, -1); ex.close(); return
      }
      if (flakyFirst) {
        val key = ex.getRequestURI.toString
        val n = flakyAttempts.merge(key, 1, (a, b) => a + b)
        if (n == 1) { ex.sendResponseHeaders(500, -1); ex.close(); return }
      }
      val body =
        try respond(ex)
        catch { case e: Throwable => ex.sendResponseHeaders(500, -1); throw e }
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
      ex.close()
    }

    private def respond(ex: HttpExchange): String = {
      val raw = ex.getRequestURI.getRawQuery
      requests.add(if (raw == null) "" else raw)
      val params = HttpPageClient.parseQuery(raw)
      def one(k: String): Option[String] = params.collectFirst { case (`k`, v) => v }
      if (one("meta").contains("1")) return TotalRows.toString

      val page = one("page").get.toInt
      val pageSize = one("pageSize").get.toInt
      val filters = HttpPageClient.decodeFilters(params.collect { case ("filter", v) => v })
      val start = page.toLong * pageSize
      val end = math.min(start + pageSize, TotalRows)
      val rows = (start until end).iterator
        .map(PagedSource.row)
        .filter(PagedSource.accept(filters, _))

      one("aggs") match {
        case Some(aggSpecs) =>
          val groupCols = one("groupBy").map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
          val specs = aggSpecs.split(',').toSeq
          // per-page partial aggregation, insertion-ordered groups
          val acc = scala.collection.mutable.LinkedHashMap
            .empty[Seq[String], (Long, Double, Double, Double)]
          rows.foreach { r =>
            val key = groupCols.map {
              case "brand_id" => r._1.toString
              case "date_str" => r._2
            }
            val (c, s, mn, mx) =
              acc.getOrElse(key, (0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
            acc(key) = (c + 1, s + r._3, math.min(mn, r._3), math.max(mx, r._3))
          }
          acc.iterator
            .map { case (key, (c, s, mn, mx)) =>
              val aggVals = specs.map {
                case "count:*" | "count:metric" => c.toString
                case "sum:metric"               => s.toString
                case "min:metric"               => mn.toString
                case "max:metric"               => mx.toString
                case other                      => throw new IllegalArgumentException(other)
              }
              (key ++ aggVals).mkString(",")
            }
            .mkString("\n")
        case None =>
          val cols = one("cols").map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
          val capped = one("limit").map(_.toInt).fold(rows)(rows.take)
          capped
            .map { r =>
              cols
                .map {
                  case "brand_id" => r._1.toString
                  case "date_str" => r._2
                  case "metric"   => r._3.toString
                }
                .mkString(",")
            }
            .mkString("\n")
      }
    }
  }

  private def http = spark.read
    .format("graft.sources.PagedSource")
    .option("endpoint", endpoint)
    // the mounted-secret auth shape: the token FILE path rides the plan,
    // readers re-read it executor-side (CredentialProvider.fromFile)
    .option("tokenFile", tokenFile.toString)
    .option("pageSize", "500")
    .load()

  private def generated = spark.read
    .format("graft.sources.PagedSource")
    .option("rows", TotalRows.toString)
    .option("pageSize", "500")
    .load()

  test("full scan over HTTP: pages -> partitions, rows identical to generator mode") {
    requests.clear(); authHeaders.clear()
    val rows = http.collect()
    assert(rows.length == TotalRows)
    assert(rows.toSeq.map(_.toSeq).toSet == generated.collect().toSeq.map(_.toSeq).toSet)
    // 10 page fetches (+1 meta); every page request carried the full projection
    val pageReqs = requests.asScala.filter(_.contains("page="))
    assert(pageReqs.size == 10)
    assert(pageReqs.forall(_.contains("cols=brand_id%2Cdate_str%2Cmetric")))
    // every request — the driver-side meta probe AND all executor-side
    // page fetches — carried the bearer from the token file
    assert(authHeaders.size >= 11)
    assert(authHeaders.asScala.forall(_ == s"Bearer $Token"), authHeaders.asScala.toSet)
  }

  test("missing or wrong bearer -> 401 surfaces as a clear auth error, not a retry storm") {
    authHeaders.clear()
    val unauthed = new HttpPageClient(endpoint, CredentialProvider.none)
    val e1 = intercept[IllegalStateException] { unauthed.totalRows() }
    assert(e1.getMessage.contains("401") && e1.getMessage.contains("GRAFT_AUTH_TOKEN"))
    val wrong = new HttpPageClient(endpoint, CredentialProvider.static("not-the-token"))
    val e2 = intercept[IllegalStateException] { wrong.totalRows() }
    assert(e2.getMessage.contains("401"))
    // deterministic failures: exactly one request each, zero retries
    assert(authHeaders.size == 2, authHeaders.asScala.toSeq)
  }

  test("a transient 500 retries the single page, not the whole scan") {
    requests.clear(); flakyAttempts.clear()
    val client =
      new HttpPageClient(flakyEndpoint, CredentialProvider.static(Token), retryBaseMillis = 1)
    // first attempt 500s, retry succeeds — same URI fetched twice
    assert(client.totalRows() == TotalRows)
    assert(flakyAttempts.get("/flaky?meta=1") == 2)
    val lines = client.fetchLines(Seq(
      "page" -> "0", "pageSize" -> "500", "cols" -> "brand_id,date_str,metric")).toVector
    assert(lines.size == 500)
  }

  test("retries are bounded: a persistent 500 fails after maxRetries") {
    flakyAttempts.clear()
    // maxRetries=0 against the first-attempt-500 URI: the one 500 must
    // surface immediately (bounded), with the retry budget in the message
    val noRetry = new HttpPageClient(
      flakyEndpoint, CredentialProvider.static(Token), maxRetries = 0, retryBaseMillis = 1)
    val e = intercept[IllegalStateException] { noRetry.totalRows() }
    assert(e.getMessage.contains("HTTP 500"))
    assert(flakyAttempts.get("/flaky?meta=1") == 1)
  }

  test("tokenFile resolution: explicit file wins; missing file fails loudly") {
    assert(CredentialProvider.fromFile(tokenFile.toString).token().contains(Token))
    val gone = tokenFile.getParent.resolve("graft-no-such-token.txt").toString
    val e = intercept[IllegalStateException] { CredentialProvider.fromFile(gone).token() }
    assert(e.getMessage.contains("not readable"))
  }

  test("resolver precedence: property beats file-property; absent everything -> None") {
    // no other suite reads the resolver during tests (both HTTP specs
    // inject their provider), so scoped property mutation is race-free
    val saveTok = sys.props.get("graft.auth.token")
    val saveFile = sys.props.get("graft.auth.tokenFile")
    try {
      sys.props("graft.auth.token") = "prop-tok"
      sys.props("graft.auth.tokenFile") = tokenFile.toString
      assert(CredentialProvider.resolve.token().contains("prop-tok"))
      sys.props.remove("graft.auth.token")
      assert(CredentialProvider.resolve.token().contains(Token))
      sys.props.remove("graft.auth.tokenFile")
      // the env vars are unset in the test JVM, so nothing resolves
      if (!sys.env.contains("GRAFT_AUTH_TOKEN") && !sys.env.contains("GRAFT_AUTH_TOKEN_FILE"))
        assert(CredentialProvider.resolve.token().isEmpty)
    } finally {
      saveTok.fold(sys.props.remove("graft.auth.token"): Unit)(v => sys.props("graft.auth.token") = v)
      saveFile.fold(sys.props.remove("graft.auth.tokenFile"): Unit)(v => sys.props("graft.auth.tokenFile") = v)
    }
  }

  test("filter pushdown reaches the wire and the plan drops the residual") {
    requests.clear()
    val q = http.filter(col("brand_id").isin(1, 2) && col("date_str") >= "2024-01-10")
    val out = q.collect()
    val expected = generated
      .filter(col("brand_id").isin(1, 2) && col("date_str") >= "2024-01-10")
      .collect()
    assert(out.toSeq.map(_.toSeq).toSet == expected.toSeq.map(_.toSeq).toSet)
    assert(out.nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("brand_id") && plan.contains("graft_paged_source"))
    val pageReqs = requests.asScala.filter(_.contains("page="))
    assert(pageReqs.nonEmpty)
    // wire carries both predicates (URL-encoded filter specs)
    assert(pageReqs.forall(r => r.contains("filter=brand_id%3Ain%3A1%7C2")))
    assert(pageReqs.forall(r => r.contains("filter=date_str%3Age%3A2024-01-10")))
  }

  test("column pruning reaches the wire") {
    requests.clear()
    val out = http.select("metric").collect()
    assert(out.length == TotalRows)
    val pageReqs = requests.asScala.filter(_.contains("page="))
    assert(pageReqs.forall(_.contains("cols=metric")))
    assert(pageReqs.forall(r => !r.contains("brand_id")))
  }

  test("limit pushdown plans only the needed pages") {
    requests.clear()
    val out = http.limit(700).collect()
    assert(out.length == 700)
    // ceil(700/500) = 2 page fetches, each row-capped server-side
    val pageReqs = requests.asScala.filter(_.contains("page="))
    assert(pageReqs.size == 2, s"expected 2 page fetches, got $pageReqs")
    assert(pageReqs.forall(_.contains("limit=700")))
  }

  test("partial aggregation pushdown: server pages back pre-aggregated rows") {
    requests.clear()
    val q = http.groupBy("brand_id").agg(
      sum("metric").as("s"), count(lit(1)).as("n"), min("metric").as("mn"), max("metric").as("mx"))
    val out = q.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val expected = generated.groupBy("brand_id").agg(
      sum("metric").as("s"), count(lit(1)).as("n"), min("metric").as("mn"), max("metric").as("mx"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(out == expected && out.size == 97)
    assert(q.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    val pageReqs = requests.asScala.filter(_.contains("page="))
    assert(pageReqs.nonEmpty)
    assert(pageReqs.forall(r => r.contains("groupBy=brand_id") && r.contains("aggs=")))
  }

  test("filter encode/decode round-trips every pushable shape") {
    import org.apache.spark.sql.sources._
    val filters: Seq[Filter] = Seq(
      In("brand_id", Array(1L, 2L, 3L)),
      EqualTo("brand_id", 7L),
      GreaterThan("date_str", "2024-01-03"),
      GreaterThanOrEqual("date_str", "2024-01-04"),
      LessThan("brand_id", 50L),
      LessThanOrEqual("date_str", "2024-01-20"))
    val decoded = HttpPageClient.decodeFilters(HttpPageClient.encodeFilters(filters))
    // value-level equivalence via the single accept() definition
    val probe = Seq.tabulate(200)(i => PagedSource.row(i.toLong * 131))
    probe.foreach { r =>
      assert(
        PagedSource.accept(filters, r) == PagedSource.accept(decoded, r),
        s"accept drift for $r")
    }
  }
}
