package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.auth.CredentialProvider
import graft.load.{BigQuerySink, HttpBigQueryLoadClient, Sink}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Contract spec for the HTTP BigQuery load-job client — the last
  * environment-bound seam, closed the same way the extract side's pager
  * was: a loopback `com.sun.net.httpserver` stub speaks the PUBLIC
  * BigQuery REST v2 load-job shapes (`jobs.insert` multipart upload →
  * PENDING/RUNNING job, `jobs.get` polling → DONE with
  * `statistics.load.outputRows` or `status.errorResult`), enforces the
  * documented job semantics (truncate replaces, append unions fields
  * only under ALLOW_FIELD_ADDITION), and the spec drives the full
  * `BigQuerySink → HttpBigQueryLoadClient` path over real HTTP. JDK-only
  * on both ends (`/root/reference/data_load.py:40-70` is the contract
  * source).
  */
class HttpBigQuerySinkSpec extends SparkSpec {

  private var server: HttpServer = _
  private var base: String = _
  private val Token = "bq-adc-bearer-r12"
  private val requests = new ConcurrentLinkedQueue[String]()
  /** Authorization header of every request (or "<none>") */
  private val authHeaders = new ConcurrentLinkedQueue[String]()

  // stub warehouse + job registry
  private case class StubTable(fields: Vector[String], rows: Vector[Map[String, String]])
  private case class StubJob(var getsSeen: Int, result: Either[String, Long]) // err msg | outputRows
  private val tables = mutable.Map.empty[String, StubTable]
  private val jobs = mutable.Map.empty[String, StubJob]
  private val jobSeq = new AtomicLong(0)
  /** config JSONs seen by jobs.insert, for wire-shape asserts */
  private val configsSeen = new ConcurrentLinkedQueue[String]()

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new StubHandler)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def field(body: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*\"?((?:[^\"\\\\,}\\]\\s]|\\\\.)+)\"?").r
      .findFirstMatchIn(body).map(_.group(1))

  /** Flat NDJSON object → key→rendered-value map (what toJSON emits for
    * the primitive frames under test; null fields are simply absent).
    */
  private def parseNdjsonRow(line: String): Map[String, String] =
    ("\"([^\"]+)\"\\s*:\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|-?[0-9.Ee+]+|true|false|null)").r
      .findAllMatchIn(line)
      .map(m => m.group(1) -> m.group(2).stripPrefix("\"").stripSuffix("\""))
      .toMap

  private final class StubHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (code, body) =
        try respond(ex)
        catch { case e: Throwable => ex.sendResponseHeaders(500, -1); ex.close(); throw e }
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
      ex.close()
    }

    private def respond(ex: HttpExchange): (Int, String) = synchronized {
      val path = ex.getRequestURI.getPath
      requests.add(s"${ex.getRequestMethod} $path")
      // ADC-equivalent wire behavior: every v2 call must carry the bearer
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      authHeaders.add(if (auth == null) "<none>" else auth)
      if (auth != s"Bearer $Token") return (401, "")
      if (ex.getRequestMethod == "POST" && path.endsWith("/jobs") && path.contains("/upload/")) {
        insertJob(ex)
      } else if (ex.getRequestMethod == "POST" && path.endsWith("/jobs")) {
        insertJobStaged(ex)
      } else if (ex.getRequestMethod == "GET" && path.contains("/jobs/")) {
        getJob(path.substring(path.lastIndexOf('/') + 1))
      } else (404, "")
    }

    private def insertJob(ex: HttpExchange): (Int, String) = {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val boundary = ("boundary=(.+)").r
        .findFirstMatchIn(ex.getRequestHeaders.getFirst("Content-Type")).get.group(1)
      val parts = body.split(java.util.regex.Pattern.quote(s"--$boundary"))
        .map(_.trim).filter(p => p.nonEmpty && p != "--")
      val config = parts(0).substring(parts(0).indexOf("\r\n\r\n") + 4)
      val ndjson = parts(1).substring(parts(1).indexOf("\r\n\r\n") + 4)
      applyLoad(config, ndjson.linesIterator.filter(_.nonEmpty).map(parseNdjsonRow).toVector)
    }

    /** The GCS-staged shape: plain-JSON body IS the config; rows come
      * from the `sourceUris` shard files (the stub resolves `file:` URIs
      * from local disk — its bucket stand-in).
      */
    private def insertJobStaged(ex: HttpExchange): (Int, String) = {
      val config = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val uris = ("\"sourceUris\"\\s*:\\s*\\[([^\\]]*)\\]").r
        .findFirstMatchIn(config).map(_.group(1)).getOrElse("")
        .split(',').map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      val rows = uris.toVector.flatMap { u =>
        val p = java.nio.file.Paths.get(java.net.URI.create(u))
        java.nio.file.Files.readAllLines(p).asScala.filter(_.nonEmpty).map(parseNdjsonRow)
      }
      applyLoad(config, rows)
    }

    private def applyLoad(config: String, rows: Vector[Map[String, String]]): (Int, String) = {
      configsSeen.add(config)
      val tableId = Seq("projectId", "datasetId", "tableId")
        .map(k => field(config, k).get).mkString(".")
      val disposition = field(config, "writeDisposition").get
      val allowAdd = config.contains("ALLOW_FIELD_ADDITION")
      val fields = rows.flatMap(_.keys).distinct
      val result: Either[String, Long] = (tables.get(tableId), disposition) match {
        case (None, _) | (_, "WRITE_TRUNCATE") =>
          tables(tableId) = StubTable(fields, rows); Right(rows.size.toLong)
        case (Some(t), "WRITE_APPEND") =>
          val newFields = fields.filterNot(t.fields.contains)
          if (newFields.nonEmpty && !allowAdd)
            Left(s"Provided Schema does not match Table $tableId. Cannot add fields: ${newFields.mkString(",")}")
          else {
            tables(tableId) = StubTable(t.fields ++ newFields, t.rows ++ rows)
            Right(rows.size.toLong)
          }
        case (_, other) => Left(s"unknown writeDisposition $other")
      }
      val jobId = s"job_${jobSeq.incrementAndGet()}"
      jobs(jobId) = StubJob(0, result)
      (200, s"""{"jobReference":{"projectId":"p","jobId":"$jobId"},"status":{"state":"PENDING"}}""")
    }

    /** First poll RUNNING, second DONE — exercises the client's wait loop. */
    private def getJob(jobId: String): (Int, String) = jobs.get(jobId) match {
      case None => (404, "")
      case Some(j) =>
        j.getsSeen += 1
        if (j.getsSeen < 2) (200, s"""{"status":{"state":"RUNNING"}}""")
        else
          j.result match {
            case Right(n) =>
              (200,
                s"""{"status":{"state":"DONE"},"statistics":{"load":{"outputRows":"$n"}}}""")
            case Left(msg) =>
              (200,
                s"""{"status":{"state":"DONE","errorResult":{"reason":"invalid","message":"$msg"}}}""")
          }
    }
  }

  private def freshSink(project: String = "proj", dataset: String = "ds") =
    new BigQuerySink(
      new HttpBigQueryLoadClient(base, project, pollMillis = 5,
        creds = CredentialProvider.static(Token)),
      dataset)

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val s2 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  test("truncate load drives the full insert→poll→DONE lifecycle over HTTP") {
    requests.clear(); configsSeen.clear()
    val n = freshSink().load(
      df(s2, Row(1L, "a"), Row(2L, "b"), Row(3L, "c")),
      "cfg1", Sink.WriteTruncate)
    assert(n === 3)
    val t = tables("proj.ds.010_warner_dl_lf_cfg1")
    assert(t.rows.size === 3 && t.fields.toSet === Set("id", "name"))
    // wire shape: the LoadJobConfig knobs the reference sets reached the server
    val cfg = configsSeen.asScala.last
    assert(cfg.contains("WRITE_TRUNCATE") && cfg.contains("ALLOW_FIELD_ADDITION"))
    assert(cfg.contains("NEWLINE_DELIMITED_JSON") && cfg.contains("\"autodetect\":true"))
    // the client actually polled (insert is PENDING; ≥1 jobs.get before DONE)
    assert(requests.asScala.count(_.startsWith("GET")) >= 2)
  }

  test("append with a new field evolves the schema under ALLOW_FIELD_ADDITION") {
    freshSink().load(df(s2, Row(1L, "a"), Row(2L, "b")), "cfg2", Sink.WriteTruncate)
    val s3 = s2.add(StructField("score", DoubleType, nullable = true))
    val n = freshSink().load(df(s3, Row(9L, "z", 0.5)), "cfg2", Sink.WriteAppend)
    assert(n === 1)
    val t = tables("proj.ds.010_warner_dl_lf_cfg2")
    assert(t.fields === Vector("id", "name", "score") && t.rows.size === 3)
    // pre-evolution rows null-extend: the old rows simply lack the key
    assert(!t.rows.head.contains("score") && t.rows.last("score") === "0.5")
  }

  test("append adding a field WITHOUT the option surfaces the job errorResult") {
    val client = new HttpBigQueryLoadClient(base, "proj", pollMillis = 5,
      creds = CredentialProvider.static(Token))
    client.loadTable(df(s2, Row(1L, "a")), "proj.ds.t_noevolve", Sink.WriteTruncate, Set.empty)
    val s3 = s2.add(StructField("extra", StringType, nullable = true))
    val e = intercept[BigQuerySink.LoadJobException] {
      client.loadTable(df(s3, Row(2L, "b", "x")), "proj.ds.t_noevolve", Sink.WriteAppend, Set.empty)
    }
    assert(e.getMessage.contains("Cannot add fields"))
  }

  test("empty input raises before any HTTP request") {
    requests.clear()
    intercept[Sink.EmptyInputException] {
      freshSink().load(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], s2), "cfg3", Sink.WriteAppend)
    }
    assert(requests.isEmpty)
  }

  test("an HTTP-level failure surfaces as the LoadJobException (GoogleAPIError path)") {
    // unreachable endpoint: connection refused → wrapped, like the
    // reference's blanket RuntimeError conversion
    val dead = new HttpBigQueryLoadClient("http://127.0.0.1:1", "proj", pollMillis = 5)
    intercept[BigQuerySink.LoadJobException] {
      dead.loadTable(df(s2, Row(1L, "a")), "proj.ds.t", Sink.WriteAppend, Set.empty)
    }
  }

  test("every request in the lifecycle carries the bearer token") {
    authHeaders.clear()
    freshSink().load(df(s2, Row(1L, "a")), "cfg_auth", Sink.WriteTruncate)
    assert(authHeaders.size >= 2) // jobs.insert + ≥1 jobs.get poll
    assert(authHeaders.asScala.forall(_ == s"Bearer $Token"), authHeaders.asScala.toSet)
  }

  test("missing or wrong bearer -> 401 surfaces as LoadJobException naming the seam") {
    val unauthed = new HttpBigQueryLoadClient(base, "proj", pollMillis = 5,
      creds = CredentialProvider.none)
    val e1 = intercept[BigQuerySink.LoadJobException] {
      unauthed.loadTable(df(s2, Row(1L, "a")), "proj.ds.t401", Sink.WriteTruncate, Set.empty)
    }
    assert(e1.getMessage.contains("401") && e1.getMessage.contains("GRAFT_AUTH_TOKEN"))
    val wrong = new HttpBigQueryLoadClient(base, "proj", pollMillis = 5,
      creds = CredentialProvider.static("stale-token"))
    val e2 = intercept[BigQuerySink.LoadJobException] {
      wrong.loadTable(df(s2, Row(1L, "a")), "proj.ds.t401", Sink.WriteTruncate, Set.empty)
    }
    assert(e2.getMessage.contains("401"))
    assert(!tables.contains("proj.ds.t401"))
  }

  test("a job that never reaches DONE fails at the poll deadline, not forever") {
    // stuck context: insert accepts, every poll answers RUNNING
    val stuck = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    stuck.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body =
          if (ex.getRequestMethod == "POST")
            """{"jobReference":{"jobId":"job_stuck"},"status":{"state":"PENDING"}}"""
          else """{"status":{"state":"RUNNING"}}"""
        if (ex.getRequestMethod == "POST") ex.getRequestBody.readAllBytes()
        val bytes = body.getBytes(UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody; os.write(bytes); os.close(); ex.close()
      }
    })
    stuck.start()
    try {
      val client = new HttpBigQueryLoadClient(
        s"http://127.0.0.1:${stuck.getAddress.getPort}", "proj",
        pollMillis = 5, creds = CredentialProvider.static(Token), maxWaitMillis = 200)
      val e = intercept[BigQuerySink.LoadJobException] {
        client.loadTable(df(s2, Row(1L, "a")), "proj.ds.tstuck", Sink.WriteTruncate, Set.empty)
      }
      assert(e.getMessage.contains("did not reach DONE") && e.getMessage.contains("RUNNING"))
    } finally stuck.stop(0)
  }

  // ---- GCS-staged load path (stagingRoot): sourceUris jobs.insert ----

  private def stagedClient(root: java.nio.file.Path, creds: CredentialProvider =
      CredentialProvider.static(Token)) =
    new HttpBigQueryLoadClient(base, "proj", pollMillis = 5,
      creds = creds, stagingRoot = Some(root.toString))

  private def stageDirsUnder(root: java.nio.file.Path): Seq[String] =
    if (!java.nio.file.Files.exists(root)) Seq.empty
    else java.nio.file.Files.list(root).iterator.asScala
      .map(_.getFileName.toString).filter(_.startsWith("graft-stage-")).toSeq

  test("staged load: executors write shards, jobs.insert carries sourceUris, lifecycle completes") {
    val root = java.nio.file.Files.createTempDirectory("bqstage")
    requests.clear(); configsSeen.clear()
    val sink = new BigQuerySink(stagedClient(root), "ds")
    val n = sink.load(
      df(s2, Row(1L, "a"), Row(2L, "b"), Row(3L, "c")),
      "cfg_staged", Sink.WriteTruncate)
    assert(n === 3)
    val t = tables("proj.ds.010_warner_dl_lf_cfg_staged")
    assert(t.rows.size === 3 && t.fields.toSet === Set("id", "name"))
    // wire shape: a PLAIN jobs.insert (no /upload/), config carries the
    // shard URIs and the same knobs the multipart path sends
    val post = requests.asScala.find(_.startsWith("POST")).get
    assert(!post.contains("/upload/"), post)
    val cfg = configsSeen.asScala.last
    assert(cfg.contains("\"sourceUris\":[\"file:"), cfg)
    assert(cfg.contains("WRITE_TRUNCATE") && cfg.contains("ALLOW_FIELD_ADDITION"))
    assert(cfg.contains("NEWLINE_DELIMITED_JSON") && cfg.contains("\"autodetect\":true"))
    // the client polled the same lifecycle as multipart
    assert(requests.asScala.count(_.startsWith("GET")) >= 2)
    // staging directory is cleaned up after the job completes
    assert(stageDirsUnder(root).isEmpty, stageDirsUnder(root))
  }

  test("staged zero-row frame loads successfully (0 rows) — same outcome as the multipart path") {
    // a zero-row frame previously succeeded via multipart but could
    // throw on the staged path; now both body paths yield a zero-row
    // load. Spark writes at least one (empty) shard even for a
    // zero-partition frame, so this flows through the staged body; the
    // defensive no-shards fallback (a filesystem listing no part files)
    // reuses the multipart body for the same zero-row outcome.
    val root = java.nio.file.Files.createTempDirectory("bqstage")
    requests.clear(); configsSeen.clear()
    val zeroPart = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s2)
    val n = stagedClient(root).loadTable(zeroPart, "proj.ds.t_staged_empty", Sink.WriteTruncate, Set.empty)
    assert(n === 0)
    // and the staging directory is still cleaned up
    assert(stageDirsUnder(root).isEmpty, stageDirsUnder(root))
  }

  test("staged config knobs are byte-identical to the multipart path's") {
    configsSeen.clear()
    freshSink().load(df(s2, Row(1L, "a")), "cfg_wire", Sink.WriteAppend)
    val multipartCfg = configsSeen.asScala.last
    val root = java.nio.file.Files.createTempDirectory("bqstage")
    new BigQuerySink(stagedClient(root), "ds")
      .load(df(s2, Row(2L, "b")), "cfg_wire", Sink.WriteAppend)
    val stagedCfg = configsSeen.asScala.last
    // strip only the sourceUris suffix; everything else must match byte
    // for byte (disposition, schema options, format, autodetect, table)
    val stripped = stagedCfg.replaceFirst(",\"sourceUris\":\\[[^\\]]*\\]", "")
    assert(stripped === multipartCfg, s"\nstaged:    $stagedCfg\nmultipart: $multipartCfg")
  }

  test("staged append adding a field without the option surfaces the errorResult and still cleans up") {
    val root = java.nio.file.Files.createTempDirectory("bqstage")
    val client = stagedClient(root)
    client.loadTable(df(s2, Row(1L, "a")), "proj.ds.t_staged_noevolve", Sink.WriteTruncate, Set.empty)
    val s3 = s2.add(StructField("extra", StringType, nullable = true))
    val e = intercept[BigQuerySink.LoadJobException] {
      client.loadTable(df(s3, Row(2L, "b", "x")), "proj.ds.t_staged_noevolve", Sink.WriteAppend, Set.empty)
    }
    assert(e.getMessage.contains("Cannot add fields"))
    assert(stageDirsUnder(root).isEmpty, stageDirsUnder(root))
  }

  test("staged 401 surfaces the auth guidance and leaves no table or staging litter") {
    val root = java.nio.file.Files.createTempDirectory("bqstage")
    val unauthed = stagedClient(root, creds = CredentialProvider.none)
    val e = intercept[BigQuerySink.LoadJobException] {
      unauthed.loadTable(df(s2, Row(1L, "a")), "proj.ds.t_staged_401", Sink.WriteTruncate, Set.empty)
    }
    assert(e.getMessage.contains("401") && e.getMessage.contains("GRAFT_AUTH_TOKEN"))
    assert(!tables.contains("proj.ds.t_staged_401"))
    assert(stageDirsUnder(root).isEmpty, stageDirsUnder(root))
  }

  test("field scans are scoped: nested error text cannot shadow status/statistics fields") {
    import graft.load.HttpBigQueryLoadClient.{extractIn, subObject}
    // a realistic v2 body whose errorResult message QUOTES a state and
    // whose errors[] carries its own message — the shapes that defeat a
    // whole-body first-occurrence scan
    val body =
      """{"jobReference":{"projectId":"p","jobId":"job_9"},
        |"configuration":{"load":{"destinationTable":{"tableId":"t"}}},
        |"status":{"state":"DONE",
        |  "errors":[{"reason":"invalid","message":"row 3: bad \"state\":\"RUNNING\" literal"}]},
        |"statistics":{"creationTime":"1700000000","load":{"outputRows":"42"}}}""".stripMargin
    assert(extractIn(body, "status", "state").contains("DONE"))
    assert(extractIn(body, "jobReference", "jobId").contains("job_9"))
    assert(extractIn(body, "statistics", "outputRows").contains("42"))
    // subobject extraction is balanced-brace aware, not first-} naive
    assert(subObject(body, "statistics").exists(_.contains("outputRows")))
    assert(subObject(body, "nope").isEmpty)
  }

  test("subObject anchors outside strings and at top level only") {
    import graft.load.HttpBigQueryLoadClient.{extractIn, subObject}
    // an earlier STRING VALUE containing '"status": {' must not anchor
    // the scan (the defeated shape: a log line quoted inside a message)
    val trap =
      """{"note":"saw \"status\": {\"state\":\"RUNNING\"} in upstream log",
        |"status":{"state":"DONE"}}""".stripMargin
    assert(extractIn(trap, "status", "state").contains("DONE"))
    assert(subObject(trap, "status").contains("""{"state":"DONE"}"""))
    // a NESTED object reusing the key must not anchor either — only the
    // top-level key owns the scan
    val nested =
      """{"configuration":{"status":{"state":"NESTED"}},
        |"status":{"state":"DONE"}}""".stripMargin
    assert(extractIn(nested, "status", "state").contains("DONE"))
    // key present only nested → no top-level match
    assert(subObject("""{"outer":{"status":{"state":"X"}}}""", "status").isEmpty)
  }

  test("a non-200 insert surfaces the server's error.message, not just the code") {
    // BigQuery answers a rejected insert with an error BODY carrying the
    // actionable reason; the exception must include it (pre-r14 only the
    // status code survived)
    val reject = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    reject.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        val body =
          """{"error":{"code":400,"message":"Invalid load configuration: bad sourceFormat"}}"""
        val bytes = body.getBytes(UTF_8)
        ex.sendResponseHeaders(400, bytes.length)
        val os = ex.getResponseBody; os.write(bytes); os.close(); ex.close()
      }
    })
    reject.start()
    try {
      val client = new HttpBigQueryLoadClient(
        s"http://127.0.0.1:${reject.getAddress.getPort}", "proj",
        pollMillis = 5, creds = CredentialProvider.static(Token))
      val e = intercept[BigQuerySink.LoadJobException] {
        client.loadTable(df(s2, Row(1L, "a")), "proj.ds.trej", Sink.WriteTruncate, Set.empty)
      }
      assert(e.getMessage.contains("400"), e.getMessage)
      assert(e.getMessage.contains("Invalid load configuration"), e.getMessage)
    } finally reject.stop(0)
  }
}
