package graft.load

import org.apache.spark.sql.DataFrame

import graft.auth.CredentialProvider

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import scala.io.Source
import scala.util.control.NonFatal

/** [[BigQueryLoadClient]] over the PUBLIC BigQuery REST v2 load-job wire
  * shapes (`jobs.insert` multipart upload + `jobs.get` polling) — closes
  * the last environment-bound seam the same way the HTTP pager closed
  * the extract side: the lifecycle the reference drives through
  * `load_table_from_json(...)` + `load_job.result()`
  * (`/root/reference/data_load.py:52-59`) now runs over real HTTP
  * against any server speaking these shapes. Tests bind a loopback
  * `com.sun.net.httpserver` stub; a deployment points `base` at the
  * real endpoint.
  *
  * Wire contract (JDK-only on both ends):
  *  - `POST {base}/upload/bigquery/v2/projects/{project}/jobs?uploadType=multipart`
  *    — part 1 (`application/json`): the load-job configuration
  *    (destinationTable, writeDisposition, schemaUpdateOptions,
  *    sourceFormat NEWLINE_DELIMITED_JSON, autodetect — the exact knobs
  *    `LoadJobConfig` carries at `data_load.py:40-44`); part 2
  *    (`application/octet-stream`): the frame as NDJSON. Response: job
  *    JSON with `jobReference.jobId` and `status.state`.
  *  - `GET {base}/bigquery/v2/projects/{project}/jobs/{jobId}` — polled
  *    until `status.state == "DONE"` (the `load_job.result()` wait);
  *    `status.errorResult` → [[BigQuerySink.LoadJobException]] (the
  *    GoogleAPIError path `data_load.py:66-70` wraps);
  *    `statistics.load.outputRows` is the returned row count.
  *
  * The NDJSON payload streams through `toJSON.toLocalIterator` — one
  * partition at a time through a chunked request body, never a full
  * collect (the reference materializes its whole `List[Dict]`). The
  * 100 TB path remains the distributed connector / GCS-staged load
  * documented on [[BigQueryLoadClient]]; this client is the faithful
  * JSON load-job lifecycle at the reference's config-batch scale.
  */
final class HttpBigQueryLoadClient(
    base: String,
    override val project: String,
    pollMillis: Long = 50,
    creds: CredentialProvider = CredentialProvider.resolve,
    maxWaitMillis: Long = 120000
) extends BigQueryLoadClient {

  import HttpBigQueryLoadClient._

  override def loadTable(
      df: DataFrame,
      tableId: String,
      disposition: Sink.WriteDisposition,
      schemaUpdateOptions: Set[String]
  ): Long = {
    val Array(proj, dataset, table) = tableId.split('.') match {
      case a @ Array(_, _, _) => a
      case _ => throw new BigQuerySink.LoadJobException(s"invalid table id '$tableId'")
    }
    val wireDisposition = disposition match {
      case Sink.WriteAppend   => "WRITE_APPEND"
      case Sink.WriteTruncate => "WRITE_TRUNCATE"
    }
    val config =
      s"""{"configuration":{"load":{
         |"destinationTable":{"projectId":"${esc(proj)}","datasetId":"${esc(dataset)}","tableId":"${esc(table)}"},
         |"writeDisposition":"$wireDisposition",
         |"schemaUpdateOptions":[${schemaUpdateOptions.toSeq.sorted.map(o => "\"" + esc(o) + "\"").mkString(",")}],
         |"sourceFormat":"NEWLINE_DELIMITED_JSON",
         |"autodetect":true}}}""".stripMargin.replace("\n", "")
    // failures wrap like everything else: the reference converts ANY
    // load-path exception to its RuntimeError (`data_load.py:71-75`) —
    // including Spark task failures surfaced while streaming the NDJSON
    // body — and LoadJobException is that analogue, so the catch is
    // NonFatal, not just IOException
    val insertBody =
      try insertJob(config, df)
      catch {
        case e: BigQuerySink.LoadJobException => throw e
        case NonFatal(e) =>
          throw new BigQuerySink.LoadJobException(s"jobs.insert failed: $e")
      }
    val jobId = extractIn(insertBody, "jobReference", "jobId").getOrElse(
      throw new BigQuerySink.LoadJobException(s"no jobId in insert response: $insertBody"))
    // bounded wait: a server that never reaches DONE (or answers without
    // status.state) must surface, not spin — the reference's
    // load_job.result() at least raises on its retry deadline
    val deadline = System.nanoTime() + maxWaitMillis * 1000000L
    var status = insertBody
    while (!statusField(status, "state").contains("DONE")) {
      if (System.nanoTime() > deadline)
        throw new BigQuerySink.LoadJobException(
          s"load job $jobId did not reach DONE within ${maxWaitMillis}ms " +
            s"(last state: ${statusField(status, "state").getOrElse("<missing>")})")
      Thread.sleep(pollMillis)
      status = get(s"$base/bigquery/v2/projects/$project/jobs/$jobId")
    }
    val statusObj = subObject(status, "status").getOrElse("")
    if (statusObj.contains("\"errorResult\"")) {
      val msg = extract(statusObj.substring(statusObj.indexOf("\"errorResult\"")), "message")
        .getOrElse("load job failed")
      throw new BigQuerySink.LoadJobException(msg)
    }
    extractIn(status, "statistics", "outputRows").map(_.toLong).getOrElse(
      throw new BigQuerySink.LoadJobException(s"no outputRows in DONE job: $status"))
  }

  private def statusField(body: String, key: String): Option[String] =
    extractIn(body, "status", key)

  /** Multipart insert: config part + chunk-streamed NDJSON part. */
  private def insertJob(configJson: String, df: DataFrame): String = {
    val url = s"$base/upload/bigquery/v2/projects/$project/jobs?uploadType=multipart"
    val boundary = s"graft-bq-${java.util.UUID.randomUUID()}"
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setChunkedStreamingMode(64 * 1024)
    conn.setRequestProperty("Content-Type", s"multipart/related; boundary=$boundary")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000)
    // the reference authenticates through application-default
    // credentials; here the same wire behavior — a bearer token on every
    // request — comes from the CredentialProvider seam
    creds.token().foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
    try {
      try {
        val out = conn.getOutputStream
        try {
          def w(s: String): Unit = out.write(s.getBytes(UTF_8))
          w(s"--$boundary\r\nContent-Type: application/json; charset=UTF-8\r\n\r\n")
          w(configJson)
          w(s"\r\n--$boundary\r\nContent-Type: application/octet-stream\r\n\r\n")
          val it = df.toJSON.toLocalIterator()
          while (it.hasNext) { w(it.next()); w("\n") }
          w(s"\r\n--$boundary--\r\n")
        } finally out.close()
      } catch {
        case e: java.io.IOException =>
          // a server that rejects the request up front (bad credentials,
          // oversized body) may close the stream before draining it; the
          // write then dies with an opaque transport IOException. If a
          // response code is already readable, surface THAT — the
          // actionable auth guidance must not be masked.
          val early = scala.util.Try(conn.getResponseCode).getOrElse(-1)
          if (early == 401 || early == 403)
            throw new BigQuerySink.LoadJobException(
              s"jobs.insert unauthorized: HTTP $early — set GRAFT_AUTH_TOKEN / " +
                "GRAFT_AUTH_TOKEN_FILE (or the graft.auth.token property) to a valid bearer token")
          if (early > 0 && early != 200)
            throw new BigQuerySink.LoadJobException(
              s"jobs.insert failed: HTTP $early${errorDetail(conn)} (body stream aborted: $e)")
          throw e
      }
      val code = conn.getResponseCode
      if (code == 401 || code == 403)
        throw new BigQuerySink.LoadJobException(
          s"jobs.insert unauthorized: HTTP $code — set GRAFT_AUTH_TOKEN / " +
            "GRAFT_AUTH_TOKEN_FILE (or the graft.auth.token property) to a valid bearer token")
      if (code != 200)
        throw new BigQuerySink.LoadJobException(
          s"jobs.insert failed: HTTP $code${errorDetail(conn)}")
      val in = conn.getInputStream
      try Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    } finally conn.disconnect()
  }

  /** Best-effort `: <error.message>` suffix from the server's error body
    * (`getErrorStream`) — a non-200 jobs.insert carries the actionable
    * reason there (e.g. a malformed load config), and reporting only the
    * status code discards it. Never throws: a closed/absent error stream
    * yields an empty suffix.
    */
  private def errorDetail(conn: HttpURLConnection): String =
    scala.util.Try {
      val es = conn.getErrorStream
      if (es == null) ""
      else {
        val body = try Source.fromInputStream(es, "UTF-8").mkString finally es.close()
        extractIn(body, "error", "message").fold("")(m => s": $m")
      }
    }.getOrElse("")

  private def get(url: String): String = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    creds.token().foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
    try {
      val code = conn.getResponseCode
      if (code == 401 || code == 403)
        throw new BigQuerySink.LoadJobException(
          s"jobs.get unauthorized: HTTP $code for $url — set GRAFT_AUTH_TOKEN / " +
            "GRAFT_AUTH_TOKEN_FILE (or the graft.auth.token property) to a valid bearer token")
      if (code != 200)
        throw new BigQuerySink.LoadJobException(s"jobs.get failed: HTTP $code for $url")
      val in = conn.getInputStream
      try Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    } catch {
      case e: java.io.IOException =>
        throw new BigQuerySink.LoadJobException(s"jobs.get failed: $e")
    } finally conn.disconnect()
  }
}

object HttpBigQueryLoadClient {

  /** The balanced-brace subobject after a TOP-LEVEL `"key": {` — scopes
    * the field scans below to the subobject that actually owns the
    * field, so a real v2 response nesting extra objects (an errorResult
    * whose message quotes 'state', status.errors[] carrying its own
    * 'message') cannot shadow the field being read. The anchor scan is
    * string-context-aware AND depth-anchored: a string VALUE containing
    * e.g. `"status": {`, or a nested object reusing the key, cannot
    * mis-scope the walk. String contents are likewise skipped during
    * brace counting.
    */
  private[graft] def subObject(body: String, key: String): Option[String] = {
    val quoted = "\"" + key + "\""
    // pass 1: find `"key"\s*:\s*{` at object depth 1, outside strings
    var i = 0
    var depth = 0
    var inString = false
    var escaped = false
    var start = -1
    while (i < body.length && start < 0) {
      val c = body.charAt(i)
      if (inString) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inString = false
        i += 1
      } else if (c == '"') {
        if (depth == 1 && body.startsWith(quoted, i)) {
          var j = i + quoted.length
          while (j < body.length && body.charAt(j).isWhitespace) j += 1
          if (j < body.length && body.charAt(j) == ':') {
            j += 1
            while (j < body.length && body.charAt(j).isWhitespace) j += 1
            if (j < body.length && body.charAt(j) == '{') start = j
          }
        }
        if (start < 0) { inString = true; i += 1 }
      } else {
        if (c == '{') depth += 1 else if (c == '}') depth -= 1
        i += 1
      }
    }
    if (start < 0) return None
    // pass 2: balanced-brace walk from the anchor
    i = start
    depth = 0
    inString = false
    escaped = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (inString) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return Some(body.substring(start, i + 1))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** `extract` scoped to the named subobject — `extractIn(body,
    * "status", "state")` reads status.state and nothing else.
    */
  private[graft] def extractIn(body: String, obj: String, key: String): Option[String] =
    subObject(body, obj).flatMap(extract(_, key))

  /** First value of `"key": "v"` / `"key": v` in a JSON body — the few
    * fields this client reads (jobId, state, outputRows, message) are
    * flat strings/numbers, so a field scan over the pre-scoped
    * subobject (see [[extractIn]]) suffices — no JSON lib in the
    * sandbox's dependency budget.
    */
  private[load] def extract(body: String, key: String): Option[String] = {
    val k = java.util.regex.Pattern.quote(key)
    ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(body).map(_.group(1))
      .orElse(("\"" + k + "\"\\s*:\\s*([^,}\\s\"]+)").r
        .findFirstMatchIn(body).map(_.group(1)))
  }

  private[load] def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
}
