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
  *  - `POST {base}/bigquery/v2/projects/{project}/jobs`
  *    (`application/json`) — the staged variant: the same load-job
  *    configuration plus `sourceUris` pointing at executor-written
  *    NDJSON shards; no data part in the request.
  *  - `GET {base}/bigquery/v2/projects/{project}/jobs/{jobId}` — polled
  *    until `status.state == "DONE"` (the `load_job.result()` wait);
  *    `status.errorResult` → [[BigQuerySink.LoadJobException]] (the
  *    GoogleAPIError path `data_load.py:66-70` wraps);
  *    `statistics.load.outputRows` is the returned row count.
  *
  * Two body paths, selected by `stagingRoot`:
  *
  *  - **multipart (default)** — the NDJSON payload streams through
  *    `toJSON.toLocalIterator`, one partition at a time through a
  *    chunked request body, never a full collect (the reference
  *    materializes its whole `List[Dict]`). Faithful to the reference's
  *    in-process `load_table_from_json`, but a driver funnel: every
  *    byte of a load transits one JVM. Right at the reference's
  *    config-batch scale only.
  *  - **staged (`stagingRoot = Some(root)`)** — the 100 TB shape:
  *    EXECUTORS write the frame as NDJSON shards under
  *    `{root}/graft-stage-{uuid}/` (`df.toJSON.write.text`, one shard
  *    per partition — `root` is the `gs://bucket/prefix` stand-in), and
  *    `jobs.insert` is a plain-JSON POST whose load config carries
  *    `sourceUris` instead of a multipart body — the documented
  *    GCS-staged load-job shape. No row ever transits the driver; the
  *    staging directory is best-effort deleted once the job reaches a
  *    terminal state. Disposition / schemaUpdateOptions / autodetect
  *    knobs are byte-identical to the multipart config, and both paths
  *    share the same poll → DONE → errorResult lifecycle.
  */
final class HttpBigQueryLoadClient(
    base: String,
    override val project: String,
    pollMillis: Long = 50,
    creds: CredentialProvider = CredentialProvider.resolve,
    maxWaitMillis: Long = 120000,
    stagingRoot: Option[String] = None
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
    // the knob block is built ONCE and shared verbatim by both body
    // paths — staged loads differ only by the appended sourceUris, so
    // dispositions/schema options/autodetect are byte-identical on the
    // wire whichever path carries the data
    def config(sourceUris: Seq[String]): String = {
      val uris =
        if (sourceUris.isEmpty) ""
        else s""","sourceUris":[${sourceUris.map(u => "\"" + esc(u) + "\"").mkString(",")}]"""
      s"""{"configuration":{"load":{
         |"destinationTable":{"projectId":"${esc(proj)}","datasetId":"${esc(dataset)}","tableId":"${esc(table)}"},
         |"writeDisposition":"$wireDisposition",
         |"schemaUpdateOptions":[${schemaUpdateOptions.toSeq.sorted.map(o => "\"" + esc(o) + "\"").mkString(",")}],
         |"sourceFormat":"NEWLINE_DELIMITED_JSON",
         |"autodetect":true$uris}}}""".stripMargin.replace("\n", "")
    }
    stagingRoot match {
      case None => awaitJob(insertWrapped(insertJob(config(Nil), df)))
      case Some(root) =>
        // stage shards (distributed write), insert by reference, and
        // drop the staging directory once the job is terminal — success,
        // errorResult, deadline, or a mid-write task failure alike (the
        // dir name is fixed BEFORE the write so a partial write cannot
        // leak shards; a retry restages under a fresh uuid)
        val dir = s"${root.stripSuffix("/")}/graft-stage-${java.util.UUID.randomUUID()}"
        try {
          // Spark task failures during the shard write wrap like every
          // other load-path failure (the reference's blanket conversion)
          val uris =
            try stageShards(df, dir)
            catch {
              case e: BigQuerySink.LoadJobException => throw e
              case NonFatal(e) =>
                throw new BigQuerySink.LoadJobException(s"staging write failed: $e")
            }
          // zero shards (a zero-partition frame, e.g. everything filtered
          // out): BigQuery rejects a load config with no sourceUris, but
          // the job must still run — a zero-row WRITE_TRUNCATE truncates
          // the table. Fall back to the multipart body so the same valid
          // input behaves identically on both body paths.
          if (uris.isEmpty) awaitJob(insertWrapped(insertJob(config(Nil), df)))
          else awaitJob(insertWrapped(insertJobStaged(config(uris))))
        } finally cleanupStaging(df, dir)
    }
  }

  /** The reference converts ANY load-path exception to its RuntimeError
    * (`data_load.py:71-75`) — including Spark task failures surfaced
    * while streaming/staging the NDJSON — and LoadJobException is that
    * analogue, so the catch is NonFatal, not just IOException.
    */
  private def insertWrapped(insert: => String): String =
    try insert
    catch {
      case e: BigQuerySink.LoadJobException => throw e
      case NonFatal(e) =>
        throw new BigQuerySink.LoadJobException(s"jobs.insert failed: $e")
    }

  /** Shared job lifecycle from the insert response: poll to DONE,
    * surface errorResult, return outputRows.
    */
  private def awaitJob(insertBody: String): Long = {
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

  /** Distributed NDJSON staging: executors write one shard per
    * partition into `dir` (under the `gs://bucket/prefix` stand-in —
    * any Hadoop-FS URI works; the caller fixes the directory name
    * before the write so cleanup covers partial writes). Returns the
    * sorted shard URIs for `sourceUris`. Empty partitions yield empty
    * shard files — harmless NDJSON (zero rows). A frame with no shards at
    * all returns an empty Seq; the caller falls back to the multipart
    * body rather than submitting a job BigQuery would reject with a "no
    * files" error after the poll wait.
    */
  private def stageShards(df: DataFrame, dir: String): Seq[String] = {
    df.toJSON.write.text(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val uris = fs.listStatus(p).iterator
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString).toSeq.sorted
    uris
  }

  /** Best-effort: staged shards are job input, not state — a failed
    * delete must never mask the load result (production would pair this
    * with a bucket lifecycle rule).
    */
  private def cleanupStaging(df: DataFrame, dir: String): Unit =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration).delete(p, true)
    }

  /** Staged insert: plain-JSON `jobs.insert` — the config (with
    * `sourceUris`) IS the body; no data part.
    */
  private def insertJobStaged(configJson: String): String = {
    val url = s"$base/bigquery/v2/projects/$project/jobs"
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json; charset=UTF-8")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000)
    creds.token().foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
    try {
      val out = conn.getOutputStream
      try out.write(configJson.getBytes(UTF_8))
      finally out.close()
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
