package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import graft.spec.ExportConfig

/** HTTP trigger for the pipeline — the reference's serverless entry
  * point (`/root/reference/main.py:20-122`: an HTTP Cloud Function that
  * reads `reports_filter` / `start_date` / `end_date` from the request
  * JSON, runs every export config through extract→transform→load with
  * per-config fault isolation, and answers 200 with the processed count,
  * or 500 when setup itself fails). This is the same seam treatment as
  * `BigQuerySink` (r8) and the `PagedSource` HTTP pager (r11): JDK-only
  * loopback-testable HTTP, with the orchestration semantics delegated to
  * [[Pipeline.run]] so the fault contract (E1–E4) has ONE definition.
  *
  * Request body (all fields optional, mirroring the reference):
  * `{"reports_filter": "<configId>", "start_date": "...", "end_date": "..."}`
  *
  * `configs` is the configuration fetch (the reference loads JSON from a
  * bucket — S3/S4 are environment-bound; this takes the parsed result),
  * evaluated per request so a fetch failure is a 500, not a constructor
  * crash. `process` runs one config with the request's date range.
  */
final class HttpEntry(
    configs: () => Seq[ExportConfig],
    process: (ExportConfig, Option[String], Option[String]) => Long
) {

  private val mapper = new ObjectMapper
  private var server: HttpServer = _

  /** Bind and start; port 0 picks a free port. Returns the bound address. */
  def start(port: Int = 0): InetSocketAddress = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new Handler)
    server.start()
    server.getAddress
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private final class Handler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (code, body) =
        try {
          val req =
            try mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
            catch { case _: Exception => mapper.createObjectNode() }
          def field(name: String): Option[String] =
            Option(req.get(name)).filterNot(_.isNull).map(_.asText)
          val filter = field("reports_filter")
          val start = field("start_date")
          val end = field("end_date")
          // setup (config fetch) failures escape to the 500 branch —
          // exactly the reference's outer try; per-config failures are
          // absorbed by Pipeline.run (E1) and never fail the request
          val summary = Pipeline.run(configs(), filter)(cfg => process(cfg, start, end))
          val msg = s"Processed ${summary.processedCount} export configurations successfully."
          (200, s"""{"message":${mapper.writeValueAsString(msg)}}""")
        } catch {
          case e: Exception =>
            graft.util.JsonLog.critical(s"Function failed: ${e.getMessage}")
            (500, s"""{"error":${mapper.writeValueAsString(String.valueOf(e.getMessage))}}""")
        }
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
      ex.close()
    }
  }
}
