package graft

import org.scalatest.funsuite.AnyFunSuite

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.immutable.ListMap

import graft.pipeline.HttpEntry
import graft.spec.ExportConfig

/** Loopback contract for the HTTP trigger (the reference's serverless
  * entry: request JSON → per-config pipeline run → 200 with processed
  * count; setup failure → 500). Pure JDK HTTP on both sides; no Spark.
  */
class HttpEntrySpec extends AnyFunSuite {

  private def cfg(id: String) =
    ExportConfig(id, "ds", ListMap.empty, ListMap.empty, ListMap.empty, Seq.empty)

  /** POST `body` to a started entry; returns (status, responseBody). */
  private def post(entry: HttpEntry, body: String): (Int, String) = {
    val addr = entry.start()
    try {
      val conn = URI
        .create(s"http://127.0.0.1:${addr.getPort}/")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      os.write(body.getBytes(UTF_8)); os.close()
      val code = conn.getResponseCode
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text = new String(in.readAllBytes(), UTF_8)
      conn.disconnect()
      (code, text)
    } finally entry.stop()
  }

  test("200 with the processed-count message; dates forwarded to the run") {
    var seen = Vector.empty[(String, Option[String], Option[String])]
    val entry = new HttpEntry(
      () => Seq(cfg("a"), cfg("b")),
      (c, s, e) => { seen :+= ((c.configId, s, e)); 3L })
    val (code, body) =
      post(entry, """{"start_date":"2024-01-01","end_date":"2024-01-31"}""")
    assert(code == 200)
    assert(body == """{"message":"Processed 2 export configurations successfully."}""")
    assert(seen == Vector(
      ("a", Some("2024-01-01"), Some("2024-01-31")),
      ("b", Some("2024-01-01"), Some("2024-01-31"))))
  }

  test("reports_filter scopes the run to one config id (P7)") {
    var seen = Vector.empty[String]
    val entry = new HttpEntry(
      () => Seq(cfg("a"), cfg("b"), cfg("c")),
      (c, _, _) => { seen :+= c.configId; 1L })
    val (code, body) = post(entry, """{"reports_filter":"b"}""")
    assert(code == 200)
    assert(body.contains("Processed 1 export configurations"))
    assert(seen == Vector("b"))
  }

  test("per-config failure is absorbed (E1): still 200, count excludes it") {
    val entry = new HttpEntry(
      () => Seq(cfg("a"), cfg("boom"), cfg("c")),
      (c, _, _) => if (c.configId == "boom") throw new RuntimeException("x") else 2L)
    val (code, body) = post(entry, "{}")
    assert(code == 200)
    assert(body.contains("Processed 2 export configurations"))
  }

  test("setup failure (config fetch throws) is a 500, not a crash") {
    val entry = new HttpEntry(
      () => throw new IllegalStateException("bucket unreachable"),
      (_, _, _) => 1L)
    val (code, body) = post(entry, "{}")
    assert(code == 500)
    assert(body.contains("bucket unreachable"))
  }

  test("malformed / empty request body behaves as no filters") {
    val entry = new HttpEntry(() => Seq(cfg("a")), (_, _, _) => 1L)
    val (code, body) = post(entry, "not json at all")
    assert(code == 200)
    assert(body.contains("Processed 1 export configurations"))
  }
}
