package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.DefaultConfiguration
import org.apache.logging.log4j.core.impl.Log4jLogEvent
import org.apache.logging.log4j.layout.template.json.JsonTemplateLayout
import org.apache.logging.log4j.message.SimpleMessage
import org.scalatest.funsuite.AnyFunSuite

/** F6 — the log4j2 JSON layout the library ships for cluster deployments
  * (`graft-log4j2-json.properties`) must render log events as the
  * reference's Cloud-Logging line shape: one JSON object per event with
  * `severity` and `message` fields (`/root/reference/main.py:37-40`).
  * Renders through the same JsonTemplateLayout + GcpLayout template the
  * properties file wires, then parses with Jackson.
  */
class JsonLayoutSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def render(level: Level, msg: String): com.fasterxml.jackson.databind.JsonNode = {
    val layout = JsonTemplateLayout
      .newBuilder()
      .setConfiguration(new DefaultConfiguration())
      .setEventTemplateUri("classpath:GcpLayout.json")
      .build()
    val event = Log4jLogEvent
      .newBuilder()
      .setLoggerName("graft.pipeline.Pipeline")
      .setLevel(level)
      .setMessage(new SimpleMessage(msg))
      .setTimeMillis(1722470400123L)
      .build()
    mapper.readTree(layout.toSerializable(event))
  }

  test("log events render as single-line JSON with GCP severity + message") {
    val node = render(Level.WARN, "No data extracted for lf_123")
    // GCP template maps log4j WARN -> Cloud Logging WARNING, same as the
    // reference's explicit {"severity": "WARNING"} lines
    assert(node.get("severity").asText() == "WARNING")
    assert(node.get("message").asText() == "No data extracted for lf_123")
    assert(node.get("timestamp") != null)
  }

  test("message content needing escapes survives the JSON round-trip") {
    val tricky = "quote\" backslash\\ newline\n tab\t done"
    val node = render(Level.INFO, tricky)
    assert(node.get("severity").asText() == "INFO")
    assert(node.get("message").asText() == tricky)
  }

  test("shipped properties config wires a JsonTemplateLayout console appender") {
    val text = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/main/resources/graft-log4j2-json.properties")
      ),
      java.nio.charset.StandardCharsets.UTF_8
    )
    assert(text.contains("appender.json.layout.type = JsonTemplateLayout"))
    assert(text.contains("eventTemplateUri = classpath:GcpLayout.json"))
    // opt-in contract: must NOT be auto-discovered by log4j2's default
    // config scan (that would hijack the host app's logging)
    assert(!new java.io.File("src/main/resources/log4j2.properties").exists())
  }

  test("JsonLog driver-side emitter matches the same severity/message shape") {
    val node = mapper.readTree(graft.util.JsonLog.line("ERROR", "Failed processing lf_9: boom\nstack"))
    assert(node.get("severity").asText() == "ERROR")
    assert(node.get("message").asText() == "Failed processing lf_9: boom\nstack")
  }
}
