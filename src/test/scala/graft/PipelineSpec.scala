package graft

import graft.load.Sink
import graft.pipeline.Pipeline
import graft.spec.ExportConfig
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.collection.immutable.ListMap

/** E2E pipeline semantics: per-config fault isolation (E1–E4) and the
  * sink's write dispositions + schema evolution (K1/K2).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(id: String) =
    ExportConfig(id, "ds", ListMap.empty, ListMap.empty, ListMap.empty, Seq.empty)

  test("per-config fault isolation: one failure doesn't stop the run (E1)") {
    val summary = Pipeline.run(Seq(cfg("a"), cfg("boom"), cfg("c"))) { c =>
      if (c.configId == "boom") throw new RuntimeException("exploded") else 5L
    }
    assert(summary.processedCount == 2)
    assert(summary.results.collect { case Pipeline.Failed(id, _) => id } == Seq("boom"))
    assert(summary.message == "Processed 2 configurations")
  }

  test("empty extract → Skipped with warning semantics (E2)") {
    val summary = Pipeline.run(Seq(cfg("empty"))) { _ => 0L }
    assert(summary.results.head.isInstanceOf[Pipeline.Skipped])
    assert(summary.processedCount == 0)
  }

  test("reports_filter scopes the run to one config (P7)") {
    val summary = Pipeline.run(Seq(cfg("a"), cfg("b")), reportsFilter = Some("b"))(_ => 1L)
    assert(summary.results.map(_.configId) == Seq("b"))
  }

  test("sink: WRITE_TRUNCATE overwrites, WRITE_APPEND accumulates (K1)") {
    val dir = Files.createTempDirectory("sink").toString + "/out"
    val df1 = Seq((1, "a")).toDF("k", "v")
    Sink.writeParquet(df1, dir, Sink.WriteDisposition.fromString("WRITE_TRUNCATE"))
    Sink.writeParquet(df1, dir, Sink.WriteDisposition.fromString("WRITE_APPEND"))
    assert(spark.read.parquet(dir).count() == 2)
    Sink.writeParquet(df1, dir, Sink.WriteDisposition.fromString("WRITE_TRUNCATE"))
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("sink: schema evolution across appends (ALLOW_FIELD_ADDITION analogue)") {
    val dir = Files.createTempDirectory("sink-evolve").toString + "/out"
    Sink.writeParquet(Seq((1, "a")).toDF("k", "v"), dir, Sink.WriteAppend)
    Sink.writeParquet(Seq((2, "b", 9.5)).toDF("k", "v", "extra"), dir, Sink.WriteAppend)
    val merged = Sink.readMerged(spark, dir)
    assert(merged.columns.toSet == Set("k", "v", "extra"))
    assert(merged.filter(col("extra").isNull).count() == 1)
  }

  test("sink: write-side evolution null-fills the union and verifies on-disk schema") {
    val dir = Files.createTempDirectory("sink-evolve-w").toString + "/out"
    val u1 = Sink.writeParquetEvolving(spark, Seq((1, "a")).toDF("k", "v"), dir, Sink.WriteAppend)
    assert(u1.fieldNames.toSeq == Seq("k", "v"))
    // second run adds `extra` and DROPS `v`: union keeps both, v null-filled
    val u2 = Sink.writeParquetEvolving(
      spark, Seq((2, 9.5)).toDF("k", "extra"), dir, Sink.WriteAppend)
    assert(u2.fieldNames.toSeq == Seq("k", "v", "extra"))
    val merged = Sink.readMerged(spark, dir)
    assert(merged.count() == 2)
    // the run-2 file itself carries the full union (write-side, not just
    // read-side merge): reading it alone shows all three columns
    assert(merged.filter(col("v").isNull).select("k").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("sink: write-side evolution rejects a type change on an existing column") {
    val dir = Files.createTempDirectory("sink-evolve-t").toString + "/out"
    Sink.writeParquetEvolving(spark, Seq((1, "a")).toDF("k", "v"), dir, Sink.WriteAppend)
    intercept[Sink.SchemaEvolutionException] {
      Sink.writeParquetEvolving(spark, Seq((2, 3.5)).toDF("k", "v"), dir, Sink.WriteAppend)
    }
  }

  test("sink: empty input raises (K2)") {
    val dir = Files.createTempDirectory("sink-empty").toString + "/out"
    val empty = Seq.empty[(Int, String)].toDF("k", "v")
    intercept[Sink.EmptyInputException] {
      Sink.writeParquet(empty, dir, Sink.WriteAppend)
    }
  }

  test("table naming matches the reference prefix") {
    assert(Sink.tableName("cfg1") == "010_warner_dl_lf_cfg1")
  }
}
