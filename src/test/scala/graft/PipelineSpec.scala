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

  test("full lifecycle: content rewrite → transform chain → evolving sink, per config") {
    import graft.extract.QueryExec
    import graft.transform.Transforms
    val outRoot = Files.createTempDirectory("e2e").toString
    val facts = graft.queries.Tables.t(spark, sf("sf0.001"), "events")
      .withColumn("lfm.fact.date_str", date_format(col("ts"), "yyyy-MM-dd"))
    val configs = Seq(
      ExportConfig("daily_a", "brand_content_daily",
        ListMap("sum:value" -> "float64"), ListMap("lfm.fact.date_str" -> "string"),
        ListMap.empty, Seq(2L, 3L, 5L)),
      ExportConfig("bad_dates", "brand_content_daily",
        ListMap("sum:value" -> "float64"), ListMap("lfm.fact.date_str" -> "string"),
        ListMap.empty, Seq(2L)),
      ExportConfig("daily_c", "brand_content_daily",
        // second run ADDS a metric → the sink's field-addition path
        ListMap("sum:value" -> "float64", "count:event_id" -> "int64"),
        ListMap("lfm.fact.date_str" -> "string"), ListMap.empty, Seq(7L, 11L))
    )
    val dest = outRoot + "/010_warner_dl_lf_shared"
    val summary = Pipeline.run(configs) { c =>
      val start = if (c.configId == "bad_dates") "not-a-macro" else "{{nDaysAgo 45}}"
      val extracted = QueryExec.runContent(
        facts, c, brandCol = "user_id", dateStrCol = "lfm.fact.date_str",
        requestStart = start, requestEnd = "{{nDaysAgo 10}}",
        today = java.time.LocalDate.parse("2024-02-20"))
      val transformed = Transforms.sanitizeColumnNames(
        Transforms.projectColumns(extracted, c.orderedColumns))
      Sink.writeParquetEvolving(spark, transformed, dest, Sink.WriteAppend)
      spark.read.parquet(dest).count()
    }
    // bad_dates failed (E1) without stopping the others
    assert(summary.processedCount == 2)
    assert(summary.results.collect { case Pipeline.Failed(id, _) => id } == Seq("bad_dates"))
    // schema evolved across the two successful configs: the added metric
    // column exists and is null for the first config's rows
    val merged = Sink.readMerged(spark, dest)
    assert(merged.columns.toSet ==
      Set("lfm&fact&date_str", "sum:value", "count:event_id"))
    assert(merged.filter(col("`count:event_id`").isNull).count() > 0)
    assert(merged.count() > 0)
  }

  test("sink: dynamic partition overwrite replaces only the re-run partition") {
    import spark.implicits._
    val dest = Files.createTempDirectory("graft_dyn_").toFile.getAbsolutePath
    val day1 = Seq(("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0),
      ("2024-01-02", 3L, 30.0)).toDF("day", "id", "v")
    Sink.writePartitionedDynamic(day1, dest, Seq("day"))
    // re-run day 1 with corrected values; day 2 must survive untouched
    val rerun = Seq(("2024-01-01", 1L, 11.0)).toDF("day", "id", "v")
    Sink.writePartitionedDynamic(rerun, dest, Seq("day"))
    // partition directory values are type-inferred (DateType) on read
    val out = spark.read.parquet(dest)
      .select(col("day").cast("string"), col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(("2024-01-01", 1L, 11.0), ("2024-01-02", 3L, 30.0)))
  }
}
