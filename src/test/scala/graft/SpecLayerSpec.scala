package graft

import graft.spec.{DateMacro, ExportConfig}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.time.LocalDate

/** Spec-layer tests: config parsing and the nDaysAgo macro
  * (`/root/reference/data_extract.py:109-126`, `main.py:50,72-78`).
  */
class SpecLayerSpec extends AnyFunSuite {

  private val today = LocalDate.of(2024, 12, 20)

  test("nDaysAgo macro: {{nDaysAgo 30}} → today-30 as yyyy-MM-dd") {
    assert(DateMacro.nDaysAgo("{{nDaysAgo 30}}", today).contains("2024-11-20"))
    assert(DateMacro.nDaysAgo("{{ nDaysAgo 1 }}", today).contains("2024-12-19"))
  }

  test("nDaysAgo: non-macro input → None (reference logs ERROR, returns None)") {
    assert(DateMacro.nDaysAgo("2024-01-01", today).isEmpty)
    assert(DateMacro.nDaysAgo("nDaysAgo 3", today).isEmpty)
    assert(DateMacro.nDaysAgo("", today).isEmpty)
  }

  test("resolve: literal dates pass through, macros resolve, junk → None") {
    assert(DateMacro.resolve("2024-05-05", today).contains("2024-05-05"))
    assert(DateMacro.resolve("{{nDaysAgo 0}}", today).contains("2024-12-20"))
    assert(DateMacro.resolve("yesterday", today).isEmpty)
  }

  test("nDaysAgo property: always yyyy-MM-dd and before-or-equal today") {
    val gen = Gen.choose(0, 10000)
    val samples = (0 until 100).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    (samples ++ Seq(0, 1, 365, 10000)).foreach { n =>
      val out = DateMacro.nDaysAgo(s"{{nDaysAgo $n}}", today)
      assert(out.exists(_.matches("""\d{4}-\d{2}-\d{2}""")), s"n=$n")
      assert(out.exists(s => !LocalDate.parse(s).isAfter(today)), s"n=$n")
    }
  }

  test("ExportConfig.parseAll: field order preserved, dtypes merged, brands read") {
    val json =
      """{
        |  "brand_content": {
        |    "dataset_id": "dataset_content_metrics",
        |    "metrics": {"lfm.m1": "float64", "lfm.m2": "int64"},
        |    "group_by": {"lfm.g1": "int64", "lfm.g2": "datetime64[ns]"},
        |    "meta_dimensions": {"lfm.d1": "string"},
        |    "brands": [17448, 17449]
        |  }
        |}""".stripMargin
    val cfgs = ExportConfig.parseAll(json)
    assert(cfgs.size == 1)
    val c = cfgs.head
    assert(c.configId == "brand_content")
    assert(c.isContentDataset)
    assert(c.orderedColumns == Seq("lfm.g1", "lfm.g2", "lfm.d1", "lfm.m1", "lfm.m2"))
    assert(c.dtypes("lfm.m1") == "float64")
    assert(c.brands == Seq(17448L, 17449L))
  }

  test("ExportConfig: missing sections default empty") {
    val c = ExportConfig.parseAll("""{"x": {"dataset_id": "d"}}""").head
    assert(c.metrics.isEmpty && c.groupBy.isEmpty && c.brands.isEmpty)
    assert(!c.isContentDataset)
  }
}
