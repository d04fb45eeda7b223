package graft

import graft.transform.Transforms
import org.apache.spark.sql.functions._

/** Cast-coercion parity with the reference's pandas semantics
  * (`/root/reference/data_transform.py:34-44`; SURVEY.md §1.2) plus the
  * P5 sentinel filter and F4 sanitizer.
  */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("int64 coercion: '3.5'→3, 'abc'→0, null→0, '42'→42, '-2.9'→-2") {
    val df = Seq("3.5", "abc", null, "42", "-2.9").toDF("x")
    val out = df.select(Transforms.castColumn(col("x"), "int64").as("x")).as[Long].collect()
    assert(out.toSeq == Seq(3L, 0L, 0L, 42L, -2L))
  }

  test("float64 coercion: junk→0.0, numeric strings parse") {
    val df = Seq("1.25", "n/a", null, "1e3").toDF("x")
    val out = df.select(Transforms.castColumn(col("x"), "float64").as("x")).as[Double].collect()
    assert(out.toSeq == Seq(1.25, 0.0, 0.0, 1000.0))
  }

  test("datetime coercion: unparseable→null (NaT analogue)") {
    val df = Seq("2024-11-03 10:15:00", "not-a-date", null).toDF("x")
    val out = df.select(Transforms.castColumn(col("x"), "datetime64[ns]").as("x")).collect()
    assert(out(0).getTimestamp(0) != null)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("string cast: ints/doubles stringify, null stays null") {
    val df = Seq((1, 2.5), (3, 4.0)).toDF("a", "b")
    val out = df.select(
      Transforms.castColumn(col("a"), "string").as("a"),
      Transforms.castColumn(col("b"), "string").as("b")
    ).as[(String, String)].collect()
    assert(out(0) == (("1", "2.5")))
  }

  test("unknown dtype throws") {
    intercept[IllegalArgumentException](Transforms.castColumn(col("x"), "bogus"))
  }

  test("dropRowsContaining drops a row when ANY column matches, keeps null-bearing rows") {
    val df = Seq(
      ("ok", "fine", 1),
      ("unauthorized", "fine", 2),
      ("ok", "unauthorized", 3),
      (null, "fine", 4)
    ).toDF("a", "b", "c")
    val kept = Transforms.dropRowsContaining(df).select("c").as[Int].collect().sorted
    assert(kept.toSeq == Seq(1, 4))
  }

  test("dropRowsContaining matches non-string columns via string equality (pandas isin parity)") {
    val df = Seq((1, "x"), (2, "y")).toDF("n", "s")
    val kept = Transforms.dropRowsContaining(df, sentinel = "2").select("n").as[Int].collect()
    assert(kept.toSeq == Seq(1))
  }

  test("sanitizeColumnNames: every '.' → '&'") {
    val df = Seq((1, 2)).toDF("lfm.post.link", "plain")
    assert(Transforms.sanitizeColumnNames(df).columns.toSeq == Seq("lfm&post&link", "plain"))
  }

  test("projectColumns keeps order and drops extras") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    assert(Transforms.projectColumns(df, Seq("z", "x")).columns.toSeq == Seq("z", "x"))
  }

  test("formatDates: date and ISO-T formats (F3)") {
    val df = Seq("2024-11-03 10:15:00").toDF("raw")
      .select(col("raw").cast("timestamp").as("d"), col("raw").cast("timestamp").as("t"))
    val out = Transforms.formatDates(df, dateCols = Seq("d"), timestampCols = Seq("t"))
      .as[(String, String)].collect().head
    assert(out == (("2024-11-03", "2024-11-03T10:15:00")))
  }
}
