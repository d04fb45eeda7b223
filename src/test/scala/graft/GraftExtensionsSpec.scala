package graft

import graft.ops.Similarity

/** Proves the `spark.sql.extensions=graft.functions.GraftExtensions`
  * route alone resolves the engine's native expressions (VERDICT r11
  * #8). The shared test session is built `withExtensions`, and
  * `newSession()` gives a FRESH sessionState whose function registry is
  * seeded only by builtins + extension-injected functions — any
  * imperative `ensureRegistered` call another suite made against the
  * parent registry is invisible here, so resolution in the child session
  * is attributable to the extension and nothing else.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_array_dot resolves from SQL in a fresh extension-built session") {
    val fresh = spark.newSession()
    val d = fresh.sql("SELECT graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
  }

  test("graft_srp_buckets resolves from SQL and replays the radSign definition") {
    val fresh = spark.newSession()
    val v = Array(0.3, -1.2, 0.7)
    val (planes, tables, dim) = (4, 2, 3)
    val out = fresh.sql(
      s"SELECT graft_srp_buckets(array(${v.mkString("d,")}d), $planes, $tables, $dim) AS b")
      .collect()(0).getSeq[Long](0)
    val expected = (0 until tables).map { t =>
      (0 until planes).foldLeft(0L) { (b, p) =>
        val s = v.indices.foldLeft(0.0)((acc, i) => acc + v(i) * Similarity.radSign(t * planes + p, i))
        if (s > 0) b | (1L << p) else b
      }
    }
    assert(out == expected)
  }

  test("graft_pq_codes resolves from SQL in a fresh extension-built session") {
    val fresh = spark.newSession()
    // one subspace of width 2, codebook = {code 7: [1,0], code 9: [0,1]}:
    // [3,4] is closer (cosine) to [0,1] -> code 9
    val out = fresh.sql(
      """SELECT graft_pq_codes(array(3.0d, 4.0d), 2,
        |  array(7L, 9L),
        |  array(array(1.0d, 0.0d), array(0.0d, 1.0d)),
        |  array(1.0d, 1.0d)) AS c""".stripMargin)
      .collect()(0).getSeq[Long](0)
    assert(out == Seq(9L))
  }

  test("graft_token_runs resolves from SQL in a fresh extension-built session") {
    val fresh = spark.newSession()
    val out = fresh.sql(
      "SELECT graft_token_runs(lower('  Hello, World!42  '), true) AS t")
      .collect()(0).getSeq[String](0)
    assert(out == Seq("hello", "world", "42"))
    val ws = fresh.sql(
      "SELECT graft_token_runs('  a\tb  c ', false) AS t")
      .collect()(0).getSeq[String](0)
    assert(ws == Seq("a", "b", "c"))
  }

  test("graft_shingle_runs resolves from SQL in a fresh extension-built session") {
    val fresh = spark.newSession()
    val out = fresh.sql(
      "SELECT graft_shingle_runs(array('a', 'b', 'c', 'd'), 3) AS s")
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
  }

  test("graft_winnow_runs resolves from SQL and matches the TextOps column route") {
    val fresh = spark.newSession()
    val text = "the quick brown fox jumps over the lazy dog"
    val sqlOut = fresh.sql(
      s"SELECT graft_winnow_runs('$text', 8, 4) AS f")
      .collect()(0).getSeq[Long](0)
    import fresh.implicits._
    val colOut = graft.ops.TextOps
      .winnowFingerprints(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 8, 4)
      .collect()(0).getAs[scala.collection.Seq[Long]]("fps")
    // the SQL route skips normalize(); this text is already normalized,
    // so the two routes must agree exactly
    assert(sqlOut.nonEmpty && sqlOut == colOut)
  }

  test("both routes build the same expression (shared builder, no drift)") {
    import graft.functions.{ArrayDot, SrpBuckets}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = Literal.create(Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    assert(ArrayDot.builder(Seq(a, a)) == ArrayDot(a, a))
    assert(SrpBuckets.builder(Seq(a, Literal(8), Literal(4), Literal(2))) ==
      SrpBuckets(a, 8, 4, 2))
  }
}
