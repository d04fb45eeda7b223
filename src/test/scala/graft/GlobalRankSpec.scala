package graft

import graft.ops.{GlobalRank, Skew}
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank equals the single-partition row_number, any partitioning") {
    val df = Seq(
      (1L, 50.0), (2L, 10.0), (3L, 50.0), (4L, 99.0), (5L, 10.0),
      (6L, 75.0), (7L, 0.5), (8L, 99.0), (9L, 33.0), (10L, 33.0)
    ).toDF("id", "score")
    val expected = df
      .orderBy(col("score").desc, col("id").asc)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    for (input <- Seq(df, df.repartition(7), df.repartition(1))) {
      val got = GlobalRank
        .globalRank(input, Seq(col("score").desc, col("id").asc), "rnk", parts = 4)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk")).toMap
      assert(got == expected)
    }
  }

  test("globalCumSum equals the single-partition running sum, any partitioning") {
    val df = Seq(
      (1L, 5L), (2L, 1L), (3L, 7L), (4L, 2L), (5L, 9L),
      (6L, 4L), (7L, 8L), (8L, 3L), (9L, 6L), (10L, 0L)
    ).toDF("k", "v")
    var acc = 0L
    val expected = df.orderBy(col("k")).collect().map { r =>
      acc += r.getLong(1); r.getLong(0) -> acc
    }.toMap
    for (input <- Seq(df, df.repartition(7), df.repartition(1))) {
      val got = GlobalRank
        .globalCumSum(input, Seq(col("k")), col("v"), "run", parts = 4)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("run")).toMap
      assert(got == expected)
    }
  }

  test("saltedJoin equals the plain join (every pair exactly once)") {
    val left = Seq((1L, 100L), (1L, 101L), (1L, 102L), (2L, 200L), (3L, 300L))
      .toDF("k", "row_id")
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "attr")
    val plain = left.join(right, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(left, right, "k", col("row_id"), salts = 4)
      .select("k", "row_id", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 4)
  }
}
