package graft

import graft.ops.Embeddings
import org.apache.spark.sql.functions._

/** Embedding maintenance ops: normalization and quantization invariants. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.queries.Tables.t(spark, sf("sf0.001"), "embeddings")

  test("l2Normalize: unit vectors have norm ~1; zero vector passes through") {
    val unit = Embeddings.l2Normalize(emb, "vec_id", "embedding")
    val norms = unit
      .select(sqrt(graft.ops.Similarity.dot(col("unit"), col("unit"))).as("n"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-12))

    val zero = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val z = Embeddings.l2Normalize(zero, "vec_id", "embedding").collect().head
    assert(z.getAs[Double]("nrm") == 0.0)
    assert(z.getAs[scala.collection.Seq[Double]]("unit").toSeq == Seq(0.0, 0.0))
  }

  test("quantizeInt8: q in [-127,127], dequantization error <= 0.5/scale") {
    val q = Embeddings.quantizeInt8(emb, "vec_id", "embedding")
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "vec_id")
    val rows = q.select("v", "scale", "q").as[(Seq[Double], Double, Seq[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, scale, qs) =>
      assert(qs.forall(x => x >= -127 && x <= 127))
      if (scale > 0) {
        val maxErr = v.zip(qs).map { case (x, qi) => math.abs(x - qi / scale) }.max
        assert(maxErr <= 0.5 / scale + 1e-12)
      }
    }
  }

  test("groupSumInt8: exact integer dimension sums, partitioning-independent") {
    val df = Seq(
      (0, Seq(1.0f, -2.0f)),  // maxabs 2, scale 63.5 -> q = [64, -127]
      (0, Seq(0.5f, 0.5f)),   // maxabs .5, scale 254 -> q = [127, 127]
      (1, Seq(0.0f, 0.0f))    // zero vector -> scale 0 -> q = [0, 0]
    ).toDF("label", "embedding")
    val out = Embeddings.groupSumInt8(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      (0, 0) -> ((2L, 191L)), (0, 1) -> ((2L, 0L)),
      (1, 0) -> ((1L, 0L)), (1, 1) -> ((1L, 0L))))
    val repartitioned = Embeddings.groupSumInt8(df.repartition(7), "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(repartitioned == out)
  }

  test("bpeishTokens segments letter/digit/punct runs") {
    val out = Seq("Hello, world 42!!").toDF("t")
      .select(graft.ops.TextOps.bpeishTokens(col("t")))
      .as[Seq[String]].collect().head
    assert(out == Seq("Hello", ",", "world", "42", "!!"))
  }
}
