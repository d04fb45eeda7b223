package graft

import graft.functions.PqCodes

import org.apache.spark.sql.functions._

/** Pins the [[PqCodes]] custom expression to the explode → ×nCodes
  * broadcast-join → struct-max assignment it replaced: same slice
  * clamps, same sequential-fold cosine, same NaN-safe lexicographic
  * argmax (ties → lowest code) — so every PQ oracle and recorded code
  * word reproduces bit-for-bit, by BOTH the interpreted eval and the
  * generated code.
  */
class PqCodesSpec extends SparkSpec {

  private val subspaces = 4
  private val subDim = 16
  private val nCodes = 8

  private lazy val emb = graft.queries.Tables.t(spark, sf("sf0.001"), "embeddings")

  /** The replaced join form, verbatim (Similarity.pqEncodeFromRaw's old
    * body) — kept HERE as the reference semantics the expression must
    * replay.
    */
  private def joinFormEncode: Map[(Long, Long), Long] = {
    val baseRaw = emb.select(col("vec_id").cast("long").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    graft.functions.ArrayDot.ensureRegistered(spark)
    def fastDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function(graft.functions.ArrayDot.name, a, b)
    val subCols = (0 until subspaces).map { s =>
      struct(lit(s).as("s"), slice(col("v"), s * subDim + 1, subDim).as("sv"))
    }
    val subs = baseRaw
      .select(col("vid"), explode(array(subCols: _*)).as("e"))
      .select(col("vid"), col("e.s").as("s"), col("e.sv").as("sv"))
      .withColumn("snrm", sqrt(fastDot(col("sv"), col("sv"))))
    val codebook = subs
      .filter(col("vid") < nCodes)
      .select(col("vid").as("code"), col("s"), col("sv").as("cv"), col("snrm").as("cnrm"))
    subs
      .join(broadcast(codebook), Seq("s"))
      .select(col("vid"), col("s"),
        struct(
          (fastDot(col("sv"), col("cv")) / (col("snrm") * col("cnrm"))).as("sim"),
          (-col("code")).as("negCode")).as("cand"))
      .groupBy(col("vid"), col("s"))
      .agg(max(col("cand")).as("best"))
      .select(col("vid"), col("s").cast("long").as("s"), (-col("best.negCode")).cast("long").as("code"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
  }

  test("expression codes match the join-form reference on the whole fixture") {
    val got = graft.ops.Similarity
      .pqEncode(emb, "vec_id", "embedding", subspaces, subDim, nCodes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val ref = joinFormEncode
    assert(got.size === ref.size)
    ref.foreach { case (k, code) => assert(got(k) === code, s"code mismatch at $k") }
  }

  test("interpreted eval equals generated code (codegen on/off parity)") {
    val enc = graft.ops.Similarity
      .pqEncode(emb, "vec_id", "embedding", subspaces, subDim, nCodes)
    val withCodegen = enc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = enc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(withCodegen.length === interpreted.length)
      withCodegen.zip(interpreted).foreach { case (a, b) => assert(a === b) }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("degenerate shapes: short vectors clamp like slice(); zero-norm tail ranks NaN first") {
    PqCodes.ensureRegistered(spark)
    import spark.implicits._
    // dim 20 < 4 subspaces × 16: subspaces 2 and 3 have empty/short
    // slices → snrm 0 → sim NaN for every code → NaN-safe argmax keeps
    // the FIRST (lowest) code, exactly like max(struct(NaN, −code))
    val cb = (0L until 3L).map(i => (i, Array.tabulate(20)(d => (d + i + 1).toDouble)))
    val rows = cb ++ Seq((7L, Array.tabulate(20)(d => 0.5 * (d % 5))))
    val df = rows.toDF("vid", "raw").select(col("vid"), col("raw").cast("array<double>").as("v"))
    val out = graft.ops.Similarity
      .pqEncode(df, "vid", "v", subspaces, subDim, nCodes = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out.size === 4 * subspaces)
    // subspace 2 starts at offset 32 > len 20 → all sims NaN → code 0
    rows.map(_._1).foreach { vid =>
      assert(out((vid, 2L)) === 0L, s"NaN-tie subspace should keep lowest code for $vid")
      assert(out((vid, 3L)) === 0L)
    }
  }
}
