package graft.util

import org.apache.spark.sql.SparkSession

/** Build-time hyperparameter metadata for persisted index/tokenizer
  * artifacts (`buildIvfPqIndex`, `saveTokenizer`, `lshBuildIndex`).
  *
  * The hazard this closes (r19 advice): every `*WithIndex`/`load*` entry
  * point used to TRUST the caller to repeat the build-time
  * hyperparameters — a query passing a different `nCodes`/`subDim` than
  * the persisted codes were encoded with would index a freshly derived
  * codebook with stale code words and silently return wrong neighbors.
  * With the params file written at build time and validated on load, a
  * mismatch fails loudly instead.
  *
  * Stored as a ONE-ROW parquet (`dir/params` by convention) with string
  * columns — parquet rather than JSON so the artifact stays
  * single-format, readable by any engine, and free of hand-rolled
  * parsing. The row is bounded by construction (a handful of scalars).
  */
object ArtifactParams {

  /** Write `params` as the artifact's one-row metadata table. */
  def write(spark: SparkSession, dir: String, params: Seq[(String, String)]): Unit = {
    require(params.nonEmpty, "artifact params must not be empty")
    import org.apache.spark.sql.{Row, types => T}
    val schema = T.StructType(params.map { case (k, _) => T.StructField(k, T.StringType) })
    spark
      .createDataFrame(
        java.util.Collections.singletonList(Row.fromSeq(params.map(_._2))),
        schema)
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Read the artifact's params row back as a map. Fails loudly on a
    * missing or malformed params table — an artifact without metadata is
    * not a valid artifact of this library.
    */
  def read(spark: SparkSession, dir: String): Map[String, String] = {
    val rows = spark.read.parquet(dir).collect()
    require(
      rows.length == 1,
      s"artifact params at $dir must be exactly one row, found ${rows.length}")
    val r = rows.head
    r.schema.fieldNames.iterator.zipWithIndex
      .map { case (f, i) => f -> String.valueOf(r.get(i)) }
      .toMap
  }

  /** Validate that the artifact at `dir` was built with exactly
    * `expected` — fail loudly (with both sides printed) on any mismatch
    * or missing key, instead of silently querying with stale codebooks.
    */
  def validate(spark: SparkSession, dir: String, expected: Seq[(String, String)]): Unit = {
    val actual = read(spark, dir)
    val diffs = expected.flatMap { case (k, v) =>
      actual.get(k) match {
        case Some(a) if a == v => None
        case other             => Some(s"$k: expected $v, artifact has ${other.getOrElse("<missing>")}")
      }
    }
    require(
      diffs.isEmpty,
      s"artifact at $dir was built with different hyperparameters than the query supplies — " +
        s"refusing to return silently-wrong results: ${diffs.mkString("; ")}")
  }
}
