package graft.load

import org.apache.spark.sql.DataFrame

/** K1/K2 — the load stage (`/root/reference/data_load.py:27-59`).
  *
  * Reference semantics: BigQuery JSON load job with `write_disposition`
  * from env (`WRITE_APPEND`/`WRITE_TRUNCATE`), `ALLOW_FIELD_ADDITION` +
  * `autodetect=True` schema evolution, and a hard error on empty input
  * (`data_load.py:27-33`). Offline mapping (SURVEY.md §2.7): parquet with
  * append/overwrite + `mergeSchema` on read; in production this trait gets a
  * BigQuery implementation via the spark-bigquery connector.
  */
object Sink {

  /** Empty-input guard (K2, `/root/reference/data_load.py:27-33`). */
  final class EmptyInputException(msg: String) extends RuntimeException(msg)

  sealed trait WriteDisposition { def sparkMode: String }
  case object WriteAppend extends WriteDisposition { val sparkMode = "append" }
  case object WriteTruncate extends WriteDisposition { val sparkMode = "overwrite" }

  object WriteDisposition {
    /** Env-string mapping (`/root/reference/main.py:11`, `data_load.py:44-50`). */
    def fromString(s: String): WriteDisposition = s match {
      case "WRITE_TRUNCATE" => WriteTruncate
      case _                => WriteAppend
    }
  }

  /** Destination naming: `010_warner_dl_lf_{config_id}`
    * (`/root/reference/data_load.py:36`).
    */
  def tableName(configId: String): String = s"010_warner_dl_lf_$configId"

  def writeParquet(df: DataFrame, path: String, disposition: WriteDisposition): Unit = {
    // isEmpty is a cheap limit-1 job; the reference raises ValueError on an
    // empty record list before submitting the load job.
    if (df.isEmpty) throw new EmptyInputException(s"no records to load into $path")
    df.write.mode(disposition.sparkMode).parquet(path)
  }

  /** Read side of ALLOW_FIELD_ADDITION: schema union across appended runs. */
  def readMerged(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
