package graft.etl

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Ingestion audit log (SURVEY A21/A23): one row per processed file,
  * mirroring `XMLFilesProcessed` (`database_setup.py:80-95`) with the
  * reference's exact status vocabulary (`main_ingest.py:366,378,393,653,
  * 669,684`). Append-only; written last so a replayed batch is detectable.
  */
object Audit {

  object Status {
    val Staged = "Staged_Dynamic_PG_V4"
    val ErrorMd5 = "Error_MD5"
    val ErrorFileNotFound = "Error_FileNotFound"
    val ErrorParsingEmpty = "Error_Parsing_Empty"
    val ErrorStagingTx = "Error_Staging_Tx_PG_V4"
    val ErrorUnexpected = "Error_Unexpected_PG_V4"
    val all: Seq[String] = Seq(Staged, ErrorMd5, ErrorFileNotFound,
      ErrorParsingEmpty, ErrorStagingTx, ErrorUnexpected)
  }

  case class AuditRow(
      processed_file_id: String,
      original_file_name: String,
      md5_hash: String,
      processing_timestamp: Timestamp,
      status: String,
      schema_version_id: Option[Int])

  def rows(spark: SparkSession, rs: Seq[AuditRow]): DataFrame = {
    import spark.implicits._
    rs.toDF()
  }

  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Cross-file duplicate-ingest check by MD5 (SURVEY §2B). */
  def duplicateIngests(audit: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    audit.groupBy("md5_hash").agg(count(lit(1)).as("n_ingests"))
      .where(col("n_ingests") > 1)
  }
}
