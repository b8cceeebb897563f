package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** NEMSIS data-dictionary lookup loader (SURVEY A24/A25): the reference
  * HTTP-GETs pipe-delimited text files and full-refreshes
  * `ElementDefinitions` / `FieldDefinitions`
  * (`create_definitions.py:38-63,95-120`).
  *
  * Spark has no HTTP source, so fetch-to-landing-path stays a driver
  * concern (zero-egress here, so the fetch itself is out of scope); the
  * engine's operator is: pipe-CSV scan with header, all-TEXT columns,
  * whitespace-trimmed fields, and an overwrite (full refresh) write.
  */
object DictionaryLoader {

  val ElementDefinitionsColumns: Seq[String] =
    Seq("DatasetName", "ElementNumber", "ElementName", "Code", "CodeDescription")
  val FieldDefinitionsColumns: Seq[String] =
    Seq("Dataset", "DatasetType", "ElementNumber", "ElementName", "Attribute")

  /** Pipe-delimited dictionary scan: header row, every column TEXT,
    * every field trimmed (`create_definitions.py:41-52`).
    */
  def readPipeCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("sep", "|")
      .option("header", "true")
      .option("inferSchema", "false") // all-TEXT contract, §1.2
      .csv(path)
    raw.select(raw.columns.map(c => trim(col(c)).as(c.trim)).toSeq: _*)
  }

  /** Full refresh: DELETE-all + re-insert in the reference
    * (`create_definitions.py:54-63`) == atomic overwrite here.
    */
  def fullRefresh(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
