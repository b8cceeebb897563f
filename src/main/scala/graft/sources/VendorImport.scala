package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Sanitize

/** Vendor code-book import (SURVEY A26-A29): the reference reads one
  * Excel sheet per entry of a hardcoded vendor spec, projects a fixed
  * column subset, drops all-null rows, stringifies every cell, and lands
  * one all-TEXT table named `{source}_{sheet}`
  * (`vendor_import.py:6-245`).
  *
  * The Excel decode itself is pluggable ([[SheetProvider]]): no POI jar
  * ships in this environment, so the bundled provider reads
  * `<dir>/<sheet>.csv` staging files — the operator surface (projection,
  * all-null drop, stringify, naming) is the real, tested part, and a
  * POI-backed provider slots in without touching it.
  */
object VendorImport {

  /** vendor -> (sheet name -> columns to keep), mirroring
    * `VENDOR_SPECS` (`vendor_import.py:6-198`).
    */
  type VendorSpec = Map[String, Seq[String]]

  trait SheetProvider {
    def sheet(name: String): DataFrame
  }

  /** CSV staging-dir provider (one `<sheet>.csv` per sheet, header row). */
  final class CsvDirProvider(spark: SparkSession, dir: String) extends SheetProvider {
    override def sheet(name: String): DataFrame =
      spark.read.option("header", "true").option("inferSchema", "false")
        .csv(s"$dir/$name.csv")
  }

  /** One sheet -> cleaned all-TEXT DataFrame: usecols projection
    * (A26), all-null-row drop (A27), string cast + null-normalize (A28).
    */
  def importSheet(provider: SheetProvider, sheetName: String, usecols: Seq[String]): DataFrame = {
    val df = provider.sheet(sheetName)
    val present = usecols.filter(df.columns.contains)
    df.select(present.map(col).toSeq: _*)
      .na.drop("all")
      .select(present.map(c => col(c).cast("string").as(c)).toSeq: _*)
  }

  /** Full vendor import: (derived table name -> DataFrame) per sheet of
    * the spec, names per `{source}_{sheet}` contract (A29).
    */
  def importVendor(provider: SheetProvider, source: String, spec: VendorSpec): Map[String, DataFrame] =
    spec.map { case (sheetName, cols) =>
      Sanitize.vendorTableName(source, sheetName) -> importSheet(provider, sheetName, cols)
    }
}
