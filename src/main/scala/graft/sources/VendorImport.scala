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
  * The Excel decode is pluggable ([[SheetProvider]]): [[XlsxSheetProvider]]
  * reads real .xlsx workbooks on JDK-only primitives (zip + StAX, no POI
  * needed), and [[CsvDirProvider]] reads `<dir>/<sheet>.csv` staging
  * files for pre-extracted sheets. The operator surface (projection,
  * all-null drop, stringify, naming) is provider-independent.
  */
object VendorImport {

  /** vendor -> (sheet name -> columns to keep), mirroring
    * `VENDOR_SPECS` (`vendor_import.py:6-198`).
    */
  type VendorSpec = Map[String, Seq[String]]

  /** The imagetrend code-book spec, transcribed sheet-for-sheet from
    * `vendor_import.py:6-198`. Sheet names are Excel's 31-char-truncated
    * forms and are preserved BYTE-FOR-BYTE — including trailing spaces
    * ("Emergency Department Diagnosis ", "Emergency Department Procedure ")
    * which is what keeps their derived table names distinct from the
    * untruncated "Emergency Department Procedures" sheet (trailing space
    * becomes a trailing underscore, `vendor_import.py:223-225`).
    */
  private val CodeListColumns = Seq("Code", "Value", "Label", "Sort Order", "Resource Type")
  val ImagetrendSpec: VendorSpec = scala.collection.immutable.ListMap(
    "DataSetFields" -> Seq(
      "Field Code", "Field Name", "Default Label", "Data Type", "Active", "Specific Module"),
    "DataSetFieldValues" -> Seq(
      "Field Code", "Field Name", "Data Type", "Code", "Value", "Label", "Sort Order", "Active"),
    "Medication Allergies (eHistory." -> CodeListColumns,
    "Environmental Food Allergies (e" -> CodeListColumns,
    "Medical Surgical History (eHist" -> CodeListColumns,
    "Current Medications (eHistory.1" -> CodeListColumns,
    "Cause of Injury (eInjury.01)" -> CodeListColumns,
    "Medication Given (eMedications." -> CodeListColumns,
    "Emergency Department Recorded C" -> CodeListColumns,
    "Emergency Department Procedures" -> CodeListColumns,
    "Emergency Department Diagnosis " -> CodeListColumns,
    "Hospital Procedures (eOutcome.1" -> CodeListColumns,
    "Hospital Diagnosis (eOutcome.13" -> CodeListColumns,
    "EMS Condition Code (ePayment.51" -> CodeListColumns,
    "Procedure (eProcedures.03)" -> CodeListColumns,
    "Incident Location Type (eScene." -> CodeListColumns,
    "Primary Symptom (eSituation.09)" -> CodeListColumns,
    "Other Associated Symptoms (eSit" -> CodeListColumns,
    "Provider's Primary Impression (" -> CodeListColumns,
    "Provider's Secondary Impression" -> CodeListColumns,
    "Patient Activity (eSituation.17" -> CodeListColumns,
    "Controlled Substance Medication" -> CodeListColumns,
    "Medication Ordered (itMedicatio" -> CodeListColumns,
    "Emergency Department Procedure " -> CodeListColumns,
    "Hospital Procedure (itOutcome.0" -> CodeListColumns,
    "Procedure Ordered (itProcedureO" -> CodeListColumns)

  /** Vendor registry, `VENDOR_SPECS` (`vendor_import.py:6-199`). */
  val Specs: Map[String, VendorSpec] = Map("imagetrend" -> ImagetrendSpec)

  trait SheetProvider {
    def sheet(name: String): DataFrame
  }

  /** CSV staging-dir provider (one `<sheet>.csv` per sheet, header row):
    * the alternative to [[XlsxSheetProvider]] when sheets are already
    * extracted (e.g. `ssconvert`/`in2csv --sheet`, or any spreadsheet
    * tool's save-as-CSV — file name must be the exact sheet name,
    * trailing spaces included).
    */
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

  /** Registry-driven entry, the reference CLI's shape
    * (`vendor_import.py:211-215`): unknown vendors are refused loudly.
    */
  def importVendorByName(provider: SheetProvider, vendor: String, source: String): Map[String, DataFrame] =
    importVendor(provider, source, Specs.getOrElse(vendor,
      throw new IllegalArgumentException(
        s"Vendor '$vendor' not supported. Add it to VendorImport.Specs.")))
}
