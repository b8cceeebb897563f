package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.etl.Migrations

/** Sidecar loaders (SURVEY A24-A30): pipe-CSV dictionary scan, vendor
  * sheet import, rename migration.
  */
class SidecarSourcesSpec extends AnyFunSuite with SparkSpec {

  test("pipe-CSV dictionary loader trims fields and keeps all-TEXT schema") {
    val dir = Files.createTempDirectory("graft_dict")
    Files.writeString(dir.resolve("defs.txt"),
      """DatasetName|ElementNumber|ElementName|Code|CodeDescription
        |EMSDataSet | eVitals.01 |  SBP  |9924001| Systolic Blood Pressure
        |EMSDataSet|eVitals.02|DBP|9924003|Diastolic """.stripMargin)
    val df = DictionaryLoader.readPipeCsv(spark, dir.resolve("defs.txt").toString)
    assert(df.columns.toSeq == DictionaryLoader.ElementDefinitionsColumns)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val r = df.orderBy("ElementNumber").collect()
    assert(r(0).getString(1) == "eVitals.01")
    assert(r(0).getString(2) == "SBP") // trimmed
    assert(r(1).getString(4) == "Diastolic") // trailing space trimmed
  }

  test("A24 fetch seam: dictionary load end-to-end through a Fetcher") {
    val dir = Files.createTempDirectory("graft_fetch")
    val source = dir.resolve("remote.txt")
    Files.writeString(source,
      """DatasetName|ElementNumber|ElementName|Code|CodeDescription
        |EMSDataSet|eVitals.01|SBP|9924001|Systolic""".stripMargin)
    // file-backed test double for the zero-egress environment; the
    // HttpFetcher implements the same trait for real deployments
    val double = new DictionaryLoader.Fetcher {
      override def fetchToFile(url: String, landingPath: java.nio.file.Path): java.nio.file.Path = {
        assert(url == "https://nemsis.example/enum.txt") // url is threaded through
        Files.copy(source, landingPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val landing = dir.resolve("landing.txt")
    val df = DictionaryLoader.fetchAndRead(spark, double,
      "https://nemsis.example/enum.txt", landing)
    assert(Files.exists(landing))
    assert(df.columns.toSeq == DictionaryLoader.ElementDefinitionsColumns)
    assert(df.head().getString(4) == "Systolic")
    // full refresh lands parquet the relational queries can read back
    val out = dir.resolve("element_definitions").toString
    DictionaryLoader.fullRefresh(df, out)
    assert(spark.read.parquet(out).count() == 1)
  }

  test("vendor import: projection, all-null drop, stringify, naming") {
    val dir = Files.createTempDirectory("graft_vendor")
    Files.writeString(dir.resolve("Crew Members.csv"),
      """CrewID,Name,Role,Ignored
        |1,Ann,Medic,x
        |,,,
        |2,Bo,Driver,y""".stripMargin)
    val provider = new VendorImport.CsvDirProvider(spark, dir.toString)
    val out = VendorImport.importVendor(provider, "imagetrend",
      Map("Crew Members" -> Seq("CrewID", "Name", "Role")))
    assert(out.keySet == Set("imagetrend_crew_members"))
    val df = out("imagetrend_crew_members")
    assert(df.columns.toSeq == Seq("CrewID", "Name", "Role"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 2) // all-null row dropped
  }

  test("imagetrend spec: full transcription, distinct table names, real sheet shapes") {
    // all 26 reference sheets, and every derived table name is distinct —
    // including the truncation-collision trio around
    // "Emergency Department Procedure(s)"
    assert(VendorImport.ImagetrendSpec.size == 26)
    val names = VendorImport.ImagetrendSpec.keys
      .map(graft.etl.Sanitize.vendorTableName("imagetrend", _)).toSeq
    assert(names.distinct.size == names.size)
    assert(names.contains("imagetrend_emergency_department_procedures"))
    assert(names.contains("imagetrend_emergency_department_procedure_")) // trailing space sheet
    assert(VendorImport.ImagetrendSpec("DataSetFieldValues").size == 8)
    assert(VendorImport.ImagetrendSpec("Cause of Injury (eInjury.01)") ==
      Seq("Code", "Value", "Label", "Sort Order", "Resource Type"))

    // drive three real sheet shapes through the CSV staging provider
    val dir = Files.createTempDirectory("graft_imagetrend")
    Files.writeString(dir.resolve("DataSetFieldValues.csv"),
      """Field Code,Field Name,Data Type,Code,Value,Label,Sort Order,Active,Extra
        |eVitals.06,SBP,int,9924001,120,Systolic,1,Y,junk
        |,,,,,,,,""".stripMargin)
    Files.writeString(dir.resolve("Emergency Department Procedures.csv"),
      """Code,Value,Label,Sort Order,Resource Type
        |P1,v1,full-sheet,1,proc""".stripMargin)
    Files.writeString(dir.resolve("Emergency Department Procedure .csv"),
      """Code,Value,Label,Sort Order,Resource Type
        |P2,v2,truncated-sheet,1,proc""".stripMargin)
    val provider = new VendorImport.CsvDirProvider(spark, dir.toString)
    val subset = VendorImport.ImagetrendSpec.view.filterKeys(Set(
      "DataSetFieldValues", "Emergency Department Procedures",
      "Emergency Department Procedure ")).toMap
    val out = VendorImport.importVendor(provider, "imagetrend", subset)
    assert(out.keySet == Set(
      "imagetrend_datasetfieldvalues",
      "imagetrend_emergency_department_procedures",
      "imagetrend_emergency_department_procedure_"))
    val dsfv = out("imagetrend_datasetfieldvalues")
    assert(dsfv.columns.toSeq == VendorImport.ImagetrendSpec("DataSetFieldValues"))
    assert(dsfv.count() == 1) // all-null row dropped, Extra column projected away
    assert(out("imagetrend_emergency_department_procedures")
      .select("Label").head().getString(0) == "full-sheet")
    assert(out("imagetrend_emergency_department_procedure_")
      .select("Label").head().getString(0) == "truncated-sheet")

    // registry path refuses unknown vendors (reference ValueError)
    intercept[IllegalArgumentException] {
      VendorImport.importVendorByName(provider, "zoll", "src")
    }
  }

  test("xlsx provider: real workbook decode through JDK zip+StAX") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("graft_xlsx")
    val path = dir.resolve("codebook.xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="DataSetFields" sheetId="1" r:id="rId1"/>
        |    <sheet name="Cause of Injury (eInjury.01)" sheetId="2" r:id="rId2"/>
        |  </sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |  <si><t>Field Code</t></si>
        |  <si><t>Field Name</t></si>
        |  <si><r><t>eVitals</t></r><r><t>.06</t></r></si>
        |  <si><t>SBP</t></si>
        |</sst>""".stripMargin)
    // sheet1: shared strings in the header, rich text, a number cell, a
    // boolean, a skipped cell (sparse refs), an empty trailing row
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="s"><v>1</v></c>
        |      <c r="C1" t="inlineStr"><is><t>Data Type</t></is></c>
        |      <c r="D1" t="inlineStr"><is><t>Active</t></is></c>
        |      <c r="E1" t="inlineStr"><is><t>Default Label</t></is></c>
        |      <c r="F1" t="inlineStr"><is><t>Specific Module</t></is></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2" t="s"><v>2</v></c>
        |      <c r="B2" t="s"><v>3</v></c>
        |      <c r="C2"><v>9924001</v></c>
        |      <c r="D2" t="b"><v>1</v></c>
        |      <c r="F2" t="str"><v>ems</v></c>
        |    </row>
        |    <row r="3"/>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    part("xl/worksheets/sheet2.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row><c t="inlineStr"><is><t>Code</t></is></c><c t="inlineStr"><is><t>Value</t></is></c><c t="inlineStr"><is><t>Label</t></is></c><c t="inlineStr"><is><t>Sort Order</t></is></c><c t="inlineStr"><is><t>Resource Type</t></is></c></row>
        |    <row><c t="inlineStr"><is><t>I1</t></is></c><c><v>7</v></c><c t="inlineStr"><is><t>fall</t></is></c><c><v>1</v></c><c t="inlineStr"><is><t>injury</t></is></c></row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    zos.close()

    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("AA3") == 26)
    val provider = new XlsxSheetProvider(spark, path.toString)
    val subset = VendorImport.ImagetrendSpec.view
      .filterKeys(Set("DataSetFields", "Cause of Injury (eInjury.01)")).toMap
    val out = VendorImport.importVendor(provider, "imagetrend", subset)
    val dsf = out("imagetrend_datasetfields")
    assert(dsf.columns.toSeq == VendorImport.ImagetrendSpec("DataSetFields"))
    val r = dsf.head()
    assert(r.getString(0) == "eVitals.06") // rich-text shared string
    assert(r.getString(1) == "SBP")
    assert(r.getString(3) == "9924001")    // number cell, raw stored text
    assert(r.getString(4) == "TRUE")       // boolean cell
    assert(r.getString(5) == "ems")        // formula-cached string
    assert(r.isNullAt(2))                  // skipped E2 -> Default Label null
    assert(dsf.count() == 1)               // empty row dropped by na.drop
    val coi = out("imagetrend_cause_of_injury_(einjury_01)")
    assert(coi.select("Label").head().getString(0) == "fall")
    // unknown sheet fails loudly, listing what the workbook has
    val e = intercept[IllegalArgumentException](provider.sheet("NoSuch"))
    assert(e.getMessage.contains("DataSetFields"))
  }

  test("xlsx shared strings: text after nested runs kept, phonetic rPh skipped") {
    import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
    val dir = Files.createTempDirectory("graft_xlsx_rich")
    val path = dir.resolve("rich.xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    zos.putNextEntry(new ZipEntry("xl/sharedStrings.xml"))
    // si 0: rich text where a <rPr> formatting element interrupts the
    // runs — text AFTER it must still be collected;
    // si 1: Japanese cell with phonetic <rPh> annotation runs that
    // pandas/openpyxl exclude from the cell value
    zos.write(
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
        |  <si><r><t>before</t></r><r><rPr><b/></rPr><t xml:space="preserve"> after</t></r></si>
        |  <si><r><t>東京</t></r><rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si>
        |</sst>""".stripMargin.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val zip = new ZipFile(path.toFile)
    try {
      val ss = Xlsx.sharedStrings(zip)
      assert(ss(0) == "before after")
      assert(ss(1) == "東京") // phonetic runs are annotations, not content
    } finally zip.close()
  }

  test("jsonl corpus: schema-pinned read, quarantine, sharded round-trip") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("part0.jsonl"),
      """{"doc_id": 1, "text": "hello world", "source": "web"}
        |{"doc_id": 2, "text": "bonjour", "source": "web", "extra_field": true}
        |{not valid json at all
        |{"doc_id": 3, "text": "ciao", "source": "books"}""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    val quarantined = Jsonl.quarantine(
      Jsonl.read(spark, dir.resolve("part0.jsonl").toString, schema))
    val (clean, corrupt) = (quarantined.clean, quarantined.corrupt)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "source")) // extra field dropped
    assert(clean.count() == 3)
    assert(corrupt.count() == 1)
    assert(corrupt.head().getString(0).startsWith("{not valid"))

    // round-trip through a split-sharded layout (the c01 assignment)
    val out = dir.resolve("corpus").toString
    val withSplit = clean.withColumn("split",
      graft.ops.Curation.splitAssign(org.apache.spark.sql.functions.col("doc_id")))
    Jsonl.write(withSplit, out, partitionBy = Seq("split"))
    val back = spark.read.schema(schema.add("split", StringType)).json(out)
    assert(back.count() == 3)
    assert(back.select("split").distinct().count() >= 1) // partition col restored
    quarantined.release() // the split pins the parse; callers must release
  }

  test("jsonl streaming: shards landed across micro-batches, corrupt lines split off") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_jsonl_stream")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Files.writeString(dir.resolve("shard0.jsonl"),
      """{"doc_id": 1, "text": "alpha"}
        |{"doc_id": 2, "text": "beta"}""".stripMargin)
    val parsed = Jsonl.readStream(spark, dir.toString, schema, maxFilesPerTrigger = 1)
    val q = parsed
      .select(col("doc_id"), col("text"), col(Jsonl.CorruptCol).isNotNull.as("corrupt"))
      .writeStream.format("memory").queryName("jsonl_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_stream").count() == 2)
      // a later shard with one malformed line arrives in a NEW batch
      Files.writeString(dir.resolve("shard1.jsonl"),
        """{"doc_id": 3, "text": "gamma"}
          |{oops not json""".stripMargin)
      q.processAllAvailable()
      val rows = spark.table("jsonl_stream")
      assert(rows.count() == 4)
      assert(rows.where(col("corrupt")).count() == 1)
      assert(rows.where(!col("corrupt")).count() == 3)
    } finally q.stop()
  }

  test("A30 rename migration is idempotent and reversible") {
    import spark.implicits._
    val legacy = Seq(("e1", "120")).toDF("element_id", "text_content")
    val up = Migrations.renameValueColumn(legacy, "eVitals_06")
    assert(up.columns.contains("evitals_06_value"))
    // idempotent
    assert(Migrations.renameValueColumn(up, "eVitals_06").columns.toSeq == up.columns.toSeq)
    // reversible
    val down = Migrations.revertValueColumn(up, "eVitals_06")
    assert(down.columns.contains("text_content"))
    assert(Migrations.renameValueColumnSql("public", "eVitals_06") ==
      """ALTER TABLE "public"."evitals_06" RENAME COLUMN "text_content" TO "evitals_06_value";""")
  }
}
