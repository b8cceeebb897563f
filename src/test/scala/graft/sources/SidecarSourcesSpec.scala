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
