package graft.etl

import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Integration test of the JDBC mirror (A12-A17, A19) against embedded
  * Derby — a real database: DDL synthesis, schema evolution on a second
  * batch, per-PCR keyed delete, batched appends, FK creation (once).
  */
class JdbcMirrorSpec extends AnyFunSuite with SparkSpec {

  private val url = "jdbc:derby:memory:graftmirror;create=true"
  private val cfg = JdbcMirror.MirrorConfig(url, dialect = JdbcMirror.DerbyDialect)

  private def xml(pcr: String, vital: String, extraAttr: String = ""): String =
    s"""<EMSDataSet xmlns="http://www.nemsis.org">
       |<PatientCareReport UUID="$pcr">
       |<eVitals.06 CodeType="ct"$extraAttr>$vital</eVitals.06>
       |</PatientCareReport>
       |</EMSDataSet>""".stripMargin

  private def tallOf(docs: (String, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    docs.toSeq.toDF("name", "content").as[(String, String)]
      .flatMap { case (n, c) =>
        XmlFlatten.parse(c.getBytes("UTF-8"), n, "md5", XmlFlatten.DeterministicId)
      }.toDF()
  }

  private def queryCount(sql: String): Int = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); rs.getInt(1)
    } finally conn.close()
  }

  test("mirror batch: create, append, keyed overwrite, evolve, FK") {
    val t1 = tallOf("f1.xml" -> xml("pcr-1", "120"), "f2.xml" -> xml("pcr-2", "130"))
    val tables = JdbcMirror.mirrorBatch(t1, cfg)
    assert(tables == Set("emsdataset", "patientcarereport", "evitals_06"))

    assert(queryCount("""SELECT count(*) FROM "APP"."evitals_06"""") == 2)
    assert(queryCount("""SELECT count(*) FROM "APP"."evitals_06" WHERE "codetype" = 'ct'""") == 2)

    // second batch: same PCR re-ingested with a NEW attribute -> keyed
    // delete + ALTER TABLE ADD COLUMN, and the FK is not re-added
    val t2 = tallOf("f1b.xml" -> xml("pcr-1", "125", """ Units="mmHg""""))
    JdbcMirror.mirrorBatch(t2, cfg)

    assert(queryCount("""SELECT count(*) FROM "APP"."evitals_06"""") == 2) // pcr-1 replaced
    assert(queryCount(
      """SELECT count(*) FROM "APP"."evitals_06" WHERE "evitals_06_value" = '125'""") == 1)
    assert(queryCount(
      """SELECT count(*) FROM "APP"."evitals_06" WHERE "units" = 'mmHg'""") == 1)

    // same-batch replay is fully idempotent (container rows evicted by
    // id, PCR rows by key) — counts unchanged
    JdbcMirror.mirrorBatch(t2, cfg)
    assert(queryCount("""SELECT count(*) FROM "APP"."evitals_06"""") == 2)
    assert(queryCount("""SELECT count(*) FROM "APP"."emsdataset"""") == 3)

    // FK enforced: orphan child insert must fail
    val conn = DriverManager.getConnection(url)
    try {
      val e = intercept[java.sql.SQLException] {
        conn.createStatement().execute(
          """INSERT INTO "APP"."evitals_06" ("element_id", "parent_element_id") VALUES ('x', 'no-such-parent')""")
      }
      assert(e.getSQLState.startsWith("23")) // integrity constraint violation
    } finally conn.close()
  }
}
