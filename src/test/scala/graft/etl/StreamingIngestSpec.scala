package graft.etl

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Drives the Structured Streaming ingest (SURVEY A31) end-to-end with
  * real files on a real landing directory: file discovery, executor
  * parse, lake write, source archival.
  */
class StreamingIngestSpec extends AnyFunSuite with SparkSpec {

  test("file-source streaming ingest processes landed XML and archives it") {
    val landing = Files.createTempDirectory("graft_stream_landing")
    val lake = Files.createTempDirectory("graft_stream_lake").toString
    val archive = Files.createTempDirectory("graft_stream_archive").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    Files.writeString(landing.resolve("a.xml"),
      """<EMSDataSet><PatientCareReport UUID="p1"><eVitals.01>v</eVitals.01></PatientCareReport></EMSDataSet>""")

    val q = IngestPipeline.streamingIngest(
      spark, landing.toString, lake, archive, ckpt).start()
    try {
      q.processAllAvailable()
      val tall = spark.read.parquet(IngestPipeline.elementsPath(lake))
      assert(tall.count() == 3)
      assert(tall.where(col("pcr_uuid_context") === "p1").count() == 2)

      // second file lands mid-stream: next micro-batch picks it up and
      // the keyed overwrite applies (same PCR, updated value)
      Files.writeString(landing.resolve("b.xml"),
        """<EMSDataSet><PatientCareReport UUID="p1"><eVitals.01>v2</eVitals.01></PatientCareReport></EMSDataSet>""")
      q.processAllAvailable()
      val tall2 = spark.read.parquet(IngestPipeline.elementsPath(lake))
      val vals = tall2.where(col("table_name") === "eVitals_01")
        .select("text_value").collect().map(_.getString(0)).toSeq
      assert(vals == Seq("v2"))
    } finally q.stop()
  }

  test("streaming ingest with a per-micro-batch JDBC mirror") {
    val landing = Files.createTempDirectory("graft_streamm_landing")
    val lake = Files.createTempDirectory("graft_streamm_lake").toString
    val archive = Files.createTempDirectory("graft_streamm_archive").toString
    val ckpt = Files.createTempDirectory("graft_streamm_ckpt").toString
    val url = "jdbc:derby:memory:graftstreammirror;create=true"
    val cfg = JdbcMirror.MirrorConfig(url, dialect = JdbcMirror.DerbyDialect)

    Files.writeString(landing.resolve("a.xml"),
      """<EMSDataSet><PatientCareReport UUID="p1"><eVitals.01>v</eVitals.01></PatientCareReport></EMSDataSet>""")
    val q = IngestPipeline.streamingIngest(
      spark, landing.toString, lake, archive, ckpt, mirror = Some(cfg)).start()
    try {
      q.processAllAvailable()
      // second micro-batch re-ingests the same PCR: the mirror's keyed
      // delete keeps the DB at one row per element, updated value
      Files.writeString(landing.resolve("b.xml"),
        """<EMSDataSet><PatientCareReport UUID="p1"><eVitals.01>v2</eVitals.01></PatientCareReport></EMSDataSet>""")
      q.processAllAvailable()
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          """SELECT "evitals_01_value" FROM "APP"."evitals_01"""")
        assert(rs.next() && rs.getString(1) == "v2")
        assert(!rs.next())
        rs.close()
      } finally conn.close()
    } finally q.stop()
  }
}
