package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.IngestPipeline

/** CLI surface for the XML ingest path: `runMain graft.IngestDemo
  * <xmlGlob> <lakeDir> [jdbcUrl]` runs the full batch pipeline and
  * prints the resulting lake state (per-tag counts, FK edges, audit
  * rows); with a jdbcUrl it also mirrors the batch to that database
  * (A12-A17) and prints the mirrored tables.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val Array(xmlGlob, lakeDir) = args.take(2)
    val jdbcUrl = args.lift(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val r = IngestPipeline.ingestDirectory(spark, xmlGlob, lakeDir)
    println(s"staged=${r.filesStaged.size} errored=${r.filesErrored.size} elements=${r.elementCount}")

    println("--- per-tag counts ---")
    spark.read.parquet(IngestPipeline.elementsPath(lakeDir))
      .groupBy("table_name").count().orderBy("table_name")
      .collect().foreach(r => println(s"${r.get(0)}: ${r.get(1)}"))

    println("--- fk edges ---")
    spark.read.parquet(IngestPipeline.fkEdgesPath(lakeDir))
      .orderBy("child_table").collect()
      .foreach(r => println(s"${r.get(0)} -> ${r.get(1)}"))

    jdbcUrl.foreach { url =>
      val dialect =
        if (url.startsWith("jdbc:derby")) graft.etl.JdbcMirror.DerbyDialect
        else graft.etl.JdbcMirror.PostgresDialect
      val cfg = graft.etl.JdbcMirror.MirrorConfig(url, dialect = dialect)
      val mirrored = graft.etl.JdbcMirror.mirrorBatch(
        spark.read.parquet(IngestPipeline.elementsPath(lakeDir)), cfg)
      println(s"--- jdbc mirror: ${mirrored.toSeq.sorted.mkString(", ")} ---")
      // the reference's log_processed_file: audit rows land in the DB's
      // XMLFilesProcessed control table too, keyed on ProcessedFileID
      graft.etl.JdbcMirror.mirrorAudit(
        spark.read.parquet(IngestPipeline.auditPath(lakeDir)), cfg)
    }

    println("--- audit ---")
    spark.read.parquet(IngestPipeline.auditPath(lakeDir))
      .select("original_file_name", "status").orderBy("original_file_name")
      .collect().foreach(r => println(s"${r.get(0)}: ${r.get(1)}"))

    spark.stop()
  }
}
