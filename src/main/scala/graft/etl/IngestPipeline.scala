package graft.etl

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end batch ingest (SURVEY §3.1's Spark-native lifecycle):
  * binaryFile scan -> executor-side flatten -> keyed overwrite against the
  * existing lake -> tall write partitioned by tag -> FK-edge table ->
  * audit append (last, so replays are detectable). The whole row path is
  * distributed; the driver only sees per-file statuses (one tiny collect)
  * and DDL metadata.
  *
  * Storage layout under `lakeDir`:
  *   elements/   tall element table, partitioned by table_name
  *   fk_edges/   distinct (child_table, parent_table) pairs
  *   audit/      append-only XMLFilesProcessed mirror
  */
object IngestPipeline {

  case class Result(
      filesStaged: Seq[String],
      filesErrored: Seq[String],
      elementCount: Long)

  def elementsPath(lakeDir: String) = s"$lakeDir/elements"
  def fkEdgesPath(lakeDir: String) = s"$lakeDir/fk_edges"
  def auditPath(lakeDir: String) = s"$lakeDir/audit"

  def ingestDirectory(
      spark: SparkSession,
      xmlGlob: String,
      lakeDir: String,
      idGen: XmlFlatten.IdGen = XmlFlatten.DeterministicId,
      schemaVersionId: Option[Int] = Some(1)): Result = {

    val statuses = NemsisXmlReader.fileStatuses(spark, xmlGlob, idGen).collect()
    val ok = statuses.filter(_.getLong(2) > 0)
    val bad = statuses.filter(_.getLong(2) == 0)

    val tall = NemsisXmlReader.readTall(spark, xmlGlob, idGen)
      .where(col("source_file").isin(ok.map(_.getString(0)).toSeq: _*))

    val elemsDir = elementsPath(lakeDir)
    val hasExisting = {
      val p = new org.apache.hadoop.fs.Path(elemsDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val merged =
      if (hasExisting) {
        // Idempotent keyed overwrite (A15): evict rows of re-ingested PCRs,
        // and rows of replayed files (container elements like the document
        // root carry no PCR context; without the file-level eviction a
        // same-file replay would duplicate them — the reference actually
        // does accumulate such rows, but with fresh uuid4 ids; our
        // deterministic ids make the file-level replace both safe and
        // strictly more idempotent).
        val existing = spark.read.schema(tall.schema).parquet(elemsDir)
        KeyedOverwrite.multiKey(existing, tall, Seq("source_file", "pcr_uuid_context"))
      } else tall

    // A20 transaction parity on plain parquet: write the merged table to
    // a temp dir, then atomically swap directories — a failure mid-write
    // leaves the previous lake intact (Delta's commit protocol is the
    // production mapping; this is the storage-agnostic equivalent).
    val fs = new org.apache.hadoop.fs.Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpDir = s"$lakeDir/.elements_tmp"
    fs.delete(new org.apache.hadoop.fs.Path(tmpDir), true)
    TagTables.writeTall(merged, tmpDir, SaveMode.Overwrite)
    val bakDir = new org.apache.hadoop.fs.Path(s"$lakeDir/.elements_old")
    fs.delete(bakDir, true)
    if (hasExisting) fs.rename(new org.apache.hadoop.fs.Path(elemsDir), bakDir)
    fs.rename(new org.apache.hadoop.fs.Path(tmpDir), new org.apache.hadoop.fs.Path(elemsDir))
    fs.delete(bakDir, true)

    TagTables.fkEdges(spark.read.parquet(elemsDir))
      .write.mode(SaveMode.Overwrite).parquet(fkEdgesPath(lakeDir))

    val now = new Timestamp(System.currentTimeMillis())
    val auditRows = ok.map { r =>
      Audit.AuditRow(XmlFlatten.DeterministicId.id(r.getString(0), -1),
        r.getString(0), r.getString(1), now, Audit.Status.Staged, schemaVersionId)
    } ++ bad.map { r =>
      Audit.AuditRow(XmlFlatten.DeterministicId.id(r.getString(0), -1),
        r.getString(0), r.getString(1), now, Audit.Status.ErrorParsingEmpty, schemaVersionId)
    }
    Audit.append(Audit.rows(spark, auditRows.toSeq), auditPath(lakeDir))

    val n = spark.read.parquet(elemsDir).count()
    Result(ok.map(_.getString(0)).toSeq, bad.map(_.getString(0)).toSeq, n)
  }

  /** Streaming ingest (SURVEY A31): the reference's per-file shell loop is
    * exactly Structured Streaming's file source. Each micro-batch runs the
    * same keyed-overwrite ingest; `cleanSource=archive` is the reference's
    * `processed_xml_archive/` move done by the engine itself.
    */
  def streamingIngest(
      spark: SparkSession,
      landingDir: String,
      lakeDir: String,
      archiveDir: String,
      checkpointDir: String,
      idGen: XmlFlatten.IdGen = XmlFlatten.DeterministicId) = {
    import spark.implicits._
    spark.readStream
      .format("binaryFile")
      .option("pathGlobFilter", "*.xml")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))))
      .load(landingDir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        XmlFlatten.parse(bytes, p, NemsisXmlReader.md5Hex(bytes), idGen)
      }
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ElementRecord], _: Long) =>
        val df = batch.toDF()
        val elemsDir = elementsPath(lakeDir)
        val p = new org.apache.hadoop.fs.Path(elemsDir)
        val exists = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration).exists(p)
        val merged =
          if (exists) KeyedOverwrite(df.sparkSession.read.schema(df.schema).parquet(elemsDir), df)
          else df
        TagTables.writeTall(merged.localCheckpoint(eager = true), elemsDir, SaveMode.Overwrite)
        ()
      }
  }
}
