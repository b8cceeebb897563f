package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Path
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** NEMSIS data-dictionary lookup loader (SURVEY A24/A25): the reference
  * HTTP-GETs pipe-delimited text files and full-refreshes
  * `ElementDefinitions` / `FieldDefinitions`
  * (`create_definitions.py:38-63,95-120`).
  *
  * Spark has no HTTP source, so fetch-to-landing-path is a driver
  * concern behind [[DictionaryLoader.Fetcher]] — the bundled
  * `java.net.http` implementation covers deployments with egress, tests
  * use a local-copy double (this environment is zero-egress). The
  * engine's operator is: pipe-CSV scan with header, all-TEXT columns,
  * whitespace-trimmed fields, and an overwrite (full refresh) write.
  */
object DictionaryLoader {

  val ElementDefinitionsColumns: Seq[String] =
    Seq("DatasetName", "ElementNumber", "ElementName", "Code", "CodeDescription")
  val FieldDefinitionsColumns: Seq[String] =
    Seq("Dataset", "DatasetType", "ElementNumber", "ElementName", "Attribute")

  /** Fetch-to-landing-path seam (A24's fetch half,
    * `create_definitions.py:38-40,95-97`).
    */
  trait Fetcher {
    /** GET `url`, write the body to `landingPath`, return `landingPath`. */
    def fetchToFile(url: String, landingPath: Path): Path
  }

  /** `java.net.http` fetcher with the reference's `raise_for_status`
    * parity: any non-2xx response is an error, never an empty dictionary.
    */
  final class HttpFetcher(timeout: Duration = Duration.ofSeconds(60)) extends Fetcher {
    override def fetchToFile(url: String, landingPath: Path): Path = {
      val client = HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NORMAL)
        .connectTimeout(timeout)
        .build()
      val req = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET().build()
      // Download into a sibling temp file, then move atomically over the
      // landing path: a mid-body network failure or a non-2xx error body
      // must never truncate or poison a previous good dictionary — the
      // landing file either keeps its old content or becomes the
      // complete new body.
      val tmp = java.nio.file.Files.createTempFile(
        Option(landingPath.toAbsolutePath.getParent).orNull, ".fetch-", ".tmp")
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
        if (resp.statusCode() / 100 != 2)
          throw new IOException(s"GET $url failed: HTTP ${resp.statusCode()}")
        java.nio.file.Files.move(tmp, landingPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        landingPath
      } finally {
        java.nio.file.Files.deleteIfExists(tmp)
        ()
      }
    }
  }

  /** Fetch + scan in one step: the full A24 path
    * (`create_definitions.py:38-52`).
    */
  def fetchAndRead(spark: SparkSession, fetcher: Fetcher, url: String,
      landingPath: Path): DataFrame = {
    fetcher.fetchToFile(url, landingPath)
    readPipeCsv(spark, landingPath.toString)
  }

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

  /** Project to the declared dictionary columns in declared order. A
    * header absent from the download becomes an empty-string column —
    * the reference's `row.get(k, "").strip()` contract
    * (`create_definitions.py:43-52,103-110`), where a renamed upstream
    * header silently yields empty fields rather than failing.
    */
  def projectTo(df: DataFrame, columns: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(columns.map(c =>
      (if (present(c)) col(c) else lit("")).as(c)): _*)
  }

  /** Full refresh: DELETE-all + re-insert in the reference
    * (`create_definitions.py:54-63`) == atomic overwrite here.
    */
  def fullRefresh(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
