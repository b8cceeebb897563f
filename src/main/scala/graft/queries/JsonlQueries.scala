package graft.queries

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Curation
import graft.sources.{Jsonl, Tables}

/** JSONL corpus round-trip (SURVEY §2C source/sink): write the
  * documents table as a split-sharded gzip JSONL corpus (the c01
  * hash-split layout), read it back schema-pinned, quarantine a
  * malformed shard line, and aggregate the clean side — the full
  * write -> read -> quarantine -> aggregate path of
  * [[graft.sources.Jsonl]] under one DuckDB oracle (`read_json` over
  * the very same files).
  */
object JsonlQueries {

  /** Corpus landing dir, keyed by the SF-dir basename: the oracle reads
    * the sf0.01 layout by fixed path, and a bench pass at another SF
    * must never clobber the files the oracle is about to read.
    */
  private[queries] def corpusDir(sfDir: String): String =
    s"/tmp/graft_j01_corpus_${Paths.get(sfDir).getFileName}"

  private val corpusSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType)))

  private[queries] def csvDir(sfDir: String): String =
    s"/tmp/graft_j02_corpus_${Paths.get(sfDir).getFileName}"
  private[queries] def orcDir(sfDir: String): String =
    s"/tmp/graft_j03_corpus_${Paths.get(sfDir).getFileName}"
  private[queries] def evoDir(sfDir: String): String =
    s"/tmp/graft_j04_corpus_${Paths.get(sfDir).getFileName}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j01_jsonl_roundtrip" -> ((s, d) => {
      val dir = corpusDir(d)
      val corpus = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        .withColumn("split", Curation.splitAssign(col("doc_id")))
      Jsonl.write(corpus, dir, partitionBy = Seq("split"))
      // hand-append one malformed gzip shard so the PERMISSIVE
      // quarantine path is exercised by the real read (gzipped so the
      // oracle's *.json.gz glob sees exactly what Spark sees, and
      // Spark's .crc sidecars stay excluded)
      val bad = Paths.get(dir, "split=train", "zz-malformed.json.gz")
      val os = new GZIPOutputStream(Files.newOutputStream(bad))
      try os.write("{BROKEN LINE\n".getBytes("UTF-8")) finally os.close()

      val q = Jsonl.quarantine(Jsonl.read(s, dir, corpusSchema))
      // corrupt count rides along as a column so the quarantine itself
      // is oracle-checked, not just the clean aggregate. It is counted
      // EAGERLY so the pinned parse can be released before returning —
      // otherwise the cached corpus would sit in executor storage for
      // the rest of the session (the clean side references more than
      // the corrupt column, so it recomputes legally uncached).
      val nCorrupt = q.corrupt.count()
      q.release()
      q.clean.groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("total_chars"))
        .withColumn("n_corrupt", lit(nCorrupt))
        .orderBy("split", "source")
    }),

    // CSV interchange round-trip: Spark WRITES RFC4180 CSV (escape set
    // to '"' — Spark's backslash default is nonstandard and DuckDB
    // would misparse it), a hostile probe row (comma, doubled quote,
    // embedded newline) rides along to force the quoting paths, Spark
    // reads its own files back multiLine, and the ORACLE parses the
    // very same bytes with DuckDB's reader — per-row md5s prove the
    // text survived both engines' CSV stacks byte-identically.
    "j02_csv_roundtrip" -> ((s, d) => {
      import s.implicits._
      val dir = csvDir(d)
      // -2 pins the EMPTY-string case: Spark writes quoted "" and the
      // oracle reads with allow_quoted_nulls=false, so both engines
      // agree it round-trips as '' (md5 d41d8...), never NULL
      val probe = Seq(
        (-1L, "a,b \"quoted\" and\na second line", "probe"),
        (-2L, "", "probe"))
        .toDF("doc_id", "text", "source")
      Tables.load(s, d, "documents").select("doc_id", "text", "source")
        .unionByName(probe)
        .write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(dir)
      // nullValue pointed at a sentinel that never occurs: Spark's
      // default ("") would read the quoted-empty field back as NULL —
      // the corpus is written null-free, so '' must round-trip as ''
      // (DuckDB side states the same via allow_quoted_nulls=false)
      s.read.schema(corpusSchema)
        .option("header", "true").option("escape", "\"")
        .option("multiLine", "true")
        .option("nullValue", "\u0000")
        .csv(dir)
        .select(col("doc_id"), col("source"), md5(col("text")).as("text_md5"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id")
    }),

    // ADDITIVE schema evolution at the lake layer — the reference's
    // ALTER TABLE ADD COLUMN contract (A13, main_ingest.py:252-272)
    // restated for parquet: day 1 writes the original two-column
    // schema, day 2 writes the schema with a new column, and ONE
    // mergeSchema read serves both vintages (old rows surface the new
    // column as NULL — exactly what the reference's backfilled TEXT
    // column holds). The oracle restates the merged view from the
    // source table, proving the two-vintage round-trip lost nothing.
    "j04_schema_evolution" -> ((s, d) => {
      val dir = evoDir(d)
      val docs = Tables.load(s, d, "documents")
      docs.where(pmod(col("doc_id"), lit(2)) === 0)
        .select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/day=1")
      docs.where(pmod(col("doc_id"), lit(2)) === 1)
        .select("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/day=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("n_chars"), col("day").cast("long").as("day"))
        .orderBy("doc_id")
    }),

    // ORC round-trip — the second columnar lake format (built into
    // Spark): partitioned zstd ORC write, read back through the ORC
    // scan (partition pruning + pushdown apply as with parquet). The
    // oracle reads the ORIGINAL parquet — DuckDB has no ORC reader, so
    // the hash-match proves the ORC write+read preserved every row and
    // byte rather than reparsing the same file.
    "j03_orc_roundtrip" -> ((s, d) => {
      val dir = orcDir(d)
      Tables.load(s, d, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").partitionBy("source")
        .option("compression", "zstd")
        .orc(dir)
      s.read.orc(dir)
        .select(col("doc_id"), col("source"), col("lang"),
          md5(col("text")).as("text_md5"), col("n_chars"))
        .orderBy("doc_id")
    }),
  )

  /** DuckDB reads the corpus Spark wrote (`read_json` over the same
    * gzip shards, hive-partitioned on split). `ignore_errors` turns the
    * malformed line into an all-null row rather than dropping it, so
    * null-text rows are the corrupt set — the corpus itself never has
    * null text (it came from the documents table, which doesn't).
    *
    * The corpus path depends on the SF the gate runs at, so the SQL
    * carries [[SfBaseToken]] and `Verify` substitutes the actual SF-dir
    * basename when dumping oracle_sql.json — a gate run at sf0.001 must
    * read the sf0.001 corpus, not a stale sf0.01 one.
    */
  val SfBaseToken = "__GRAFT_SF_BASE__"

  val oracles: Map[String, String] = Map(
    "j01_jsonl_roundtrip" ->
      s"""WITH parsed AS (
         |  SELECT * FROM read_json('${corpusDir(SfBaseToken)}/*/*.json.gz',
         |    format='newline_delimited',
         |    columns={doc_id: 'BIGINT', text: 'VARCHAR', source: 'VARCHAR'},
         |    hive_partitioning=true, ignore_errors=true)),
         |bad AS (SELECT count(*) AS n_corrupt FROM parsed WHERE text IS NULL)
         |SELECT split, source, count(*) AS n_docs,
         |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
         |  (SELECT n_corrupt FROM bad) AS n_corrupt
         |FROM parsed WHERE text IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // DuckDB parses the very CSV bytes Spark wrote: RFC4180 quoting
    // (quote '"', escape '"'), quoted newlines on by default
    "j02_csv_roundtrip" ->
      s"""SELECT doc_id, source, md5(text) AS text_md5,
         |  CAST(length(text) AS INTEGER) AS n_chars
         |FROM read_csv('${csvDir(SfBaseToken)}/*.csv', header=true,
         |  columns={doc_id: 'BIGINT', text: 'VARCHAR', source: 'VARCHAR'},
         |  quote='"', escape='"', allow_quoted_nulls=false)
         |ORDER BY doc_id""".stripMargin,

    // the original parquet restated — equality proves the ORC
    // write+read preserved every row/byte (DuckDB has no ORC reader)
    "j03_orc_roundtrip" ->
      """SELECT doc_id, source, lang, md5(text) AS text_md5, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // merged-view restatement: old-vintage rows carry NULL for the
    // evolved column, day derives from the vintage rule
    "j04_schema_evolution" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |  CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE NULL END AS n_chars,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS day
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
