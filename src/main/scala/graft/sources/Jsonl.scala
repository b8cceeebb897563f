package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus source/sink (SURVEY §2C extension): the de-facto
  * interchange format for LLM training corpora — one JSON document per
  * line, compressed per file. Spark's JSON source already splits,
  * decompresses, and parallelizes per file; this wrapper pins the
  * contracts that matter at 100 TB:
  *
  *  - the READ takes an explicit schema: schema inference is a full
  *    extra pass over every byte of the corpus (twice the scan cost on
  *    100 TB), and a drifting field type silently changes downstream
  *    semantics. Fields outside the schema are dropped by the parser
  *    (column pruning still reaches the text scan: only schema fields
  *    are even parsed).
  *  - malformed lines land in `_corrupt_record` (PERMISSIVE) instead of
  *    killing a 10-hour job, and [[quarantine]] splits them off so the
  *    clean path stays typed — the same lands-or-quarantines contract
  *    as the XML ingest (A22).
  *  - the WRITE shards by any partition columns (e.g. the c01/c02
  *    split/shard assignment), producing the layout training loaders
  *    consume directly.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** PERMISSIVE schema-pinned read; adds `_corrupt_record` (string,
    * null for clean rows).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Result of [[quarantine]]: call [[Quarantined.release]] once both
    * sides are consumed — the split pins the parsed frame in executor
    * storage (see quarantine's doc), and a long-lived session that never
    * releases it leaks one cached corpus per call.
    */
  final class Quarantined(val clean: DataFrame, val corrupt: DataFrame,
      cached: DataFrame) {
    /** Unpersist the pinned parse (idempotent, non-blocking). */
    def release(): Unit = { cached.unpersist(); () }
  }

  /** (clean, corrupt) split. Spark requires caching the parsed frame
    * before referencing `_corrupt_record` alone (the parser would
    * otherwise prune every other field and see nothing as corrupt).
    */
  def quarantine(parsed: DataFrame): Quarantined = {
    val cached = parsed.cache()
    val clean = cached.where(col(CorruptCol).isNull).drop(CorruptCol)
    val corrupt = cached.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    new Quarantined(clean, corrupt, cached)
  }

  /** Streaming twin of [[read]]: a landing directory consumed as a
    * Structured Streaming file source — new shards are picked up per
    * micro-batch, with the same pinned schema and PERMISSIVE
    * `_corrupt_record` contract as the batch read (inference is not
    * even possible on a stream, which is the point: the schema IS the
    * interface). `maxFilesPerTrigger` bounds a backfill's batch size so
    * a million-shard landing dir drains in bounded memory instead of
    * one giant batch. Compose the corrupt-column filter downstream,
    * but keep AT LEAST ONE data column in the corrupt-side projection:
    * a streaming query whose references into this source are ONLY
    * `_corrupt_record` hits the same parser-pruning restriction the
    * batch [[quarantine]] caches around (and caching is impossible on
    * a stream) — project e.g. (doc_id, _corrupt_record), or run the
    * batch [[quarantine]] inside `foreachBatch` for a two-sink split.
    */
  def readStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Sharded corpus write: one directory per partition-column value
    * (e.g. split=train/shard=0), gzip per file.
    */
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Seq.empty,
      compression: String = "gzip"): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }
}
