package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType, TimestampType}

/** Streaming maintenance of the interaction graph behind
  * [[graft.ops.Graph.chainEdges]] (g01/g02): the g-family's
  * incremental face.
  *
  * Chain edges are NOT per-batch appendable — a group's chain depends
  * on its complete member list ordered by (first-seen, id), and members
  * of one (event type × hour) group arrive across micro-batches. What
  * IS algebraic is the MEMBER relation: (group, user) → min(ts) merges
  * by per-key MIN exactly as q42's min-state does. So each micro-batch
  * writes its member partial under `stateDir/members/batch_id=N` (the
  * [[SearchStreams]] per-batch-id idempotent layout; a commit marker
  * lands LAST so a reader racing a mid-commit batch sees none of it),
  * and [[loadEdges]] merges the partials with one min-groupBy and
  * derives the chains with the SAME per-group lag windows as the batch
  * operator — spec-pinned equal to `Graph.chainEdges` on the union.
  *
  * At 100 TB: partials are bounded by the batch's distinct
  * (group, user) pairs; the reader's merge is one map-side-combined
  * min; a periodic compaction can fold old batch partitions into a
  * base partition without changing any reader. Groups older than the
  * event horizon stop changing, so downstream consumers (PageRank,
  * triangles) can incrementally freeze closed hours.
  */
object GraphStreams {

  private def memberSchema = StructType(Seq(
    StructField("event_type", StringType), StructField("h", TimestampType),
    StructField("user_id", LongType), StructField("mts", TimestampType),
    StructField("batch_id", LongType)))
  private def commitSchema = StructType(Seq(
    StructField("n", LongType), StructField("batch_id", LongType)))

  /** Start member-state maintenance over `events` (a streaming frame
    * with (event_type string, ts timestamp, user_id long)).
    */
  def memberStream(events: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // mirror Graph.chainEdges' null guards: a null user would become
        // a null-dst edge, a null ts sorts nondeterministically — drop
        // both here so loadEdges == chainEdges(union) holds verbatim
        val part = batch
          .where(col("user_id").isNotNull && col("ts").isNotNull)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            col("user_id"))
          .agg(min(col("ts")).as("mts"))
        part.write.mode("overwrite")
          .parquet(s"$stateDir/members/batch_id=$batchId")
        // marker LAST: a batch is committed iff its commit row exists
        val spark = batch.sparkSession
        import spark.implicits._
        Seq(Tuple1(0L)).toDF("n")
          .write.mode("overwrite")
          .parquet(s"$stateDir/commits/batch_id=$batchId")
        ()
      }
      .start()

  /** Merge every committed batch's member partials (per-key MIN) and
    * derive the chain edges — identical output to
    * `Graph.chainEdges(unionOfBatches, ...)`. Empty state yields an
    * empty edge relation.
    */
  def loadEdges(spark: SparkSession, stateDir: String): DataFrame = {
    val commits = PipelineStreams
      .readOrEmpty(spark, s"$stateDir/commits", commitSchema)
      .localCheckpoint(true)
    val committed = commits.select("batch_id").collect()
      .map(_.getLong(0)).toIndexedSeq
    val members = PipelineStreams
      .readOrEmpty(spark, s"$stateDir/members", memberSchema)
      .where(col("batch_id").isin(committed: _*))
      .groupBy("event_type", "h", "user_id")
      .agg(min(col("mts")).as("mts"))
    val w = Window.partitionBy(col("event_type"), col("h"))
      .orderBy(col("mts"), col("user_id"))
    members
      .select(col("user_id").as("dst"),
        lag(col("user_id"), 1).over(w).as("src"))
      .where(col("src").isNotNull)
      .select("src", "dst").distinct()
  }
}
