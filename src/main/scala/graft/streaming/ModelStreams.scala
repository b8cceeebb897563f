package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, LongType, StringType,
  StructField, StructType}

import graft.ops.LangModel
import graft.ops.LangModel.BigramModel

/** Streaming maintenance of the ALGEBRAIC model states — the bigram
  * LM's count relations ([[LangModel]], t16/t18) and the DSIR
  * bucket-count model ([[graft.ops.Curation.dsirModel]], c14): each
  * micro-batch of landing documents is counted ONCE and its per-batch
  * count partials land under `modelDir/<rel>/batch_id=N` (the
  * [[SearchStreams]] per-batch-id idempotent layout, commit marker
  * written last). Readers reconstruct the full model with one
  * term-keyed sum per relation — the q42/t15 rule: counts over
  * disjoint document sets SUM, so tomorrow's model is yesterday's
  * partials + the batch's, and the corpus is never re-tokenized
  * (t18's merged == direct proof carries over batch-by-batch; the
  * spec pins loadModel == LangModel.train(union)).
  *
  * Contract: batches are disjoint document sets (dedup upstream —
  * [[PipelineStreams.settleBatch]]); null-text rows carry no tokens.
  *
  * At 100 TB: partials are vocab-sized (LM) / `buckets`-sized (DSIR),
  * orders of magnitude under the batch; [[compact]] periodically folds
  * them with the same covers protocol as [[SearchStreams.compact]]
  * (sums must never double-count, so the flip is atomic).
  */
object ModelStreams {

  private def uniSchema = StructType(Seq(
    StructField("w1", StringType), StructField("cu", LongType),
    StructField("batch_id", LongType)))
  private def biSchema = StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType),
    StructField("cb", LongType), StructField("batch_id", LongType)))
  private def dsirSchema = StructType(Seq(
    StructField("__b", LongType), StructField("cr", LongType),
    StructField("ct", LongType), StructField("batch_id", LongType)))
  private def histSchema = StructType(Seq(
    StructField("metric", StringType), StructField("v", LongType),
    StructField("c", LongType), StructField("batch_id", LongType)))
  // commit marker; `covers` marks a compacted base (see SearchStreams)
  private def statsSchema = StructType(Seq(
    StructField("n", LongType),
    StructField("covers", ArrayType(LongType)),
    StructField("batch_id", LongType)))

  /** Start bigram-LM model maintenance over a streaming `docs` frame
    * with a `textCol` string column: per batch, train on the batch
    * alone and land its uni/bi count partials; the stats marker lands
    * LAST (the commit point).
    */
  def lmStream(docs: DataFrame, textCol: String, modelDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sc = batch.sparkSession.sparkContext
        val pinnedBefore = sc.getPersistentRDDs.keySet
        val b = batch.localCheckpoint(true)
        try writeLmPartials(b, textCol, modelDir, batchId)
        finally {
          (sc.getPersistentRDDs.keySet -- pinnedBefore).foreach { id =>
            sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))
          }
          ()
        }
      }
      .start()

  /** One batch's LM count partials, written in the stream layout
    * (uni, bi, then the stats commit marker LAST). The per-batch body
    * of [[lmStream]], exposed so composed flows — e.g.
    * [[PipelineStreams.incrementalCurateWithModel]], which trains on
    * each batch's curated SURVIVORS — reuse the exact same layout and
    * commit protocol.
    */
  def writeLmPartials(batch: DataFrame, textCol: String, modelDir: String,
      batchId: Long): Unit = {
    val m = LangModel.train(batch, textCol)
    m.uni.write.mode("overwrite")
      .parquet(s"$modelDir/uni/batch_id=$batchId")
    m.bi.write.mode("overwrite")
      .parquet(s"$modelDir/bi/batch_id=$batchId")
    val spark = batch.sparkSession
    import spark.implicits._
    Seq(Tuple1(batch.count())).toDF("n")
      .write.mode("overwrite")
      .parquet(s"$modelDir/stats/batch_id=$batchId")
    ()
  }

  /** Start DSIR bucket-model maintenance: per batch, one tokenize pass
    * into the (bucket, cr, ct) partial. `isTargetCol` is a boolean
    * column of `docs` marking the target-distribution slice.
    */
  def dsirStream(docs: DataFrame, textCol: String, isTargetCol: String,
      buckets: Int, stateDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Curation
          .dsirModel(batch, textCol, col(isTargetCol), buckets)
          .write.mode("overwrite")
          .parquet(s"$stateDir/buckets/batch_id=$batchId")
        val spark = batch.sparkSession
        import spark.implicits._
        Seq(Tuple1(0L)).toDF("n")
          .write.mode("overwrite")
          .parquet(s"$stateDir/stats/batch_id=$batchId")
        ()
      }
      .start()

  /** Streaming maintenance of VALUE HISTOGRAMS for quantile-threshold
    * segmentation ([[graft.ops.Segmentation]], e15's scalable form):
    * per batch, each metric column's (value → count) partial lands
    * under its batch id; the merged histogram (one keyed sum) feeds
    * [[graft.ops.Segmentation.thresholdsFromCounts]], so tile
    * thresholds over a GROWING corpus derive from vocabulary-of-values
    *-sized state — history is never re-scanned. Contract: metrics are
    * per-DOCUMENT (append-only — a re-aggregated per-user metric would
    * need retraction; use the batch operator over the settled user
    * relation for those). Null metric values carry no histogram mass.
    */
  def histStream(docs: DataFrame, metricCols: Seq[String], stateDir: String,
      checkpointDir: String): StreamingQuery = {
    require(metricCols.nonEmpty,
      "histStream needs at least one metric column")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.localCheckpoint(true) // one pass per metric
        try {
          metricCols.map { m =>
            b.where(col(m).isNotNull)
              .groupBy(lit(m).as("metric"), col(m).cast("long").as("v"))
              .agg(count(lit(1)).as("c"))
          }.reduce(_ unionByName _)
            .write.mode("overwrite")
            .parquet(s"$stateDir/hist/batch_id=$batchId")
          val spark = batch.sparkSession
          import spark.implicits._
          Seq(Tuple1(0L)).toDF("n")
            .write.mode("overwrite")
            .parquet(s"$stateDir/stats/batch_id=$batchId")
          ()
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /** The merged value histogram of one metric — (v, c), one row per
    * distinct value. `ascending = false` negates the value axis (the
    * [[graft.ops.Segmentation]] orientation rule for DESC tiles).
    */
  def loadHistogram(spark: SparkSession, stateDir: String, metric: String,
      ascending: Boolean = true): DataFrame = {
    val ids = effectiveIds(spark, stateDir)
    val base = PipelineStreams.readOrEmpty(spark, s"$stateDir/hist", histSchema)
      .where(col("batch_id").isin(ids: _*))
      .where(col("metric") === metric)
    val oriented =
      if (ascending) base.select(col("v"), col("c"))
      else base.select((-col("v")).as("v"), col("c"))
    oriented.groupBy("v").agg(sum("c").as("c"))
  }

  /** Tile thresholds of one maintained metric, anytime: the merged
    * histogram through [[graft.ops.Segmentation.thresholdsFromCounts]]
    * — spec-pinned equal to the batch `exactThresholds` over the union
    * of all committed batches, through compaction.
    */
  def loadThresholds(spark: SparkSession, stateDir: String, metric: String,
      k: Int, ascending: Boolean = true): Seq[Long] =
    graft.ops.Segmentation.thresholdsFromCounts(
      loadHistogram(spark, stateDir, metric, ascending), k)

  /** Committed = stats rows minus covered ids (the SearchStreams
    * rule — the model scalars and counts are sums, never allowed to
    * double-count).
    */
  private def effectiveIds(spark: SparkSession, dir: String): IndexedSeq[Long] = {
    val rows = PipelineStreams
      .readOrEmpty(spark, s"$dir/stats", statsSchema)
      .select("batch_id", "covers").collect()
    val covered = rows.iterator.filterNot(_.isNullAt(1))
      .flatMap(_.getSeq[Long](1)).toSet
    rows.map(_.getLong(0)).filterNot(covered).toIndexedSeq.sorted
  }

  /** Reconstruct the merged [[BigramModel]]: per-key sums over every
    * committed batch's partials; V is the merged unigram relation's
    * row count (vocabularies OVERLAP across batches, so V is NOT a
    * sum — it must be counted on the merged relation).
    */
  def loadModel(spark: SparkSession, modelDir: String): BigramModel = {
    val ids = effectiveIds(spark, modelDir)
    def rel(name: String, schema: StructType): DataFrame =
      PipelineStreams.readOrEmpty(spark, s"$modelDir/$name", schema)
        .where(col("batch_id").isin(ids: _*)).drop("batch_id")
    val uni = rel("uni", uniSchema).groupBy("w1").agg(sum("cu").as("cu"))
      .localCheckpoint(true)
    val bi = rel("bi", biSchema).groupBy("w1", "w2").agg(sum("cb").as("cb"))
    BigramModel(uni, bi, uni.count())
  }

  /** Reconstruct the merged DSIR bucket model — (__b, cr, ct), ready
    * for [[graft.ops.Curation.dsirScoresWith]].
    */
  def loadDsirModel(spark: SparkSession, stateDir: String): DataFrame = {
    val ids = effectiveIds(spark, stateDir)
    PipelineStreams.readOrEmpty(spark, s"$stateDir/buckets", dsirSchema)
      .where(col("batch_id").isin(ids: _*)).drop("batch_id")
      .groupBy("__b").agg(sum("cr").as("cr"), sum("ct").as("ct"))
  }

  /** Fold every effective batch's partials into one base partition —
    * the [[SearchStreams.compact]] protocol verbatim (sums ⇒ atomic
    * flip via a covering stats row written last; covered partitions
    * GC'd marker-first). `rels` names the count relations of the state
    * dir: ("uni", "bi") for an LM dir, ("buckets") for a DSIR dir,
    * ("hist") for a histogram dir.
    */
  def compact(spark: SparkSession, dir: String, rels: Seq[String]): Unit = {
    val statRows = PipelineStreams
      .readOrEmpty(spark, s"$dir/stats", statsSchema)
      .select("batch_id", "n", "covers").collect()
    val covered = statRows.iterator.filterNot(_.isNullAt(2))
      .flatMap(_.getSeq[Long](2)).toSet
    val effective = statRows.filterNot(r => covered.contains(r.getLong(0)))
    covered.toIndexedSeq.sorted.foreach { id =>
      StreamStateDirs.delete(spark, s"$dir/stats/batch_id=$id")
      rels.foreach(r => StreamStateDirs.delete(spark, s"$dir/$r/batch_id=$id"))
    }
    if (effective.length <= 1) return
    val ids = effective.map(_.getLong(0)).toIndexedSeq.sorted
    val base = math.min(ids.min, 0L) - 1L
    // (schema, key columns, count columns) per known relation name
    val specs: Map[String, (StructType, Seq[String], Seq[String])] = Map(
      "uni" -> ((uniSchema, Seq("w1"), Seq("cu"))),
      "bi" -> ((biSchema, Seq("w1", "w2"), Seq("cb"))),
      "buckets" -> ((dsirSchema, Seq("__b"), Seq("cr", "ct"))),
      "hist" -> ((histSchema, Seq("metric", "v"), Seq("c"))))
    val folded = rels.map { r =>
      val (schema, keyCols, cntCols) = specs(r)
      val df = PipelineStreams.readOrEmpty(spark, s"$dir/$r", schema)
        .where(col("batch_id").isin(ids: _*)).drop("batch_id")
        .groupBy(keyCols.map(col): _*)
        .agg(sum(cntCols.head).as(cntCols.head),
          cntCols.tail.map(c => sum(c).as(c)): _*)
        .localCheckpoint(true)
      r -> df
    }
    try {
      folded.foreach { case (r, df) =>
        df.write.mode("overwrite").parquet(s"$dir/$r/batch_id=$base")
      }
      import spark.implicits._
      Seq((effective.map(_.getLong(1)).sum, ids)).toDF("n", "covers")
        .write.mode("overwrite").parquet(s"$dir/stats/batch_id=$base")
    } finally { folded.foreach(_._2.unpersist()); () }
    ids.foreach { id =>
      StreamStateDirs.delete(spark, s"$dir/stats/batch_id=$id")
      rels.foreach(r => StreamStateDirs.delete(spark, s"$dir/$r/batch_id=$id"))
    }
  }
}
