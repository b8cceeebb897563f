package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.ops.{Curation, LangModel}

/** Stream-maintained model state must reconstruct the models a direct
  * whole-corpus train produces on the union of the batches — t18's
  * merged == direct proof shape, carried over micro-batches — and
  * survive compaction unchanged.
  */
class ModelStreamsSpec extends AnyFunSuite with SparkSpec {

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq).toSet

  test("streamed LM partials reconstruct the direct model; scores match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq((1L, "alpha beta gamma alpha"), (2L, "beta beta"))
    val batch2 = Seq((11L, "alpha beta delta"), (12L, "gamma alpha beta"))

    val dir = java.nio.file.Files.createTempDirectory("graft_ms_lm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ms_lmc").toString
    val in = MemoryStream[(Long, String)]
    val q = ModelStreams.lmStream(
      in.toDS().toDF("doc_id", "text"), "text", dir, ckpt)
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = ModelStreams.loadModel(spark, dir)
    val direct = LangModel.train(
      (batch1 ++ batch2).toDF("doc_id", "text"), "text")
    assert(streamed.vocab === direct.vocab)
    assert(rows(streamed.uni) === rows(direct.uni))
    assert(rows(streamed.bi) === rows(direct.bi))

    // scoring under the stream-maintained model == under the direct one
    val probe = Seq((100L, "alpha beta gamma"), (101L, "zeta zeta"))
      .toDF("doc_id", "text")
    assert(rows(LangModel.score(probe, "doc_id", "text", streamed)) ===
      rows(LangModel.score(probe, "doc_id", "text", direct)))

    // compaction folds the partials without changing the model
    ModelStreams.compact(spark, dir, Seq("uni", "bi"))
    val compacted = ModelStreams.loadModel(spark, dir)
    assert(compacted.vocab === direct.vocab)
    assert(rows(compacted.uni) === rows(direct.uni))
    assert(rows(compacted.bi) === rows(direct.bi))
  }

  test("streamed DSIR bucket partials reconstruct the direct model; scores match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq((1L, "alpha beta gamma", true), (2L, "delta delta", false))
    val batch2 = Seq((11L, "alpha alpha", true), (12L, "beta epsilon", false))
    val buckets = 64

    val dir = java.nio.file.Files.createTempDirectory("graft_ms_ds").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ms_dsc").toString
    val in = MemoryStream[(Long, String, Boolean)]
    val q = ModelStreams.dsirStream(
      in.toDS().toDF("doc_id", "text", "is_target"), "text", "is_target",
      buckets, dir, ckpt)
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val union = (batch1 ++ batch2).toDF("doc_id", "text", "is_target")
    val streamed = ModelStreams.loadDsirModel(spark, dir)
    val direct = Curation.dsirModel(union, "text", col("is_target"), buckets)
    assert(rows(streamed) === rows(direct))
    assert(streamed.count() > 0)

    // dsirScoresWith under the maintained model == the one-shot
    // dsirScores (same corpus, same model by the assert above)
    val viaModel = Curation.dsirScoresWith(union, "doc_id", "text",
      streamed, buckets)
    val oneShot = Curation.dsirScores(union, "doc_id", "text",
      col("is_target"), buckets)
    assert(rows(viaModel) === rows(oneShot))

    // compaction folds the partials without changing the model
    ModelStreams.compact(spark, dir, Seq("buckets"))
    assert(rows(ModelStreams.loadDsirModel(spark, dir)) === rows(direct))
  }

  test("streamed histogram partials yield the batch exactThresholds, asc and desc, through compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // doc-level metrics (append-only): two batches, overlapping values
    val batch1 = Seq((1L, 10L, 3L), (2L, 20L, 9L), (3L, 10L, 1L),
      (4L, 35L, 7L))
    val batch2 = Seq((11L, 50L, 2L), (12L, 20L, 8L), (13L, 60L, 4L),
      (14L, 5L, 6L), (15L, 40L, 5L))

    val dir = java.nio.file.Files.createTempDirectory("graft_ms_hist").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ms_histc").toString
    val in = MemoryStream[(Long, Long, Long)]
    val q = ModelStreams.histStream(
      in.toDS().toDF("doc_id", "n_chars", "quality"),
      Seq("n_chars", "quality"), dir, ckpt)
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val union = (batch1 ++ batch2).toDF("doc_id", "n_chars", "quality")
    def direct(metric: String, asc: Boolean) =
      graft.ops.Segmentation.exactThresholds(
        if (asc) union
        else union.withColumn(metric, -col(metric)), metric, 3)
    assert(ModelStreams.loadThresholds(spark, dir, "n_chars", 3) ==
      direct("n_chars", asc = true))
    assert(ModelStreams.loadThresholds(spark, dir, "quality", 3,
      ascending = false) == direct("quality", asc = false))

    ModelStreams.compact(spark, dir, Seq("hist"))
    assert(ModelStreams.loadThresholds(spark, dir, "n_chars", 3) ==
      direct("n_chars", asc = true))
    assert(ModelStreams.loadThresholds(spark, dir, "quality", 3,
      ascending = false) == direct("quality", asc = false))
  }
}
