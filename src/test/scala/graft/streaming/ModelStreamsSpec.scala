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
}
