package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The streaming face of the composed pipeline must settle, across
  * micro-batches, to EXACTLY what the batch stages settle to on the
  * union of the batches — including an exact duplicate whose copy
  * arrives a batch later than its original (the case only the
  * parquet fingerprint state can catch).
  */
class PipelineStreamsSpec extends AnyFunSuite with SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType)))

  // same quality-passing corpus construction as PipelineSpec: 30 words,
  // mean word length in band, one stopword, no shared bigrams between
  // seeds
  private def passingText(seed: Int): String = {
    val words = "the" +:
      f"doc$seed%02d" +:
      (0 until 14).map(i => f"q$seed%02d${('a' + i).toChar}") ++:
      (0 until 14).map(i => f"z$seed%02d${('a' + i).toChar}x")
    words.mkString(" ")
  }

  test("two micro-batches settle to the batch stages over their union; cross-batch duplicate caught via persisted state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(
      (1L, passingText(1), "srcA"),
      (2L, passingText(2), "srcA"),
      (3L, passingText(3), "srcA"), // benchmark hit -> decontaminated
      (4L, "too short to train", "srcA")) // quality victim
    val batch2 = Seq(
      (11L, passingText(1), "srcA"), // exact copy of doc 1, PREVIOUS batch
      (12L, passingText(5), "srcB"),
      (13L, passingText(5), "srcB"), // exact copy within its own batch
      (14L, passingText(6), "srcA"))
    val bench = Seq((3L, passingText(3), "srcA")).toDF("doc_id", "text", "source")

    val state = java.nio.file.Files.createTempDirectory("graft_ps_state").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ps_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ps_ckpt").toString

    val in = MemoryStream[(Long, String, String)]
    val q = PipelineStreams.incrementalCurate(
      in.toDS().toDF("doc_id", "text", "source"), bench,
      "doc_id", "text", state, out, ckpt)
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = PipelineStreams.curated(spark, out, docSchema)
    val streamedIds = streamed.select("doc_id").as[Long].collect().toSet

    // batch twin: the same settle run once over the union, no history
    val union = (batch1 ++ batch2).toDF("doc_id", "text", "source")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("fingerprint", StringType))))
    val (batchCurated, _) =
      PipelineStreams.settleBatch(union, bench, empty, "doc_id", "text")
    val batchIds = batchCurated.select("doc_id").as[Long].collect().toSet

    assert(streamedIds == batchIds,
      s"stream settled to $streamedIds, batch twin to $batchIds")
    assert(!streamedIds.contains(11L),
      "cross-batch exact copy must be dropped via the persisted fingerprint state")
    assert(streamedIds.intersect(Set(12L, 13L)).size == 1,
      "within-batch copies must settle to one canonical row")
    assert(!streamedIds.contains(3L) && !streamedIds.contains(4L))
    assert(streamedIds.contains(1L) && streamedIds.contains(2L) &&
      streamedIds.contains(14L))

    // full row content matches too (not just membership)
    val sRows = streamed.select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val bRows = batchCurated.select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(sRows == bRows)

    // the state table holds one row per DISTINCT fingerprint ever seen
    // (6 distinct texts: 4 in batch1; batch2 adds only seeds 5 and 6 —
    // its other rows duplicate batch1 or each other), each stamped with
    // the batch that first saw it
    val fps = PipelineStreams.fingerprints(spark, state)
    assert(fps.count() == 6)
    assert(fps.select("fingerprint").distinct().count() == 6)
    assert(fps.select("batch_id").distinct().count() == 2)
  }

  test("reader helpers return typed empties before any batch has run") {
    val noDir = java.nio.file.Files.createTempDirectory("graft_ps_none").toString + "/missing"
    assert(PipelineStreams.fingerprints(spark, noDir).count() == 0)
    assert(PipelineStreams.curated(spark, noDir, docSchema).count() == 0)
  }

  test("compact never folds the newest fingerprint partition (the possibly-uncommitted batch)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ps_cmp").toString
    Seq("a").toDF("fingerprint").write.parquet(s"$dir/batch_id=0")
    Seq("b").toDF("fingerprint").write.parquet(s"$dir/batch_id=1")
    Seq("c").toDF("fingerprint").write.parquet(s"$dir/batch_id=2")
    PipelineStreams.compact(spark, dir)
    val ids = PipelineStreams.fingerprints(spark, dir)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    // 0 and 1 folded into the negative base; 2 (the newest — the only
    // id that can belong to a batch whose checkpoint hasn't committed)
    // must remain under its own id, so a replay of batch 2 still
    // excludes its own fingerprints via batch_id < 2
    assert(ids == Set(-1L, 2L), ids)
    val all = PipelineStreams.fingerprints(spark, dir)
      .select("fingerprint").as[String].collect().toSet
    assert(all == Set("a", "b", "c"))
    val below2 = PipelineStreams.fingerprints(spark, dir)
      .where(col("batch_id") < 2).select("fingerprint")
      .as[String].collect().toSet
    assert(below2 == Set("a", "b"), "the replayed batch must not see itself")
  }

  test("a corrupt state read PROPAGATES instead of settling against an empty history") {
    // only path-not-found means "no state yet"; any other failure must
    // fail the micro-batch (an empty-history fallback would re-admit
    // every previously seen document)
    val dir = java.nio.file.Files.createTempDirectory("graft_ps_corrupt")
    val part = dir.resolve("batch_id=0")
    java.nio.file.Files.createDirectories(part)
    java.nio.file.Files.write(part.resolve("junk.parquet"),
      "this is not parquet".getBytes)
    intercept[Exception] {
      PipelineStreams.fingerprints(spark, dir.toString).count()
    }
  }
}
