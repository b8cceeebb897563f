package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.ops.Search

/** The streamed index, reconstructed from per-batch partials, must be
  * relation-for-relation (and score-for-score) the index a direct
  * whole-corpus build produces on the union of the batches.
  */
class SearchStreamsSpec extends AnyFunSuite with SparkSpec {

  test("two micro-batches of partials reconstruct the direct index; BM25 answers match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha delta"), (3L, "beta beta gamma"))
    val batch2 = Seq(
      (11L, "alpha alpha beta"), (12L, "epsilon zeta"), (13L, "gamma delta alpha"))

    val dir = java.nio.file.Files.createTempDirectory("graft_ss_ix").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss_ckpt").toString

    val in = MemoryStream[(Long, String)]
    val q = SearchStreams.indexStream(
      in.toDS().toDF("doc_id", "text"), "doc_id", "text", dir, ckpt)
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = SearchStreams.loadIndex(spark, dir)
    val direct = Search.buildIndex(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text")

    assert(streamed.nDocs == direct.nDocs && streamed.nDocs == 6L)
    assert(streamed.totalTokens == direct.totalTokens)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    assert(rows(streamed.df) == rows(direct.df))
    assert(rows(streamed.tf) == rows(direct.tf))
    assert(rows(streamed.lens) == rows(direct.lens))

    val queries = Seq((1L, "alpha"), (1L, "gamma")).toDF("qid", "term")
    assert(rows(Search.bm25FromIndex(streamed, queries, "qid", "term", 4)) ==
      rows(Search.bm25FromIndex(direct, queries, "qid", "term", 4)))
  }

  test("loadIndex: empty dir yields empty index; uncommitted partials are invisible; committed corruption propagates") {
    import spark.implicits._
    val none = java.nio.file.Files.createTempDirectory("graft_ss_none").toString + "/missing"
    val ix = SearchStreams.loadIndex(spark, none)
    assert(ix.nDocs == 0L && ix.totalTokens == 0L)
    assert(ix.tf.count() == 0 && ix.df.count() == 0 && ix.lens.count() == 0)

    val dir = java.nio.file.Files.createTempDirectory("graft_ss_bad")
    val part = dir.resolve("df/batch_id=0")
    java.nio.file.Files.createDirectories(part)
    java.nio.file.Files.write(part.resolve("junk.parquet"), "not parquet".getBytes)
    // batch 0 has NO stats row -> it is mid-commit/aborted, and the
    // reader must see none of it, corrupt or not (the torn-index guard)
    assert(SearchStreams.loadIndex(spark, dir.toString).df.count() == 0)
    // once batch 0 is COMMITTED (stats row lands), its corrupt df
    // partial must fail the read, never silently score without it
    Seq((1L, 1L)).toDF("n", "toks")
      .write.parquet(dir.resolve("stats/batch_id=0").toString)
    intercept[Exception] {
      SearchStreams.loadIndex(spark, dir.toString).df.count()
    }
  }
}
