package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.ops.Graph

/** The streamed member state, merged across micro-batches, must derive
  * the exact edge set `Graph.chainEdges` produces on the union — even
  * when one group's members split across batches and a user re-appears
  * with an earlier timestamp in a later batch (the min-merge case).
  */
class GraphStreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("two micro-batches reconstruct the batch operator's edges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the click group's members arrive across BOTH batches; user 30
    // appears in batch 2 with an EARLIER first-seen than batch 1 gave
    // it, so only the min-merge yields the right chain order
    val batch1 = Seq(("click", ts(5), 10L), ("click", ts(10), 30L),
      ("view", ts(7), 20L))
    val batch2 = Seq(("click", ts(2), 30L), ("click", ts(8), 20L),
      ("view", ts(9), 10L))

    val dir = java.nio.file.Files.createTempDirectory("graft_gs_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gs_ckpt").toString

    val in = MemoryStream[(String, Timestamp, Long)]
    val q = GraphStreams.memberStream(
      in.toDS().toDF("event_type", "ts", "user_id"), dir, ckpt)
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = GraphStreams.loadEdges(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val direct = Graph.chainEdges(
        (batch1 ++ batch2).toDF("event_type", "ts", "user_id"),
        Seq(col("event_type"), date_trunc("hour", col("ts"))),
        "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(streamed === direct)
    // the min-merge must order user 30 FIRST in the click chain
    // (ts 00:02 from batch 2 beats 00:10 from batch 1):
    // click members by (min_ts, id): 30 @00:02, 10 @00:05, 20 @00:08
    assert(streamed.contains(30L -> 10L) && streamed.contains(10L -> 20L))
    assert(!streamed.contains(10L -> 30L))
  }

  test("stream-maintained edges feed pageRank with batch-identical ranks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(("click", ts(1), 1L), ("click", ts(2), 2L))
    val batch2 = Seq(("click", ts(3), 3L), ("view", ts(4), 2L), ("view", ts(5), 1L))
    val dir = java.nio.file.Files.createTempDirectory("graft_gs_pr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gs_prc").toString
    val in = MemoryStream[(String, Timestamp, Long)]
    val q = GraphStreams.memberStream(
      in.toDS().toDF("event_type", "ts", "user_id"), dir, ckpt)
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val viaStream = Graph.pageRank(GraphStreams.loadEdges(spark, dir), 3)
      .orderBy("node").collect().map(_.toSeq)
    val viaBatch = Graph.pageRank(Graph.chainEdges(
        (batch1 ++ batch2).toDF("event_type", "ts", "user_id"),
        Seq(col("event_type"), date_trunc("hour", col("ts"))), "user_id", "ts"), 3)
      .orderBy("node").collect().map(_.toSeq)
    assert(viaStream.toSeq === viaBatch.toSeq && viaStream.nonEmpty)
  }

  test("null users and timestamps are dropped, mirroring the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a null user would become a null-dst edge; a null ts would make the
    // member's first-seen sort nondeterministic — the stream must apply
    // the SAME guards Graph.chainEdges does, or the documented
    // "identical output on the union" contract breaks
    val batch = Seq(
      ("click", Option(ts(1)), Option(1L)),
      ("click", Option(ts(2)), Option(2L)),
      ("click", Option(ts(3)), Option.empty[Long]),   // null user
      ("click", Option.empty[Timestamp], Option(3L))) // null ts
    val dir = java.nio.file.Files.createTempDirectory("graft_gs_null").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gs_nullc").toString
    val in = MemoryStream[(String, Option[Timestamp], Option[Long])]
    val q = GraphStreams.memberStream(
      in.toDS().toDF("event_type", "ts", "user_id"), dir, ckpt)
    try { in.addData(batch: _*); q.processAllAvailable() } finally q.stop()
    val streamed = GraphStreams.loadEdges(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val direct = Graph.chainEdges(
        batch.toDF("event_type", "ts", "user_id"),
        Seq(col("event_type"), date_trunc("hour", col("ts"))),
        "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(streamed === direct)
    assert(streamed === Set(1L -> 2L)) // only the two clean rows chain
  }

  test("loadEdges: empty state yields no edges; uncommitted partials are invisible") {
    import spark.implicits._
    val none = java.nio.file.Files.createTempDirectory("graft_gs_none").toString + "/missing"
    assert(GraphStreams.loadEdges(spark, none).count() === 0)

    val dir = java.nio.file.Files.createTempDirectory("graft_gs_torn")
    // a members partial with NO commit marker is mid-commit: invisible
    Seq(("click", ts(1), ts(1), 1L)).toDF("event_type", "h", "mts", "user_id")
      .select(col("event_type"), col("h"), col("user_id"), col("mts"))
      .write.parquet(dir.resolve("members/batch_id=0").toString)
    assert(GraphStreams.loadEdges(spark, dir.toString).count() === 0)
  }
}
