package graft.streaming

import java.nio.file.{Files, Path => JPath, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.ops.Search

/** Streaming-state compaction: reader output must be IDENTICAL before
  * and after [[GraphStreams.compact]] / [[PipelineStreams.compact]] /
  * [[SearchStreams.compact]] — and at every mid-compaction crash point
  * (base written but unmarked; base committed but originals not yet
  * deleted), with a compaction replay converging afterwards. The
  * folded state must also actually FOLD: one base partition where N
  * batch partitions were.
  */
class StreamingCompactionSpec extends AnyFunSuite with SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def partitionIds(dir: String): Set[Long] =
    if (!Files.isDirectory(Paths.get(dir))) Set.empty
    else {
      val s = Files.list(Paths.get(dir))
      try s.toArray.map(_.asInstanceOf[JPath].getFileName.toString)
        .filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong).toSet
      finally s.close()
    }

  // ---- GraphStreams ------------------------------------------------------

  test("graph member state: compaction folds partitions, edges unchanged, crash windows safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(("click", ts(5), 10L), ("click", ts(10), 30L), ("view", ts(7), 20L)),
      Seq(("click", ts(2), 30L), ("click", ts(8), 20L), ("view", ts(9), 10L)),
      Seq(("click", ts(1), 40L), ("view", ts(3), 30L)))
    val dir = Files.createTempDirectory("graft_cmp_gs").toString
    val ckpt = Files.createTempDirectory("graft_cmp_gsc").toString
    val in = MemoryStream[(String, Timestamp, Long)]
    val q = GraphStreams.memberStream(
      in.toDS().toDF("event_type", "ts", "user_id"), dir, ckpt)
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    def edges() = GraphStreams.loadEdges(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val before = edges()
    assert(before.nonEmpty)
    assert(partitionIds(s"$dir/members").size === 3)

    // crash window A: a base members partition exists but has NO commit
    // marker — it must be invisible to readers
    spark.read.parquet(s"$dir/members/batch_id=0")
      .write.mode("overwrite").parquet(s"$dir/members/batch_id=-99")
    assert(edges() === before)
    StreamStateDirs.delete(spark, s"$dir/members/batch_id=-99")

    // real compaction: edges identical, state folded to ONE partition
    GraphStreams.compact(spark, dir)
    assert(edges() === before)
    assert(partitionIds(s"$dir/members") === Set(-1L))
    assert(partitionIds(s"$dir/commits") === Set(-1L))

    // idempotence: compacting a compacted state is a no-op
    GraphStreams.compact(spark, dir)
    assert(edges() === before)
    assert(partitionIds(s"$dir/members") === Set(-1L))
  }

  test("graph member state: base+originals coexisting (mid-delete crash) read identically; replay converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(("click", ts(5), 10L), ("click", ts(10), 30L)),
      Seq(("click", ts(2), 30L), ("click", ts(8), 20L)))
    val dir = Files.createTempDirectory("graft_cmp_gs2").toString
    val ckpt = Files.createTempDirectory("graft_cmp_gs2c").toString
    val in = MemoryStream[(String, Timestamp, Long)]
    val q = GraphStreams.memberStream(
      in.toDS().toDF("event_type", "ts", "user_id"), dir, ckpt)
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    def edges() = GraphStreams.loadEdges(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val before = edges()

    // simulate the crash window: base data + covering marker landed,
    // originals NOT deleted — min-merge idempotence + covers must keep
    // the reader invariant
    spark.read.parquet(s"$dir/members")
      .where(col("batch_id").isin(0L, 1L)).drop("batch_id")
      .groupBy("event_type", "h", "user_id").agg(min("mts").as("mts"))
      .select("event_type", "h", "user_id", "mts")
      .write.parquet(s"$dir/members/batch_id=-1")
    Seq((0L, Seq(0L, 1L))).toDF("n", "covers")
      .write.parquet(s"$dir/commits/batch_id=-1")
    assert(edges() === before)
    assert(partitionIds(s"$dir/members") === Set(-1L, 0L, 1L))

    // replay: compact() finishes the job (folds to a fresh base,
    // removes every superseded partition)
    GraphStreams.compact(spark, dir)
    assert(edges() === before)
    assert(partitionIds(s"$dir/members").size === 1)
  }

  // ---- PipelineStreams ---------------------------------------------------

  test("fingerprint state: compaction folds partitions; dedup history is unchanged") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft_cmp_fp").toString
    // three settled batches' fingerprints, written in the stream layout
    Seq("a", "b").toDF("fingerprint")
      .write.parquet(s"$stateDir/batch_id=0")
    Seq("b", "c").toDF("fingerprint")
      .write.parquet(s"$stateDir/batch_id=1")
    Seq("d").toDF("fingerprint")
      .write.parquet(s"$stateDir/batch_id=2")

    def history() = PipelineStreams.fingerprints(spark, stateDir)
      .select("fingerprint").distinct().collect().map(_.getString(0)).toSet
    assert(history() === Set("a", "b", "c", "d"))

    PipelineStreams.compact(spark, stateDir)
    assert(history() === Set("a", "b", "c", "d"))
    // the NEWEST partition (2) is never folded: without commit markers
    // it may belong to a batch whose checkpoint hasn't committed, and
    // folding it into the base would hand a replay its own
    // fingerprints as history (round-7 review fix; the marker-gated
    // composed layout folds everything — see CuratedClusterStreamsSpec)
    assert(partitionIds(stateDir) === Set(-1L, 2L))
    // the base keeps working as history for later batches: batch_id=-1
    // passes every `batch_id < N` history read
    val hist = PipelineStreams.fingerprints(spark, stateDir)
      .where(col("batch_id") < 7).select("fingerprint")
    assert(hist.collect().map(_.getString(0)).toSet === Set("a", "b", "c", "d"))

    PipelineStreams.compact(spark, stateDir) // no-op (base + newest only)
    assert(partitionIds(stateDir) === Set(-1L, 2L))
    assert(history() === Set("a", "b", "c", "d"))
  }

  test("fingerprint state: base+originals coexisting read identically; replay converges") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft_cmp_fp2").toString
    Seq("a", "b").toDF("fingerprint").write.parquet(s"$stateDir/batch_id=0")
    Seq("b", "c").toDF("fingerprint").write.parquet(s"$stateDir/batch_id=1")
    // crash window: base landed, originals not yet deleted
    Seq("a", "b", "c").toDF("fingerprint").write.parquet(s"$stateDir/batch_id=-1")
    def history() = PipelineStreams.fingerprints(spark, stateDir)
      .select("fingerprint").distinct().collect().map(_.getString(0)).toSet
    assert(history() === Set("a", "b", "c"))
    PipelineStreams.compact(spark, stateDir)
    assert(history() === Set("a", "b", "c"))
    // the orphan base and batch 0 fold into a fresh base; batch 1 (the
    // newest, possibly-uncommitted — round-7 review fix) stays put
    assert(partitionIds(stateDir) === Set(-2L, 1L))
  }

  // ---- SearchStreams -----------------------------------------------------

  test("BM25 index: compaction folds partials; index and scores unchanged; sums never double-count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq((1L, "alpha beta gamma"), (2L, "alpha delta")),
      Seq((11L, "alpha alpha beta"), (12L, "epsilon zeta")),
      Seq((21L, "gamma delta alpha")))
    val dir = Files.createTempDirectory("graft_cmp_ix").toString
    val ckpt = Files.createTempDirectory("graft_cmp_ixc").toString
    val in = MemoryStream[(Long, String)]
    val q = SearchStreams.indexStream(
      in.toDS().toDF("doc_id", "text"), "doc_id", "text", dir, ckpt)
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    def snapshot() = {
      val ix = SearchStreams.loadIndex(spark, dir)
      val queries = Seq((1L, "alpha"), (2L, "gamma")).toDF("qid", "term")
      (ix.nDocs, ix.totalTokens, rows(ix.tf), rows(ix.df), rows(ix.lens),
        rows(Search.bm25FromIndex(ix, queries, "qid", "term", 4)))
    }
    val before = snapshot()
    assert(before._1 === 5L)
    assert(partitionIds(s"$dir/stats").size === 3)

    SearchStreams.compact(spark, dir)
    assert(snapshot() === before)
    Seq("tf", "df", "lens", "stats").foreach(r =>
      assert(partitionIds(s"$dir/$r") === Set(-1L), s"relation $r not folded"))

    SearchStreams.compact(spark, dir) // idempotent no-op
    assert(snapshot() === before)
  }

  test("BM25 index: crash windows — unmarked base invisible; committed base excludes covered originals; replay converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq((1L, "alpha beta"), (2L, "alpha")),
      Seq((11L, "beta beta gamma")))
    val dir = Files.createTempDirectory("graft_cmp_ix2").toString
    val ckpt = Files.createTempDirectory("graft_cmp_ix2c").toString
    val in = MemoryStream[(Long, String)]
    val q = SearchStreams.indexStream(
      in.toDS().toDF("doc_id", "text"), "doc_id", "text", dir, ckpt)
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    def snapshot() = {
      val ix = SearchStreams.loadIndex(spark, dir)
      (ix.nDocs, ix.totalTokens, rows(ix.tf), rows(ix.df), rows(ix.lens))
    }
    val before = snapshot()

    // crash window A: merged tf/df/lens landed under the base id but
    // stats (the commit) did not — the base must be invisible
    def relAll(name: String) = spark.read.parquet(s"$dir/$name")
      .where(col("batch_id").isin(0L, 1L)).drop("batch_id")
    relAll("tf").write.parquet(s"$dir/tf/batch_id=-1")
    relAll("df").groupBy("term").agg(sum("df").as("df"))
      .write.parquet(s"$dir/df/batch_id=-1")
    relAll("lens").write.parquet(s"$dir/lens/batch_id=-1")
    assert(snapshot() === before)

    // crash window B: the covering stats row lands (base committed),
    // originals not yet deleted — df/nDocs/toks are SUMS, so this is
    // the double-count hazard; `covers` must exclude the originals
    Seq((3L, 6L, Seq(0L, 1L))).toDF("n", "toks", "covers")
      .write.parquet(s"$dir/stats/batch_id=-1")
    assert(snapshot() === before)

    // replay converges: every superseded partition removed, one base
    SearchStreams.compact(spark, dir)
    assert(snapshot() === before)
    Seq("tf", "df", "lens", "stats").foreach(r =>
      assert(partitionIds(s"$dir/$r").size === 1, s"relation $r not folded"))
  }
}
