package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Dedup

/** The stream-maintained label relation must equal the BATCH
  * clustering over the union of all committed batches — at every
  * prefix of the stream, across cluster-bridging batches, and through
  * compaction. Texts repeat a base phrase so minhash bands collide
  * deterministically (near-identical docs share buckets).
  */
class ClusterStreamsSpec extends AnyFunSuite with SparkSpec {

  // near-dup families: docs within a family differ by one trailing
  // token, so they band-collide; families are mutually distant
  private def fam(p: String, n: Int, ids: Seq[Long]): Seq[(Long, String)] = {
    val base = (1 to 30).map(i => s"$p$i").mkString(" ")
    ids.map(id => id -> s"$base extra$id")
  }

  private def directLabels(docs: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(
        Dedup.minHashCandidatePairs(docs.toDF("id", "text"), "id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def streamedLabels(dir: String): Map[Long, Long] =
    ClusterStreams.loadLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("micro-batches reconstruct the batch clustering, including a cluster-bridging batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch 1: two separate families {1,2} and {10,11}
    val b1 = fam("alpha", 30, Seq(1L, 2L)) ++ fam("beta", 30, Seq(10L, 11L))
    // batch 2: doc 5 is an alpha near-dup (joins {1,2}); doc 20 starts
    // a fresh family
    val b2 = fam("alpha", 30, Seq(5L)) ++ fam("gamma", 30, Seq(20L, 21L))
    // batch 3: doc 7 shares alpha's AND beta's shingles is impossible —
    // instead bridge via a doc near-identical to alpha that ALSO lands
    // new alpha members; and extend gamma
    val b3 = fam("alpha", 30, Seq(6L)) ++ fam("gamma", 30, Seq(22L))

    val dir = java.nio.file.Files.createTempDirectory("graft_cs_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cs_ckpt").toString

    val in = MemoryStream[(Long, String)]
    val q = ClusterStreams.clusterStream(
      in.toDS().toDF("id", "text"), "id", "text", dir, ckpt)
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      // prefix invariant after batch 1
      assert(streamedLabels(dir) === directLabels(b1))
      in.addData(b2: _*)
      q.processAllAvailable()
      assert(streamedLabels(dir) === directLabels(b1 ++ b2))
      in.addData(b3: _*)
      q.processAllAvailable()
      assert(streamedLabels(dir) === directLabels(b1 ++ b2 ++ b3))
    } finally q.stop()

    // sanity: the alpha family actually merged across batches
    val labels = streamedLabels(dir)
    assert(labels(5L) === labels(1L) && labels(6L) === labels(1L))
    // and compaction changes nothing a reader sees
    val before = (streamedLabels(dir),
      ClusterStreams.loadBands(spark, dir).count())
    ClusterStreams.compact(spark, dir)
    val after = (streamedLabels(dir),
      ClusterStreams.loadBands(spark, dir).count())
    assert(after === before)
    // a batch arriving AFTER compaction still probes the folded index:
    // doc 8 is another alpha near-dup and must join the alpha cluster.
    // The restart reuses the SAME checkpoint (the state-dir ↔
    // checkpoint-lineage contract): batch ids continue past the
    // compacted ones instead of colliding with the base's covers list.
    val q2 = ClusterStreams.clusterStream(
      in.toDS().toDF("id", "text"), "id", "text", dir, ckpt)
    try {
      in.addData(fam("alpha", 30, Seq(8L)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val finalLabels = streamedLabels(dir)
    assert(finalLabels(8L) === finalLabels(1L))
    assert(finalLabels === directLabels(b1 ++ b2 ++ b3 ++ fam("alpha", 30, Seq(8L))))
  }

  test("a replayed batch recomputes its identical delta (self-excluded state reads)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val b1 = fam("alpha", 30, Seq(1L, 2L)) ++ fam("beta", 30, Seq(10L))
    val b2 = fam("alpha", 30, Seq(5L)) ++ fam("gamma", 30, Seq(20L))
    val dir = java.nio.file.Files.createTempDirectory("graft_cs_rp").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cs_rpc").toString
    val in = MemoryStream[(Long, String)]
    val q = ClusterStreams.clusterStream(
      in.toDS().toDF("id", "text"), "id", "text", dir, ckpt)
    try Seq(b1, b2).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    // the crash-replay scenario: batch 1's marker landed, the stream
    // replays it. State reads self-exclude batch 1, so the recomputed
    // delta must be byte-identical to what batch 1 originally wrote —
    // the overwrite is then a no-op, never an erasure.
    val stored = spark.read.parquet(s"$dir/labels/batch_id=1")
      .select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val histLabels = ClusterStreams.loadLabelsBelow(spark, dir, 1L)
    val replayEdges = Dedup.incrementalMinHashCandidates(
      ClusterStreams.loadBandsBelow(spark, dir, 1L),
      b2.toDF("id", "text"), "id", "text")
    val updated = Dedup.incrementalClusters(histLabels, replayEdges)
    val recomputed = updated
      .join(histLabels.withColumnRenamed("label", "__old"), Seq("id"), "left")
      .where(col("__old").isNull || col("__old") =!= col("label"))
      .select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recomputed === stored)
    assert(stored.nonEmpty) // non-vacuous: batch 1 really wrote a delta
    // and self-exclusion really excludes: below-1 state is exactly b1's
    assert(ClusterStreams.loadLabelsBelow(spark, dir, 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === directLabels(b1))
  }

  test("compaction crash windows: base+originals coexisting read identically; replay converges") {
    import java.nio.file.{Files, Path => JPath, Paths}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val b1 = fam("alpha", 30, Seq(1L, 2L))
    val b2 = fam("alpha", 30, Seq(5L)) ++ fam("beta", 30, Seq(10L))
    val dir = Files.createTempDirectory("graft_cs_crash").toString
    val ckpt = Files.createTempDirectory("graft_cs_crashc").toString
    val in = MemoryStream[(Long, String)]
    val q = ClusterStreams.clusterStream(
      in.toDS().toDF("id", "text"), "id", "text", dir, ckpt)
    try Seq(b1, b2).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    def partitionIds(sub: String): Set[Long] = {
      val p = Paths.get(s"$dir/$sub")
      if (!Files.isDirectory(p)) Set.empty
      else {
        val s = Files.list(p)
        try s.toArray.map(_.asInstanceOf[JPath].getFileName.toString)
          .filter(_.startsWith("batch_id="))
          .map(_.stripPrefix("batch_id=").toLong).toSet
        finally s.close()
      }
    }
    val beforeLabels = streamedLabels(dir)
    val beforeBands = ClusterStreams.loadBands(spark, dir)
      .collect().map(_.toSeq).toSet

    // crash window: base data + covering marker landed, originals NOT
    // deleted. Labels fold = latest-wins, bands fold = distinct union —
    // both must read identically with base and originals coexisting.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("batch_id").desc)
    spark.read.parquet(s"$dir/labels")
      .where(col("batch_id").isin(0L, 1L))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).select("id", "label")
      .write.parquet(s"$dir/labels/batch_id=-1")
    spark.read.parquet(s"$dir/bands")
      .where(col("batch_id").isin(0L, 1L))
      .select("id", "band_idx", "band_key").distinct()
      .write.parquet(s"$dir/bands/batch_id=-1")
    Seq((0L, Seq(0L, 1L))).toDF("n", "covers")
      .write.parquet(s"$dir/commits/batch_id=-1")
    assert(streamedLabels(dir) === beforeLabels)
    assert(ClusterStreams.loadBands(spark, dir)
      .collect().map(_.toSeq).toSet === beforeBands)
    assert(partitionIds("labels") === Set(-1L, 0L, 1L))

    // replay: compact() finishes the interrupted flip
    ClusterStreams.compact(spark, dir)
    assert(streamedLabels(dir) === beforeLabels)
    assert(ClusterStreams.loadBands(spark, dir)
      .collect().map(_.toSeq).toSet === beforeBands)
    assert(partitionIds("labels").size === 1)
    assert(partitionIds("bands").size === 1)
  }
}
