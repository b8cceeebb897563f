package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.ops.Dedup

class DedupStreamsSpec extends AnyFunSuite with SparkSpec {

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today spark"),
    (3L, "completely different text with nothing shared at all whatsoever here"),
    // arrives in a LATER batch, near-dup of 1 and 2
    (4L, "the quick brown fox jumps over the lazy dog again and again today"))

  test("streaming candidate pairs match the batch LSH operator across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = DedupStreams.nearDupPairs(in.toDS().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(docs(0), docs(1), docs(2))
      q.processAllAvailable()
      in.addData(docs(3)) // state remembers bucket members across batches
      q.processAllAvailable()
      val streamed = spark.table("neardup_stream")
        .select("id_a", "id_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.minHashCandidatePairs(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(streamed.contains((1L, 4L))) // cross-batch pair via state
      assert(!streamed.exists(p => p._1 == 3L || p._2 == 3L))
    } finally q.stop()
  }

  test("exactlyOncePairs collapses multi-band emissions to one row per pair across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val raw = DedupStreams.nearDupPairs(in.toDS().toDF("doc_id", "text"), "doc_id", "text")
    val q = DedupStreams.exactlyOncePairs(raw)
      .writeStream.format("memory").queryName("neardup_once")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(docs(0), docs(1), docs(2))
      q.processAllAvailable()
      in.addData(docs(3)) // identical to doc 1 -> pairs via ALL 4 bands
      q.processAllAvailable()
      val rows = spark.table("neardup_once")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // exactly once: no (id_a, id_b) appears twice even though the raw
      // stream emits identical-doc pairs once per shared band
      assert(rows.size == rows.distinct.size,
        s"duplicate pairs in deduped sink: $rows")
      val batch = Dedup.minHashCandidatePairs(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.toSet == batch)
      assert(rows.toSet.contains((1L, 4L))) // cross-batch pair, still single
    } finally q.stop()
  }

  test("streaming decontamination flags exactly the batch operator's ids, once each") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(
      (100L, "held out evaluation question about the quick brown fox jumping"),
      (101L, "another benchmark prompt that must never leak into training data"))
      .toDF("doc_id", "text")
    val streamDocs = Seq(
      // near-dup of bench 100 (one word appended) -> must flag
      (1L, "held out evaluation question about the quick brown fox jumping spark"),
      // unrelated -> must not flag
      (2L, "completely different text with nothing shared at all whatsoever here"),
      // identical to bench 101 -> hits ALL bands, must still flag ONCE
      (3L, "another benchmark prompt that must never leak into training data"))
    val in = MemoryStream[(Long, String)]
    val q = DedupStreams.decontaminationFlags(
        in.toDS().toDF("doc_id", "text"), bench, "doc_id", "text")
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(streamDocs(0), streamDocs(1))
      q.processAllAvailable()
      in.addData(streamDocs(2)) // static side serves every micro-batch
      q.processAllAvailable()
      val flagged = spark.table("decon_stream").collect().map(_.getLong(0)).toSeq
      assert(flagged.sorted == Seq(1L, 3L), s"flagged=$flagged")
      // batch twin agrees
      val batch = graft.ops.Curation.lshDecontaminateIds(
          streamDocs.toDF("doc_id", "text"), bench, "doc_id", "text")
        .collect().map(_.getLong(0)).toSet
      assert(batch == Set(1L, 3L))
    } finally q.stop()
  }

  test("stateTtl wiring: pairs still flow with processing-time timeout armed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // smoke test for the ProcessingTimeTimeout path: setTimeoutDuration
    // throws at runtime if the timeout conf is mis-wired, so one
    // micro-batch through the TTL branch guards the whole path
    val q = DedupStreams.nearDupPairs(in.toDS().toDF("doc_id", "text"),
        "doc_id", "text", stateTtl = Some("1 hour"))
      .writeStream.format("memory").queryName("neardup_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(docs(0), docs(1))
      // NOT processAllAvailable: with a processing-time timeout armed the
      // engine keeps scheduling timeout-check batches, so "all available"
      // never settles — poll the sink with a deadline instead
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("neardup_ttl").count() < 1 &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(spark.table("neardup_ttl").count() >= 1)
    } finally q.stop()
  }

  test("streaming incremental dedup keeps exactly the batch operator's new fingerprints") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val history = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val b1 = Seq((10L, "ALPHA TEXT"), (11L, "gamma text"), (12L, "gamma text"))
    val b2 = Seq((13L, "gamma text"), (14L, "delta text"), (15L, null.asInstanceOf[String]))
    val in = MemoryStream[(Long, String)]
    val handle = DedupStreams.incrementalNew(in.toDS().toDF("doc_id", "text"),
        history, "doc_id", "text")
    val q = handle.stream
      .writeStream.format("memory").queryName("incr_new")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*) // 13 duplicates gamma ACROSS batches -> state drops it
      q.processAllAvailable()
      val rows = spark.table("incr_new").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      // one emission per new fingerprint: gamma once (first arrival 11),
      // delta once; history's alpha (case-normalized) and the null text
      // never pass
      assert(rows.map(_._1).sorted.toSeq == Seq(11L, 14L))
      val batch = graft.ops.Dedup.incrementalNew(
          (b1 ++ b2).toDF("doc_id", "text").where(col("text").isNotNull),
          history, "doc_id", "text")
        .collect().map(_.getAs[String]("fingerprint")).toSet
      assert(rows.map(_._2).toSet == batch,
        "streaming must admit exactly the batch operator's fingerprint set")
    } finally { q.stop(); handle.release() }
  }

  test("bucket cap bounds membership but arrivals still pair against remembered members") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = DedupStreams.nearDupPairs(in.toDS().toDF("doc_id", "text"),
        "doc_id", "text", maxBucketSize = 2)
      .writeStream.format("memory").queryName("neardup_capped")
      .outputMode(OutputMode.Append).start()
    try {
      val same = "identical text shared by every single document in this stream"
      in.addData((1L, same), (2L, same), (3L, same), (4L, same))
      q.processAllAvailable()
      val pairs = spark.table("neardup_capped")
        .select("id_a", "id_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // membership froze at 2 docs, but later arrivals still paired
      // against both remembered members: of the C(4,2)=6 batch pairs,
      // exactly the one AMONG the two over-cap docs is lost (which two
      // docs became members is iterator-order dependent).
      val all = (1L to 4L).combinations(2).map(c => (c(0), c(1))).toSet
      assert(pairs.size == 5 && (all -- pairs).size == 1)
    } finally q.stop()
  }

  test("streaming winnow index partials merge to the batch index; stats face agrees") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("winnow-stream-").toString
    val in = MemoryStream[(Long, String)]
    val q = DedupStreams.winnowIndexStream(in.toDS().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/ckpt")
    try {
      in.addData(docs(0), docs(1))
      q.processAllAvailable()
      in.addData(docs(2), docs(3)) // doc 4 repeats doc 1's text verbatim
      q.processAllAvailable()
      val streamed = DedupStreams.loadWinnowIndex(spark, s"$dir/index")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fps = Dedup.winnowFingerprints(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      val batch = Dedup.winnowIndex(fps)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === batch)
      // and the d29 face over the streamed index == over the batch index
      val viaStream = Dedup.winnowStatsFromIndex(fps,
          DedupStreams.loadWinnowIndex(spark, s"$dir/index"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val viaBatch = Dedup.winnowStats(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(viaStream === viaBatch)
      // cross-batch sharing is the point: docs 1 and 4 landed in
      // DIFFERENT batches and every one of their fingerprints must
      // still count as shared through the merged index
      val d1 = viaStream(1L)
      assert(d1._2 > 0 && d1._2 === d1._3,
        s"identical cross-batch doc not fully shared: $d1")
    } finally q.stop()
  }

  test("streaming CDC chunk index == batch index across batches, incl. compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc-stream-").toString
    // (source, text): doc in batch 2 repeats batch 1 boilerplate
    // verbatim at a shifted offset — the cross-batch chunk-share the
    // merged index must count
    val boiler = "shared boilerplate paragraph that chunk dedup must catch across docs"
    val rows = Seq(
      ("src_a", s"intro words $boiler and a tail"),
      ("src_a", "totally unrelated content in the same source group here"),
      ("src_b", s"different prefix text then $boiler trailing off"),
      ("src_a", s"yet another framing of $boiler appearing in a later batch"))
    val in = MemoryStream[(String, String)]
    val q = DedupStreams.cdcChunkIndexStream(
      in.toDS().toDF("source", "text"), s"$dir/index", s"$dir/ckpt")
    def streamedIndex() = DedupStreams
      .loadCdcChunkIndex(spark, s"$dir/index")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    try {
      in.addData(rows(0), rows(1))
      q.processAllAvailable()
      in.addData(rows(2), rows(3))
      q.processAllAvailable()
      val batch = Dedup.cdcChunkIndex(rows.toDF("source", "text"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      assert(streamedIndex() === batch)
      // the d27 stats face over the streamed index == over the batch one
      def face(ix: org.apache.spark.sql.DataFrame) =
        Dedup.cdcChunkStats(rows.toDF("source", "text"), ix)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getLong(5)))).toMap
      assert(face(DedupStreams.loadCdcChunkIndex(spark, s"$dir/index")) ===
        face(Dedup.cdcChunkIndex(rows.toDF("source", "text"))))
      // compaction folds partials into one base partition; the read
      // view must not change (and a second compact is a no-op)
      DedupStreams.compactCdcChunkIndex(spark, s"$dir/index")
      assert(streamedIndex() === batch)
      DedupStreams.compactCdcChunkIndex(spark, s"$dir/index")
      assert(streamedIndex() === batch)
      val partials = new java.io.File(s"$dir/index/chunks").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSeq
      assert(partials === Seq("batch_id=-1"),
        s"compaction left extra partials: $partials")
    } finally q.stop()
  }

  test("streaming cross-span index == batch index; drives d35 removal; compaction invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("xspan-stream-").toString
    val minLen = 10
    // the cross-batch case the index exists for: the boilerplate's
    // SECOND witness arrives in a LATER batch, so neither batch alone
    // sees a multi-doc gram — only the sum-merged index does
    val boiler = "SHARED CROSS BATCH BOILERPLATE SENTENCE"
    val rows: Seq[(Long, String, String)] = Seq(
      (1L, s"alpha $boiler one", "s1"),
      (2L, "no repeats in this one at all", "s1"),
      (3L, s"beta $boiler two", "s1"),
      (4L, s"other source $boiler", "s2"))
    val in = MemoryStream[(Long, String, String)]
    val q = DedupStreams.crossSpanIndexStream(
      in.toDS().toDF("doc_id", "text", "source"),
      s"$dir/index", s"$dir/ckpt", minLen = minLen)
    val allDf = rows.toDF("doc_id", "text", "source")
    def streamedIndex() = DedupStreams
      .loadCrossSpanIndex(spark, s"$dir/index")
    def indexMap() = streamedIndex().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def removalVia(ix: org.apache.spark.sql.DataFrame) =
      graft.ops.SuffixArray
        .crossDocSpanRemovalFromIndex(allDf, ix, "doc_id", "text",
          "source", minLen)
        .collect().map(r => r.getLong(0) -> ((r.getString(1),
          r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    try {
      // before any commit: empty index, not an error
      assert(indexMap() === Map.empty)
      in.addData(rows(0), rows(1))
      q.processAllAvailable()
      in.addData(rows(2), rows(3))
      q.processAllAvailable()
      val batchIx = graft.ops.SuffixArray
        .crossSpanIndex(allDf, "doc_id", "text", "source", minLen)
      val batchMap = batchIx.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(indexMap() === batchMap)
      // the streamed index drives the SAME removal as the direct op
      val direct = graft.ops.SuffixArray
        .crossDocSpanRemoval(allDf, "doc_id", "text", "source", minLen)
        .collect().map(r => r.getLong(0) -> ((r.getString(1),
          r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(removalVia(streamedIndex()) === direct)
      // the boilerplate IS cut (cross-batch witness found) — non-vacuous
      assert(direct(1L)._3 < rows(0)._2.length.toLong,
        "cross-batch boilerplate must be cut")
      // compaction folds partials into one base; the read view and the
      // removal it drives must not change (second compact = no-op)
      DedupStreams.compactCrossSpanIndex(spark, s"$dir/index")
      assert(indexMap() === batchMap)
      assert(removalVia(streamedIndex()) === direct)
      DedupStreams.compactCrossSpanIndex(spark, s"$dir/index")
      assert(indexMap() === batchMap)
      val partials = new java.io.File(s"$dir/index/grams").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSeq
      assert(partials === Seq("batch_id=-1"),
        s"compaction left extra partials: $partials")
    } finally q.stop()
  }
}
