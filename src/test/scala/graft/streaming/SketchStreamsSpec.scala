package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SketchStreamsSpec extends AnyFunSuite with SparkSpec {

  test("streaming KMV state equals the batch sketch of everything ingested, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 4 // small k so the estimator's (k-1)·2^32/h_k branch is exercised
    val batch1 = (1 to 10).map(i => ("a", s"doc a $i")) ++
      Seq(("b", "doc b 1"), ("b", "doc b 1"), ("b", null: String))
    val batch2 = (5 to 15).map(i => ("a", s"doc a $i")) ++ // overlap 5..10 adds nothing new
      Seq(("b", "doc b 2"))
    val in = MemoryStream[(String, String)]
    val q = SketchStreams.kmvBySource(in.toDS().toDF("source", "text"), "source", "text", k)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      // update mode: EXACTLY one emission per source touched by the trigger
      assert(spark.table("kmv_stream").count() == 2L,
        "trigger 1 touched sources a and b -> exactly 2 emissions")
      in.addData(batch2: _*)
      q.processAllAvailable()
      assert(spark.table("kmv_stream").count() == 4L,
        "trigger 2 touched both sources again -> exactly 2 more emissions")

      // batch reference: the native aggregate over the full ingested data
      graft.functions.KmvExpressions.register(spark)
      val all = (batch1 ++ batch2).toDF("source", "text").where(col("text").isNotNull)
      val expected = all
        .select(col("source"), graft.ops.Dedup.md5Hash32(col("text")).as("hv"))
        .groupBy("source")
        .agg(graft.functions.KmvExpressions.bottom_k_hashes(col("hv"), k).as("sk"))
        .collect().map { r =>
          val sk = r.getSeq[Long](1)
          r.getString(0) -> ((sk.size.toLong, SketchStreams.estimate(sk, k)))
        }.toMap

      val emitted = spark.table("kmv_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      // the LAST emission per source (largest sketch; at equal size the
      // LARGER estimate — h_k only shrinks as smaller hashes arrive, so
      // the estimate only grows) must equal the batch sketch
      val last = emitted.groupBy(_._1).map { case (s, rows) =>
        s -> rows.map(e => (e._2, e._3)).max
      }
      assert(last == expected, s"streaming state diverged: $last vs $expected")
      // and the 'b' source (2 distinct texts < k) sits on the exact branch
      assert(expected("b")._1 == 2L && expected("b")._2 == 2.0)
    } finally q.stop()
  }

  test("streaming histogram quantiles equal the batch q39 rule over everything ingested") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = 10L
    // values chosen so batch 2 MOVES p95/p99 (a tail arrives late) and
    // leaves p50 alone — merging, not just counting, is under test
    def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    val batch1 = (1L to 50L).map(v => ("k1", jl(v))) ++
      Seq(("k2", jl(7L)), ("k2", null.asInstanceOf[java.lang.Long]))
    val batch2 = (951L to 960L).map(v => ("k1", jl(v))) ++ Seq(("k2", jl(8L)))
    val in = MemoryStream[(String, java.lang.Long)]
    val q = SketchStreams.histogramQuantiles(
        in.toDS().toDF("key", "v"), "key", "v", w)
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val last = spark.table("hist_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
      // batch reference: q39's integer rule on the merged counts
      def ref(vals: Seq[Long]): (Long, Long, Long) = {
        val bins = vals.groupBy(_ / w).view.mapValues(_.size.toLong).toMap
        (SketchStreams.histQuantile(bins, 50, w),
          SketchStreams.histQuantile(bins, 95, w),
          SketchStreams.histQuantile(bins, 99, w))
      }
      val k1Vals = (1L to 50L) ++ (951L to 960L)
      val (p50, p95, p99) = ref(k1Vals.toSeq)
      assert(last("k1") == (("k1", 60L, p50, p95, p99)))
      // the late tail moved the upper quantiles into the 950s bins
      assert(p95 >= 950L && p99 >= 950L && p50 <= 300L)
      val (q50, q95, q99) = ref(Seq(7L, 8L))
      assert(last("k2") == (("k2", 2L, q50, q95, q99)))
    } finally q.stop()
  }
}
