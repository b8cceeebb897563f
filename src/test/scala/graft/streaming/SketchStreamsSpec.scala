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
}
