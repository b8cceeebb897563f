package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The KMV bottom-k aggregate's contract: the sketch IS the k smallest
  * distinct hashes — exactly, not approximately — under any split of
  * the data into partial buffers (that is what makes it
  * oracle-replayable). Distribution invariance is the load-bearing
  * property: partial buffers merging must commute with a single pass.
  */
class KmvSpec extends AnyFunSuite with graft.SparkSpec {

  private def bruteBottomK(values: Seq[Long], k: Int): Seq[Long] =
    values.distinct.sorted.take(k)

  test("sketch equals the k smallest distinct values regardless of partitioning") {
    import spark.implicits._
    KmvExpressions.register(spark)
    val rnd = new scala.util.Random(42)
    // duplicates on purpose: distinctness is part of the contract
    val values = Seq.fill(5000)(rnd.nextLong() % 700)
    for (parts <- Seq(1, 2, 7)) {
      val got = values.toDF("h").repartition(parts)
        .agg(KmvExpressions.bottom_k_hashes(col("h"), 16).as("sk"))
        .head().getSeq[Long](0).toSeq
      assert(got == bruteBottomK(values, 16), s"parts=$parts")
    }
  }

  test("fewer distinct values than k: the sketch is the exact distinct set") {
    import spark.implicits._
    KmvExpressions.register(spark) // each test registers: tests must run in isolation
    val values = Seq(5L, 3L, 5L, 3L, 9L)
    val got = values.toDF("h")
      .agg(KmvExpressions.bottom_k_hashes(col("h"), 64).as("sk"))
      .head().getSeq[Long](0).toSeq
    assert(got == Seq(3L, 5L, 9L))
  }

  test("nulls are skipped, empty input yields an empty sketch") {
    import spark.implicits._
    KmvExpressions.register(spark)
    val got = Seq[Option[Long]](None, Some(7L), None).toDF("h")
      .agg(KmvExpressions.bottom_k_hashes(col("h"), 4).as("sk"))
      .head().getSeq[Long](0).toSeq
    assert(got == Seq(7L))
    val empty = Seq.empty[Long].toDF("h")
      .agg(KmvExpressions.bottom_k_hashes(col("h"), 4).as("sk"))
      .head().getSeq[Long](0).toSeq
    assert(empty == Seq.empty)
  }

  test("merging per-group sketches equals the whole-corpus sketch") {
    // the two-level contract behind q36: bottom_k_merge over PERSISTED
    // per-group sketches must reproduce bottom_k_hashes over the raw
    // union — exactly, for any grouping of the data
    import spark.implicits._
    KmvExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(4000)(i => (s"src${i % 5}", rnd.nextLong() % 900))
    val df = rows.toDF("src", "h")
    val whole = df.agg(KmvExpressions.bottom_k_hashes(col("h"), 16).as("sk"))
      .head().getSeq[Long](0).toSeq
    val merged = df.groupBy("src")
      .agg(KmvExpressions.bottom_k_hashes(col("h"), 16).as("sk"))
      .agg(KmvExpressions.bottom_k_merge(col("sk"), 16).as("gsk"))
      .head().getSeq[Long](0).toSeq
    assert(merged == whole)
    assert(merged == bruteBottomK(rows.map(_._2), 16))
  }

  test("two-sketch intersection composition (q40): exact when the union fits in k") {
    // the q40 estimator: sku = k smallest of (ska ∪ skb), n_in_both =
    // |sku ∩ ska ∩ skb|. When |A ∪ B| <= k both sketches are the full
    // sets, so Jaccard and the intersection come out EXACT — the
    // small-set degenerate case every estimator must inherit
    import spark.implicits._
    KmvExpressions.register(spark)
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val b = Seq(4L, 5L, 6L, 7L, 8L)
    val k = 16
    val ska = a.toDF("h").agg(KmvExpressions.bottom_k_hashes(col("h"), k).as("s"))
      .head().getSeq[Long](0).toSet
    val skb = b.toDF("h").agg(KmvExpressions.bottom_k_hashes(col("h"), k).as("s"))
      .head().getSeq[Long](0).toSet
    val sku = (ska ++ skb).toSeq.sorted.take(k).toSet
    val nBoth = (sku & ska & skb).size
    assert(nBoth == (a.toSet & b.toSet).size)       // exact intersection
    assert(sku.size == (a.toSet ++ b.toSet).size)   // exact union
    // and the estimator rule applied to full-coverage sketches is exact
    assert(nBoth.toDouble / sku.size ==
      (a.toSet & b.toSet).size.toDouble / (a.toSet ++ b.toSet).size)
  }

  test("bottom_k_merge rejects a non-sketch column") {
    import spark.implicits._
    KmvExpressions.register(spark)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("h")
        .agg(KmvExpressions.bottom_k_merge(col("h"), 4)).head()
    }
    assert(err.getMessage.contains("bottom_k_merge"))
  }

  test("parquet round-trip: persisted sketches merge identically to same-job sketches (q46)") {
    // the cross-SESSION contract behind q46: writing per-group sketches
    // to parquet and reading them back cold must be lossless — the
    // merge over (persisted ∪ fresh) sketch rows equals the direct
    // whole-corpus sketch
    import spark.implicits._
    KmvExpressions.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(4000)(i => (s"src${i % 5}", i % 3 == 0, rnd.nextLong() % 900))
    val df = rows.toDF("src", "today", "h")
    val dir = java.nio.file.Files.createTempDirectory("kmv_roundtrip").toString
    df.where(!col("today")).groupBy("src")
      .agg(KmvExpressions.bottom_k_hashes(col("h"), 16).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .unionByName(df.where(col("today")).groupBy("src")
        .agg(KmvExpressions.bottom_k_hashes(col("h"), 16).as("sk")))
      .groupBy("src")
      .agg(KmvExpressions.bottom_k_merge(col("sk"), 16).as("msk"))
    val direct = df.groupBy("src")
      .agg(KmvExpressions.bottom_k_hashes(col("h"), 16).as("dsk"))
    val joined = merged.join(direct, "src").collect()
    assert(joined.length == 5)
    joined.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"src=${r.getString(0)}")
    }
  }

  test("serde round-trip preserves the buffer (the shuffle path)") {
    val agg = BottomKHashes(
      org.apache.spark.sql.catalyst.expressions.Literal(0L), k = 8)
    val buf = agg.createAggregationBuffer()
    Seq(9L, 1L, 5L, 1L, -3L).foreach(buf.add(_))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("SQL surface works after registration") {
    import spark.implicits._
    KmvExpressions.register(spark)
    Seq(1L, 2L, 2L, 3L).toDF("h").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT bottom_k_hashes(h, 2) AS sk FROM kmv_in")
      .head().getSeq[Long](0).toSeq
    assert(got == Seq(1L, 2L))
  }
}
