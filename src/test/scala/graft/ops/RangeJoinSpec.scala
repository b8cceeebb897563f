package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketized interval join must be row-for-row the naive BETWEEN
  * join for every interval/width geometry — intervals shorter, equal
  * to, and much longer than the bucket width; empty intervals;
  * boundary points (inclusive lo, exclusive hi); negative coordinates
  * (floor-division bucketing, not truncation).
  */
class RangeJoinSpec extends AnyFunSuite with graft.SparkSpec {

  test("bucketized point-in-interval equals the naive range join across geometries") {
    import spark.implicits._
    // deterministic pseudo-random layout: points on a line, intervals
    // of wildly varying lengths including empty and negative-coordinate
    val points = (-50L to 400L).map(p => (p, s"p$p")).toDF("pt", "ptag")
    val intervals = Seq(
      (-45L, -40L, "neg"),        // fully negative
      (-5L, 5L, "zero_cross"),    // crosses zero
      (0L, 1L, "unit"),           // single point [0,1)
      (10L, 10L, "empty"),        // hi == lo -> matches nothing
      (20L, 19L, "inverted"),     // hi < lo  -> matches nothing
      (30L, 37L, "short"),        // shorter than width
      (40L, 56L, "exact"),        // exactly one width
      (60L, 300L, "long"),        // many buckets
      (95L, 112L, "straddle"))    // straddles bucket boundaries
      .toDF("lo", "hi", "wtag")
    for (width <- Seq(1L, 7L, 16L, 1000L)) {
      val bucketized = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", width)
        .select("pt", "wtag").orderBy("pt", "wtag").collect().toSeq
      val naive = points.join(intervals, col("pt") >= col("lo") && col("pt") < col("hi"))
        .select("pt", "wtag").orderBy("pt", "wtag").collect().toSeq
      assert(bucketized == naive, s"width=$width")
    }
  }

  test("property: seeded random geometries match the naive join (duplicates included)") {
    import spark.implicits._
    // seeded so a failure reproduces; duplicate points and overlapping/
    // inverted/empty intervals arise naturally from the generator
    val rnd = new scala.util.Random(20260813L)
    for (width <- Seq(3L, 17L, 64L)) {
      val points = Seq.fill(300)(rnd.nextLong() % 1000).map(Tuple1(_)).toDF("pt")
      val intervals = Seq.fill(40) {
        val lo = rnd.nextLong() % 1000
        (lo, lo + rnd.nextInt(120) - 10) // ~8% inverted or empty
      }.zipWithIndex.map { case ((lo, hi), i) => (lo, hi, i.toLong) }
        .toDF("lo", "hi", "wid")
      val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", width)
        .select("pt", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = points.join(intervals, col("pt") >= col("lo") && col("pt") < col("hi"))
        .select("pt", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == want, s"width=$width: got ${got.size} rows, want ${want.size}")
    }
  }

  test("a reserved __bkt column on either input is rejected up front") {
    import spark.implicits._
    val tainted = Seq((1L, 2L)).toDF("pt", "__bkt")
    val clean = Seq((0L, 10L)).toDF("lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(tainted, "pt", clean, "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("__bkt"))
  }

  test("a pathological open-ended interval fails fast with the offending bounds") {
    import spark.implicits._
    val points = Seq(5L).toDF("pt")
    val sentinel = Seq((0L, Long.MaxValue)).toDF("lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", sentinel, "lo", "hi",
          bucketWidth = 10L, maxBucketsPerInterval = 1000L)
        .collect()
    }
    // the raise_error fires during expansion, naming the interval
    assert(e.getMessage != null && e.getMessage.contains("RangeJoin"),
      s"got: ${e.getMessage}")
  }

  test("boundary semantics: lo inclusive, hi exclusive") {
    import spark.implicits._
    val points = Seq(9L, 10L, 19L, 20L).toDF("pt")
    val intervals = Seq((10L, 20L)).toDF("lo", "hi")
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 8L)
      .select("pt").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 19L))
  }
}
