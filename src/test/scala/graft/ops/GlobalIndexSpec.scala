package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Layout.globalIndex's contract: the two-pass (intra-granule window +
  * broadcast granule-prefix offsets) index equals the naive
  * single-partition row_number over the same total order — for any
  * granule size, including granules larger than the domain (one
  * granule = the naive form) and granule 1 (every row its own
  * granule), and under order-value COLLISIONS where the tie column
  * decides.
  */
class GlobalIndexSpec extends AnyFunSuite with SparkSpec {

  private def naive(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.sortBy { case (id, ord) => (ord, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap

  test("equals naive row_number for every granule size, sparse ids included") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(1 << 20).toLong))
      .map { case (id, ord) => (id, ord - ord % 3 + id % 3) } // some collisions
    val expected = naive(rows)
    val df = rows.toDF("id", "ord")
    for (granule <- Seq(1L, 7L, 1024L, 1L << 30)) {
      val got = Layout.globalIndex(df, col("ord"), col("id"), granule)
        .select("id", "global_idx")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"granule $granule")
    }
  }

  test("indexes are a dense 0-based permutation") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i * 37 % 101)).toDF("id", "ord")
    val idx = Layout.globalIndex(df, col("ord"), col("id"), 16L)
      .select("global_idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == (0L until 100L))
  }

  test("hash-order shuffle: identical permutation at different parallelism") {
    import spark.implicits._
    val df = (1L to 300L).toDF("id")
      .withColumn("h", Dedup.md5Hash32(col("id").cast("string")))
    def run(parts: Int): Seq[(Long, Long)] =
      Layout.globalIndex(df.repartition(parts), col("h"), col("id"), 1L << 24)
        .select("id", "global_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(run(1) == run(13))
  }

  test("negative orders index correctly (floor-div granules, not trunc)") {
    import spark.implicits._
    // orders straddle 0: trunc-toward-zero `div` would merge the
    // (-granule, granule) window into one granule 0 and interleave
    // negatives with positives; floor semantics must keep the global
    // order exact for the full signed range
    val rnd = new scala.util.Random(3)
    val rows = (1L to 400L).map(i => (i, rnd.nextInt(1 << 16).toLong - (1L << 15)))
    val expected = naive(rows)
    val df = rows.toDF("id", "ord")
    for (granule <- Seq(1L, 7L, 1024L, 1L << 30)) {
      val got = Layout.globalIndex(df, col("ord"), col("id"), granule)
        .select("id", "global_idx")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"granule $granule")
    }
  }

  test("granule must be positive") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("id", "ord")
    intercept[IllegalArgumentException] {
      Layout.globalIndex(df, col("ord"), col("id"), 0L)
    }
  }
}
