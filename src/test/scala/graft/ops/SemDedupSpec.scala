package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SemDedupSpec extends AnyFunSuite with SparkSpec {

  // two tight groups far apart (k-means must separate them) with an
  // exact duplicate and a near-duplicate inside group A, plus a
  // lone far-out vector in group B's half-space
  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // A canonical
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // A exact dup of 1
      (3L, Array(0.999f, 0.01f, 0.0f, 0.0f)), // A near-dup of 1
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),  // B canonical
      (5L, Array(-0.7f, -0.7f, 0.0f, 0.0f))  // B distinct direction
    ).toDF("vec_id", "embedding")
  }

  private def flags(tau: Double): Map[Long, Boolean] =
    Dedup.semDedup(corpus(), k = 2, iters = 2, tau = tau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

  test("exact and near duplicates flagged within their cluster, lowest id kept") {
    assert(flags(0.999) == Map(
      1L -> false, // kept representative
      2L -> true,  // exact dup of 1
      3L -> true,  // cos(1,3) ~ 0.99995 >= 0.999
      4L -> false, 5L -> false))
  }

  test("zero-norm embeddings are never flagged (NaN cosine must not order above tau)") {
    import spark.implicits._
    // two all-zero vectors land in SOME shared cluster; their cosine is
    // 0/0 = NaN, which Spark orders ABOVE tau — without the norm guard
    // both comparisons 'pass' and 7 is flagged as a duplicate of 6
    val withZeros = corpus().unionByName(Seq(
      (6L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (7L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val got = Dedup.semDedup(withZeros, k = 2, iters = 2, tau = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(6L) === false)
    assert(got(7L) === false)
    // the real duplicates are still caught alongside
    assert(got(2L) === true)
  }

  test("tau = 1.0 keeps the merely-near duplicate") {
    // quantized (1000,0,0,0) vs (999,10,0,0): cosine < 1, so only the
    // bit-identical copy is flagged
    assert(flags(1.0) == Map(
      1L -> false, 2L -> true, 3L -> false, 4L -> false, 5L -> false))
  }

  test("cross-cluster similarity never flags: duplicates split by the clustering survive") {
    import spark.implicits._
    // k = number of vectors forces singleton-ish clusters; with every
    // vector alone (or paired only with its cluster-mates) no pair
    // forms across clusters even for identical vectors placed apart
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, k = 2, iters = 1, tau = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> false, 2L -> false))
  }
}
