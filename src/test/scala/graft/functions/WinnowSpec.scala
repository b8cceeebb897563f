package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Winnowing fingerprints (d29's primitive): agreement with a direct
  * per-window reference (rolling hash + rightmost-min selection as the
  * oracle states them), the SWA density/guarantee properties, offset
  * invariance (the content-locked sampling that makes shared
  * boilerplate fingerprint identically at any offset), and edges.
  */
class WinnowSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private val K = 5
  private val W = 8

  private def fingerprintsOf(rows: Seq[String]): Seq[Seq[Long]] =
    rows.toDF("s")
      .select(TextHashExpressions.winnow_fingerprints(col("s"), K, W).as("f"))
      .collect().map(_.getSeq[Long](0).toList).toList

  /** Direct reference: gram hashes as the plain polynomial, selection
    * as the literal rightmost-min over each (clamped) window, distinct
    * selected positions in order — the DuckDB oracle's statement.
    */
  private def reference(s: String): Seq[Long] = {
    val m = s.length - K + 1
    if (m < 1) return Nil
    val g = (0 until m).map { i =>
      (i until i + K).foldLeft(0L)((a, j) => (a * 31 + s.charAt(j)) & 0xFFFFFFFFL)
    }
    val nWin = math.max(m - W + 1, 1)
    (0 until nWin).flatMap { j =>
      val end = math.min(j + W - 1, m - 1)
      val window = (j to end)
      val minV = window.map(g).min
      Some(window.filter(p => g(p) == minV).max) // rightmost min
    }.distinct.sorted.map(p => ((p + 1).toLong << 32) | g(p))
  }

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog " * 20,
    (0 until 400).map(i => ('a' + (i * 7) % 26).toChar).mkString,
    "short", "", "abcd", "abcde", // m = -? / 0 / 1 edges around k = 5
    "exactly a bit longer",
    "a" * 300 // degenerate: all gram hashes equal — ties everywhere
  )

  test("engine fingerprints equal the direct reference on every edge shape") {
    corpus.zip(fingerprintsOf(corpus)).foreach { case (s, got) =>
      assert(got === reference(s), s"winnow diverged for '${s.take(20)}...'")
    }
  }

  test("SWA guarantee: every window of w grams holds a fingerprint; positions strictly increase") {
    val s = "spark shuffles partitions and broadcasts the small side " * 10
    val Seq(fp) = fingerprintsOf(Seq(s))
    val pos = fp.map(p => (p >>> 32).toInt)
    assert(pos === pos.sorted && pos.distinct.size === pos.size)
    val m = s.length - K + 1
    (0 to m - W).foreach { j =>
      assert(pos.exists(p => p >= j + 1 && p <= j + W),
        s"window at gram $j has no fingerprint")
    }
    // density lands near the expected 2/(w+1), not at the gram count
    assert(pos.size < m / 2 && pos.size > m / (4 * W))
  }

  test("content-locked: a shared substring fingerprints identically at different offsets") {
    val boiler = "unsubscribe from this newsletter at example dot com please"
    val a = "PREFIX A >>> " + boiler + " <<< TAIL ONE"
    val b = "a very different and much longer preamble here ... " + boiler + " other tail"
    val Seq(fa, fb) = fingerprintsOf(Seq(a, b))
    // compare (hash, offset-within-boilerplate) pairs for fingerprints
    // inside the shared region: winnowing selects the SAME grams
    def inside(f: Seq[Long], off: Int): Set[(Long, Int)] =
      f.map(p => ((p >>> 32).toInt - 1, p & 0xFFFFFFFFL))
        .collect { case (p, h) if p >= off + W && p + K <= off + boiler.length - W =>
          (h, p - off) }.toSet
    val sa = inside(fa, a.indexOf(boiler))
    val sb = inside(fb, b.indexOf(boiler))
    assert(sa.nonEmpty && sa === sb)
  }

  test("d29 stats face: shared fingerprints found, zero-gram docs kept with zeros") {
    val docs = Seq(
      (1L, "the curated corpus shares this exact boilerplate sentence verbatim", "s1"),
      (2L, "another doc where the curated corpus shares this exact boilerplate sentence verbatim too", "s1"),
      (3L, "completely unrelated text with nothing in common qqq zzz", "s2"),
      (4L, "abc", "s2") // shorter than k: 0 grams, 0 fingerprints
    ).toDF("doc_id", "text", "source")
    val out = graft.ops.Dedup.winnowStats(docs, "doc_id", "text", K, W)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L)._3 > 0 && byId(2L)._3 > 0, "shared boilerplate not flagged")
    assert(byId(3L)._3 === 0)
    assert(byId(4L) === ((0L, 0L, 0L)))
  }

  test("p07 funnel candidates: real shared boilerplate flags, clean sources don't") {
    // s1's docs share a 44-char phrase (>= FunnelK+FunnelW-1 = 31, so
    // the winnow guarantee applies); s2's docs share nothing that
    // long; s3 has boilerplate spread across DIFFERENT sources only —
    // the candidate rule is within-source, so neither flags
    val boiler = "this exact boilerplate phrase repeats verbatim"
    val docs = Seq(
      (1L, s"alpha intro $boiler and then a tail", "s1"),
      (2L, s"second doc where $boiler shows up too", "s1"),
      (3L, "completely unrelated text number one with no long repeats at all", "s2"),
      (4L, "another entirely different document that shares nothing long", "s2"),
      (5L, s"cross source copy $boiler here", "s3")
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.Dedup.funnelCandidateSources(docs)
      .collect().map(_.getString(0)).toSet
    assert(got === Set("s1"))
  }
}
