package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The prefix filter's contract is COMPLETENESS: unlike the banded /
  * rare-gram candidate generators (whose misses are a documented
  * tradeoff), every pair at-or-above the threshold must be found. The
  * property test compares against brute-force all-pairs Jaccard —
  * equality both ways also catches false positives in the verify step.
  */
class PrefixFilterSpec extends AnyFunSuite with SparkSpec {

  private def bruteForce(docs: Seq[(Long, String)], tauNum: Int,
      tauDen: Int): Set[(Long, Long)] = {
    val sets = docs.map { case (i, t) =>
      i -> t.split(" ").filter(_.nonEmpty).toSet }
    (for {
      (a, sa) <- sets
      (b, sb) <- sets
      if a < b
      inter = (sa & sb).size
      un = (sa | sb).size
      if un > 0 && inter * tauDen >= un * tauNum
    } yield (a, b)).toSet
  }

  test("property: prefix-filter pairs equal brute-force Jaccard on randomized corpora") {
    import spark.implicits._
    val vocab = ('a' to 't').map(_.toString)
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 60L).map { i =>
        val n = 3 + rnd.nextInt(8)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", tauNum = 3, tauDen = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == bruteForce(docs, 3, 5), s"seed $seed")
    }
  }

  test("exact duplicates score 1.0; single-token mutations pass 3/5 when long enough") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),          // J(1,2) = 1.0
      (3L, "alpha beta gamma delta spark"),    // J(1,3) = 4/5 >= 3/5
      (4L, "alpha zeta"),                      // J(1,4) = 1/5 < 3/5
      (5L, "unrelated words entirely here"))
    val rows = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 3, tauDen = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(rows((1L, 2L)) == 1.0)
    assert(rows((1L, 3L)) == 0.8)
  }

  test("candidate-budget guard trips on a low-entropy corpus, passes under budget unchanged") {
    import spark.implicits._
    // every doc shares the same 5-word vocabulary -> at tau=3/5 the
    // prefix relation is dense and candidates are ~C(n,2): the exact
    // join's quadratic regime, which must fail FAST and DIAGNOSABLY
    val lowEntropy = (1L to 40L)
      .map(i => (i, s"alpha beta gamma delta w${i % 2}"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.prefixFilterPairs(lowEntropy, "doc_id", "text",
        tauNum = 3, tauDen = 5, maxCandidatePairs = 50L)
    }
    assert(e.getMessage.contains("candidate volume"), e.getMessage)
    assert(e.getMessage.contains("minHashCandidatePairs"), e.getMessage)
    // the same corpus under a sufficient budget returns normally, and
    // a distinctive corpus under the DEFAULT budget is unaffected
    assert(Dedup.prefixFilterPairs(lowEntropy, "doc_id", "text",
      tauNum = 3, tauDen = 5, maxCandidatePairs = 10000L).count() >= 0)
    val distinct = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta spark"))
      .toDF("doc_id", "text")
    val rows = Dedup.prefixFilterPairs(distinct, "doc_id", "text",
        tauNum = 3, tauDen = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows == Map((1L, 2L) -> 0.8))
  }

  test("doubled spaces and empty docs produce no phantom tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha  beta"), // doubled space: token set {alpha, beta}
      (2L, "alpha beta"),
      (3L, ""))
    val rows = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 3, tauDen = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows == Map((1L, 2L) -> 1.0))
  }
}
