package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class FuzzySpec extends AnyFunSuite with SparkSpec {

  private val clean = Seq(
    (1L, "abcdefgh"),
    (2L, "abcdeXgh"),
    (3L, "zzzzzzzz"))

  private def run(dirty: Seq[(Long, String)]) = {
    import spark.implicits._
    Fuzzy.bestMatch(dirty.toDF("id", "name"), "id", "name",
        clean.toDF("id", "name"), "id", "name", maxDist = 2)
      .select("dirty_id", "clean_id", "dist").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("best match: exact wins at dist 0, ties break on clean id, far strings unmatched") {
    val out = run(Seq(
      (10L, "abcdefgh"),   // exact -> clean 1, dist 0
      (11L, "abcdefXh"),   // dist 1 from clean 1, dist 2 from clean 2 -> clean 1
      (12L, "abcdeggh"),   // dist 1 from BOTH clean 1 and 2 -> tie -> clean 1
      (13L, "qqqqqqqq")))  // dist 8 from everything -> no row
    assert(out == Map(
      10L -> ((1L, 0L)), 11L -> ((1L, 1L)), 12L -> ((1L, 1L))))
  }

  test("length-band pass catches a prefix-defeating edit; a pair defeating both passes is the documented miss") {
    // substitution at position 2: prefix block 'aXcd' != 'abcd' but the
    // length band (8//4 = 2) still matches -> found
    val caught = run(Seq((20L, "aXcdefgh")))
    assert(caught == Map(20L -> ((1L, 1L))))
    // deletion at position 1 of an 8-char name: prefix differs AND the
    // length band drops (7//4 = 1) -> lost by BOTH passes (documented
    // multi-pass tradeoff; the oracle applies the same rule)
    val missed = run(Seq((21L, "bcdefgh")))
    assert(missed.isEmpty)
  }
}
