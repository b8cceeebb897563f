package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class FuzzySpec extends AnyFunSuite with SparkSpec {

  private val clean = Seq(
    (1L, "abcdefgh"),
    (2L, "abcdeXgh"),
    (3L, "zzzzzzzz"),
    (4L, "abcdefghijklmnopqrst"))

  // block keys shorter than the names (a name not longer than
  // prefixLen gets no edit tolerance from the prefix pass: its block
  // key IS the whole string)
  private def run(dirty: Seq[(Long, String)]) = {
    import spark.implicits._
    Fuzzy.bestMatch(dirty.toDF("id", "name"), "id", "name",
        clean.toDF("id", "name"), "id", "name", maxDist = 2,
        prefixLen = 4, suffixLen = 4)
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

  test("suffix pass catches a prefix-defeating edit; edits in BOTH end regions are the documented miss") {
    // substitution at position 2 of a 20-char name: the prefix block
    // differs but the suffix survives -> found at dist 1
    val caught = run(Seq((20L, "aXcdefghijklmnopqrst")))
    assert(caught == Map(20L -> ((4L, 1L))))
    // deletion at position 2 AND substitution in the suffix region:
    // both guard regions edited -> lost by BOTH passes even though
    // dist = 2 <= maxDist (documented multi-pass tradeoff; the oracle
    // applies the same rule)
    val missed = run(Seq((21L, "acdefghijklmnopqrsX")))
    assert(missed.isEmpty)
  }
}
