package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Aho–Corasick multi-pattern scan (t28's primitive): agreement with
  * the naive per-position reference (the oracle's statement), overlap
  * and nesting semantics, and the codegen path through the plan
  * reference object.
  */
class PatternScanSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private def naive(s: String, p: String): Long =
    (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)).toLong

  private def viaSpark(texts: Seq[String], pats: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("s")
      .select(PatternScanExpressions.multi_pattern_counts(col("s"), pats).as("c"))
      .collect().map(_.getSeq[Long](0).toList).toList

  test("counts equal the naive per-position reference, nested + overlapping") {
    val pats = Seq("scan", "can", "a a", "aa", "spark", "ark", "s")
    val texts = Seq(
      "we scan the table then scan again",
      "a a a a a",       // "a a" overlaps: 4 occurrences
      "aaaa",            // "aa" overlaps: 3
      "sparkle ark spark", // "ark" inside both sparks AND standalone
      "", "zzz",
      ("scan" * 50) + " " + ("a " * 100))
    val got = viaSpark(texts, pats)
    texts.zip(got).foreach { case (t, row) =>
      pats.zip(row).foreach { case (p, n) =>
        assert(n === naive(t, p), s"pattern '$p' on '${t.take(20)}...'")
      }
    }
  }

  test("automaton matches through fail links (suffix pattern found mid-walk)") {
    // walking "bc" after failing out of "abc*" must still credit "bc"
    val got = viaSpark(Seq("abx bc abc"), Seq("abcz", "bc"))
    assert(got.head === Seq(0L, 2L))
  }

  test("one pass equals P naive passes on corpus-shaped text at scale") {
    val pats = Seq("slow", "low", "fast", "table part")
    val texts = (0 until 200).map(i =>
      s"key agg row scan slow fast table part value $i " * (1 + i % 5))
    val got = viaSpark(texts, pats)
    texts.zip(got).foreach { case (t, row) =>
      assert(row === pats.map(naive(t, _)))
    }
  }

  test("builder rejects degenerate blocklists loudly") {
    intercept[IllegalArgumentException](new AhoCorasick(Nil))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("a", "")))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("x", "x")))
  }
}
