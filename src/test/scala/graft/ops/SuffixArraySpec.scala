package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Suffix-array family (d30/d31): prefix-doubling ranks vs the
  * sort-the-suffixes definition on adversarial shapes (small alphabets
  * force ties deep into the doubling), LRS vs a brute-force reference,
  * and the in-place LCP expression.
  */
class SuffixArraySpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private def refRanks(s: String): Map[Int, Long] = {
    val order = (1 to s.length).sortBy(p => s.substring(p - 1))
    order.zipWithIndex.map { case (p, i) => p -> (i + 1).toLong }.toMap
  }

  private def refLrs(s: String): (Long, String) = {
    val subs = for {
      len <- (s.length - 1) to 1 by -1
      i <- 0 to s.length - len
      sub = s.substring(i, i + len)
      if s.indexOf(sub, i + 1) >= 0
    } yield sub
    subs.headOption match {
      case Some(first) =>
        val len = first.length
        val best = subs.takeWhile(_.length == len).min
        (len.toLong, best)
      case None => (0L, "")
    }
  }

  // small alphabets force rank ties for many doubling rounds; the
  // run-heavy shapes exercise the -1 sentinel (proper prefixes)
  private val rnd = new scala.util.Random(20260815)
  private val corpus: Seq[(Long, String)] =
    Seq("a", "ab", "ba", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "abababababababab", "mississippi", "banana",
      "the quick brown fox the quick brown cat").zipWithIndex
      .map { case (s, i) => (i.toLong, s) } ++
      (100 until 140).map { i =>
        val n = 1 + rnd.nextInt(60)
        (i.toLong, (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      }

  test("prefix-doubling ranks equal the sort-the-suffixes definition") {
    val got = SuffixArray
      .suffixRanks(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => r.getInt(1) -> r.getLong(2)).toMap }
    corpus.foreach { case (id, s) =>
      assert(got(id) === refRanks(s), s"ranks diverged for '$s'")
    }
  }

  test("longest repeated substring equals brute force (incl. ('',0) docs)") {
    val got = SuffixArray
      .longestRepeatedSubstring(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    corpus.foreach { case (id, s) =>
      assert(got(id) === refLrs(s), s"LRS diverged for '$s'")
    }
  }

  test("lcp_at scans in place: bounds, identity, and mismatch-at-k") {
    val rows = Seq(("banana", 2, 4), ("banana", 1, 1), ("banana", 6, 7),
        ("aaaa", 1, 2), ("ab", 2, 1))
      .toDF("t", "i", "j")
      .select(graft.functions.TextHashExpressions
        .lcp_at(col("t"), col("i"), col("j")).as("l"))
      .collect().map(_.getInt(0)).toSeq
    // ("anana","ana")->3; self->6; j past end->0; ("aaaa","aaa")->3; ("b","ab")->0
    assert(rows === Seq(3, 6, 0, 3, 0))
  }

  test("null and empty texts yield no suffix rows, not errors") {
    val df = Seq((1L, "ab"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(SuffixArray.suffixRanks(df, "doc_id", "text")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet === Set(1L))
  }
}
