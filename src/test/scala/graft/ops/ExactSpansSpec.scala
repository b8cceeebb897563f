package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property spec for the exact suffix-key span dedup (d19) — planted
  * spans recovered exactly, island semantics, and consistency with
  * d14's SAMPLED estimate on corpora where both have a defined answer.
  */
class ExactSpansSpec extends AnyFunSuite with SparkSpec {

  private def spans(docs: Seq[(Long, String)], l: Int) = {
    import spark.implicits._
    Dedup.exactDuplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", l)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("a planted cross-doc run is recovered exactly — full extent, nothing else") {
    // docs share tokens s0..s9 at different offsets; all other tokens
    // are globally unique, so no spurious l-gram can duplicate
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val a = (0 until 5).map(i => s"a$i").mkString(" ") + " " + shared +
      " " + (0 until 4).map(i => s"z$i").mkString(" ")
    val b = (0 until 3).map(i => s"b$i").mkString(" ") + " " + shared
    val out = spans(Seq((1L, a), (2L, b)), l = 4)
    // doc 1: tokens 5..14 inclusive -> [5, 15); doc 2: [3, 13)
    assert(out.toSeq == Seq((1L, 5L, 15L), (2L, 3L, 13L)), out.toSeq)
  }

  test("within-doc repeats count as duplication (stated divergence from d14's >=2-docs rule)") {
    val phrase = (0 until 6).map(i => s"p$i").mkString(" ")
    val doc = phrase + " " + (0 until 5).map(i => s"u$i").mkString(" ") +
      " " + phrase
    val out = spans(Seq((1L, doc)), l = 6)
    assert(out.toSeq == Seq((1L, 0L, 6L), (1L, 11L, 17L)), out.toSeq)
  }

  test("adjacent and overlapping duplicated windows merge into one island; separated regions stay apart") {
    // one 12-token duplicated run -> overlapping 4-gram starts 0..8
    // must merge to a single [s, s+12) span per doc
    val run = (0 until 12).map(i => s"r$i").mkString(" ")
    val out = spans(Seq((1L, run), (2L, run)), l = 4)
    assert(out.toSeq == Seq((1L, 0L, 12L), (2L, 0L, 12L)), out.toSeq)
  }

  test("COVERAGE semantics pinned: abutting windows duplicated at DIFFERENT sites merge into one island whose whole text repeats nowhere") {
    // doc A carries w0..w3 (duplicated in doc B) immediately followed
    // by x0..x3 (duplicated in doc C): A's dup starts are {0, 4}, the
    // break rule merges them (4 > 4 is false), and the island [0, 8)
    // is a run of COVERED tokens even though no 8-token span of A
    // occurs twice — the documented coverage semantics, exactly what
    // ExactSubstr removal cuts
    val w = (0 until 4).map(i => s"w$i").mkString(" ")
    val x = (0 until 4).map(i => s"x$i").mkString(" ")
    val out = spans(Seq(
      (1L, s"$w $x"),
      (2L, s"b0 b1 $w"),
      (3L, s"c0 c1 $x")), l = 4)
    assert(out.toSeq == Seq((1L, 0L, 8L), (2L, 2L, 6L), (3L, 2L, 6L)),
      out.toSeq)
  }

  test("docs shorter than l emit nothing and do not error") {
    val out = spans(Seq((1L, "only three tokens"), (2L, "only three tokens")),
      l = 8)
    assert(out.isEmpty)
  }

  test("removal cuts exactly the spanned tokens, all occurrences, and leaves clean docs byte-identical") {
    import spark.implicits._
    val shared = (0 until 8).map(i => s"s$i").mkString(" ")
    val aHead = (0 until 3).map(i => s"a$i").mkString(" ")
    val aTail = (0 until 2).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"$aHead $shared $aTail"),
      (2L, shared),                                     // fully duplicated
      (3L, (0 until 6).map(i => s"u$i").mkString(" "))) // clean
      .toDF("doc_id", "text")
    val out = Dedup.removeExactDuplicatedSpans(docs, "doc_id", "text", l = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept_tokens"),
          r.getAs[String]("cleaned"))).toMap
    assert(out(1L) == ((13L, 5L, s"$aHead $aTail")), out(1L))
    // the fully-duplicated doc is cut to nothing (all occurrences cut,
    // the d15 rule — canonical selection is d01/c04's job, not this op's)
    assert(out(2L) == ((8L, 0L, "")), out(2L))
    assert(out(3L) == ((6L, 6L, (0 until 6).map(i => s"u$i").mkString(" "))))
  }

  test("consistency with d14's sampled profile: verbatim-duplicate docs are fully covered in both; unique docs in neither") {
    import spark.implicits._
    // texts long enough for d14's char shingles (k=8, stride=2) to
    // sample densely; doc 3 is globally unique
    val dupText = (0 until 30).map(i => s"tok$i").mkString(" ")
    val uniq = (0 until 30).map(i => s"only$i").mkString(" ")
    val docs = Seq((1L, dupText), (2L, dupText), (3L, uniq))
      .toDF("doc_id", "text")
    val exact = Dedup.exactDuplicatedSpans(docs, "doc_id", "text", l = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact: docs 1 and 2 covered end to end (30 tokens), doc 3 absent
    assert(exact.toSet == Set((1L, 0L, 30L), (2L, 0L, 30L)), exact.toSeq)
    val sampled = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("dup_fraction"))).toMap
    // sampled estimate agrees where it is defined: full coverage on
    // the twins, zero on the unique doc
    assert(sampled(1L) == 1.0 && sampled(2L) == 1.0, sampled)
    assert(sampled(3L) == 0.0, sampled)
  }

  test("property: hashed-shuffle form == raw-text form on randomized corpora") {
    import spark.implicits._
    // low-vocab corpora breed heavy genuine gram duplication (the
    // regime the hash pass must not corrupt); sweep l across the
    // window sizes the islands depend on
    for (seed <- Seq(3, 19, 101); l <- Seq(2, 4)) {
      val rnd = new scala.util.Random(seed)
      val vocab = ('a' to 'f').map(_.toString)
      val docs = (1L to 40L).map { i =>
        val n = rnd.nextInt(20)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val raw = Dedup.exactDuplicatedSpans(df, "doc_id", "text", l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val hashed = Dedup.exactDuplicatedSpansHashed(df, "doc_id", "text", l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(hashed == raw, s"seed=$seed l=$l")
    }
  }
}
