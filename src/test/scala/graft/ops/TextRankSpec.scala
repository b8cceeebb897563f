package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** t31/t32: TextRank keyword extraction (word co-occurrence graph +
  * the shared integer PageRank) and the integer Flesch–Kincaid
  * readability profile.
  */
class TextRankSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  test("textRankKeywords: the star-graph hub outranks leaf words") {
    // 'spark' is the center of a 6-leaf star (every leaf's whole rank
    // mass flows to it); short ('a', 'of') and non-alpha ('123',
    // 'x9') tokens must never enter the graph
    val docs = Seq(
      (1L, "alpha spark beta of a 123"),
      (2L, "gamma spark delta x9"),
      (3L, "epsilon spark zeta"),
      (4L, "Spark SPARK spark")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.textRankKeywords(docs, "doc_id", "text",
        minLen = 4, iterations = 5, topK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.head._2 === "spark")
    // kw_rank is a clean 1..n sequence, ordered by (pagerank desc, word)
    assert(got.map(_._1).toSeq === (1L to got.length).toSeq)
    val ranks = got.map(r => (r._3, r._2))
    assert(ranks.sortBy { case (pr, w) => (-pr, w) }.toSeq === ranks.toSeq)
    val words = got.map(_._2).toSet
    assert(!words.exists(w => w.length < 4 || !w.matches("^[a-z]+$")))
    // doc 4 collapses to equal consecutive tokens -> no self-edges;
    // the six leaves all rank below the hub with EQUAL rank
    assert(words === Set("spark", "alpha", "beta", "gamma", "delta",
      "epsilon", "zeta"))
    val leafRanks = got.filter(_._2 != "spark").map(_._3).toSet
    assert(leafRanks.size === 1)
  }

  test("textRankKeywords is partitioning-invariant (integer PageRank)") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha delta"),
      (2L, "beta gamma delta epsilon zeta"),
      (3L, "gamma alpha epsilon beta")
    ).toDF("doc_id", "text")
    val a = TextAnalysis.textRankKeywords(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val b = TextAnalysis.textRankKeywords(docs.repartition(5), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(a === b)
  }

  test("readability: hand-computed integer Flesch-Kincaid") {
    // "the cat sat. it ran!" — words=5 (split on single spaces:
    // [the, cat, sat., it, ran!]), sentence runs {., !} = 2,
    // vowel runs: the(1) cat(1) sat(1) it(1) ran(1) = 5
    // fk_x100 = (39*5) div 2 + (1180*5) div 5 - 1559 = 97 + 1180 - 1559 = -282
    val docs = Seq((1L, "the cat sat. it ran!")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs, "doc_id", "text").collect().head
    assert(r.getLong(1) === 5L)   // n_words
    assert(r.getLong(2) === 2L)   // n_sentences
    assert(r.getLong(3) === 5L)   // n_syllables
    assert(r.getLong(4) === -282L)
    // no sentence punctuation floors n_sentences at 1; 'y' counts as
    // a vowel ('rhythm' -> 1 run)
    val frag = Seq((2L, "rhythm")).toDF("doc_id", "text")
    val f = TextAnalysis.readability(frag, "doc_id", "text").collect().head
    assert(f.getLong(1) === 1L && f.getLong(2) === 1L && f.getLong(3) === 1L)
    assert(f.getLong(4) === (39L / 1 + 1180L / 1 - 1559L))
  }
}
