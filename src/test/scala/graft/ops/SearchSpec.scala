package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SearchSpec extends AnyFunSuite with SparkSpec {

  test("bm25: more matched terms outrank fewer; rare terms outrank common; length normalization bites; k caps") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),          // both query terms
      (2L, "alpha delta epsilon"),       // one query term
      (3L, "alpha beta gamma alpha beta gamma alpha beta gamma alpha beta gamma"), // long doc, same terms
      (4L, "zeta eta theta"),            // no query terms
      (5L, "alpha rare"),                // 'rare' appears only here
      (6L, "alpha common"), (7L, "beta common"), (8L, "gamma common")
    ).toDF("doc_id", "text")
    val queries = Seq(
      (1L, "alpha"), (1L, "beta"),
      (2L, "rare"), (2L, "common")).toDF("qid", "term")

    val out = Search.bm25TopK(docs, "doc_id", "text", queries, "qid", "term", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))

    val q1 = out.filter(_._1 == 1L).sortBy(_._3)
    // doc 4 never appears (no terms), only k=3 rows per query
    assert(out.count(_._1 == 1L) == 3)
    assert(!out.exists(_._2 == 4L))
    // both-term docs outrank single-term docs for q1
    val rankOf = q1.map(t => t._2 -> t._3).toMap
    assert(rankOf.contains(1L), s"doc1 (both terms) must make top-3: $q1")
    assert(rankOf(1L) < q1.filter(t => t._5 == 1L).map(_._3).headOption.getOrElse(Long.MaxValue),
      "a two-term match must outrank one-term matches")
    // length normalization: doc 3 has the same distinct terms as doc 1
    // but is 4x longer with 4x the tf — saturation + normalization must
    // not let it dominate by raw tf alone. RELATIVE bound: with b=0.75
    // the score ratio is ~1.12; with normalization broken (b ignored)
    // it rises to ~1.69, and raw-tf scoring would hit 4.0 — so < 1.4
    // separates working from broken
    assert(rankOf.contains(3L))
    val scoreOf = q1.map(t => t._2 -> t._4).toMap
    assert(scoreOf(3L) < 1.4 * scoreOf(1L),
      s"longer doc must not dominate by raw tf: ${scoreOf(3L)} vs ${scoreOf(1L)}")
    assert(scoreOf(3L) > scoreOf(1L),
      "higher tf should still win at equal idf (saturation, not inversion)")
    // rare term beats common term at equal tf (q2: doc 5 'rare' df=1 vs
    // docs 6-8 'common' df=3)
    val q2 = out.filter(_._1 == 2L)
    assert(q2.minBy(_._3)._2 == 5L, s"rare-term doc must rank first: ${q2.toSeq}")
    // scores strictly ordered by rank within a query
    Seq(q1, q2).foreach { qs =>
      val byRank = qs.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mergeIndex of disjoint halves equals buildIndex of the union, relation by relation") {
    import spark.implicits._
    val docs = (1L to 20L).map { i =>
      i -> Seq.fill(3 + (i % 4).toInt)(Seq("alpha", "beta", "gamma", "delta")((i % 4).toInt)).mkString(" ")
    }.toDF("doc_id", "text")
    val direct = Search.buildIndex(docs, "doc_id", "text")
    val merged = Search.mergeIndex(
      Search.buildIndex(docs.where($"doc_id" % 2 === 0), "doc_id", "text"),
      Search.buildIndex(docs.where($"doc_id" % 2 =!= 0), "doc_id", "text"))
    assert(merged.nDocs == direct.nDocs && merged.totalTokens == direct.totalTokens)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(rows(merged.df) == rows(direct.df))
    assert(rows(merged.tf) == rows(direct.tf))
    assert(rows(merged.lens) == rows(direct.lens))
    // and the scored output is identical too
    val q = Seq((1L, "alpha"), (1L, "beta")).toDF("qid", "term")
    assert(rows(Search.bm25FromIndex(merged, q, "qid", "term", 5)) ==
      rows(Search.bm25FromIndex(direct, q, "qid", "term", 5)))
  }

  test("bm25: k must be positive") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Search.bm25TopK(Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        Seq((1L, "x")).toDF("qid", "term"), "qid", "term", k = 0)
    }
    assert(e.getMessage.contains("k"))
  }
}
