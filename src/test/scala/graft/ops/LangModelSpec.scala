package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Bigram-LM scoring (t16): hand-computed counts and scores on a tiny
  * corpus, smoothing for unseen events, the sub-bigram row contract,
  * and partitioning-invariance of the ordered fold.
  */
class LangModelSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("train counts unigrams, bigrams, and vocab on a tiny corpus") {
    val m = LangModel.train(docs(1L -> "a b a", 2L -> "b a"), "text")
    assert(m.vocab === 2)
    val uni = m.uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni === Map("a" -> 3L, "b" -> 2L))
    val bi = m.bi.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi === Map(("a", "b") -> 1L, ("b", "a") -> 2L))
  }

  test("score matches the hand-computed smoothed probabilities") {
    val d = docs(1L -> "a b a", 2L -> "b a")
    val out = LangModel.selfScore(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 1: p(b|a) = (1+1)/(3+2) = 0.4, p(a|b) = (2+1)/(2+2) = 0.75
    assert(out(1L)._1 === 2)
    assert(out(1L)._2 === 0.4 + 0.75)
    // doc 2: p(a|b) = 0.75
    assert(out(2L) === ((1L, 0.75)))
  }

  test("unseen words smooth to 1/(0 + V) and sub-bigram docs surface with NULL mean") {
    val model = LangModel.train(docs(1L -> "a b"), "text")
    val out = LangModel.score(docs(10L -> "x y", 11L -> "solo"), "doc_id", "text", model)
      .orderBy("doc_id").collect()
    // unseen bigram over unseen history: (0+1)/(0+2)
    assert(out(0).getLong(1) === 1L)
    assert(out(0).getDouble(2) === 0.5)
    // 1-word doc: zero bigrams, zero score, NULL mean_prob
    assert(out(1).getLong(1) === 0L)
    assert(out(1).getDouble(2) === 0.0)
    assert(out(1).isNullAt(3))
  }

  test("nbSelfClassify recovers separable classes and breaks ties to the lowest class") {
    val d = Seq(
      (1L, "aa bb aa", "en"), (2L, "bb aa aa", "en"),
      (3L, "xx yy xx", "fr"), (4L, "yy xx yy", "fr"),
      (5L, "aa bb", "en"), (6L, "xx yy", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = LangModel.nbSelfClassify(d, "doc_id", "text", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "en", 2L -> "en", 5L -> "en",
      3L -> "fr", 4L -> "fr", 6L -> "fr"))
  }

  test("nbSelfClassify best_score matches the hand-computed smoothed fold") {
    // one doc per class, one shared token: scores computable by hand
    val d = Seq((1L, "a", "x"), (2L, "a b", "y")).toDF("doc_id", "text", "lang")
    // vocab = {a, b} -> V=2; class x: ctok=1, c(a,x)=1; class y: ctok=2,
    // c(a,y)=1, c(b,y)=1.
    // doc1 under x: (1+1)/(1+2) = 2/3; under y: (1+1)/(2+2) = 1/2 -> x
    // doc2 under x: 2/3 + (0+1)/(1+2) = 1.0; under y: 1/2 + 1/2 = 1.0
    //   -> tie, lowest class "x" wins
    val out = LangModel.nbSelfClassify(d, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    assert(out(0).getString(2) === "x")
    assert(out(0).getDouble(3) === 2.0 / 3.0)
    assert(out(1).getString(2) === "x")
    assert(out(1).getDouble(3) === 2.0 / 3.0 + 1.0 / 3.0)
  }

  test("merge of disjoint halves equals training on the union") {
    val rows = (1L to 30L).map(i =>
      i -> Seq.tabulate(8)(j => s"w${(i * 3 + j) % 7}").mkString(" "))
    val d = docs(rows: _*)
    val merged = LangModel.merge(
      LangModel.train(d.where(col("doc_id") % 2 === 0), "text"),
      LangModel.train(d.where(col("doc_id") % 2 =!= 0), "text"))
    val direct = LangModel.train(d, "text")
    assert(merged.vocab === direct.vocab)
    val a = LangModel.score(d, "doc_id", "text", merged)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = LangModel.score(d, "doc_id", "text", direct)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("model survives a parquet round-trip and merges with a new batch (the q46 pattern)") {
    val rows = (1L to 24L).map(i =>
      i -> Seq.tabulate(6)(j => s"v${(i + j * 2) % 5}").mkString(" "))
    val (day1, day2) = rows.partition(_._1 <= 12L)
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_state").toString
    // day 1: train, persist the MODEL (never the text)
    val m1 = LangModel.train(docs(day1: _*), "text")
    m1.uni.write.parquet(s"$dir/uni")
    m1.bi.write.parquet(s"$dir/bi")
    // day 2 (fresh "session"): read the model back, merge the batch
    val restored = LangModel.BigramModel(
      spark.read.parquet(s"$dir/uni"), spark.read.parquet(s"$dir/bi"),
      vocab = 0L) // vocab is recomputed by merge from the merged uni
    val merged = LangModel.merge(restored, LangModel.train(docs(day2: _*), "text"))
    val direct = LangModel.train(docs(rows: _*), "text")
    assert(merged.vocab === direct.vocab)
    val a = LangModel.score(docs(rows: _*), "doc_id", "text", merged)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = LangModel.score(docs(rows: _*), "doc_id", "text", direct)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("scores are invariant to input partitioning (ordered fold, not sum)") {
    val d = (1L to 40L).map(i =>
      i -> Seq.tabulate(12)(j => s"w${(i * 7 + j * 3) % 9}").mkString(" "))
    val a = LangModel.selfScore(docs(d: _*), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = LangModel.selfScore(docs(d: _*).repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
