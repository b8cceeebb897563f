package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** c14 DSIR importance scoring: target-slice tokens raise scores,
  * the bucket-model bound, deterministic top-k selection, and
  * partitioning-invariance of the ordered fold.
  */
class DsirSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("documents made of target-slice tokens outscore off-target documents") {
    val d = docs(
      (1L, "alpha beta alpha beta", "en"),
      (2L, "alpha beta beta alpha", "en"),
      (3L, "gamma delta gamma delta", "fr"),
      (4L, "alpha beta alpha beta", "fr"), // target-looking text, raw-side doc
      (5L, "gamma delta delta gamma", "fr"))
    val out = Curation.dsirScores(d, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // alpha/beta appear 12x raw, 8x in target; gamma/delta 8x raw, 0x.
    // So any alpha/beta doc must outscore any gamma/delta doc — and doc
    // 4 scores exactly like docs 1/2 (content decides, not the label).
    assert(out(1L) === out(4L))
    assert(out(1L) > out(3L) && out(4L) > out(5L))
  }

  test("the bucket model stays bounded at `buckets` rows regardless of vocabulary") {
    val d = (1L to 50L).map(i => (i, Seq.tabulate(20)(j => s"tok_${i}_$j").mkString(" "), "en"))
    // 1000 distinct tokens through 16 buckets: scoring still works and
    // every token maps in-range (a pmod bug would shift buckets
    // silently; the score join would then drop rows)
    val out = Curation.dsirScores(docs(d: _*), "doc_id", "text",
      col("lang") === "en", buckets = 16).collect()
    assert(out.length === 50)
    assert(out.forall(_.getLong(1) === 20L))
  }

  test("dsirSelect takes exactly k by (score desc, id) deterministically") {
    // gamma/delta need raw count >= 2: at cr=1 the smoothed ratio
    // (0+1)/(1+1) equals the target tokens' (1+1)/(3+1) and everything
    // ties at 0.5 (the add-one floor) — caught on first run
    val d = docs(
      (1L, "alpha beta", "en"), (2L, "alpha beta", "fr"),
      (3L, "gamma delta gamma delta", "fr"), (4L, "alpha beta", "fr"))
    val sel = Curation.dsirSelect(d, "doc_id", "text", col("lang") === "en", k = 3)
      .collect().map(_.getLong(0))
    // ties on identical text broken by id: 1, 2, 4 (3 scores 1/3 < 1/2)
    assert(sel.toSeq === Seq(1L, 2L, 4L))
  }

  test("scores are invariant to input partitioning") {
    val d = (1L to 60L).map(i =>
      (i, Seq.tabulate(10)(j => s"w${(i + j * 5) % 13}").mkString(" "),
        if (i % 3 == 0) "en" else "fr"))
    val a = Curation.dsirScores(docs(d: _*), "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Curation.dsirScores(docs(d: _*).repartition(9), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
