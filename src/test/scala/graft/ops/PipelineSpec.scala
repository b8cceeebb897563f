package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** End-to-end properties of the composed curation pipeline — each
  * stage must actually BITE on a corpus planted with one victim per
  * stage (a pipeline where every doc survives verifies nothing).
  */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  // 30 words, mean word length (3 + 5 + 14*4 + 14*5)/30 ≈ 4.47 ∈
  // [4.3,4.7], one stopword ("the") → ratio 1/30 ≥ 3% — passes every
  // quality rule. Filler words embed the seed, so DOCS SHARE NO
  // BIGRAMS across seeds: the contamination stage must drop exactly
  // the benchmark-planted doc, never the rest (a shared word pool made
  // every doc "contaminated" and emptied the pipeline — caught by this
  // spec's first run).
  private def passingText(seed: Int): String = {
    val words = "the" +:
      f"doc$seed%02d" +:
      (0 until 14).map(i => f"q$seed%02d${('a' + i).toChar}") ++:
      (0 until 14).map(i => f"z$seed%02d${('a' + i).toChar}x")
    words.mkString(" ")
  }

  test("every stage bites: exact copy, near-dup, contamination, quality victim all removed; clean docs packed") {
    import spark.implicits._
    val clean = (1 to 8).map(i => (i.toLong, passingText(i), "srcA"))
    val docs = (clean ++ Seq(
      (101L, passingText(1), "srcA"),            // exact copy of doc 1
      (102L, passingText(2) + " spark", "srcA"), // near-dup of doc 2
      (103L, "too short to train", "srcA")       // quality victim
    )).toDF("doc_id", "text", "source")
    // doc 3's text IS the benchmark -> contamination victim (overlap 1)
    val bench = Seq((3L, passingText(3), "srcA")).toDF("doc_id", "text", "source")

    val out = Pipeline.curate(docs, bench, "doc_id", "text", "source")
    val kept = out.select("doc_id").as[Long].collect().toSet

    assert(!kept.contains(101L), "exact copy must lose to the min-id canonical")
    assert(kept.contains(1L))
    // near-dup cluster {2, 102}: exactly one member survives, and
    // keep-best prefers the LONGER text (the mutant)
    assert(kept.intersect(Set(2L, 102L)) == Set(102L),
      s"near-dup cluster must keep exactly its longest member, kept=$kept")
    assert(!kept.contains(3L), "benchmark-identical doc must be decontaminated")
    assert(!kept.contains(103L), "quality-failing doc must be gated")
    assert(kept.intersect(Set(4L, 5L, 6L, 7L, 8L)) == Set(4L, 5L, 6L, 7L, 8L),
      "clean docs must pass untouched")

    // packed columns: n_tokens is the whitespace count, shard 0 at this
    // size, split populated
    val row = out.where(col("doc_id") === 4L).head()
    assert(row.getAs[Long]("n_tokens") === 30L)
    assert(row.getAs[Long]("shard") === 0L)
    assert(Set("train", "val", "test").contains(row.getAs[String]("split")))
  }

  test("shard packing: ids pack in order within (split, source) and roll over the budget") {
    import spark.implicits._
    // all docs identical split (same hash? no — force one split by
    // filtering afterwards): use enough docs that at least one
    // (split, source) group holds >= 3 docs; budget 60 with 30-token
    // docs -> every 3rd doc starts a new shard (2 docs per shard)
    val docs = (1 to 30).map(i => (i.toLong, passingText(i), s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val bench = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val out = Pipeline.curate(docs, bench, "doc_id", "text", "source",
      shardBudget = 60L)
    val rows = out.select("split", "source", "doc_id", "shard")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2))
    assert(rows.nonEmpty)
    rows.foreach { case (_, members) =>
      val inOrder = members.sortBy(_._3)
      // 30-token docs, 60 budget: shard index = position/2 within group
      inOrder.zipWithIndex.foreach { case ((_, _, _, shard), idx) =>
        assert(shard === idx / 2,
          s"doc ${inOrder(idx)._3} at position $idx expected shard ${idx / 2}, got $shard")
      }
    }
  }

  test("reserved output columns are rejected on the input") {
    import spark.implicits._
    val bad = Seq((1L, "x", "s", "oops")).toDF("doc_id", "text", "source", "shard")
    val bench = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      Pipeline.curate(bad, bench, "doc_id", "text", "source")
    }
    assert(e.getMessage.contains("shard"))
  }

  test("p03 stage interplay: exact copies collapse before selection, so a duplicate can never double-select") {
    // Mirrors the p03 composition semantics at spec scale: docs 1 and
    // 101 are byte-identical ('en', the target slice). Dedup keeps the
    // canonical min id; DSIR selection then sees ONE candidate — if
    // dedup ran after selection, both could make the top-k and the
    // shard counts would double.
    import spark.implicits._
    import graft.ops.{Curation, Dedup}
    // texts are doc-unique (the seed word embeds i) — a mod-based word
    // pool collapsed 21 docs to 7 distinct texts on first run
    val base = (1L to 20L).map(i => (i,
      s"seed$i " + Seq.tabulate(7)(j => s"tok${(i * 3 + j) % 7}").mkString(" "),
      if (i <= 10) "en" else "fr"))
    val docs = (base :+ ((101L, base.head._2, "en")))
      .toDF("doc_id", "text", "lang")
    val canon = Dedup.exactGroups(docs, "doc_id", "text")
      .select(org.apache.spark.sql.functions.col("canonical_id").as("doc_id"))
    val s1 = docs.join(canon, Seq("doc_id"))
    assert(s1.count() === 20) // 101 collapsed into 1
    val sel = Curation.dsirSelect(s1, "doc_id", "text",
      org.apache.spark.sql.functions.col("lang") === "en", k = 25)
    val ids = sel.collect().map(_.getLong(0))
    assert(ids.length === 20) // k over-provisioned: everything, once
    assert(ids.distinct.length === ids.length && !ids.contains(101L))
  }
}
