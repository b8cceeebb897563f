package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class BpeSpec extends AnyFunSuite with SparkSpec {

  private def words(docs: Seq[String]) = {
    import spark.implicits._
    Bpe.wordTable(docs.toDF("text"), "text")
  }

  private def reprs(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("w", "repr").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("word table: frequencies, char reprs, delimiter and empty guards") {
    val w = words(Seq("ab ab cd", "ab  x@y", null))
    val rows = w.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    // "x@y" dropped (contains the delimiter), "" from the double space
    // dropped, null text dropped
    assert(rows.toSeq == Seq(("ab", "@a@b@", 3L), ("cd", "@c@d@", 1L)))
  }

  test("greedy merges are frequency-weighted with (l, r) tie-break") {
    // pair (a,b) appears in "ab" (freq 3) and "abc" (freq 1) -> 4;
    // (b,c) only in "abc" -> 1. Step 1 must merge (a,b).
    val (m, fin) = Bpe.learnMerges(
      words(Seq("ab ab ab abc")), 1)
    assert(m.map(x => (x.step, x.left_sym, x.right_sym, x.merged, x.pair_freq)) ==
      Seq((1L, "a", "b", "ab", 4L)))
    assert(reprs(fin) == Map("ab" -> "@ab@", "abc" -> "@ab@c@"))
  }

  test("later merges compose earlier symbols into multi-char pairs") {
    // step 1: (a,b)->ab everywhere; step 2 must see the MERGED symbol:
    // (ab,c) freq 2 beats (x,y) freq 1
    val (m, fin) = Bpe.learnMerges(
      words(Seq("abc abc xy")), 2)
    assert(m.map(x => (x.left_sym, x.right_sym, x.merged)) ==
      Seq(("a", "b", "ab"), ("ab", "c", "abc")))
    assert(reprs(fin)("abc") == "@abc@")
  }

  test("one-pass replace semantics: odd run keeps its tail unmerged within the step") {
    // "aaa" = @a@a@a@ under merge (a,a): the scan consumes the shared
    // boundary delimiter, so one pass yields @aa@a@ — deterministic,
    // and identical to the DuckDB oracle's replace
    val (m, fin) = Bpe.learnMerges(words(Seq("aaa aaa")), 1)
    assert(m.head.merged == "aa")
    assert(reprs(fin)("aaa") == "@aa@a@")
  }

  test("exhaustion stops early: k beyond full merging returns fewer merges") {
    // vocab {ab x2}: step 1 merges to one symbol, then no pair remains
    val (m, fin) = Bpe.learnMerges(words(Seq("ab ab")), 10)
    assert(m.size == 1)
    assert(reprs(fin) == Map("ab" -> "@ab@"))
  }

  test("single-char words contribute no pairs but stay in the vocab map") {
    val (m, fin) = Bpe.learnMerges(words(Seq("a a a bc")), 1)
    assert(m.map(x => x.merged) == Seq("bc"))
    assert(reprs(fin) == Map("a" -> "@a@", "bc" -> "@bc@"))
  }

  test("applyMerges: training words reproduce the final vocab map; unseen words merge partially") {
    import spark.implicits._
    val (m, fin) = Bpe.learnMerges(words(Seq("abc abc abc xy")), 2)
    // inference over the TRAINING words must reproduce training's reprs
    val replay = Bpe.applyMerges(
        Seq("abc", "xy").toDF("w"), "w", m)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(replay == reprs(fin))
    // unseen words: "abd" gets the (a,b) merge but not (ab,c);
    // "zq" shares no learned pair and stays fully split
    val unseen = Bpe.applyMerges(Seq("abd", "zq", "abcabc").toDF("w"), "w", m)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(unseen("abd") == "@ab@d@")
    assert(unseen("zq") == "@z@q@")
    // merges apply in learned order inside a longer unseen word; the
    // second adjacent (ab,c) occurrence keeps the one-pass boundary gap
    // (its leading delimiter was consumed by the first replacement) —
    // the same documented semantics training has
    assert(unseen("abcabc") == "@abc@ab@c@")
  }

  test("applyMerges rejects words containing the symbol delimiter") {
    import spark.implicits._
    val (m, _) = Bpe.learnMerges(words(Seq("abc abc")), 1)
    val e = intercept[Exception] {
      Bpe.applyMerges(Seq("ok", "bad@word").toDF("w"), "w", m).collect()
    }
    // raise_error surfaces wrapped; the message must name the culprit
    assert(e.toString.contains("symbol delimiter") ||
      Option(e.getCause).exists(_.toString.contains("symbol delimiter")), e.toString)
  }

  test("symbolCount reads the delimited representation") {
    import spark.implicits._
    val df = Seq("@a@b@", "@abc@", "@aa@a@").toDF("repr")
      .select(Bpe.symbolCount(org.apache.spark.sql.functions.col("repr")).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 1L, 2L))
  }
}
