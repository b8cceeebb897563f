package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** encodingProfile's classification rules, pinned: legitimate
  * whitespace controls (\t \n \r) are NOT anomalies; every other C0
  * control is; U+FFFD counts in its own class; NULL text joins n_docs
  * but no anomaly count.
  */
class EncodingProfileSpec extends AnyFunSuite with SparkSpec {

  test("tab/newline/cr are clean; bell and FFFD are counted per class") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text", "s1"),
      (2L, "tabs\tand\nnewlines\rok", "s1"),
      (3L, "bell\u0007bell\u0007\u0007", "s1"),
      (4L, "lossy\uFFFDdecode", "s2"),
      (5L, null.asInstanceOf[String], "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.encodingProfile(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // s1: 3 docs, only the bell doc flagged, 3 ctrl chars, 0 repl
    assert(got("s1") == ((3L, 1L, 3L, 0L)))
    // s2: 2 docs (null included), 1 flagged, 0 ctrl, 1 repl
    assert(got("s2") == ((2L, 1L, 0L, 1L)))
  }
}
