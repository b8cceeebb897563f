package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class DuplicatedSpansSpec extends AnyFunSuite with SparkSpec {

  test("span coverage: full dup, zero dup, partial dup, within-doc repeats don't count") {
    import spark.implicits._
    // k=8, stride=2: doc of length 16 samples positions 1,3,5,7,9;
    // length 20 -> ..13 (7 positions); length 32 -> ..25 (13 positions)
    val docs = Seq(
      (1L, "abcdefghijklmnop"),               // identical to 2 -> all dup
      (2L, "abcdefghijklmnop"),
      (3L, "qrstuvwxyzqrstuvwxyz"),           // period-10 repeat: shingle
                                              // at pos 11 == pos 1, but
                                              // still ONE distinct doc ->
                                              // nothing dup
      (4L, "abcdefghijklmnop0123456789012345") // first 5 sampled shingles
                                              // shared with 1/2, the 8
                                              // digit-bearing ones unique
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      1L -> ((5L, 5L, 1.0)),
      2L -> ((5L, 5L, 1.0)),
      3L -> ((7L, 0L, 0.0)),
      4L -> ((13L, 5L, 5.0 / 13.0))))
  }
}
