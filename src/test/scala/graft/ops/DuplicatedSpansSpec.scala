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

  test("span removal: overlapping cuts stitch, clean docs pass through unchanged, full-dup doc empties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghijklmnop"),                 // identical to 2 -> fully cut
      (2L, "abcdefghijklmnop"),
      (3L, "zz99yy88xx77ww66vv55"),             // unique -> unchanged
      // shares only its FIRST 8 chars with 1/2: sampled dup starts at
      // 1-based 1 (and none later — chars 9+ differ), cut = [1, 9)
      (4L, "abcdefghQRSTUVWXYZ_4242"),
      // shares a MIDDLE span with 4 (QRSTUVWXYZ at a different offset):
      // head and tail must survive around the cut
      (5L, "00a1QRSTUVWXYZzzzz_end!!")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
      .select("doc_id", "cleaned").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(out(1L) == "" && out(2L) == "", s"full dup must cut to empty: $out")
    assert(out(3L) == "zz99yy88xx77ww66vv55")
    // doc 4: cuts at sampled starts 1 (abcdefgh); pos 3,5,... contain
    // QRSTUVWXYZ chars shared with doc 5? positions overlap region
    // [1..8] only at start 1 for the abcdefgh window; the QRSTUVWXYZ
    // span sits at different offsets in 4 (9) and 5 (5) — stride-2
    // sampling hits start 9 in doc 4 and 5 in doc 5, both spanning
    // QRSTUVWX; those hashes match, so both docs cut their copy
    assert(!out(4L).contains("QRSTUVWX"))
    assert(!out(5L).contains("QRSTUVWX"))
    assert(out(5L).startsWith("00a1"), s"head before a middle cut must survive: ${out(5L)}")
    assert(out(5L).endsWith("!!"), s"tail after the last cut must survive: ${out(5L)}")
    // removal is consistent with the d14 profile: zero-dup docs have
    // cleaned == text, full-dup docs have cleaned == ""
    val profile = Dedup.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(profile(3L) == 0.0 && profile(1L) == 1.0)
  }

  test("span removal: reserved output column rejected, null text rows dropped") {
    import spark.implicits._
    val bad = Seq((1L, "x", "y")).toDF("doc_id", "text", "cleaned")
    val e = intercept[IllegalArgumentException] {
      Dedup.removeDuplicatedSpans(bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("cleaned"))
    val withNull = Seq((1L, "some text here"), (2L, null))
      .toDF("doc_id", "text")
    assert(Dedup.removeDuplicatedSpans(withNull, "doc_id", "text").count() == 1)
  }
}
