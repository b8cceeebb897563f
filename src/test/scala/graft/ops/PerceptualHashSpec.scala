package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** perceptualHashPairs: aHash mean-threshold bits + 4x8 band join.
  * Pins the detection claims (identical payloads at hamming 0, a
  * one-byte edit of a structured payload within maxHamming, unrelated
  * structures absent), the empty-payload exclusion, and the pre-join
  * candidate budget guard on a structurally uniform corpus.
  */
class PerceptualHashSpec extends AnyFunSuite with SparkSpec {

  private def media(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("media_id", "s")
      .select(col("media_id"), col("s").cast("binary").as("payload"))
  }

  test("identical payloads pair at hamming 0; one-byte edit stays near; unrelated far") {
    // structured payload: low bytes then high bytes — a crisp bit plane
    val base = ("a" * 40) + ("z" * 40)
    val edit = "Z" + base.substring(1)
    val other = ("z" + "a" * 3) * 20 // alternating structure
    val got = Multimodal.perceptualHashPairs(
        media(Seq((1L, base), (2L, base), (3L, edit), (4L, other))))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0L)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) <= 3L)
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("empty payloads are excluded, not hashed to a phantom bucket") {
    val got = Multimodal.perceptualHashPairs(
        media(Seq((1L, ""), (2L, ""), (3L, "abcdefgh"))))
      .collect()
    assert(got.isEmpty)
  }

  test("maxHamming > 3 derives maxHamming+1 bands: a 5-bit spread pair IS found") {
    import spark.implicits._
    // payloads engineered so the two ahashes differ in exactly 5 bits
    // at positions {1,2,9,17,25} — one differing bit in EVERY 8-bit
    // band of the old fixed 4-band layout (which therefore had no
    // clean band and silently dropped the pair despite maxHamming=5).
    // The derived 6-band layout leaves band [10,16) clean -> found.
    val highA = Set(0, 1, 2, 9, 17, 25, 4, 12, 20, 28)
    val highB = highA -- Set(1, 2, 9, 17, 25)
    def payload(high: Set[Int]): Array[Byte] =
      (0 until 32).map(i => if (high(i)) 250.toByte else 2.toByte).toArray
    val df = Seq((1L, payload(highA)), (2L, payload(highB)))
      .toDF("media_id", "payload")
    val got = Multimodal.perceptualHashPairs(df, maxHamming = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((1L, 2L) -> 5L), s"got $got")
    // the same pair is invisible at the default threshold (hamming 5 > 3)
    assert(Multimodal.perceptualHashPairs(df).collect().isEmpty)
  }

  test("property: banding is exact recall vs the 31-band exhaustive form") {
    import spark.implicits._
    // maxHamming=31 uses 32 one-bit bands: every pair differing in
    // <= 31 bits collides somewhere, so its output is the full
    // hamming-<=31 pair relation — the brute-force reference. Any
    // tighter threshold must return exactly its restriction.
    val rnd = new scala.util.Random(13)
    val docs = (1L to 24L).map { i =>
      (i, Array.fill(32)((rnd.nextInt(256) - 128).toByte)) }
    val df = docs.toDF("media_id", "payload")
    val all = Multimodal.perceptualHashPairs(df, maxHamming = 31,
        maxCandidatePairs = 1L << 20)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (h <- Seq(3, 5, 9)) {
      val got = Multimodal.perceptualHashPairs(df, maxHamming = h,
          maxCandidatePairs = 1L << 20)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      assert(got == all.filter(_._2 <= h), s"maxHamming=$h")
    }
  }

  test("budget guard trips on a structurally uniform corpus with a diagnosis") {
    val uniform = (1L to 60L).map(i => (i, "q" * 64))
    val e = intercept[IllegalStateException] {
      Multimodal.perceptualHashPairs(media(uniform), maxCandidatePairs = 100L)
    }
    assert(e.getMessage.contains("candidate volume"), e.getMessage)
    // same corpus under budget returns all C(60,2) hamming-0 pairs
    assert(Multimodal.perceptualHashPairs(media(uniform),
      maxCandidatePairs = 100000L).count() == 60L * 59 / 2)
  }
}
