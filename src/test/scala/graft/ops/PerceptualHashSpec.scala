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
