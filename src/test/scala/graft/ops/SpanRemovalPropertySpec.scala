package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property check: the head/gaps/tail stitching in
  * [[Dedup.removeDuplicatedSpans]] must equal the independent
  * character-coverage definition — "keep every char not covered by any
  * duplicated k-span" — on random corpora from a tiny alphabet (so
  * cross-doc span collisions are dense and overlapping cuts are the
  * common case, not the edge case).
  */
class SpanRemovalPropertySpec extends AnyFunSuite with SparkSpec {

  private val K = Dedup.ShingleK
  private val Stride = Dedup.ShingleStride

  /** ShingleHash32's exact semantics, restated independently. */
  private def shingles(s: String): Seq[(Int, Long)] = {
    val n = s.length
    val last = math.max(n - K + 1, 1)
    (0 until ((last - 1) / Stride + 1)).map { p =>
      val i = p * Stride
      var h = 0L
      (0 until K).foreach { j =>
        h = h * 31L + (if (i + j < n) s.charAt(i + j).toLong else 0L)
      }
      (i, h & 0xFFFFFFFFL)
    }
  }

  /** Brute-force reference: chars covered by a duplicated span drop. */
  private def reference(corpus: Seq[(Long, String)]): Map[Long, String] = {
    val docHashes = corpus.map { case (id, t) => id -> shingles(t) }
    val df = docHashes.flatMap { case (id, hs) => hs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.size }
    docHashes.map { case (id, hs) =>
      val t = corpus.find(_._1 == id).get._2
      val covered = Array.fill(t.length)(false)
      hs.foreach { case (p, h) =>
        if (df(h) >= 2)
          (p until math.min(p + K, t.length)).foreach(covered(_) = true)
      }
      id -> t.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
    }.toMap
  }

  test("stitched removal equals the char-coverage reference on dense random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 3-char alphabet, lengths 0..40: heavy cross-doc span sharing,
    // overlapping and adjacent cuts everywhere
    (1 to 5).foreach { round =>
      val corpus = (1L to 12L).map { id =>
        val len = rnd.nextInt(41)
        id -> Seq.fill(len)("abc" (rnd.nextInt(3))).mkString
      }
      val expected = reference(corpus)
      val got = Dedup.removeDuplicatedSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "cleaned").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"round $round: corpus=$corpus")
    }
  }
}
