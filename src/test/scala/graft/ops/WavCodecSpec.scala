package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** encodeWav/decodeWav: byte-exact round trip, chunk-walk tolerance
  * for real-world containers (metadata chunks, odd-size padding), and
  * loud failure on malformed payloads — fabricated audio metadata
  * must never flow downstream.
  */
class WavCodecSpec extends AnyFunSuite with SparkSpec {

  private def roundTrip(rows: Seq[(Long, Int, Seq[Int])]) = {
    import spark.implicits._
    val spec = rows.toDF("media_id", "sample_rate", "samples")
    Multimodal.decodeWav(Multimodal.encodeWav(spec))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4),
          r.getAs[Array[Byte]](5).map(b => b & 0xFF).toSeq))).toMap
  }

  test("round trip hands back rate, layout and every sample byte exactly") {
    val s1 = (0 until 100).map(i => (i * 7) % 256)
    val s2 = Seq(0, 255, 128, 1, 254)
    val got = roundTrip(Seq((1L, 8000, s1), (2L, 44100, s2)))
    assert(got(1L) == ((8000, 1, 8, 100L, s1)))
    assert(got(2L) == ((44100, 1, 8, 5L, s2)))
  }

  test("decoded 8-bit mono pcm feeds the PCM8 energy family unchanged") {
    import spark.implicits._
    // 50 silent samples (128) then 25 loud: windowEnergy over the
    // DECODED pcm must equal the same op over the raw sample bytes
    val samples = Seq.fill(50)(128) ++ Seq.fill(25)(200)
    val spec = Seq((9L, 8000, samples)).toDF("media_id", "sample_rate", "samples")
    val pcm = Multimodal.decodeWav(Multimodal.encodeWav(spec))
      .select(col("media_id"), col("pcm").as("payload"))
    val viaWav = Multimodal.windowEnergy(pcm, windowBytes = 25)
      .select("media_id", "n_windows", "total_energy").head()
    assert(viaWav.getLong(1) == 3L)
    assert(viaWav.getLong(2) == 25L * 72 * 72)
    val segs = Multimodal.silenceSegments(pcm, windowBytes = 25, maxEnergy = 0L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(segs.toSeq == Seq((1L, 2L, 2L)), segs.toSeq)
  }

  test("chunk walk skips unknown metadata chunks and odd-size padding") {
    import spark.implicits._
    val samples = (0 until 30).map(i => i % 256)
    val wav = Multimodal.encodeWav(
        Seq((5L, 16000, samples)).toDF("media_id", "sample_rate", "samples"))
      .head().getAs[Array[Byte]](1)
    // splice a 3-byte (odd -> padded) LIST chunk between header and fmt
    val inject = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val spliced = wav.take(12) ++ inject ++ wav.drop(12)
    val got = Multimodal.decodeWav(
        Seq((5L, spliced)).toDF("media_id", "payload"))
      .head()
    assert(got.getInt(1) == 16000 && got.getLong(4) == 30L)
    assert(got.getAs[Array[Byte]](5).map(_ & 0xFF).toSeq == samples)
  }

  test("malformed payloads fail loudly with the media_id") {
    import spark.implicits._
    def decodeOne(bytes: Array[Byte]) =
      Multimodal.decodeWav(Seq((7L, bytes)).toDF("media_id", "payload"))
        .collect()
    val wav = Multimodal.encodeWav(
        Seq((7L, 8000, Seq(1, 2, 3))).toDF("media_id", "sample_rate", "samples"))
      .head().getAs[Array[Byte]](1)
    for (bad <- Seq(
        "not a riff file at all".getBytes("US-ASCII"), // wrong magic
        wav.take(10),                                   // truncated header
        wav.take(36),                                   // fmt but no data
        wav.updated(20, 2.toByte))) {                   // audio format != PCM
      val e = intercept[Exception] { decodeOne(bad) }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
      assert(msg.contains("media_id 7"), s"$msg")
    }
  }

  test("16-bit mono round-trips header + pcm8 = (s >> 8) + 128 per sample") {
    import spark.implicits._
    val left = Seq(-32768, -256, -255, -1, 0, 255, 256, 32767)
    val spec = Seq((3L, 22050, left, Option.empty[Seq[Int]]))
      .toDF("media_id", "sample_rate", "left", "right")
    val got = Multimodal.decodeWav(Multimodal.encodeWav16(spec)).head()
    assert(got.getInt(1) == 22050 && got.getInt(2) == 1 && got.getInt(3) == 16)
    assert(got.getLong(4) == left.length.toLong)
    val want = left.map(s => ((s >> 8) + 128) & 0xFF)
    assert(got.getAs[Array[Byte]](6).map(_ & 0xFF).toSeq == want)
    // raw pcm survives byte-exactly too (LE int16)
    val raw = got.getAs[Array[Byte]](5)
    val back = raw.grouped(2).map(p =>
      ((p(0) & 0xFF) | (p(1) << 8)).toShort.toInt).toSeq
    assert(back == left)
  }

  test("16-bit stereo downmixes pcm8 by the composed floor rule (l+r) >> 1 >> 8") {
    import spark.implicits._
    val l = Seq(-32768, 1000, -1001, 32767)
    val r = Seq(-32768, -999, -1000, 32767)
    val spec = Seq((4L, 44100, l, Some(r)))
      .toDF("media_id", "sample_rate", "left", "right")
    val got = Multimodal.decodeWav(Multimodal.encodeWav16(spec)).head()
    assert(got.getInt(2) == 2 && got.getInt(3) == 16)
    assert(got.getLong(4) == l.length.toLong) // frames, not raw samples
    val want = l.zip(r).map { case (a, b) => ((((a + b) >> 1) >> 8) + 128) & 0xFF }
    assert(got.getAs[Array[Byte]](6).map(_ & 0xFF).toSeq == want)
  }

  test("8-bit mono pcm8 IS the pcm stream; stereo 16-bit feeds energy unchanged") {
    import spark.implicits._
    val spec8 = Seq((6L, 8000, Seq(1, 2, 3))).toDF("media_id", "sample_rate", "samples")
    val d8 = Multimodal.decodeWav(Multimodal.encodeWav(spec8)).head()
    assert(d8.getAs[Array[Byte]](5).toSeq == d8.getAs[Array[Byte]](6).toSeq)
    // constant stereo (l = r = 512) -> pcm8 byte 130, per-window energy 2²·w
    val n = 40
    val spec16 = Seq((8L, 16000, Seq.fill(n)(512), Some(Seq.fill(n)(512))))
      .toDF("media_id", "sample_rate", "left", "right")
    val pcm8 = Multimodal.decodeWav(Multimodal.encodeWav16(spec16))
      .select(col("media_id"), col("pcm8").as("payload"))
    val e = Multimodal.windowEnergy(pcm8, windowBytes = 20).head()
    assert(e.getLong(1) == 2L && e.getLong(2) == n.toLong * 4)
  }

  test("encodeWav16 refuses out-of-range samples and mismatched stereo lengths") {
    import spark.implicits._
    val over = intercept[Exception] {
      Multimodal.encodeWav16(Seq((1L, 8000, Seq(32768), Option.empty[Seq[Int]]))
        .toDF("media_id", "sample_rate", "left", "right")).collect()
    }
    assert((Option(over.getCause).map(_.getMessage).getOrElse("") +
      over.getMessage).contains("media_id 1"))
    intercept[Exception] {
      Multimodal.encodeWav16(Seq((2L, 8000, Seq(1, 2), Some(Seq(1))))
        .toDF("media_id", "sample_rate", "left", "right")).collect()
    }
  }

  test("decode refuses unsupported bit widths and channel counts loudly") {
    import spark.implicits._
    val wav = Multimodal.encodeWav16(
        Seq((9L, 8000, Seq(1, 2, 3, 4), Option.empty[Seq[Int]]))
          .toDF("media_id", "sample_rate", "left", "right"))
      .head().getAs[Array[Byte]](1)
    // fmt chunk starts at offset 12; bits-per-sample at 12+8+14 = 34,
    // channels at 12+8+2 = 22
    def patched(off: Int, v: Int) = wav.updated(off, v.toByte)
    for (bad <- Seq(patched(34, 24), patched(22, 3))) {
      val e = intercept[Exception] {
        Multimodal.decodeWav(Seq((9L, bad)).toDF("media_id", "payload")).collect()
      }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
      assert(msg.contains("media_id 9"), msg)
    }
  }

  test("out-of-range samples and bad rates are refused at encode time") {
    import spark.implicits._
    intercept[Exception] {
      Multimodal.encodeWav(Seq((1L, 8000, Seq(256)))
        .toDF("media_id", "sample_rate", "samples")).collect()
    }
    intercept[Exception] {
      Multimodal.encodeWav(Seq((1L, 0, Seq(1)))
        .toDF("media_id", "sample_rate", "samples")).collect()
    }
  }
}
