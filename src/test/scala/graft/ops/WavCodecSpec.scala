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
