package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("mapPartitions decode agrees with the codegen'd column variant") {
    import spark.implicits._
    val media = Seq((1L, "hello world"), (2L, "x" * 300), (3L, ""))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))

    val viaPartitions = Multimodal.decodeFeatures(media)
      .select("media_id", "n_bytes", "width", "height", "format")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toSet
    val viaColumns = media
      .select(col("media_id") +: Multimodal.fakeDecodeColumns(col("payload")): _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt, r.getLong(3).toInt, r.getString(4)))
      .toSet
    assert(viaPartitions == viaColumns)
  }

  test("ImageIo decoder reads real PNG/JPEG/BMP headers through the Spark path") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK cannot encode $fmt")
      bos.toByteArray
    }
    val media = Seq(
      (1L, imageBytes(320, 200, "png")),
      (2L, imageBytes(64, 48, "jpg")),
      (3L, imageBytes(16, 16, "bmp")))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeFeatures(media, Multimodal.MediaDecoder.ImageIo)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L) == ((320, 200, "png")))
    assert(out(2L) == ((64, 48, "jpeg")))
    assert(out(3L) == ((16, 16, "bmp")))
    // non-image payloads fail loudly rather than fabricate metadata
    intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.ImageIo.decode("not an image".getBytes("UTF-8"))
    }
  }

  test("frame sampling yields ceil-ish stride segments, min 1") {
    import spark.implicits._
    val media = Seq((1L, "a" * 250), (2L, "b" * 10))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val frames = Multimodal.sampleFrames(media, 100)
      .select(col("media_id"), size(col("frames")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(frames == Map(1L -> 2, 2L -> 1))
  }

  test("window energy: exact integer sum of squared deviations per window, trailing partial dropped") {
    import spark.implicits._
    // "abcde" at windowBytes=2: windows "ab", "cd"; byte 'e' is beyond
    // the last full window (the n div W frame rule m01/m03 share)
    // ab: (97-128)^2 + (98-128)^2 = 961 + 900 = 1861
    // cd: (99-128)^2 + (100-128)^2 = 841 + 784 = 1625
    val media = Seq((1L, "abcde"), (2L, "a"))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.windowEnergy(media, windowBytes = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      1L -> ((2L, 3486L, 1861L, 1743.0)),
      // single byte shorter than the window: one short window ("a")
      2L -> ((1L, 961L, 961L, 961.0))))
  }

  test("silenceSegments: consecutive quiet windows collapse to runs; gaps split; empty payload yields nothing") {
    import spark.implicits._
    // windowBytes=1: per-byte energy (b-128)^2. 'a'=97 -> 961 (quiet at
    // <= 1000), ' '=32 -> 9216 (loud). "aa aa" -> quiet runs [1,2] and
    // [4,5] split by the loud space at 3. "aaa" -> one run [1,3].
    val media = Seq((1L, "aa aa"), (2L, "aaa"), (3L, ""))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.silenceSegments(media, windowBytes = 1,
        maxEnergy = 1000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 2L, 1922L),
      (1L, 4L, 5L, 2L, 1922L),
      (2L, 1L, 3L, 3L, 2883L)))
  }

  test("keyframeChecksums samples every k-th frame with correct indices, lengths and content") {
    import spark.implicits._
    // 25-byte payload, stride 4 -> 6 full frames (tail byte dropped);
    // every=2 samples frames 0, 2, 4. Sub-stride payload -> one frame.
    val media = Seq((1L, "abcdefghijklmnopqrstuvwxy"), (2L, "xy"))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.keyframeChecksums(media, strideBytes = 4, every = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.map(t => (t._1, t._2, t._4)).toSeq ===
      Seq((1L, 0L, 4L), (1L, 2L, 4L), (1L, 4L, 4L), (2L, 0L, 2L)))
    // content: frame 2 of media 1 is bytes "ijkl"; its md5 is over the
    // uppercase hex rendering (the engine-portable byte view)
    val hexIjkl = "ijkl".getBytes("UTF-8").map("%02X".format(_)).mkString
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(hexIjkl.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.find(t => t._1 == 1L && t._2 == 2L).get._3 === md)
  }

  test("sceneSegments: cuts where |Δenergy| > minDelta split frame runs into scenes") {
    import spark.implicits._
    // frames of 4 bytes: A = all-128 (energy 0), B = all-138
    // (energy 4·10² = 400); layout A A B B A with minDelta 100 ->
    // cuts at frames 2 and 4 -> scenes [0,1] [2,3] [4,4]
    val a = Array.fill(4)(128.toByte); val b = Array.fill(4)(138.toByte)
    val payload = a ++ a ++ b ++ b ++ a
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val out = Multimodal.sceneSegments(media, strideBytes = 4, minDelta = 100L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (0L, 0L, 1L, 2L, 0L), (1L, 2L, 3L, 2L, 800L), (2L, 4L, 4L, 1L, 0L)))
    // a constant payload is ONE scene regardless of length
    val const = Seq((2L, Array.fill(40)(200.toByte))).toDF("media_id", "payload")
    val one = Multimodal.sceneSegments(const, strideBytes = 4, minDelta = 0L)
      .collect()
    assert(one.length == 1 && one.head.getLong(4) == 10L)
  }

  test("tileChecksums: strided row slices, end clipping, empty tiles dropped") {
    import spark.implicits._
    // 200 bytes at rowBytes=64: rows 0..2 full, row 3 holds 8 bytes.
    // tile (0,0) = rows' [0,32) slices: 32+32+32+8 = 104 bytes;
    // tile (1,0) = rows' [32,64) slices: 32+32+32+0 = 96 bytes
    val payload = Array.tabulate(200)(i => (i % 251).toByte)
    val media = Seq((7L, payload)).toDF("media_id", "payload")
    val out = Multimodal.tileChecksums(media, rowBytes = 64,
        tileRows = 16, tileCols = 32)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> (r.getString(3), r.getLong(4)))
      .toMap
    assert(out.keySet === Set((0L, 0L), (1L, 0L)))
    assert(out((0L, 0L))._2 === 104L)
    assert(out((1L, 0L))._2 === 96L)
    // md5 over the uppercase-hex view of the hand-assembled slices
    def hexOf(bytes: Seq[Byte]): String =
      bytes.map(b => f"${b & 0xff}%02X").mkString
    def md5Of(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    def tileBytes(tx: Int): Seq[Byte] =
      (0 until 16).flatMap { r =>
        val off = r * 64 + tx * 32
        payload.slice(off, math.min(off + 32, payload.length)).toSeq
      }
    assert(out((0L, 0L))._1 === md5Of(hexOf(tileBytes(0))))
    assert(out((1L, 0L))._1 === md5Of(hexOf(tileBytes(1))))
    // an empty payload yields no tiles at all
    assert(Multimodal.tileChecksums(
      Seq((8L, Array.empty[Byte])).toDF("media_id", "payload"),
      rowBytes = 64, tileRows = 16, tileCols = 32).count() === 0L)
  }
}
