package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2C): image/audio/video payloads
  * travel as opaque `binary` columns next to a typed metadata struct;
  * decode / feature-extraction runs batch-at-a-time inside
  * `mapPartitions` so a real codec (JNI, native lib) amortizes init per
  * partition. Two decoders ship behind the same trait:
  * [[MediaDecoder.ImageIo]] decodes real PNG/JPEG/BMP headers on the
  * JDK's `javax.imageio` (no external libs), and
  * [[MediaDecoder.Deterministic]] synthesizes metadata from the bytes
  * for the oracle-checked queries over the synthetic (non-image) test
  * corpus. Audio/video codecs would slot in the same way.
  */
object Multimodal {

  /** Decoder contract: bytes -> (width, height, format). One instance
    * per partition (see [[decodeFeatures]]), so implementations may hold
    * native handles.
    */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, String)
  }

  object MediaDecoder {
    /** Real image decoder on the JDK's bundled `javax.imageio`
      * (PNG/JPEG/BMP/GIF/WBMP — zero external dependencies): reads
      * width/height/format from the image HEADER via an ImageReader,
      * never decoding the full raster, so cost per payload is a few
      * hundred bytes of parsing regardless of pixel count. Payloads no
      * reader recognizes fail loudly — silently fabricated metadata
      * would poison downstream filters.
      *
      * The synthetic test corpus carries random (non-image) bytes, so
      * the oracle-checked queries keep [[Deterministic]]; this is the
      * production decoder for real image columns.
      */
    object ImageIo extends MediaDecoder {
      override def decode(bytes: Array[Byte]): (Int, Int, String) = {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext())
            throw new IllegalArgumentException(
              s"no ImageIO reader recognizes payload (${bytes.length} bytes)")
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            (reader.getWidth(0), reader.getHeight(0),
              reader.getFormatName.toLowerCase(java.util.Locale.ROOT))
          } finally reader.dispose()
        } finally iis.close()
      }
    }

    /** STUB decoder: deterministic pseudo-metadata derived from payload
      * bytes. Kept for the DuckDB-oracle'd queries (m01-m03), whose
      * synthetic payloads are not real images; see [[ImageIo]] for the
      * zero-dependency real decoder.
      */
    object Deterministic extends MediaDecoder {
      override def decode(bytes: Array[Byte]): (Int, Int, String) = {
        val n = bytes.length.toLong
        val w = (64 + n % 577).toInt
        val h = (64 + (n * 31) % 433).toInt
        val fmt = (n % 3) match {
          case 0 => "png"
          case 1 => "jpeg"
          case _ => "webp"
        }
        (w, h, fmt)
      }
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  /** Batch decode: one decoder per partition, rows streamed through it.
    * Input needs columns (media_id long, payload binary).
    */
  def decodeFeatures(media: DataFrame,
      decoder: MediaDecoder = MediaDecoder.Deterministic): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init point for a real codec
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, fmt) = decoder.decode(bytes)
          Row(id, bytes.length.toLong, w, h, fmt)
        }
      }(enc)
  }

  /** Distributed PNG ENCODE on the JDK's `javax.imageio` — the
    * write-side twin of [[MediaDecoder.ImageIo]], and the harness that
    * makes the real decoder oracle-checkable END-TO-END (m04): payload
    * dimensions are chosen arithmetically, encoded to genuine PNG bytes
    * on executors, and the decode must hand them back exactly. Same
    * per-partition batch shape as [[decodeFeatures]].
    *
    * Input needs (media_id long, width int, height int); returns
    * (media_id, payload binary).
    */
  def encodePng(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    media.select(col("media_id"), col("width"), col("height"))
      .mapPartitions { rows =>
        rows.map { r =>
          // fail with the offending media_id, not a context-free NPE /
          // BufferedImage error — a malformed dims row in a large batch
          // must be attributable (same loud-failure stance as ImageIo)
          val id = r.getLong(0)
          if (r.isNullAt(1) || r.isNullAt(2) || r.getInt(1) <= 0 || r.getInt(2) <= 0)
            throw new IllegalArgumentException(
              s"media_id $id: width/height must be positive non-null, got " +
                s"(${if (r.isNullAt(1)) "null" else r.getInt(1)}, " +
                s"${if (r.isNullAt(2)) "null" else r.getInt(2)})")
          val img = new java.awt.image.BufferedImage(
            r.getInt(1), r.getInt(2), java.awt.image.BufferedImage.TYPE_INT_RGB)
          val bos = new java.io.ByteArrayOutputStream()
          if (!javax.imageio.ImageIO.write(img, "png", bos))
            throw new IllegalStateException(s"media_id $id: JDK PNG encoder unavailable")
          Row(id, bos.toByteArray)
        }
      }(enc)
  }

  /** Distributed WAV (RIFF) ENCODE — the audio twin of [[encodePng]]
    * and the harness that makes [[decodeWav]] oracle-checkable
    * END-TO-END (m11): sample values are chosen arithmetically by the
    * caller, serialized to genuine RIFF/WAVE PCM bytes on executors
    * (pure header math, zero dependencies), and the decoder must hand
    * them back exactly. 8-bit unsigned mono PCM — the one WAV layout
    * whose data chunk IS the PCM8 byte stream the m05/m06/m10 energy
    * family consumes, so a decoded real container feeds
    * [[windowEnergy]]/[[silenceSegments]] with no conversion.
    *
    * Input needs (media_id long, sample_rate int > 0, samples
    * array<int> with values in [0, 255]); returns (media_id, payload
    * binary). Malformed rows fail loudly with their media_id (the
    * [[encodePng]] stance).
    */
  def encodeWav(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    media.select(col("media_id"), col("sample_rate").cast("int"),
        col("samples"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          if (r.isNullAt(1) || r.getInt(1) <= 0)
            throw new IllegalArgumentException(
              s"media_id $id: sample_rate must be positive non-null")
          if (r.isNullAt(2))
            throw new IllegalArgumentException(
              s"media_id $id: samples must be non-null")
          val rate = r.getInt(1)
          val samples = r.getSeq[Int](2)
          val n = samples.length
          val bb = java.nio.ByteBuffer.allocate(44 + n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.putInt(36 + n)
          bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.putInt(16)          // PCM fmt chunk size
          bb.putShort(1)         // audio format: PCM
          bb.putShort(1)         // channels: mono
          bb.putInt(rate)
          bb.putInt(rate)        // byte rate = rate * channels * 1 byte
          bb.putShort(1)         // block align
          bb.putShort(8)         // bits per sample
          bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.putInt(n)
          var i = 0
          while (i < n) {
            val s = samples(i)
            if (s < 0 || s > 255)
              throw new IllegalArgumentException(
                s"media_id $id: sample $i = $s outside [0, 255]")
            bb.put(s.toByte)
            i += 1
          }
          Row(id, bb.array())
        }
      }(enc)
  }

  /** 16-bit PCM encode twin (m12): mono or stereo from signed
    * [-32768, 32767] sample arrays — real WAV corpora are 16-bit, so
    * the decoder's downconversion path needs a spec-compliant
    * generator to round-trip against. Input (media_id long,
    * sample_rate int > 0, left array<int>, right array<int> —
    * null right = mono); stereo requires equal lengths. Interleaved
    * little-endian int16 frames, the [[encodeWav]] loud-failure
    * stance throughout.
    */
  def encodeWav16(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    media.select(col("media_id"), col("sample_rate").cast("int"),
        col("left"), col("right"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          if (r.isNullAt(1) || r.getInt(1) <= 0)
            throw new IllegalArgumentException(
              s"media_id $id: sample_rate must be positive non-null")
          if (r.isNullAt(2))
            throw new IllegalArgumentException(
              s"media_id $id: left channel must be non-null")
          val rate = r.getInt(1)
          val left = r.getSeq[Int](2)
          val right = if (r.isNullAt(3)) null else r.getSeq[Int](3)
          if (right != null && right.length != left.length)
            throw new IllegalArgumentException(
              s"media_id $id: stereo channels differ in length " +
                s"(${left.length} vs ${right.length})")
          val channels = if (right == null) 1 else 2
          val n = left.length
          val dataBytes = n * channels * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.putInt(36 + dataBytes)
          bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.putInt(16)                      // PCM fmt chunk size
          bb.putShort(1)                     // audio format: PCM
          bb.putShort(channels.toShort)
          bb.putInt(rate)
          bb.putInt(rate * channels * 2)     // byte rate
          bb.putShort((channels * 2).toShort) // block align
          bb.putShort(16)                    // bits per sample
          bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.putInt(dataBytes)
          var i = 0
          while (i < n) {
            def checked(s: Int, ch: String): Short = {
              if (s < -32768 || s > 32767)
                throw new IllegalArgumentException(
                  s"media_id $id: $ch sample $i = $s outside [-32768, 32767]")
              s.toShort
            }
            bb.putShort(checked(left(i), "left"))
            if (right != null) bb.putShort(checked(right(i), "right"))
            i += 1
          }
          Row(id, bb.array())
        }
      }(enc)
  }

  val wavSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_samples", LongType),
    StructField("pcm", BinaryType),
    StructField("pcm8", BinaryType)))

  /** Real WAV/RIFF container DECODE — the audio member of the
    * [[MediaDecoder.ImageIo]] family (header parse + PCM extraction,
    * zero dependencies): validates the RIFF/WAVE magic, WALKS the
    * chunk list (unknown chunks — LIST/INFO/fact — are skipped by
    * their declared size, odd sizes consume the RIFF pad byte, so
    * real-world files with metadata chunks parse), reads the PCM
    * format fields from `fmt ` and hands back the raw `data` bytes.
    * Non-PCM encodings and truncated/malformed containers fail LOUDLY
    * with the media_id — fabricated audio metadata would poison every
    * downstream energy gate.
    *
    * For 8-bit mono output, `pcm` is directly the PCM8 stream
    * [[windowEnergy]]/[[silenceSegments]]/[[keyframeChecksums]]
    * consume — rename it to `payload` and the whole m05/m06/m10
    * family runs on real container bytes (m11 proves the loop).
    *
    * The `pcm8` column (m12) is that stream for EVERY supported
    * format: 8/16-bit, mono/stereo, normalized to one unsigned byte
    * per frame — stereo downmixes by floor-average `(l + r) >> 1`,
    * 16-bit downconverts by `(s >> 8) + 128` (arithmetic shift =
    * floor division, so the rule is exact-integer and the oracle
    * restates it as floor() arithmetic). Unsupported bit widths and
    * channel counts fail loudly with the media_id.
    */
  def decodeWav(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(wavSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          def fail(why: String) = throw new IllegalArgumentException(
            s"media_id $id: not a WAV payload — $why")
          def ascii(off: Int) = new String(b, off, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          def leInt(off: Int): Int =
            (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
              ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
          def leShort(off: Int): Int =
            (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
          if (b == null || b.length < 12) fail("shorter than a RIFF header")
          if (ascii(0) != "RIFF") fail(s"magic '${ascii(0)}' != 'RIFF'")
          if (ascii(8) != "WAVE") fail(s"form '${ascii(8)}' != 'WAVE'")
          var pos = 12
          var rate = -1; var channels = -1; var bits = -1
          var data: Array[Byte] = null
          while (pos + 8 <= b.length) {
            val cid = ascii(pos)
            val sz = leInt(pos + 4)
            // Long arithmetic: a declared size near Int.MaxValue would
            // wrap `pos + 8 + sz` negative and slip past an Int check,
            // turning the promised media_id diagnostic into a raw
            // ArrayIndexOutOfBounds from copyOfRange
            if (sz < 0 || pos.toLong + 8L + sz > b.length)
              fail(s"chunk '$cid' declares $sz bytes past payload end")
            if (cid == "fmt ") {
              if (sz < 16) fail(s"fmt chunk too small ($sz bytes)")
              val audioFormat = leShort(pos + 8)
              if (audioFormat != 1)
                fail(s"audio format $audioFormat is not PCM")
              channels = leShort(pos + 10)
              rate = leInt(pos + 12)
              bits = leShort(pos + 22)
            } else if (cid == "data") {
              data = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + sz)
            }
            pos += 8 + sz + (sz & 1) // odd chunks carry a pad byte
          }
          if (rate < 0) fail("no fmt chunk")
          if (data == null) fail("no data chunk")
          if (channels <= 0 || bits <= 0 || bits % 8 != 0)
            fail(s"implausible fmt: channels=$channels bits=$bits")
          if (bits != 8 && bits != 16)
            fail(s"bits-per-sample $bits unsupported (8 or 16)")
          if (channels > 2)
            fail(s"$channels channels unsupported (mono or stereo)")
          val frameBytes = channels * (bits / 8)
          if (data.length % frameBytes != 0)
            fail(s"data size ${data.length} not a multiple of the " +
              s"$frameBytes-byte frame")
          val frames = data.length / frameBytes
          // normalized PCM8 stream: one unsigned byte per frame.
          // Stereo downmix (l + r) >> 1 BEFORE the 16-bit >> 8
          // downconversion — both arithmetic shifts are floor
          // divisions, so the composed rule is floor((l + r) / 512)
          // + 128, restatable exactly in the oracle
          val pcm8 =
            if (bits == 8 && channels == 1) data
            else {
              val out = new Array[Byte](frames)
              var fi = 0
              while (fi < frames) {
                val base = fi * frameBytes
                val v =
                  if (bits == 8) {
                    val l = data(base) & 0xFF
                    val r = data(base + 1) & 0xFF
                    (l + r) >> 1
                  } else {
                    def s16(off: Int): Int =
                      ((data(off) & 0xFF) | (data(off + 1) << 8)).toShort.toInt
                    val m =
                      if (channels == 1) s16(base)
                      else (s16(base) + s16(base + 2)) >> 1
                    (m >> 8) + 128
                  }
                out(fi) = v.toByte
                fi += 1
              }
              out
            }
          Row(id, rate, channels, bits, frames.toLong, data, pcm8)
        }
      }(enc)
  }

  /** Frame sampling for "video" payloads: every strideBytes-th byte as a
    * frame marker — the plumbing shape of ffmpeg-style keyframe
    * extraction (array-of-binary output column).
    */
  def sampleFrames(media: DataFrame, strideBytes: Int): DataFrame =
    media.select(col("media_id"), col("payload"),
      expr(s"transform(sequence(1, greatest(octet_length(payload) div $strideBytes, 1))," +
        s" i -> substring(payload, (i - 1) * $strideBytes + 1, $strideBytes))")
        .as("frames"))

  /** Keyframe stride sampling + per-frame content checksums: every
    * `every`-th frame of the [[sampleFrames]] layout (frame = one
    * `strideBytes` byte slice; a sub-stride payload is its own single
    * frame), checksummed over its uppercase-hex rendering — the shared
    * byte representation both engines state identically (the m05
    * idiom; DuckDB's md5 is VARCHAR-only, so hex IS the portable byte
    * view). This is the ffmpeg `-vf select=not(mod(n\,k))` shape: the
    * skipped frames are never materialized — the generator emits only
    * the sampled indexes, so the per-row work is (frames/every)
    * substring+hash ops, not frames. Payload bytes never shuffle (the
    * multimodal ground rule); output is (media_id, frame_idx,
    * frame_md5, frame_len) exploded per sampled frame.
    */
  def keyframeChecksums(media: DataFrame, strideBytes: Int,
      every: Int): DataFrame = {
    require(strideBytes > 0 && every > 0,
      s"strideBytes and every must be positive (got $strideBytes, $every)")
    media
      .select(col("media_id"), col("payload"),
        explode(expr(
          s"""transform(
             |  sequence(0, (greatest(octet_length(payload) div $strideBytes, 1) - 1) div $every),
             |  i -> i * $every)""".stripMargin)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(hex(expr(
          s"substring(payload, frame_idx * $strideBytes + 1, $strideBytes)")))
          .as("frame_md5"),
        expr(s"octet_length(substring(payload, frame_idx * $strideBytes + 1, $strideBytes))")
          .cast("long").as("frame_len"))
  }

  /** Exact FRAME dedup profile (m08) — d01's fingerprint dedup applied
    * to multimodal payload frames: every frame of the stride layout is
    * content-checksummed ([[keyframeChecksums]] with `every = 1`), and
    * a frame is duplicated iff its checksum occurs at ≥ 2 (media,
    * frame) positions corpus-wide — re-encoded copies, looping clips
    * and shared intros/outros all surface here. Per media:
    * (n_frames, n_dup_frames, dup_fraction). The groupBy shuffles
    * 32-char checksums, never payload bytes (the multimodal ground
    * rule); cost is one hash pass + one map-side-combined count + one
    * checksum equi-join — the d14 scale shape on binary.
    */
  def frameDedupProfile(media: DataFrame, strideBytes: Int): DataFrame = {
    // pin: the occurrence count AND the join probe both consume the
    // frame relation — unpinned, the payload substring+hash pass (the
    // dominant cost) would run twice
    val frames = keyframeChecksums(media, strideBytes, every = 1)
      .select(col("media_id"), col("frame_md5"))
      .localCheckpoint(true)
    val occ = frames.groupBy("frame_md5").agg(count(lit(1)).as("__occ"))
    frames.join(occ, "frame_md5")
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("__occ") >= 2, 1L).otherwise(0L)).as("n_dup_frames"))
      .withColumn("dup_fraction",
        col("n_dup_frames") / col("n_frames").cast("double"))
  }

  /** Windowed audio-energy profile over a PCM8-shaped binary payload —
    * the voice-activity / silence-trim primitive of an audio pipeline,
    * on the engine's stub-payload convention (bytes ARE the samples;
    * a real s16le decode swaps only the byte→sample expression). Per
    * `windowBytes` window: energy = Σ (sample − 128)², exact integer
    * arithmetic. Bytes are read through `hex()` + per-byte `conv`
    * (Spark has no byte-iterator over BinaryType); both engines
    * uppercase-hex and parse identically, so the profile is
    * oracle-exact. Everything is one codegen'd projection per row —
    * payload bytes never shuffle (the multimodal ground rule).
    *
    * Returns per media row: n_windows, total_energy, peak_energy,
    * avg_energy (one int/int double division). An empty payload gets
    * an empty profile (0 windows, 0 total, NULL peak/avg), not a
    * phantom window of NULL energies.
    *
    * The per-window energies come from the native codegen'd
    * [[graft.functions.Pcm8WindowEnergy]] (one fused byte loop). The
    * SQL-function formulation — hex() then substr + base-16 conv per
    * byte — was this suite's measured top-12 bench line (2.6 s at
    * sf0.1); the oracle still states that portable arithmetic, so the
    * native path is hash-checked against it end-to-end.
    */
  def windowEnergy(media: DataFrame, windowBytes: Int): DataFrame = {
    require(windowBytes >= 1, s"windowBytes must be >= 1, got $windowBytes")
    media.select(col("media_id"),
        graft.functions.MediaExpressions
          .pcm8_window_energy(col("payload"), windowBytes).as("es"))
      .select(col("media_id"),
        size(col("es")).cast("long").as("n_windows"),
        expr("aggregate(es, 0L, (a, e) -> a + e)").as("total_energy"),
        array_max(col("es")).as("peak_energy"))
      .withColumn("avg_energy",
        when(col("n_windows") > 0,
          col("total_energy") / col("n_windows").cast("double")))
  }

  /** Silence segmentation over a PCM8-shaped payload — the VAD /
    * silence-trim REGION operator the m05 energy profile feeds: runs
    * of consecutive windows at-or-below `maxEnergy` become one
    * segment row (media_id, start_win, end_win, n_windows,
    * segment_energy), the spans an audio pipeline cuts or keeps.
    * Run-length grouping is the d19 island trick relationally:
    * win_idx − row_number() over (media, win order) is constant
    * exactly within a consecutive run, so islands fall out of one
    * partitioned window + one groupBy — no sequential scan, no UDF.
    * Energies come from the native codegen'd [[graft.functions
    * .Pcm8WindowEnergy]] (one fused byte loop); payload bytes never
    * shuffle — only (media_id, win_idx, energy) rows for QUIET
    * windows travel, and the window partitions by media so the sort
    * is per-media, never global. An empty payload yields no segments.
    */
  def silenceSegments(media: DataFrame, windowBytes: Int,
      maxEnergy: Long): DataFrame = {
    require(windowBytes >= 1, s"windowBytes must be >= 1, got $windowBytes")
    require(maxEnergy >= 0, s"maxEnergy must be >= 0, got $maxEnergy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("win_idx")
    media.select(col("media_id"),
        posexplode(graft.functions.MediaExpressions
          .pcm8_window_energy(col("payload"), windowBytes)))
      .select(col("media_id"), (col("pos") + 1).cast("long").as("win_idx"),
        col("col").as("energy"))
      .where(col("energy") <= maxEnergy)
      .withColumn("__isl", col("win_idx") - row_number().over(w))
      .groupBy(col("media_id"), col("__isl"))
      .agg(min("win_idx").as("start_win"), max("win_idx").as("end_win"),
        count(lit(1)).as("n_windows"), sum("energy").as("segment_energy"))
      .select("media_id", "start_win", "end_win", "n_windows",
        "segment_energy")
  }

  /** Scene-change segmentation over a frame-stride payload (m13) —
    * the video CUT detector composing the m07 frame layout with the
    * m10 island machinery: each strideBytes frame gets the native
    * codegen'd energy signature (one fused byte loop, window =
    * frame), consecutive frames whose |Δenergy| exceeds `minDelta`
    * mark a cut, and scenes are the runs between cuts — scene_idx =
    * the running cut count per media (one per-media cumulative
    * window over frame order, never a global sort), one groupBy
    * emits (media_id, scene_idx, start_frame, end_frame, n_frames,
    * scene_energy). The ffmpeg `select='gt(scene,t)'` shape on the
    * house deterministic-integer signature. Payload bytes never
    * shuffle — only (media_id, frame_idx, energy) rows travel.
    */
  def sceneSegments(media: DataFrame, strideBytes: Int,
      minDelta: Long): DataFrame = {
    require(strideBytes >= 1, s"strideBytes must be >= 1, got $strideBytes")
    require(minDelta >= 0, s"minDelta must be >= 0, got $minDelta")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    media.select(col("media_id"),
        posexplode(graft.functions.MediaExpressions
          .pcm8_window_energy(col("payload"), strideBytes)))
      .select(col("media_id"), col("pos").cast("long").as("frame_idx"),
        col("col").as("energy"))
      .withColumn("__prev", lag("energy", 1).over(w))
      .withColumn("__cut",
        when(col("__prev").isNotNull &&
          abs(col("energy") - col("__prev")) > minDelta, 1L).otherwise(0L))
      .withColumn("scene_idx", sum("__cut").over(w))
      .groupBy("media_id", "scene_idx")
      .agg(min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"), sum("energy").as("scene_energy"))
      .select("media_id", "scene_idx", "start_frame", "end_frame",
        "n_frames", "scene_energy")
  }

  /** Perceptual near-dup pairs over binary payloads — aHash (average
    * hash), the classic perceptual-dedup primitive (LAION-style image
    * dedup runs exactly this family): thumbnail each payload to 32
    * sample bytes at positions (i·n) div 32 (the m06 resize rule),
    * threshold each sample against the thumbnail MEAN (32·v_i >= Σv —
    * no division), pack the 32 verdict bits into one BIGINT. A
    * re-encode or small edit that preserves gross byte structure
    * flips few bits, so near-dups sit within small hamming distance
    * — the d03 detection shape on binary: equi-join on each of
    * `maxHamming + 1` bands splitting the 32 bits evenly (pigeonhole:
    * <= maxHamming differing bits cannot touch all maxHamming + 1
    * bands, so a qualifying pair agrees exactly on >= 1 band — recall
    * 1.0 for ANY allowed threshold, not just the 4-band default's 3),
    * then bit_count(xor) verify. maxHamming is capped at 31: 32 would
    * need a 0-bit band (every pair a candidate — that is a cross
    * join, not a banded join).
    *
    * Payload bytes never shuffle (the multimodal ground rule): the
    * hash is one codegen'd projection per row; only (id, ahash, band)
    * rows travel. Mean-threshold bits are CORRELATED across media
    * (unlike simhash's pseudo-random text bits), so band buckets can
    * skew toward a few hot keys — the s17/d11 lesson — and the
    * candidate volume Σ C(bucket, 2) is therefore aggregated BEFORE
    * the self-join: a degenerate corpus (uniform payload structure)
    * fails in seconds with a diagnosis instead of a quadratic join.
    */
  def perceptualHashPairs(media: DataFrame, maxHamming: Int = 3,
      maxCandidatePairs: Long = 1L << 26): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    require(maxCandidatePairs > 0,
      s"maxCandidatePairs must be > 0, got $maxCandidatePairs")
    val hashed = media
      .where(expr("octet_length(payload) > 0"))
      .select(col("media_id"), expr(
        """transform(sequence(0, 31),
          |  i -> CAST(conv(hex(substring(payload,
          |    CAST((i * octet_length(payload)) div 32 AS INT) + 1, 1)),
          |    16, 10) AS BIGINT))""".stripMargin).as("__v"))
      .withColumn("__s", expr("aggregate(__v, 0L, (a, x) -> a + x)"))
      .withColumn("ahash", expr(
        """aggregate(sequence(0, 31), 0L,
          |  (acc, i) -> acc + IF(32 * element_at(__v, i + 1) >= __s,
          |    shiftleft(1L, i), 0L))""".stripMargin))
      .select("media_id", "ahash")
      // the band relation feeds the budget check AND both self-join
      // sides — one materialization, and the hash pass (the payload
      // read) never reruns
      .localCheckpoint(true)
    // band count derived from the threshold (pigeonhole needs
    // maxHamming + 1 bands); widths split the 32 bits as evenly as
    // integer division allows — for the default maxHamming = 3 this
    // is exactly the classic 4 x 8-bit layout
    val nBands = maxHamming + 1
    val bands = hashed.select(col("media_id"), col("ahash"),
      explode(array((0 until nBands).map { bi =>
        val lo = bi * 32 / nBands
        val hi = (bi + 1) * 32 / nBands
        struct(lit(bi).as("band_idx"),
          shiftright(col("ahash"), lo)
            .bitwiseAND((1L << (hi - lo)) - 1L).as("band_key"))
      }: _*)).as("b"))
      .select(col("media_id"), col("ahash"), col("b.band_idx"), col("b.band_key"))
      .localCheckpoint(true)
    val nCand = bands.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("m"))
      .agg(coalesce(
        sum(col("m").cast("double") * (col("m") - 1).cast("double") / 2.0),
        lit(0.0)))
      .head().getDouble(0)
    if (nCand > maxCandidatePairs.toDouble)
      throw new IllegalStateException(
        f"perceptualHashPairs: band-bucket candidate volume $nCand%.0f " +
          s"exceeds the $maxCandidatePairs budget — mean-threshold bits " +
          "have collapsed onto few buckets (structurally uniform corpus). " +
          "Pre-block by payload size class, widen the hash, or raise " +
          "maxCandidatePairs.")
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash").as("h_a"), col("b.ahash").as("h_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Column-expression twin of the stub decode (codegen'd, used by the
    * oracle-checked query m01 — same arithmetic as Deterministic).
    */
  def fakeDecodeColumns(payload: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    val n = octet_length(payload).cast("long")
    Seq(
      n.as("n_bytes"),
      (lit(64L) + n % 577).as("width"),
      (lit(64L) + (n * 31) % 433).as("height"),
      when(n % 3 === 0, "png").when(n % 3 === 1, "jpeg").otherwise("webp").as("format"))
  }

  /** Strided 2-D tile extraction (m16) — the crop/patch primitive a
    * vision-training pipeline runs over every image (ViT patches,
    * sliding-window detection crops, thumbnail grids). The payload is
    * viewed as a row-major byte image (`rowBytes` per row); tiles are
    * `tileRows` rows × `tileCols` bytes, so each tile's content is a
    * concatenation of `tileRows` NON-CONTIGUOUS row slices — the real
    * strided-access shape a crop performs, not the contiguous frame
    * slicing m03/m07 already prove. The whole grid is one generated
    * pass per media row (explode of the tile coordinates + an
    * `aggregate` fold building each tile from bounded `substring`
    * slices); payload bytes never shuffle — tiles reduce to a 32-char
    * checksum + coordinates before anything leaves the scan, the
    * multimodal ground rule. Edge tiles clip at the payload end
    * (substring past-end yields empty); all-empty tiles (a tile_x
    * column entirely beyond a short payload) are dropped.
    *
    * Output: (media_id, tile_x, tile_y, tile_md5, tile_bytes) —
    * tile_md5 over the shared uppercase-hex byte view (the m07
    * cross-engine convention).
    */
  def tileChecksums(media: DataFrame, rowBytes: Int = 64,
      tileRows: Int = 16, tileCols: Int = 32): DataFrame = {
    require(rowBytes > 0 && tileRows > 0 && tileCols > 0,
      s"tile geometry must be positive (got $rowBytes, $tileRows, $tileCols)")
    require(rowBytes % tileCols == 0,
      s"tileCols ($tileCols) must divide rowBytes ($rowBytes)")
    val tilesX = rowBytes / tileCols
    media
      .select(col("media_id"), col("payload"),
        expr(s"(octet_length(payload) + ${rowBytes - 1}) div $rowBytes")
          .as("__nrows"))
      .where(col("__nrows") > 0)
      .select(col("media_id"), col("payload"),
        explode(expr(
          s"sequence(0, (__nrows + ${tileRows - 1}) div $tileRows - 1)"))
          .as("tile_y"))
      .select(col("media_id"), col("payload"), col("tile_y"),
        explode(expr(s"sequence(0, ${tilesX - 1})")).as("tile_x"))
      .withColumn("__tile", expr(
        // offset math in BIGINT: (tile_y·tileRows + r)·rowBytes on a
        // payload approaching 2 GiB overflows 32-bit arithmetic BEFORE
        // a trailing cast, yielding negative offsets instead of the
        // intended clean past-end clip — so promote first, clamp the
        // final byte offset to the INT range substring needs (any
        // offset past 2^31 is past every payload's end anyway)
        s"""aggregate(sequence(0, ${tileRows - 1}), cast('' as binary),
           |  (acc, r) -> concat(acc, substring(payload,
           |    cast(least((cast(tile_y as bigint) * $tileRows + r) * $rowBytes
           |      + cast(tile_x as bigint) * $tileCols + 1,
           |      2147483647) as int), $tileCols)))""".stripMargin))
      .where(octet_length(col("__tile")) > 0)
      .select(col("media_id"),
        col("tile_x").cast("long").as("tile_x"),
        col("tile_y").cast("long").as("tile_y"),
        md5(hex(col("__tile"))).as("tile_md5"),
        octet_length(col("__tile")).cast("long").as("tile_bytes"))
  }
}
