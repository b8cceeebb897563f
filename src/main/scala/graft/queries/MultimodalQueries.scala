package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.sources.Tables

/** Multimodal pack (SURVEY §2C): binary payload columns + typed
  * metadata. m01–m03 run the documents' text bytes through the
  * deterministic stub decoder (decode arithmetic shared between the
  * mapPartitions operator, the codegen'd column variant, and the DuckDB
  * oracle); m04 drives the REAL `javax.imageio` codec end-to-end —
  * executor-side PNG encode of arithmetically chosen dimensions, real
  * header decode back — under a pure-arithmetic oracle.
  */
object MultimodalQueries {

  /** m10's quiet-window threshold — ONE definition for the Spark flow
    * and the oracle; sits near the corpus's 25th energy percentile so
    * both single- and multi-window segments occur at every SF.
    */
  private val SilenceMaxEnergy = 195000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the RESIZE primitive (+ feature extract composed): nearest-
    // neighbor resample of each payload to 64 sample positions
    // (pos_i = (i·n) div 64 — the thumbnailing rule at any size, down-
    // OR up-sampling), then the m05 energy feature over the thumbnail.
    // Exact integer arithmetic; the oracle replays the byte probes via
    // hex slicing, so the resample positions are hash-verified
    "m06_thumbnail_energy" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
        .where(octet_length(col("payload")) > 0)
        .select(col("media_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          expr("""aggregate(transform(transform(sequence(0, 63),
              i -> CAST(conv(hex(substring(payload,
                CAST((i * octet_length(payload)) div 64 AS INT) + 1, 1)),
                16, 10) AS BIGINT)),
              v -> (v - 128L) * (v - 128L)),
            0L, (acc, x) -> acc + x)""").as("thumb_energy"))
        .orderBy("media_id")
    }),

    "m01_media_metadata" -> ((s, d) => {
      val media = Tables.load(s, d, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      val decoded = media.select(
        col("media_id") +: Multimodal.fakeDecodeColumns(col("payload")): _*)
      val frames = Multimodal.sampleFrames(media, strideBytes = 100)
        .select(col("media_id"), size(col("frames")).cast("long").as("n_frames"))
      decoded.join(frames, "media_id")
        .select("media_id", "n_bytes", "width", "height", "format", "n_frames")
        .orderBy("media_id")
    }),

    "m03_frame_bytes" -> ((s, d) => {
      // exercises the REAL frame extraction (substring slicing), not
      // just the count: total bytes across sampled frames must equal
      // the arithmetic the oracle states from payload length alone
      val media = Tables.load(s, d, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      Multimodal.sampleFrames(media, strideBytes = 100)
        .select(col("media_id"),
          size(col("frames")).cast("long").as("n_frames"),
          expr("aggregate(frames, 0L, (a, f) -> a + octet_length(f))").as("frame_bytes"))
        .orderBy("media_id")
    }),

    // keyframe stride sampling: every 3rd frame's CONTENT checksummed
    // (md5 over the shared uppercase-hex byte view) — proves the
    // sampled slices are byte-identical in both engines, not merely
    // counted; skipped frames are never materialized
    "m07_keyframe_checksums" -> ((s, d) => {
      val media = Tables.load(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
      Multimodal.keyframeChecksums(media, strideBytes = 100, every = 3)
        .orderBy("media_id", "frame_idx")
    }),

    // exact frame dedup across media — d01's rule on binary frames:
    // a frame is duplicated iff its content checksum occurs at >= 2
    // corpus positions (copies, loops, shared intros); checksums
    // shuffle, payload bytes never do
    "m08_frame_dedup" -> ((s, d) => {
      val media = Tables.load(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
      Multimodal.frameDedupProfile(media, strideBytes = 100)
        .orderBy("media_id")
    }),

    // silence segmentation — the VAD/silence-trim REGION view of m05's
    // energy profile: consecutive quiet windows (energy <= the shared
    // threshold) collapse to one segment row via the relational
    // island trick (win_idx - row_number is constant within a run);
    // at the chosen threshold the verify corpus yields both single-
    // and multi-window segments, so the run-length grouping is
    // exercised, not vacuous
    "m10_silence_segments" -> ((s, d) => {
      val media = Tables.load(s, d, "documents")
        .where(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
      Multimodal.silenceSegments(media, windowBytes = 100,
          maxEnergy = SilenceMaxEnergy)
        .orderBy("media_id", "start_win")
    }),

    // perceptual near-dup detection — aHash over the 32-position
    // thumbnail (mean-threshold bits, the LAION-style image-dedup
    // primitive) + d03's band join and hamming verify, on binary.
    // Twins (+1M) get ONE leading byte swapped: gross byte structure
    // survives, so the twin lands within small hamming of its source
    // — the pair exact frame dedup (m08) can't see, found without
    // payload bytes ever shuffling
    "m09_phash_neardup" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
        .where(col("text").isNotNull && length(col("text")) > 0)
      DedupQueries.requireDisjointShift(docs, "doc_id", 1000000L)
      val media = docs
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
        .unionByName(docs.select((col("doc_id") + 1000000).as("media_id"),
          concat(lit("Z"), expr("substring(text, 2)")).cast("binary")
            .as("payload")))
      Multimodal.perceptualHashPairs(media, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // REAL codec round-trip: dimensions chosen arithmetically -> PNG
    // bytes encoded on executors (javax.imageio) -> decoded back by the
    // real ImageIo decoder. The oracle states the dimensions from
    // arithmetic alone, so a decoder (or encoder) regression breaks the
    // hash-match; payload byte size is encoder-specific and excluded.
    "m04_imageio_roundtrip" -> ((s, d) => {
      val dims = Tables.load(s, d, "documents").where(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"),
          (lit(8) + col("doc_id") % 32).cast("int").as("width"),
          (lit(8) + col("doc_id") % 16).cast("int").as("height"))
      Multimodal.decodeFeatures(Multimodal.encodePng(dims),
          Multimodal.MediaDecoder.ImageIo)
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("format"))
        .orderBy("media_id")
    }),

    // REAL audio container round-trip (the m04 pattern for WAV/RIFF):
    // samples chosen arithmetically (alternating 25-sample silence /
    // tone stretches) -> genuine RIFF/WAVE PCM8 bytes encoded on
    // executors -> decoded back by the real chunk-walking parser ->
    // the m05/m10 energy family runs ON THE EXTRACTED PCM. The oracle
    // states rates, sample counts, energies and silence segments from
    // arithmetic alone, so a header-math or chunk-walk regression
    // anywhere in the container loop breaks the hash-match.
    "m11_wav_roundtrip" -> ((s, d) => {
      val spec = Tables.load(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id").as("media_id"))
        .withColumn("sample_rate",
          (lit(8000) + (col("media_id") % 3) * 4000).cast("int"))
        .withColumn("samples", expr(
          """transform(sequence(0, CAST(100 + (media_id % 5) * 50 AS INT) - 1),
            |  i -> CAST(IF((i div 25) % 2 = 0, 128,
            |    128 + (media_id + i) % 40) AS INT))""".stripMargin))
      val decoded = Multimodal.decodeWav(Multimodal.encodeWav(spec))
        .localCheckpoint(true) // feeds the header stats AND both DSP consumers
      val pcm = decoded.select(col("media_id"), col("pcm").as("payload"))
      val energy = Multimodal.windowEnergy(pcm, windowBytes = 25)
        .select(col("media_id"), col("n_windows"), col("total_energy"))
      val sil = Multimodal
        .silenceSegments(pcm, windowBytes = 25, maxEnergy = 0L)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_silence_segments"),
          sum("n_windows").as("n_silent_windows"))
      decoded.select(col("media_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_channels").cast("long").as("n_channels"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("n_samples"))
        .join(energy, "media_id")
        .join(sil, Seq("media_id"), "left")
        .select(col("media_id"), col("sample_rate"), col("n_channels"),
          col("bits_per_sample"), col("n_samples"), col("n_windows"),
          col("total_energy"),
          coalesce(col("n_silence_segments"), lit(0L)).as("n_silence_segments"),
          coalesce(col("n_silent_windows"), lit(0L)).as("n_silent_windows"))
        .orderBy("media_id")
    }),

    // m11's 16-BIT + STEREO face: real corpora are 16-bit PCM, so the
    // codec round-trips signed 16-bit samples (stereo for 2/3 of the
    // media — the stereo probe — mono for the rest), and the decoder's
    // normalized `pcm8` stream ((l+r)>>1 downmix then (s>>8)+128
    // downconversion, both floor divisions so the oracle restates them
    // as floor() arithmetic) feeds the UNCHANGED m05 energy operator.
    "m12_wav16_stereo_roundtrip" -> ((s, d) => {
      val spec = Tables.load(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id").as("media_id"))
        .withColumn("sample_rate",
          (lit(16000) + (col("media_id") % 2) * 28100).cast("int"))
        .withColumn("n", (lit(80) + (col("media_id") % 4) * 40).cast("int"))
        .withColumn("left", expr(
          """transform(sequence(0, n - 1),
            |  i -> CAST(((media_id * 131 + CAST(i AS BIGINT) * 257) % 65536)
            |    - 32768 AS INT))""".stripMargin))
        .withColumn("right", expr(
          """IF(media_id % 3 = 0, CAST(NULL AS ARRAY<INT>),
            |  transform(sequence(0, n - 1),
            |    i -> CAST(((media_id * 37 + CAST(i AS BIGINT) * 101) % 65536)
            |      - 32768 AS INT)))""".stripMargin))
      val decoded = Multimodal.decodeWav(Multimodal.encodeWav16(spec))
        .localCheckpoint(true) // feeds the header stats AND the DSP consumer
      val pcm8 = decoded.select(col("media_id"), col("pcm8").as("payload"))
      val energy = Multimodal.windowEnergy(pcm8, windowBytes = 20)
        .select(col("media_id"), col("n_windows"), col("total_energy"))
      decoded.select(col("media_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_channels").cast("long").as("n_channels"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("n_samples"))
        .join(energy, "media_id")
        .orderBy("media_id")
    }),

    // scene-change segmentation — the video cut detector over the m07
    // frame layout: per-frame integer energy signatures, a cut where
    // |Δenergy| > 5000 between consecutive frames, scenes = runs
    // between cuts via a per-media running cut count
    "m13_scene_segments" -> ((s, d) => {
      val media = Tables.load(s, d, "documents")
        .where(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
      Multimodal.sceneSegments(media, strideBytes = 100, minDelta = 5000L)
        .orderBy("media_id", "scene_idx")
    }),

    "m02_media_by_format" -> ((s, d) => {
      val media = Tables.load(s, d, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      media.select(col("media_id") +: Multimodal.fakeDecodeColumns(col("payload")): _*)
        .groupBy("format")
        .agg(count(lit(1)).as("n_media"),
          sum("n_bytes").as("total_bytes"),
          min("width").as("min_width"),
          max("height").as("max_height"))
        .orderBy("format")
    }),

    // audio-shaped DSP: windowed energy profile (the voice-activity /
    // silence-trim primitive) over PCM8 stub payloads — exact integer
    // Σ(sample-128)² per 100-byte window, bytes read through hex()
    // identically in both engines, so even this signal-processing
    // query is oracle-exact
    // 2:1 box-filter decimation (m14): the m11 synthetic corpus run
    // through encode → decode → pcm8_decimate (average-then-drop in
    // one generated pass) with the m05 energy profile measured on
    // BOTH rates — the resample every audio pipeline runs before
    // feature extraction, as a codegen'd expression instead of a
    // per-sample shuffle. Unsigned bytes make floor and truncating
    // division agree, so the oracle's `//` replays each output
    // sample; the energy windows inherit the m05 full-windows rule
    // (the decimated stream's partial tail window is dropped by both
    // engines).
    "m14_resample_decimate" -> ((s, d) => {
      val spec = Tables.load(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id").as("media_id"))
        .withColumn("sample_rate",
          (lit(8000) + (col("media_id") % 3) * 4000).cast("int"))
        .withColumn("samples", expr(
          """transform(sequence(0, CAST(100 + (media_id % 5) * 50 AS INT) - 1),
            |  i -> CAST(IF((i div 25) % 2 = 0, 128,
            |    128 + (media_id + i) % 40) AS INT))""".stripMargin))
      val decoded = Multimodal.decodeWav(Multimodal.encodeWav(spec))
        .localCheckpoint(true) // feeds both rates' energy consumers
      val pcm = decoded.select(col("media_id"), col("pcm").as("payload"))
      val deci = pcm.select(col("media_id"),
        graft.functions.MediaExpressions.pcm8_decimate(col("payload"))
          .as("payload"))
      val eIn = Multimodal.windowEnergy(pcm, windowBytes = 25)
        .select(col("media_id"), col("n_windows").as("in_windows"),
          col("total_energy").as("in_energy"))
      val eOut = Multimodal.windowEnergy(deci, windowBytes = 25)
        .select(col("media_id"), col("n_windows").as("out_windows"),
          col("total_energy").as("out_energy"))
      decoded.select(col("media_id"), col("n_samples"))
        .withColumn("n_out", expr("(n_samples + 1) div 2"))
        .join(eIn, Seq("media_id")).join(eOut, Seq("media_id"))
        .orderBy("media_id")
    }),

    // peak (gain) normalization (m15): the m11 corpus levelled to
    // full scale in one generated pass — the step that makes energy
    // thresholds comparable across recordings. Peaks are read through
    // the EXISTING energy expression at windowBytes = 1 (a 1-byte
    // window's energy IS the squared sample magnitude, so max over
    // the profile = peak² — no new operator needed for the gate);
    // magnitude-scaled integer division keeps truncation and the
    // oracle's floor in agreement.
    "m15_peak_normalize" -> ((s, d) => {
      import graft.functions.MediaExpressions
      val spec = Tables.load(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id").as("media_id"))
        .withColumn("sample_rate",
          (lit(8000) + (col("media_id") % 3) * 4000).cast("int"))
        .withColumn("samples", expr(
          """transform(sequence(0, CAST(100 + (media_id % 5) * 50 AS INT) - 1),
            |  i -> CAST(IF((i div 25) % 2 = 0, 128,
            |    128 + (media_id + i) % 40) AS INT))""".stripMargin))
      val decoded = Multimodal.decodeWav(Multimodal.encodeWav(spec))
        .localCheckpoint(true)
      val pcm = decoded.select(col("media_id"), col("n_samples"),
        col("pcm").as("payload"))
      val norm = pcm.select(col("media_id"),
        MediaExpressions.pcm8_normalize(col("payload")).as("payload"))
      def profile(df: DataFrame, peakName: String, totName: String) =
        df.select(col("media_id"),
          MediaExpressions.pcm8_window_energy(col("payload"), 1).as("es"))
          .select(col("media_id"), array_max(col("es")).as(peakName),
            expr("aggregate(es, 0L, (a, e) -> a + e)").as(totName))
      pcm.select(col("media_id"), col("n_samples"))
        .join(profile(pcm, "peak_in_sq", "in_energy"), Seq("media_id"))
        .join(profile(norm, "peak_out_sq", "out_energy"), Seq("media_id"))
        .orderBy("media_id")
    }),

    "m05_audio_energy" -> ((s, d) => {
      val media = Tables.load(s, d, "documents")
        .where(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
      Multimodal.windowEnergy(media, windowBytes = 100)
        .orderBy("media_id")
    }),

    // strided 2-D tile extraction — the ViT-patch/crop primitive:
    // each tile concatenates 16 NON-contiguous 32-byte row slices of
    // the 64-byte-wide byte image (real strided access, not m03's
    // contiguous frames); checksums leave the scan, payload bytes
    // never shuffle
    "m16_image_tiles" -> ((s, d) => {
      val media = Tables.load(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
      Multimodal.tileChecksums(media, rowBytes = 64,
          tileRows = 16, tileCols = 32)
        .orderBy("media_id", "tile_y", "tile_x")
    }),
  )

  private val decodeCte =
    """m AS (SELECT doc_id AS media_id, encode(text) AS payload FROM documents),
      |d AS (SELECT media_id,
      |    CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      |    64 + CAST(octet_length(payload) AS BIGINT) % 577 AS width,
      |    64 + (CAST(octet_length(payload) AS BIGINT) * 31) % 433 AS height,
      |    CASE CAST(octet_length(payload) AS BIGINT) % 3
      |      WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      |  FROM m)""".stripMargin

  val oracles: Map[String, String] = Map(
    "m06_thumbnail_energy" ->
      """WITH b AS (SELECT doc_id AS media_id,
        |    hex(CAST(text AS BLOB)) AS hx,
        |    octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents WHERE octet_length(CAST(text AS BLOB)) > 0)
        |SELECT media_id, CAST(n AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(
        |    list_transform(range(64), i ->
        |      ('0x' || substr(hx, 2 * ((i * n) // 64) + 1, 2))::BIGINT),
        |    v -> (v - 128) * (v - 128))) AS BIGINT) AS thumb_energy
        |FROM b ORDER BY media_id""".stripMargin,

    "m01_media_metadata" ->
      s"""WITH $decodeCte
         |SELECT media_id, n_bytes, width, height, format,
         |  greatest(n_bytes // 100, 1) AS n_frames
         |FROM d ORDER BY media_id""".stripMargin,

    "m03_frame_bytes" ->
      s"""WITH $decodeCte
         |SELECT media_id, greatest(n_bytes // 100, 1) AS n_frames,
         |  CASE WHEN n_bytes < 100 THEN n_bytes ELSE (n_bytes // 100) * 100 END AS frame_bytes
         |FROM d ORDER BY media_id""".stripMargin,

    // frame bytes sliced out of the hex rendering (2 hex chars/byte);
    // md5 over that hex string matches Spark's md5(hex(frame))
    "m07_keyframe_checksums" ->
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hxp,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |f AS (SELECT media_id, hxp, greatest(n_bytes // 100, 1) AS n FROM m),
        |k AS (SELECT media_id, hxp, (i - 1) * 3 AS fi FROM f,
        |  unnest(generate_series(1, ((n - 1) // 3) + 1)) AS g(i))
        |SELECT media_id, CAST(fi AS BIGINT) AS frame_idx,
        |  md5(substr(hxp, fi * 200 + 1, 200)) AS frame_md5,
        |  CAST(length(substr(hxp, fi * 200 + 1, 200)) // 2 AS BIGINT)
        |    AS frame_len
        |FROM k ORDER BY media_id, frame_idx""".stripMargin,

    // m07's frame enumeration with every frame kept (every = 1), then
    // the d14-shaped occurrence count + join
    "m08_frame_dedup" ->
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hxp,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |f AS (SELECT media_id, hxp, greatest(n_bytes // 100, 1) AS n FROM m),
        |k AS (SELECT media_id,
        |    md5(substr(hxp, (i - 1) * 200 + 1, 200)) AS frame_md5
        |  FROM f, unnest(generate_series(1, n)) AS g(i)),
        |occ AS (SELECT frame_md5, count(*) AS occ FROM k GROUP BY 1)
        |SELECT media_id, count(*) AS n_frames,
        |  CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_frames,
        |  CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(count(*) AS DOUBLE) AS dup_fraction
        |FROM k JOIN occ USING (frame_md5)
        |GROUP BY media_id ORDER BY media_id""".stripMargin,

    // m05's window/hex/energy CTEs + the same island trick
    "m10_silence_segments" ->
      s"""WITH media AS (SELECT doc_id AS media_id, hex(encode(text)) AS hxp,
         |    octet_length(encode(text)) AS n
         |  FROM documents WHERE length(text) > 0),
         |wins AS (SELECT media_id, i AS win_idx,
         |    substr(hxp, (i - 1) * 200 + 1, 200) AS hx
         |  FROM media,
         |    unnest(generate_series(1, greatest(n // 100, 1))) AS g(i)),
         |en AS (SELECT media_id, win_idx,
         |    CAST(list_sum(list_transform(generate_series(1, length(hx) // 2),
         |      j -> (('0x' || substr(hx, 2 * j - 1, 2))::BIGINT - 128)
         |         * (('0x' || substr(hx, 2 * j - 1, 2))::BIGINT - 128))) AS BIGINT) AS e
         |  FROM wins),
         |sil AS (SELECT media_id, win_idx, e,
         |    win_idx - row_number() OVER (PARTITION BY media_id
         |      ORDER BY win_idx) AS isl
         |  FROM en WHERE e <= $SilenceMaxEnergy)
         |SELECT media_id, CAST(min(win_idx) AS BIGINT) AS start_win,
         |  CAST(max(win_idx) AS BIGINT) AS end_win,
         |  count(*) AS n_windows,
         |  CAST(sum(e) AS BIGINT) AS segment_energy
         |FROM sil GROUP BY media_id, isl
         |ORDER BY media_id, start_win""".stripMargin,

    // same thumbnail positions (bytes via hex slicing), same
    // mean-threshold bit rule (32·v_i >= Σv — no division), same
    // 4x8-bit band join and bit_count(xor) verify
    "m09_phash_neardup" -> {
      val bandRows = (0 until 4).map { bi =>
        s"SELECT media_id, ahash, $bi AS band_idx, (ahash >> ${bi * 8}) & 255 AS band_key FROM h"
      }.mkString("\n  UNION ALL ")
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL AND length(text) > 0),
         |m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         |    octet_length(encode(text)) AS n FROM docs
         |  UNION ALL SELECT doc_id + 1000000,
         |    hex(encode('Z' || substr(text, 2))),
         |    octet_length(encode('Z' || substr(text, 2))) FROM docs),
         |v AS (SELECT media_id, list_transform(range(32),
         |    i -> ('0x' || substr(hx, 2 * ((i * n) // 32) + 1, 2))::BIGINT) AS v
         |  FROM m WHERE n > 0),
         |sv AS (SELECT media_id, v, CAST(list_sum(v) AS BIGINT) AS s FROM v),
         |h AS (SELECT media_id, CAST(list_sum(list_transform(range(32),
         |    i -> CASE WHEN 32 * v[i + 1] >= s
         |      THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
         |    AS BIGINT) AS ahash FROM sv),
         |bands AS (
         |  $bandRows),
         |cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         |    a.ahash AS ha, b.ahash AS hb
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |      AND a.media_id < b.media_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
         |ORDER BY id_a, id_b""".stripMargin
    },

    "m04_imageio_roundtrip" ->
      """SELECT doc_id AS media_id,
        |  CAST(8 + doc_id % 32 AS BIGINT) AS width,
        |  CAST(8 + doc_id % 16 AS BIGINT) AS height,
        |  'png' AS format
        |FROM documents WHERE doc_id < 100 ORDER BY media_id""".stripMargin,

    // everything from arithmetic: the WAV layer must hand the samples
    // back exactly, so the energy/silence numbers double as a byte-
    // level check on the RIFF header math and chunk walk. Windows are
    // 25 samples; even window ordinals are all-128 (silent, energy 0),
    // odd ones carry ((media_id+i) % 40)-amplitude tones; n is a
    // multiple of 25, so silent windows are isolated single-window
    // islands — n_windows/2 of each
    "m11_wav_roundtrip" ->
      """WITH p AS (SELECT doc_id AS media_id,
        |    8000 + (doc_id % 3) * 4000 AS sample_rate,
        |    100 + (doc_id % 5) * 50 AS n
        |  FROM documents WHERE doc_id < 300)
        |SELECT media_id,
        |  CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(8 AS BIGINT) AS bits_per_sample,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(n // 25 AS BIGINT) AS n_windows,
        |  CAST(list_sum(list_transform(range(n), i ->
        |    CASE WHEN (i // 25) % 2 = 1
        |      THEN ((media_id + i) % 40) * ((media_id + i) % 40)
        |      ELSE 0 END)) AS BIGINT) AS total_energy,
        |  CAST(n // 50 AS BIGINT) AS n_silence_segments,
        |  CAST(n // 50 AS BIGINT) AS n_silent_windows
        |FROM p ORDER BY media_id""".stripMargin,

    // the sample formulas replayed arithmetically; pcm8 deviation
    // v = floor((l+r)/512) stereo / floor(l/256) mono (the composed
    // floor divisions the engine's arithmetic shifts compute), window
    // energy = Σ v² per 20-frame window
    // per-media peak from the sample formula, the magnitude-scaled
    // rewrite (non-negative operands, so `//` == the engine's
    // truncation), peaks and energies over the full stream
    "m15_peak_normalize" ->
      """WITH p AS (SELECT doc_id AS media_id,
        |    100 + (doc_id % 5) * 50 AS n
        |  FROM documents WHERE doc_id < 300),
        |s AS (SELECT media_id, n, i,
        |    CASE WHEN (i // 25) % 2 = 0 THEN 0
        |         ELSE (media_id + i) % 40 END AS d
        |  FROM p, unnest(generate_series(0, n - 1)) AS g(i)),
        |pk AS (SELECT media_id, max(d) AS peak FROM s GROUP BY 1),
        |o AS (SELECT s.media_id, s.n, s.d,
        |    CASE WHEN pk.peak = 0 THEN s.d
        |         ELSE (s.d * 127) // pk.peak END AS m
        |  FROM s JOIN pk USING (media_id))
        |SELECT media_id, CAST(max(n) AS BIGINT) AS n_samples,
        |  CAST(max(d * d) AS BIGINT) AS peak_in_sq,
        |  CAST(max(m * m) AS BIGINT) AS peak_out_sq,
        |  CAST(sum(d * d) AS BIGINT) AS in_energy,
        |  CAST(sum(m * m) AS BIGINT) AS out_energy
        |FROM o GROUP BY media_id ORDER BY media_id""".stripMargin,

    // the m11 sample formula, each output sample restated as the
    // pair-average (`//` == the engine's truncating division —
    // operands non-negative), full-windows energy on both rates
    "m14_resample_decimate" ->
      """WITH p AS (SELECT doc_id AS media_id,
        |    100 + (doc_id % 5) * 50 AS n
        |  FROM documents WHERE doc_id < 300),
        |s AS (SELECT media_id, n, i,
        |    CASE WHEN (i // 25) % 2 = 0 THEN 128
        |         ELSE 128 + (media_id + i) % 40 END AS v
        |  FROM p, unnest(generate_series(0, n - 1)) AS g(i)),
        |d AS (SELECT a.media_id, a.n, a.i // 2 AS j,
        |    CASE WHEN b.v IS NULL THEN a.v ELSE (a.v + b.v) // 2 END AS v
        |  FROM s a LEFT JOIN s b
        |    ON b.media_id = a.media_id AND b.i = a.i + 1
        |  WHERE a.i % 2 = 0),
        |ein AS (SELECT media_id,
        |    CAST(sum((v - 128) * (v - 128)) AS BIGINT) AS in_energy
        |  FROM s WHERE i < (n // 25) * 25 GROUP BY 1),
        |eout AS (SELECT media_id,
        |    CAST(sum((v - 128) * (v - 128)) AS BIGINT) AS out_energy
        |  FROM d WHERE j < (((n + 1) // 2) // 25) * 25 GROUP BY 1)
        |SELECT p.media_id,
        |  CAST(p.n AS BIGINT) AS n_samples,
        |  CAST((p.n + 1) // 2 AS BIGINT) AS n_out,
        |  CAST(p.n // 25 AS BIGINT) AS in_windows,
        |  ein.in_energy,
        |  CAST(((p.n + 1) // 2) // 25 AS BIGINT) AS out_windows,
        |  eout.out_energy
        |FROM p JOIN ein USING (media_id) JOIN eout USING (media_id)
        |ORDER BY media_id""".stripMargin,

    "m12_wav16_stereo_roundtrip" ->
      """WITH p AS (SELECT doc_id AS media_id,
        |    16000 + (doc_id % 2) * 28100 AS sample_rate,
        |    80 + (doc_id % 4) * 40 AS n,
        |    (doc_id % 3) <> 0 AS stereo
        |  FROM documents WHERE doc_id < 300),
        |s AS (SELECT media_id, stereo, i,
        |    ((media_id * 131 + i * 257) % 65536) - 32768 AS l,
        |    ((media_id * 37 + i * 101) % 65536) - 32768 AS r
        |  FROM p, unnest(generate_series(0, n - 1)) AS g(i)),
        |b AS (SELECT media_id, i // 20 AS w,
        |    CASE WHEN stereo THEN CAST(floor((l + r) / 512.0) AS BIGINT)
        |         ELSE CAST(floor(l / 256.0) AS BIGINT) END AS v
        |  FROM s),
        |en AS (SELECT media_id, w, sum(v * v) AS e FROM b GROUP BY 1, 2),
        |tot AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_windows,
        |    CAST(sum(e) AS BIGINT) AS total_energy
        |  FROM en GROUP BY 1)
        |SELECT p.media_id,
        |  CAST(p.sample_rate AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN p.stereo THEN 2 ELSE 1 END AS BIGINT) AS n_channels,
        |  CAST(16 AS BIGINT) AS bits_per_sample,
        |  CAST(p.n AS BIGINT) AS n_samples,
        |  t.n_windows, t.total_energy
        |FROM p JOIN tot t USING (media_id) ORDER BY media_id""".stripMargin,

    // same hex byte extraction and integer energy as m05, then the
    // cut/run windows restated verbatim (lag + running sum)
    "m13_scene_segments" ->
      """WITH media AS (SELECT doc_id AS media_id, hex(encode(text)) AS hxp,
        |    octet_length(encode(text)) AS n
        |  FROM documents WHERE length(text) > 0),
        |f AS (SELECT media_id, i - 1 AS frame_idx,
        |    substr(hxp, (i - 1) * 200 + 1, 200) AS hx
        |  FROM media,
        |    unnest(generate_series(1, greatest(n // 100, 1))) AS g(i)),
        |en AS (SELECT media_id, frame_idx,
        |    CAST(list_sum(list_transform(generate_series(1, length(hx) // 2),
        |      j -> (('0x' || substr(hx, 2 * j - 1, 2))::BIGINT - 128)
        |         * (('0x' || substr(hx, 2 * j - 1, 2))::BIGINT - 128))) AS BIGINT) AS energy
        |  FROM f),
        |cuts AS (SELECT media_id, frame_idx, energy,
        |    CASE WHEN lag(energy) OVER w IS NOT NULL
        |          AND abs(energy - lag(energy) OVER w) > 5000
        |      THEN 1 ELSE 0 END AS cut
        |  FROM en WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
        |sc AS (SELECT media_id, frame_idx, energy,
        |    CAST(sum(cut) OVER (PARTITION BY media_id
        |      ORDER BY frame_idx) AS BIGINT) AS scene_idx
        |  FROM cuts)
        |SELECT media_id, scene_idx,
        |  min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
        |  count(*) AS n_frames, CAST(sum(energy) AS BIGINT) AS scene_energy
        |FROM sc GROUP BY 1, 2 ORDER BY media_id, scene_idx""".stripMargin,

    "m02_media_by_format" ->
      s"""WITH $decodeCte
         |SELECT format, count(*) AS n_media,
         |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         |  CAST(min(width) AS BIGINT) AS min_width,
         |  CAST(max(height) AS BIGINT) AS max_height
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // same windows, same hex byte extraction, same integer energy.
    // DuckDB has no BLOB substring, so windows are sliced from the
    // payload's FULL hex string (2 chars/byte — position and clamp
    // semantics line up with Spark's binary substring exactly)
    "m05_audio_energy" ->
      """WITH media AS (SELECT doc_id AS media_id, hex(encode(text)) AS hxp,
        |    octet_length(encode(text)) AS n
        |  FROM documents WHERE length(text) > 0),
        |wins AS (SELECT media_id,
        |    substr(hxp, (i - 1) * 200 + 1, 200) AS hx
        |  FROM media,
        |    unnest(generate_series(1, greatest(n // 100, 1))) AS g(i)),
        |en AS (SELECT media_id,
        |    CAST(list_sum(list_transform(generate_series(1, length(hx) // 2),
        |      j -> (('0x' || substr(hx, 2 * j - 1, 2))::BIGINT - 128)
        |         * (('0x' || substr(hx, 2 * j - 1, 2))::BIGINT - 128))) AS BIGINT) AS e
        |  FROM wins)
        |SELECT media_id, count(*) AS n_windows,
        |  CAST(sum(e) AS BIGINT) AS total_energy,
        |  max(e) AS peak_energy,
        |  CAST(sum(e) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_energy
        |FROM en GROUP BY 1 ORDER BY 1""".stripMargin,

    // tile content replayed in the hex view: a tile's md5 is over the
    // ORDERED concatenation of its 16 row slices (string_agg ORDER BY
    // r); hex(concat(bytes)) == concat(hex(bytes)), so md5(hex view)
    // matches Spark's md5(hex(tile)); substr past the payload end
    // yields '' in both engines (the clip semantics)
    "m16_image_tiles" ->
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hxp,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |f AS (SELECT media_id, hxp, (n_bytes + 63) // 64 AS nrows
        |  FROM m WHERE n_bytes > 0),
        |g AS (SELECT media_id, hxp, ty, tx
        |  FROM f,
        |    unnest(generate_series(0, (nrows + 15) // 16 - 1)) t1(ty),
        |    unnest(generate_series(0, 1)) t2(tx)),
        |r AS (SELECT media_id, tx, ty,
        |    string_agg(substr(hxp,
        |      CAST(((ty * 16 + q.r) * 64 + tx * 32) * 2 + 1 AS BIGINT),
        |      64), '' ORDER BY q.r) AS th
        |  FROM g, unnest(generate_series(0, 15)) q(r)
        |  GROUP BY 1, 2, 3)
        |SELECT media_id, CAST(tx AS BIGINT) AS tile_x,
        |  CAST(ty AS BIGINT) AS tile_y, md5(th) AS tile_md5,
        |  CAST(length(th) // 2 AS BIGINT) AS tile_bytes
        |FROM r WHERE length(th) > 0
        |ORDER BY media_id, tile_y, tile_x""".stripMargin,
  )
}
