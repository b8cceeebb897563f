package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Streaming operators driven end-to-end through MemoryStream micro
  * batches — watermark advance, window close, state update.
  */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  test("tumbling window closes after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(1, ts(5), 1, "click", 1.0, "{}"),
        Ev(2, ts(20), 1, "click", 2.0, "{}"))
      q.processAllAvailable()
      // advance watermark past hour 0 (event at min 80 -> wm = min 70)
      in.addData(Ev(3, ts(80), 2, "view", 3.0, "{}"))
      q.processAllAvailable()
      val out = spark.table("tumbling").collect()
      assert(out.length == 1) // hour-0 click window emitted, hour-1 still open
      val r = out.head
      assert(r.getAs[String]("event_type") == "click")
      assert(r.getAs[Long]("n_events") == 2L)
      assert(r.getAs[Long]("value_cents") == 300L)
    } finally q.stop()
  }

  test("session window merges events within gap, splits beyond it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionCounts(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at min 0 and 20 (gap 20 < 30 => one session),
      // then min 90 (> 30 gap => new session)
      in.addData(
        Ev(1, ts(0), 1, "click", 0, "{}"),
        Ev(2, ts(20), 1, "click", 0, "{}"),
        Ev(3, ts(90), 1, "click", 0, "{}"))
      q.processAllAvailable()
      in.addData(Ev(4, ts(240), 9, "view", 0, "{}")) // advance watermark
      q.processAllAvailable()
      val out = spark.table("sessions").where(col("user_id") === 1)
        .orderBy("session_start").collect()
      assert(out.length == 2)
      assert(out(0).getAs[Long]("n_events") == 2L)
      assert(out(0).getAs[Timestamp]("session_end") == ts(50)) // 20 + 30min gap
      assert(out(1).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("custom-state sessionization: data-path close, event-time-timeout close, session_window-equal bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionsWithState(in.toDF(), gapMinutes = 30,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("state_sessions")
      .outputMode(OutputMode.Append).start()
    def us(min: Int): Long = min * 60000000L
    try {
      // times start at min 100: a row at the epoch sits ON the initial
      // watermark and the stateful operator's late-row filter drops it.
      // user 1: min 100 + 120 (one session); user 2: min 105
      in.addData(
        Ev(1, ts(100), 1, "click", 0, "{}"),
        Ev(2, ts(120), 1, "click", 0, "{}"),
        Ev(3, ts(105), 2, "view", 0, "{}"))
      q.processAllAvailable()
      // user 1 at min 190: gap 70 >= 30 -> DATA-path close of
      // [100, 150); the watermark also reaches 180 >= user 2's
      // 105+30 timeout, which fires on the engine's follow-up trigger
      in.addData(Ev(4, ts(190), 1, "click", 0, "{}"))
      q.processAllAvailable()
      assert(spark.table("state_sessions").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet ==
        Set((1L, us(100), us(150), 2L), (2L, us(105), us(135), 1L)))
      // far-future event advances the watermark past user 1's open
      // 190+30 timeout; fires on the follow-up trigger
      in.addData(Ev(5, ts(700), 9, "view", 0, "{}"))
      q.processAllAvailable()
      val rows = spark.table("state_sessions").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // user 9's own session is still open -> absent (Append finality);
      // ends are last_ts + gap, the session_window rule e02 oracles
      assert(rows == Set(
        (1L, us(100), us(150), 2L),
        (1L, us(190), us(220), 1L),
        (2L, us(105), us(135), 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps one row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.dedupWithinWatermark(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(1, ts(1), 1, "click", 0, "{}"),
        Ev(2, ts(2), 1, "click", 0, "{}"), // dup key within watermark
        Ev(3, ts(3), 2, "view", 0, "{}"))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("streaming interval attribution matches the batch RangeJoin across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val windows = Seq((100L, 200L, "w1"), (150L, 250L, "w2"), (400L, 500L, "w3"))
      .toDF("lo", "hi", "wid")
    val in = MemoryStream[(Long, Long)] // (event_id, pt)
    val q = EventStreams.intervalAttribution(
        in.toDS().toDF("event_id", "pt"), "pt", windows, "lo", "hi",
        bucketWidth = 64L)
      .writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, 120L), (2L, 175L), (3L, 300L))
      q.processAllAvailable()
      in.addData((4L, 450L), (5L, 199L)) // later micro-batch, same static side
      q.processAllAvailable()
      val got = spark.table("attribution").select("event_id", "wid")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // 120 -> w1; 175 -> w1 AND w2 (overlap); 300 -> none; 450 -> w3;
      // 199 -> w1 (hi exclusive would drop 200) and w2
      assert(got == Set((1L, "w1"), (2L, "w1"), (2L, "w2"),
        (4L, "w3"), (5L, "w1"), (5L, "w2")), got)
    } finally q.stop()
  }

  test("streaming SCD2 point-in-time join matches the batch join across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val chg = Seq((1L, 0L, "one_v1"), (1L, 50L, "one_v2"),
      (2L, 0L, "two_v1"), (2L, 50L, "two_v2")).toDF("k", "eff", "v")
    val dim = graft.ops.Scd2.fromChangeLog(chg, "k", "eff", horizon = 100L)
    val in = MemoryStream[(Long, Long, Long)] // (fid, k, pt)
    val (joined, release) = graft.ops.Scd2.streamingPointInTimeJoin(
      in.toDS().toDF("fid", "k", "pt"), "pt", dim, "k", bucketWidth = 10L)
    val q = joined.writeStream.format("memory").queryName("scd2_stream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, 1L, 25L), (2L, 2L, 75L))
      q.processAllAvailable()
      in.addData((3L, 1L, 75L), (4L, 2L, 25L)) // same static dim, next batch
      q.processAllAvailable()
      val got = spark.table("scd2_stream").select("fid", "v")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // the keyed join must pick each fact's OWN key's valid version
      assert(got == Set((1L, "one_v1"), (2L, "two_v2"),
        (3L, "one_v2"), (4L, "two_v1")), got)
    } finally { q.stop(); release() }
  }

  test("trending scores reproduce the batch power-of-two decay rule across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600000000L // one hour in micros
    val in = MemoryStream[(Long, String, Long)]
    val q = EventStreams.trendingScores(in.toDS())
      .writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((0L, "click", 10L), (1L * h, "click", 20L))
      q.processAllAvailable()
      // later micro-batch: state carries the earlier buckets across
      // the batch boundary; for the 7h bucket the 1h bucket is exactly
      // at the horizon edge (age 6) and must be excluded
      in.addData((5L * h, "click", 5L), (7L * h, "click", 8L))
      q.processAllAvailable()
      val got = spark.table("trending").collect()
        .map(r => r.getLong(1) / h -> ((r.getLong(2), r.getLong(3)))).toMap
      // weights 2^(5-age): 0h alone -> 10*32; then 10*16+20*32;
      // at 5h ages are 5,4,0 -> 10*1+20*2+5*32; at 7h only 5h (age 2,
      // 8*weight... 5*8) and itself survive -> 5*8+8*32
      assert(got == Map(
        0L -> ((320L, 10L)),
        1L -> ((800L, 30L)),
        5L -> ((210L, 35L)),
        7L -> ((296L, 13L))), got)
    } finally q.stop()
  }

  test("spike flags reproduce the batch trailing-window rule across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = EventStreams.spikeFlags(in.toDS())
      .writeStream.format("memory").queryName("spike_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val h = 3600L * 1000000L
      in.addData((0 * h, "view", 10L), (1 * h, "view", 12L), (2 * h, "view", 11L))
      q.processAllAvailable()
      // state carries the trailing ring across the batch boundary:
      // hour 3 spikes (60*3 > 2*33), hour 4 sees the spike in its ring
      in.addData((3 * h, "view", 60L), (4 * h, "view", 12L))
      q.processAllAvailable()
      val out = spark.table("spike_stream").collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
      assert(out(0 * h) == ((0L, 0L, false)))  // empty frame never flags
      assert(out(1 * h) == ((1L, 10L, false)))
      assert(out(2 * h) == ((2L, 22L, false)))
      assert(out(3 * h) == ((3L, 33L, true)))  // 60*3 > 2*33
      assert(out(4 * h) == ((4L, 93L, false))) // 12*4 < 2*93

      // a late PARTIAL for hour 3 merges into the ring (never a second
      // entry) and re-emits the bucket's flag from the merged total
      in.addData((3 * h, "view", 10L))
      q.processAllAvailable()
      val rows3 = spark.table("spike_stream")
        .where(col("bucket_us") === 3 * h).collect()
      assert(rows3.length == 2) // original + refreshed row; consumers keep latest
      assert(rows3.map(_.getLong(2)).toSet == Set(60L, 70L))
      // the NEXT bucket must see hour 3 counted ONCE at its merged total
      in.addData((5 * h, "view", 10L))
      q.processAllAvailable()
      val r5 = spark.table("spike_stream").where(col("bucket_us") === 5 * h).head()
      assert(r5.getLong(3) == 5L)   // hours 0..4 — bucket 3 once
      assert(r5.getLong(4) == 115L) // 10 + 12 + 11 + 70 + 12
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val q = EventStreams.runningUserCounts(in.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, 100L), (1L, 200L), (2L, 50L))
      q.processAllAvailable()
      in.addData((1L, 300L))
      q.processAllAvailable()
      val last = spark.table("running")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last == Map(1L -> 3L, 2L -> 1L))
    } finally q.stop()
  }

  test("stream-stream click attribution joins within the window, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // offset from epoch: a row whose event time EQUALS the initial
    // watermark (0) is filtered as late before it reaches join state —
    // real feeds are never at 1970, but a test at ts(0) silently is
    def t(min: Int): Timestamp = ts(600 + min)
    val impIn = MemoryStream[(Long, Long, Timestamp)]
    val clkIn = MemoryStream[(Long, Long, Timestamp)]
    def frame(ms: MemoryStream[(Long, Long, Timestamp)]) =
      ms.toDS().toDF("event_id", "user_id", "ts")
    val q = EventStreams.clickAttribution(frame(impIn), frame(clkIn),
        attributionWindow = "10 minutes", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append).start()
    try {
      impIn.addData((100L, 1L, t(0)), (101L, 2L, t(5)))
      clkIn.addData((200L, 1L, t(4))) // same-batch match for imp 100
      q.processAllAvailable()
      // LATER batch: imp 101's click arrives (state held it), a click
      // outside imp 100's window, and a click for an unseen user
      clkIn.addData((201L, 2L, t(14)), (202L, 1L, t(20)), (203L, 9L, t(6)))
      q.processAllAvailable()
      val got = spark.table("attribution")
        .select("imp_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 200L), (101L, 201L)),
        s"attribution must match exactly the in-window pairs, got $got")
    } finally q.stop()
  }
}
