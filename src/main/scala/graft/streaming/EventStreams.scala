package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream (SURVEY §2C /
  * A31). Each transform takes an unbounded DataFrame (`readStream`
  * source or MemoryStream in tests) with the events schema
  * (event_id, ts timestamp, user_id, event_type, value, props) and
  * returns a streaming DataFrame; their batch-mode equivalents live in
  * graft.queries.EventsQueries where the DuckDB oracle can check them.
  *
  * Watermarks bound state: at 100 TB/day the state store only keeps
  * windows newer than the delay, and late events beyond it are dropped
  * deterministically.
  */
object EventStreams {

  /** Tumbling hourly counts/sums with a 10-minute watermark. */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0).cast("long")).as("value_cents"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("value_cents"))

  final case class SessionAcc(startUs: Long, lastUs: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start_us: Long,
    session_end_us: Long, n_events: Long)

  /** Per-user sessionization as CUSTOM keyed state —
    * `flatMapGroupsWithState` with an EVENT-TIME timeout, the form to
    * reach for when the built-in `session_window` can't carry the
    * state (per-session derived fields, first/last event payloads,
    * session-abandonment triggers). Emission semantics are pinned to
    * e02's `session_window(gap)` rule: a gap >= `gapMinutes` starts a
    * new session, and the emitted end is last_ts + gap. A session
    * closes (a) when a same-key event arrives past the gap — the data
    * path — or (b) when the WATERMARK passes last_ts + gap — the
    * event-time timeout — so state is bounded by the count of OPEN
    * sessions inside the watermark horizon, never by history. The
    * still-open tail session of a key is by construction unemittable
    * until the watermark moves past it (Append-mode finality).
    *
    * Cross-batch late events (admitted by the watermark but older than
    * the open session's span) extend the open session backwards
    * (start = min) rather than resurrecting closed ones — the
    * documented divergence from the batch rule, which sees all events
    * at once; with in-order arrival the two are identical (spec-pinned).
    * The timeout is clamped one ms past the current watermark: with
    * `gap` > watermark delay the clamp never binds, but a smaller gap
    * must not set a timeout the store would reject as already passed.
    */
  def sessionsWithState(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // the watermarked TIMESTAMP column must reach the stateful operator
    // unprojected (converting to micros first detaches the watermark and
    // fails analysis); micros conversion happens inside the state fn
    events.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              ClosedSession(uid, s.startUs, s.lastUs + gapUs, s.n))
          } else {
            val out =
              scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var acc = state.getOption
            // full microsecond precision: getTime alone floors to ms,
            // which would shift session bounds relative to the batch
            // session_window rule on micro-precision event times
            rows.map { r =>
              val ts = r._2
              ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
            }.toArray.sorted.foreach { t =>
              acc match {
                case Some(a) if t - a.lastUs < gapUs =>
                  acc = Some(SessionAcc(math.min(a.startUs, t),
                    math.max(a.lastUs, t), a.n + 1))
                case Some(a) =>
                  out += ClosedSession(uid, a.startUs, a.lastUs + gapUs, a.n)
                  acc = Some(SessionAcc(t, t, 1))
                case None =>
                  acc = Some(SessionAcc(t, t, 1))
              }
            }
            acc.foreach { a =>
              state.update(a)
              // CEILING ms: floor would let the timeout fire up to
              // 999 us before last+gap, closing a session an in-gap
              // micro-precision event could still legitimately extend
              state.setTimeoutTimestamp(math.max(
                (a.lastUs + gapUs + 999L) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  /** Per-user session windows (30-minute gap), the streaming twin of
    * EventsQueries.e02.
    */
  def sessionCounts(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming twin of q34's interval attribution: tag each ARRIVING
    * event with the static window(s) it falls inside — campaign
    * windows, maintenance windows, incident ranges. Reuses the exact
    * batch operator ([[graft.ops.RangeJoin]]): the bucketized form is
    * per-row column math + a stream-static equi-join, so it needs no
    * streaming state at all (a bare BETWEEN predicate on a stream
    * would hit the same nested-loop trap as in batch).
    *
    * What gets cached is the EXPANDED bucket relation — the expensive
    * half that stream-static joins would otherwise recompute every
    * micro-batch — not the raw `windows` input (whose cache would
    * still re-explode per batch, and mutating a caller-owned frame's
    * storage is rude). The cache pins ~ceil(len/width)+1 rows per
    * window for the stream's lifetime; release it after `q.stop()`
    * via `spark.catalog.clearCache()` or by re-deriving and
    * unpersisting `RangeJoin.expandIntervals(...)` (Spark's cache
    * matches by plan, so an identical derivation unpersists this one).
    * `maxBucketsPerInterval` forwards to the expansion guard — a
    * month-long window over incident-sized buckets should fail HERE
    * with the bounds in the message, not loop a crashing stream.
    */
  def intervalAttribution(events: DataFrame, ptCol: String,
      windows: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    val expanded = graft.ops.RangeJoin.expandIntervals(
      windows, loCol, hiCol, bucketWidth, maxBucketsPerInterval).cache()
    graft.ops.RangeJoin.joinExpanded(
      events, ptCol, expanded, loCol, hiCol, bucketWidth)
  }

  /** Stream-STREAM interval join — the attribution shape two live
    * event feeds need (impression → click within an attribution
    * window), and the one streaming join class nothing else in this
    * package exercises: BOTH sides are unbounded, so BOTH carry
    * watermarks and the join condition bounds click_ts to
    * [imp_ts, imp_ts + window], which is what lets Spark expire
    * impression state once no qualifying click can still arrive
    * (state retention ≈ window + watermark delay per side — bounded,
    * or the join would buffer both streams forever). Equi-key is
    * user_id, so state shards on the same key the batch join shuffles
    * on. Inner join: an unmatched impression simply ages out.
    *
    * Emits (imp_id, click_id, user_id, imp_ts, click_ts) append rows;
    * results match the identical batch join (spec-pinned).
    */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
      attributionWindow: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermarkDelay)
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    imp.join(clk,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $attributionWindow"))
      .select(col("imp_id"), col("click_id"), col("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** Exactly-once-per-key dedup within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Streaming twin of the e08 batch spike rule: hourly
    * (bucket_us, event_type, n) counts arrive and each is flagged with
    * the identical INTEGER-EXACT rule `n * trailingHours > 2 *
    * trailingSum` over the ACTIVE buckets of the trailing 24 CALENDAR
    * hours. State per event_type is the ring of buckets within that
    * window — bounded by construction (≤ 25 pairs), no timeout needed.
    *
    * Partial counts for the SAME bucket (an hour still open upstream)
    * are MERGED into one ring entry, and each arrival re-emits that
    * bucket's flag computed from the merged total — consumers keep the
    * latest row per bucket; trailing stats never double-count a bucket.
    * In-order arrival of closed buckets reproduces the batch query
    * exactly (spec-asserted across micro-batches); a bucket arriving
    * behind a later one is flagged against the ring as of its arrival
    * — the standard reordering caveat, bounded by the upstream
    * watermark.
    *
    * NOTE on composition: Spark does not allow
    * `flatMapGroupsWithState` AFTER a streaming aggregation in one
    * query — feed this from a separate query's sink (e.g.
    * [[tumblingCounts]] → Kafka/files → this), or compute the hourly
    * pre-aggregation inside `foreachBatch`.
    */
  val SpikeWindowMicros: Long = 24L * 3600000000L
  case class SpikeState(buckets: Seq[(Long, Long)]) // (bucket_us, n), sorted
  case class SpikeFlag(event_type: String, bucket_us: Long, n_events: Long,
      trailing_hours: Long, trailing_sum: Long, is_spike: Boolean)

  def spikeFlags(hourly: Dataset[(Long, String, Long)]): Dataset[SpikeFlag] = {
    import hourly.sparkSession.implicits._
    hourly.groupByKey(_._2)
      .flatMapGroupsWithState[SpikeState, SpikeFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (eventType, rows, state: GroupState[SpikeState]) =>
          var ring = state.getOption.map(_.buckets).getOrElse(Seq.empty)
          val out = rows.toSeq.sortBy(_._1).map { case (bucketUs, _, n) =>
            // merge same-bucket partials BEFORE flagging, so the flag
            // reflects the bucket's running total and trailing stats
            // never count one bucket twice
            val (same, others) = ring.partition(_._1 == bucketUs)
            val total = same.map(_._2).sum + n
            val trailing = others.filter(b =>
              b._1 < bucketUs && b._1 >= bucketUs - SpikeWindowMicros)
            val tc = trailing.size.toLong
            val ts = trailing.map(_._2).sum
            val maxSeen = (others.map(_._1) :+ bucketUs).max
            ring = (others :+ (bucketUs, total))
              .filter(_._1 >= maxSeen - SpikeWindowMicros)
              .sortBy(_._1)
            SpikeFlag(eventType, bucketUs, total, tc, ts, total * tc > 2 * ts)
          }
          state.update(SpikeState(ring))
          out.iterator
      }
  }

  /** Streaming twin of the e09 batch decayed-trending rule: hourly
    * (bucket_us, event_type, n) counts arrive and each emits the
    * event type's decayed score AS OF that bucket — Σ over the
    * trailing 6 calendar hours of n·2^(5-age), the identical
    * power-of-two integer weighting, so in-order arrival of closed
    * buckets reproduces the batch query at every anchor (the batch
    * form scores only the corpus-max anchor; the stream scores each
    * bucket close as "now"). State per event_type is the ring of
    * buckets inside the 6-hour horizon — ≤ 7 pairs, bounded by
    * construction; same-bucket partials merge and re-emit like
    * [[spikeFlags]]. Same composition note as spikeFlags: feed from a
    * separate aggregation query's sink.
    */
  val TrendWindowHours = 6
  val TrendBucketMicros: Long = 3600000000L
  case class TrendState(buckets: Seq[(Long, Long)]) // (bucket_us, n), sorted
  case class TrendScore(event_type: String, bucket_us: Long,
      decayed_score: Long, n_recent: Long)

  def trendingScores(hourly: Dataset[(Long, String, Long)]): Dataset[TrendScore] = {
    import hourly.sparkSession.implicits._
    val horizonUs = TrendWindowHours * TrendBucketMicros
    hourly.groupByKey(_._2)
      .flatMapGroupsWithState[TrendState, TrendScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (eventType, rows, state: GroupState[TrendState]) =>
          var ring = state.getOption.map(_.buckets).getOrElse(Seq.empty)
          val out = rows.toSeq.sortBy(_._1).map { case (bucketUs, _, n) =>
            val (same, others) = ring.partition(_._1 == bucketUs)
            val total = same.map(_._2).sum + n
            val maxSeen = (others.map(_._1) :+ bucketUs).max
            ring = (others :+ (bucketUs, total))
              .filter(_._1 > maxSeen - horizonUs)
              .sortBy(_._1)
            // score AS OF this bucket: ages computed against it, only
            // buckets at or before it contribute (a ring entry from a
            // later out-of-order bucket is the future — excluded)
            val window = ring.filter(b =>
              b._1 <= bucketUs && b._1 > bucketUs - horizonUs)
            val score = window.map { case (b, cnt) =>
              val age = (bucketUs - b) / TrendBucketMicros
              cnt << (TrendWindowHours - 1 - age)
            }.sum
            TrendScore(eventType, bucketUs, score, window.map(_._2).sum)
          }
          state.update(TrendState(ring))
          out.iterator
      }
  }

  /** Custom state machine via mapGroupsWithState: running per-user event
    * count + last-seen timestamp, with processing-time timeout — the
    * escape hatch for semantics windows can't express.
    */
  case class UserState(n: Long, lastTs: Long)
  case class UserUpdate(user_id: Long, n_events: Long, last_ts_us: Long)

  def runningUserCounts(events: Dataset[(Long, Long)]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
          var n = prev.n
          var last = prev.lastTs
          rows.foreach { case (_, tsUs) =>
            n += 1
            if (tsUs > last) last = tsUs
          }
          state.update(UserState(n, last))
          UserUpdate(user, n, last)
      }
  }
}
