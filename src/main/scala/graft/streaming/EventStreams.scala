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

  /** Exactly-once-per-key dedup within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Streaming twin of the e08 batch spike rule: hourly
    * (bucket_us, event_type, n) counts arrive (e.g. from
    * [[tumblingCounts]] downstream, or a per-batch pre-aggregation);
    * state per event_type is the trailing ring of the last 24 hourly
    * counts, and a bucket is flagged with the identical INTEGER-EXACT
    * rule `n * trailingHours > 2 * trailingSum`. State is bounded by
    * construction (24 pairs per event_type — no timeout needed).
    *
    * In-order bucket arrival reproduces the batch query exactly (the
    * spec asserts it across micro-batches); a bucket arriving behind
    * an already-processed later bucket is flagged against the ring as
    * of its arrival — the standard streaming/batch reordering caveat,
    * bounded by the upstream watermark.
    */
  val SpikeTrailingHours = 24
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
            val trailing = ring.filter(_._1 < bucketUs).takeRight(SpikeTrailingHours)
            val tc = trailing.size.toLong
            val ts = trailing.map(_._2).sum
            ring = (ring :+ (bucketUs, n)).sortBy(_._1).takeRight(SpikeTrailingHours)
            SpikeFlag(eventType, bucketUs, n, tc, ts, n * tc > 2 * ts)
          }
          state.update(SpikeState(ring))
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
