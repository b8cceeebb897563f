package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-stream pack over `events` (SURVEY §2C): tumbling windows,
  * session windows (Spark's native `session_window`, oracle'd by a
  * gaps-and-islands rewrite), keyed dedup, and JSON property extraction.
  * These are the batch-equivalents of the streaming module's queries
  * (graft.streaming) so the DuckDB oracle can check them.
  *
  * Timestamps are emitted as epoch microseconds (events.ts is
  * nanosecond-precision parquet; Spark truncates to micros, DuckDB's
  * epoch_us does the same).
  */
object EventsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Markov transition matrix of per-user event sequences — the
    // session-path analysis behind funnels (e06 checks ONE fixed path;
    // this profiles every observed step): per-user lag over (ts,
    // event_id), then (from, to) counts and row-normalized transition
    // probabilities (one int/int double division, IEEE-deterministic)
    "e11_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("to_type"))
        .withColumn("from_type", lag(col("to_type"), 1).over(w))
        .where(col("from_type").isNotNull)
      val cnt = tr.groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n_transitions"))
      val tot = cnt.groupBy("from_type").agg(sum("n_transitions").as("__t"))
      cnt.join(tot, "from_type")
        .select(col("from_type"), col("to_type"), col("n_transitions"),
          (col("n_transitions").cast("double") / col("__t").cast("double")).as("p"))
        .orderBy("from_type", "to_type")
    }),

    // top user paths — the sequence-mining complement of e11's
    // one-step transitions and e06's FIXED funnel: each user's first 5
    // events (by ts, event_id) joined into a path string, counted, top
    // 20 paths by (count desc, path). Per-user windows, then one
    // map-side-combined count; top-k is TakeOrdered.
    "e12_top_paths" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          row_number().over(w).as("__rn"))
        .where(col("__rn") <= 5)
        .groupBy("user_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("__rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    }),

    // TIMED funnel — e06's ordering check with per-step deadlines
    // (the form conversion analysis actually uses): first view, then
    // first click within 24 h of it, then first purchase within 72 h
    // of the click (windows sized to the synthetic ~2-events/user/day
    // density; 10-min windows left every user at stage 1); users counted by furthest stage reached.
    // Epoch-microsecond integer comparisons (the e01 rule), three
    // per-user min-aggregations chained by equi-joins.
    "e13_timed_funnel" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("v_us"))
      val c = ev.where(col("event_type") === "click").join(v, "user_id")
        .where(col("us") > col("v_us") &&
          col("us") <= col("v_us") + lit(86400000000L))
        .groupBy("user_id").agg(min("us").as("c_us"))
      val p = ev.where(col("event_type") === "purchase").join(c, "user_id")
        .where(col("us") > col("c_us") &&
          col("us") <= col("c_us") + lit(259200000000L))
        .groupBy("user_id").agg(min("us").as("p_us"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(when(col("p_us").isNotNull, 3L)
          .when(col("c_us").isNotNull, 2L).otherwise(1L).as("stage_reached"))
        .groupBy("stage_reached").agg(count(lit(1)).as("n_users"))
        .orderBy("stage_reached")
    }),

    "e01_tumbling_window" -> ((s, d) => {
      Tables.load(s, d, "events")
        .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100.0).cast("long")).as("value_cents"))
        .orderBy("bucket_us", "event_type")
    }),

    "e02_session_window" -> ((s, d) => {
      Tables.load(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n_events"))
        .orderBy("user_id", "session_start_us")
    }),

    // batch twin of EventStreams.clickAttribution — and not a rewrite:
    // the STREAMING operator runs verbatim on batch frames (watermarks
    // no-op in batch), so the oracle hash-checks the exact join the
    // stream executes. view = impression, click within 10 minutes.
    "e10_click_attribution" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      graft.streaming.EventStreams.clickAttribution(
          ev.where(col("event_type") === "view"),
          ev.where(col("event_type") === "click"),
          attributionWindow = "10 minutes")
        .select(col("imp_id"), col("click_id"), col("user_id"),
          unix_micros(col("imp_ts")).as("imp_us"),
          unix_micros(col("click_ts")).as("click_us"))
        .orderBy("imp_id", "click_id")
    }),

    "e05_sliding_window" -> ((s, d) => {
      // 1-hour windows sliding every 30 minutes: each event lands in
      // exactly two windows
      Tables.load(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_micros(col("w.start")).as("window_start_us"), col("n_events"))
        .orderBy("window_start_us")
    }),

    "e06_funnel" -> ((s, d) => {
      // view -> purchase conversion per user: first purchase strictly
      // after the first view
      Tables.load(s, d, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
        .select(col("user_id"),
          col("first_view").isNotNull.as("viewed"),
          (col("first_purchase") > col("first_view")).as("converted"))
        .groupBy("viewed")
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
        .orderBy("viewed")
    }),

    "e03_keyed_dedup" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
      Tables.load(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
        .orderBy("user_id", "event_type")
    }),

    "e09_decayed_trending" -> ((s, d) => {
      // exponentially-decayed trending: each event type's score over
      // the 6 hours up to the corpus anchor (max hour), hour h weighted
      // 2^(5-age) — newest counts 32x the oldest. Weights are powers of
      // two over a BOUNDED age range, so the whole score is exact
      // integer math (a float decay constant would never hash-match).
      // The anchor is a 1-row broadcast, not a collect: the query stays
      // one distributed plan.
      val ev = Tables.load(s, d, "events")
        .withColumn("bucket", date_trunc("hour", col("ts")))
      val counts = ev.groupBy("bucket", "event_type").agg(count(lit(1)).as("n"))
      // anchor from the ALREADY-AGGREGATED relation, not the raw events
      // (max of grouped buckets ≡ max bucket): ReuseExchange serves the
      // join input and the anchor from one shuffle — one fact-table
      // scan, not two
      val anchor = counts.agg(max(col("bucket")).as("anchor"))
      val weight = (0 to 4).foldLeft(lit(1L)) { (acc, age) =>
        when(col("age") === age, lit(1L << (5 - age))).otherwise(acc)
      }
      counts.crossJoin(broadcast(anchor))
        .withColumn("age",
          expr("(unix_micros(anchor) - unix_micros(bucket)) div 3600000000"))
        .where(col("age") < 6)
        .withColumn("w", weight)
        .groupBy("event_type")
        .agg(sum(col("n") * col("w")).as("decayed_score"),
          sum(col("n")).as("n_recent"))
        .orderBy(col("decayed_score").desc, col("event_type"))
    }),

    "q34_interval_join" -> ((s, d) => {
      // point-in-interval join, bucketized (graft.ops.RangeJoin): the
      // top-10 hottest hours per event type become non-hour-aligned
      // [h+15min, h+45min) windows; every event falling inside any
      // window is attributed to it by a HASH join on 30-min buckets +
      // residual range filter — never the BroadcastNestedLoopJoin a
      // bare BETWEEN predicate plans to (PlanSpec-gated). Counts and
      // bounds are exact integers (epoch micros).
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"))
      val hourly = ev.groupBy(col("event_type").as("w_type"), col("bucket_us"))
        .agg(count(lit(1)).as("n"))
      val rw = Window.partitionBy(col("w_type"))
        .orderBy(col("n").desc, col("bucket_us"))
      val windows = hourly.withColumn("rk", row_number().over(rw))
        .where(col("rk") <= 10)
        .select(col("w_type"),
          (col("bucket_us") + lit(900000000L)).as("lo_us"),
          (col("bucket_us") + lit(2700000000L)).as("hi_us"))
      graft.ops.RangeJoin.pointInInterval(
          ev.select("user_id", "ts_us"), "ts_us",
          windows, "lo_us", "hi_us", bucketWidth = 1800000000L)
        .groupBy("w_type", "lo_us")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("w_type", "lo_us")
    }),

    "e04_json_props" -> ((s, d) => {
      // pinned single-field schema: from_json parses one field per row
      // — measured 6x cheaper than get_json_object's generic JsonPath
      // walk, which made e04 the only full-scan agg here not within 2x
      // of e01. The field is read as STRING then cast: a STRING field
      // accepts both {"k": 5} and {"k": "5"} (BIGINT would null the
      // quoted form, silently diverging from the previous
      // get_json_object semantics and the oracle's
      // json_extract_string).
      Tables.load(s, d, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(expr("from_json(props, 'k STRING').k").cast("long")).as("k_total"))
        .orderBy("event_type")
    }),

    "e08_hourly_anomaly" -> ((s, d) => {
      // trailing-window spike detection with INTEGER-EXACT arithmetic:
      // an hour is a spike when its event count exceeds 2x the average
      // of the ACTIVE buckets in the trailing 24 CALENDAR hours (a
      // RANGE frame over epoch micros — a ROWS frame would reach back
      // days for sparse event types). Stated as n * trailing_hours >
      // 2 * trailing_sum so no float division enters the comparison;
      // an empty frame gives 0 > 0 = false, never a spike. At scale
      // the window partitions by event_type with a frame bounded to
      // 24 buckets.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("bucket_us"))
        .rangeBetween(-24L * 3600000000L, -1L)
      Tables.load(s, d, "events")
        .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("trailing_hours", count(col("n_events")).over(w))
        .withColumn("trailing_sum", coalesce(sum(col("n_events")).over(w), lit(0L)))
        .withColumn("is_spike",
          col("n_events") * col("trailing_hours") > lit(2) * col("trailing_sum"))
        .orderBy("event_type", "bucket_us")
    }),

    "e07_cohort_retention" -> ((s, d) => {
      // classic retention triangle: cohort = week of a user's first
      // event; a cell counts users of that cohort active N weeks later.
      // Two aggregations + one join on user_id — no per-user windowing.
      val ev = Tables.load(s, d, "events")
      val cohorts = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val activity = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("act_week"))
        .distinct()
      cohorts.join(activity, "user_id")
        .groupBy(unix_micros(col("cohort_week")).as("cohort_week_us"),
          expr("CAST(datediff(act_week, cohort_week) div 7 AS BIGINT)").as("week_offset"))
        .agg(count(lit(1)).as("n_active_users"))
        .orderBy("cohort_week_us", "week_offset")
    }),

    // classic RFM segmentation: recency (days from the corpus anchor
    // date to the user's last event — integer), frequency (event
    // count), monetary (integer cents — the e01 idiom), terciled by
    // ntile with a user_id tiebreak so the tiles are a total order.
    // Scale shape: events aggregate to the USER-level relation first
    // (map-side combined), so the ntile windows sort users, never
    // events — orders of magnitude smaller; at extreme user counts the
    // same scores come from an approx-quantile threshold join instead
    // (q23's percentile machinery), stated here.
    "e14_rfm_segments" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rfm = rfmUserRelation(s, d)
      val rW = Window.orderBy(col("recency_days").asc, col("user_id"))
      val fW = Window.orderBy(col("frequency").desc, col("user_id"))
      val mW = Window.orderBy(col("monetary_cents").desc, col("user_id"))
      rfm.withColumn("r", ntile(3).over(rW).cast("long"))
        .withColumn("f", ntile(3).over(fW).cast("long"))
        .withColumn("m", ntile(3).over(mW).cast("long"))
        .withColumn("segment", concat(col("r").cast("string"),
          col("f").cast("string"), col("m").cast("string")))
        .select("user_id", "recency_days", "frequency", "monetary_cents",
          "r", "f", "m", "segment")
        .orderBy("user_id")
    }),

    // e14's segmentation WITHOUT the three global ntile windows — the
    // form that survives 100×: k−1 quantile thresholds per metric
    // (exact order statistics at ntile's own boundary ranks, computed
    // over the distinct-VALUE axis, never a per-row sort) broadcast
    // into pure column math. Tie groups land in one tile — the
    // at-scale semantics; on distinct-valued data this equals ntile
    // exactly (SegmentationSpec). The oracle replays the identical
    // histogram + boundary-rank rule.
    "e15_rfm_threshold_segments" -> ((s, d) => {
      import graft.ops.Segmentation
      val rfm = rfmUserRelation(s, d).localCheckpoint(true)
      val tiled = Segmentation.quantileTiles(rfm,
        Seq(("recency_days", true), ("frequency", false),
          ("monetary_cents", false)), k = 3)
      tiled
        .withColumnRenamed("recency_days_tile", "r")
        .withColumnRenamed("frequency_tile", "f")
        .withColumnRenamed("monetary_cents_tile", "m")
        .withColumn("segment", concat(col("r").cast("string"),
          col("f").cast("string"), col("m").cast("string")))
        .select("user_id", "recency_days", "frequency", "monetary_cents",
          "r", "f", "m", "segment")
        .orderBy("user_id")
    }),

    // per-user activity streaks — the engagement/retention metric DAU
    // dashboards derive: distinct active days, then gaps-and-islands
    // (day_number − row_number is constant within a consecutive run —
    // the m10/e02 island trick on the DATE axis); windows partition
    // per user, never globally, and events collapse to distinct days
    // before any window sees them
    "e16_activity_streaks" -> ((s, d) => {
      val days = Tables.load(s, d, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      days
        .withColumn("__grp",
          expr("datediff(day, DATE '1970-01-01')").cast("long")
            - row_number().over(w))
        .groupBy("user_id", "__grp")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum("len").as("n_active_days"),
          max("len").as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    }),
  )

  /** The user-level RFM relation shared by e14 (ntile face) and e15
    * (threshold-join face): recency (days from the corpus anchor to the
    * user's last event), frequency (event count), monetary (integer
    * cents). Events aggregate to users BEFORE any segmentation, so
    * downstream work touches users, never events.
    */
  private def rfmUserRelation(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.load(s, d, "events")
      .where(col("user_id").isNotNull && col("ts").isNotNull)
    val anchor = ev.agg(max(to_date(col("ts"))).as("__anchor"))
    ev.groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("__last"),
        count(lit(1)).as("frequency"),
        coalesce(sum(round(col("value") * 100.0).cast("long")), lit(0L))
          .as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__anchor"), col("__last")).cast("long"))
      .drop("__anchor", "__last")
  }

  val oracles: Map[String, String] = Map(
    // the oracle uses the naive BETWEEN join (DuckDB's IEJoin handles
    // it); the engine's bucketized form must produce identical rows
    "q34_interval_join" ->
      """WITH h AS (SELECT event_type AS w_type, date_trunc('hour', ts) AS bucket,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT w_type, bucket,
        |    row_number() OVER (PARTITION BY w_type ORDER BY n DESC, bucket) AS rk
        |  FROM h),
        |w AS (SELECT w_type,
        |    epoch_us(bucket + INTERVAL 15 MINUTE) AS lo_us,
        |    epoch_us(bucket + INTERVAL 45 MINUTE) AS hi_us
        |  FROM r WHERE rk <= 10)
        |SELECT w_type, lo_us, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM w JOIN events e
        |  ON epoch_us(e.ts) >= lo_us AND epoch_us(e.ts) < hi_us
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e09_decayed_trending" ->
      """WITH b AS (SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT max(date_trunc('hour', ts)) AS anchor FROM events),
        |aged AS (SELECT event_type, n,
        |    (epoch_us(anchor) - epoch_us(bucket)) // 3600000000 AS age
        |  FROM b CROSS JOIN a)
        |SELECT event_type,
        |  CAST(sum(n * (CASE age WHEN 0 THEN 32 WHEN 1 THEN 16 WHEN 2 THEN 8
        |    WHEN 3 THEN 4 WHEN 4 THEN 2 ELSE 1 END)) AS BIGINT) AS decayed_score,
        |  CAST(sum(n) AS BIGINT) AS n_recent
        |FROM aged WHERE age < 6
        |GROUP BY 1 ORDER BY decayed_score DESC, event_type""".stripMargin,

    "e13_timed_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT ev.user_id, min(us) AS c_us
        |  FROM ev JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > v_us AND us <= v_us + 86400000000
        |  GROUP BY 1),
        |p AS (SELECT ev.user_id, min(us) AS p_us
        |  FROM ev JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us > c_us AND us <= c_us + 259200000000
        |  GROUP BY 1)
        |SELECT CAST(CASE WHEN p_us IS NOT NULL THEN 3
        |    WHEN c_us IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage_reached,
        |  count(*) AS n_users
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "e12_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY 1)
        |SELECT path, count(*) AS n_users FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "e11_markov_transitions" ->
      """WITH tr AS (SELECT
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM events),
        |cnt AS (SELECT from_type, to_type, count(*) AS n_transitions
        |  FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS t
        |  FROM cnt GROUP BY 1)
        |SELECT from_type, to_type, n_transitions,
        |  CAST(n_transitions AS DOUBLE) / CAST(t AS DOUBLE) AS p
        |FROM cnt JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "e01_tumbling_window" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e10_click_attribution" ->
      """WITH v AS (SELECT event_id AS imp_id, user_id, ts AS imp_ts
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT v.imp_id AS imp_id, c.click_id AS click_id,
        |  v.user_id AS user_id,
        |  epoch_us(v.imp_ts) AS imp_us, epoch_us(c.click_ts) AS click_us
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND epoch_us(c.click_ts) >= epoch_us(v.imp_ts)
        |  AND epoch_us(c.click_ts) <= epoch_us(v.imp_ts) + 600000000
        |ORDER BY imp_id, click_id""".stripMargin,

    "e02_session_window" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        |  epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,

    "e05_sliding_window" ->
      """SELECT window_start_us, count(*) AS n_events FROM (
        |  SELECT unnest([
        |    epoch_us(time_bucket(INTERVAL 30 MINUTE, ts)),
        |    epoch_us(time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE)
        |  ]) AS window_start_us
        |  FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "e06_funnel" ->
      """SELECT viewed, count(*) AS n_users,
        |  CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM (
        |  SELECT user_id,
        |    first_view IS NOT NULL AS viewed,
        |    first_purchase > first_view AS converted
        |  FROM (
        |    SELECT user_id,
        |      min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        |      min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        |    FROM events GROUP BY 1))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "e03_keyed_dedup" ->
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "e04_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "e08_hourly_anomaly" ->
      """WITH hourly AS (
        |  SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket_us, event_type, n_events,
        |  count(n_events) OVER w AS trailing_hours,
        |  CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS trailing_sum,
        |  n_events * count(n_events) OVER w >
        |    2 * CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS is_spike
        |FROM hourly
        |WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
        |  RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_type, bucket_us""".stripMargin,

    "e07_cohort_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
        |SELECT epoch_us(cw) AS cohort_week_us,
        |  CAST(datediff('day', cw, aw) // 7 AS BIGINT) AS week_offset,
        |  count(*) AS n_active_users
        |FROM cohorts JOIN activity USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e14_rfm_segments" ->
      """WITH ev AS (SELECT user_id, ts, value FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |anchor AS (SELECT max(CAST(ts AS DATE)) AS ad FROM ev),
        |rfm AS (SELECT user_id,
        |    CAST(date_diff('day', max(CAST(ts AS DATE)), ad) AS BIGINT)
        |      AS recency_days,
        |    count(*) AS frequency,
        |    CAST(COALESCE(sum(CAST(round(value * 100.0) AS BIGINT)), 0)
        |      AS BIGINT) AS monetary_cents
        |  FROM ev CROSS JOIN anchor GROUP BY user_id, ad),
        |sc AS (SELECT user_id, recency_days, frequency, monetary_cents,
        |    CAST(ntile(3) OVER (ORDER BY recency_days, user_id)
        |      AS BIGINT) AS r,
        |    CAST(ntile(3) OVER (ORDER BY frequency DESC, user_id)
        |      AS BIGINT) AS f,
        |    CAST(ntile(3) OVER (ORDER BY monetary_cents DESC, user_id)
        |      AS BIGINT) AS m
        |  FROM rfm)
        |SELECT user_id, recency_days, frequency, monetary_cents, r, f, m,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
        |    AS segment
        |FROM sc ORDER BY user_id""".stripMargin,

    // e15 replays the threshold rule itself: distinct-value histogram,
    // cumulative counts, min value whose cum reaches ntile's boundary
    // rank b_t = t*(n//3) + least(t, n%3); descending metrics run on
    // the negated scale (exactly the engine's orientation rule)
    "e15_rfm_threshold_segments" -> {
      def thrCte(name: String, vExpr: String) =
        s"""h_$name AS (SELECT $vExpr AS v, count(*) AS c FROM rfm GROUP BY 1),
           |c_$name AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h_$name),
           |t_$name AS (SELECT max(CASE WHEN t = 1 THEN thr END) AS t1,
           |    max(CASE WHEN t = 2 THEN thr END) AS t2
           |  FROM (SELECT t, min(v) AS thr FROM c_$name
           |    JOIN bounds ON cum >= b GROUP BY t))""".stripMargin
      def tile(vExpr: String, t: String) =
        s"""CAST(1 + CASE WHEN $vExpr > $t.t1 THEN 1 ELSE 0 END
           |    + CASE WHEN $vExpr > $t.t2 THEN 1 ELSE 0 END AS BIGINT)""".stripMargin
      s"""WITH ev AS (SELECT user_id, ts, value FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |anchor AS (SELECT max(CAST(ts AS DATE)) AS ad FROM ev),
         |rfm AS (SELECT user_id,
         |    CAST(date_diff('day', max(CAST(ts AS DATE)), ad) AS BIGINT)
         |      AS recency_days,
         |    count(*) AS frequency,
         |    CAST(COALESCE(sum(CAST(round(value * 100.0) AS BIGINT)), 0)
         |      AS BIGINT) AS monetary_cents
         |  FROM ev CROSS JOIN anchor GROUP BY user_id, ad),
         |nrows AS (SELECT count(*) AS n FROM rfm),
         |bounds AS (SELECT t, t * (n // 3) + least(t, n % 3) AS b
         |  FROM nrows CROSS JOIN (VALUES (1), (2)) v(t)),
         |${thrCte("r", "recency_days")},
         |${thrCte("f", "-frequency")},
         |${thrCte("m", "-monetary_cents")},
         |sc AS (SELECT user_id, recency_days, frequency, monetary_cents,
         |    ${tile("recency_days", "t_r")} AS r,
         |    ${tile("-frequency", "t_f")} AS f,
         |    ${tile("-monetary_cents", "t_m")} AS m
         |  FROM rfm CROSS JOIN t_r CROSS JOIN t_f CROSS JOIN t_m)
         |SELECT user_id, recency_days, frequency, monetary_cents, r, f, m,
         |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
         |    AS segment
         |FROM sc ORDER BY user_id""".stripMargin
    },

    "e16_activity_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT user_id,
        |    CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp
        |  FROM days),
        |s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(max(len) AS BIGINT) AS longest_streak,
        |  count(*) AS n_streaks
        |FROM s GROUP BY 1 ORDER BY user_id""".stripMargin,
  )
}
