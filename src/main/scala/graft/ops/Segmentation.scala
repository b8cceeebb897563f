package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable quantile segmentation (SURVEY §2C, round 7) — the fix for
  * the e14-class scale hazard: a global `ntile(k)` window sorts EVERY
  * row on one task. Here tile membership comes from k−1 quantile
  * THRESHOLDS broadcast into per-row column math instead, so nothing
  * ever globally sorts:
  *
  *  - [[exactThresholds]] computes the exact order statistics at
  *    ntile's own boundary ranks via a distinct-value histogram + one
  *    cumulative window over the VALUE AXIS — bounded by the metric's
  *    distinct-value count, never the row count (the c13 bounded-axis
  *    argument; integer metrics like days / event counts / cents have
  *    small domains at any corpus size). On distinct-valued data the
  *    resulting tiles equal `ntile(k)` exactly (spec-pinned); with ties
  *    a whole tie-group lands in one tile — the DEFENSIBLE semantics at
  *    scale (ntile splits ties by arbitrary row position).
  *  - [[approxThresholds]] is the 100 TB path: `percentile_approx`'s
  *    mergeable sketch, one map-side-combined aggregate, no histogram
  *    shuffle — for when even the distinct-value axis is unbounded
  *    (real-valued metrics).
  *
  * Thresholds ride the driver as k−1 longs per metric (the
  * model-rides-the-driver pattern: s08 centroids, t12 merges), so tile
  * assignment is pure codegen'd column math with zero added shuffle.
  * Metrics are LongType by contract — every house metric is integer
  * (days, counts, cents) and integer thresholds are engine-exact.
  */
object Segmentation {

  /** ntile's boundary ranks: tile t (1-based) of k over n rows ends at
    * rank t·⌊n/k⌋ + min(t, n mod k) — the first (n mod k) tiles get the
    * extra row. Returns the k−1 interior boundaries.
    */
  def ntileBoundaryRanks(n: Long, k: Int): Seq[Long] = {
    require(k > 1, "k must be > 1")
    require(n > 0, "n must be > 0")
    (1 until k).map(t => t * (n / k) + math.min(t.toLong, n % k))
  }

  /** Exact order-statistic thresholds for `metric` at ntile's boundary
    * ranks: threshold t = the b_t-th smallest value. One distinct-value
    * histogram, one cumsum window over the (bounded) value axis, one
    * broadcast join against the k−1 bounds; k−1 longs return to the
    * driver.
    */
  def exactThresholds(df: DataFrame, metric: String, k: Int): Seq[Long] =
    // null metric rows carry no histogram mass (the same rule as the
    // streaming maintenance, ModelStreams.histStream — the two paths
    // must agree or loadThresholds' equality contract breaks; a null
    // also must not count toward n, where it would shift every
    // boundary rank)
    thresholdsFromCounts(
      df.where(col(metric).isNotNull)
        .groupBy(col(metric).cast("long").as("v"))
        .agg(count(lit(1)).as("c")),
      k)

  /** The order-statistic rule over an ALREADY-AGGREGATED value
    * histogram `(v long, c long)` — the face the STREAMING maintenance
    * uses ([[graft.streaming.ModelStreams]] merges per-batch histogram
    * partials algebraically; counts over disjoint doc sets sum), so
    * thresholds over a growing corpus never rescan history.
    */
  def thresholdsFromCounts(hist: DataFrame, k: Int): Seq[Long] = {
    val spark = hist.sparkSession
    import spark.implicits._
    val n = hist.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    // empty histogram (no batches yet / all-null metric) ⇒ no
    // thresholds ⇒ every row tiles to 1 — the defined "anytime"
    // answer the streaming reader (ModelStreams.loadThresholds)
    // promises, not a require crash
    if (n == 0L) return Seq.empty
    val bounds = ntileBoundaryRanks(n, k).zipWithIndex
      .map { case (b, i) => (i + 1, b) }.toDF("t", "bound")
    val cum = hist
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("v"))))
    cum.join(broadcast(bounds), col("cum") >= col("bound"))
      .groupBy("t").agg(min(col("v")).as("thr"))
      .orderBy("t").collect().map(_.getAs[Long]("thr")).toSeq
  }

  /** Sketch-derived thresholds — the path for unbounded value domains:
    * `percentile_approx` at the boundary-rank fractions. Same driver-side
    * k−1 scalars; accuracy is the standard sketch knob.
    */
  def approxThresholds(df: DataFrame, metric: String, k: Int,
      accuracy: Int = 10000): Seq[Long] = {
    // nulls excluded BEFORE counting n: percentile_approx ignores
    // them, so counting them would skew every boundary fraction
    val live = df.where(col(metric).isNotNull)
    val n = live.count()
    if (n == 0L) return Seq.empty // same defined answer as the exact path
    val fracs = ntileBoundaryRanks(n, k).map(_.toDouble / n)
    live.agg(percentile_approx(col(metric).cast("long"),
        typedLit(fracs), lit(accuracy)).as("ts"))
      .head().getSeq[Long](0).toSeq
  }

  /** Tile assignment from driver-side thresholds: 1 + |{t : v > thr_t}|
    * — pure column math. `ascending = false` tiles the negated metric
    * (tile 1 = largest values), matching a DESC ntile. A NULL metric
    * carries no histogram mass (thresholds ignore it) and lands in
    * tile 1 here — filter or impute upstream if that is not wanted.
    */
  def tileColumn(metric: Column, thresholds: Seq[Long],
      ascending: Boolean): Column = {
    val v = if (ascending) metric.cast("long") else -metric.cast("long")
    thresholds.map(t => when(v > lit(t), lit(1L)).otherwise(lit(0L)))
      .foldLeft(lit(1L))(_ + _)
  }

  /** One-call face: add `<metric>_tile` per (metric, ascending) spec.
    * `exact = true` uses the histogram order statistics (== ntile on
    * distinct-valued data); `false` the percentile_approx sketch.
    */
  def quantileTiles(df: DataFrame, metrics: Seq[(String, Boolean)], k: Int,
      exact: Boolean = true): DataFrame = {
    // descending metrics tile the negated column, so thresholds come
    // from the negated relation too
    val thresholds = metrics.map { case (m, asc) =>
      val base = if (asc) df else df.withColumn(m, -col(m).cast("long"))
      val thr =
        if (exact) exactThresholds(base, m, k)
        else approxThresholds(base, m, k)
      (m, asc, thr)
    }
    thresholds.foldLeft(df) { case (acc, (m, asc, thr)) =>
      // thresholds were computed on the (possibly negated) scale;
      // tileColumn re-applies the same orientation
      acc.withColumn(s"${m}_tile",
        if (asc) tileColumn(col(m), thr, ascending = true)
        else tileColumn(col(m), thr, ascending = false))
    }
  }
}
