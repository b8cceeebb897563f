package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins. Spark plans a bare `pt BETWEEN lo AND hi`
  * join predicate as BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * comparisons — because there is no equality to hash on. That is the
  * classic 100 TB trap: it "works" in tests and never finishes in
  * production. The standard fix is bucketization: quantize time into
  * fixed-width buckets, expand each interval to every bucket it
  * touches, map each point to its one bucket, hash-join on the bucket,
  * and re-check the exact predicate as a residual filter.
  */
object RangeJoin {

  /** Point-in-interval join over long coordinates (epoch micros, epoch
    * days — any monotone integer axis), interval semantics [lo, hi).
    * Cost: one hash shuffle on bucket; the build side grows by
    * ceil(len/width)+1 rows per interval, so pick `bucketWidth` near
    * the TYPICAL interval length — width >> length wastes residual
    * comparisons (many points per bucket), width << length explodes
    * the interval expansion. Empty intervals (hi <= lo) match nothing
    * and are dropped before expansion (Spark's two-arg `sequence`
    * would happily emit a DESCENDING bucket array for them — spurious
    * rows the residual filter pays to remove; the guard keeps the
    * semantics cheap, it is not a crash-safety need).
    *
    * One pathological interval — an open-ended `hi = Long.MaxValue`
    * sentinel is the classic — would expand to ~`hi/width` rows and
    * kill the job mid-flight, the exact trap class this module exists
    * to prevent. `maxBucketsPerInterval` turns that into an immediate,
    * diagnosable per-row error (`raise_error` with the offending
    * bounds); raise it deliberately if your data really has
    * million-bucket intervals.
    *
    * Both inputs keep all their columns (caller ensures no name
    * collisions across the two inputs); `__bkt` is reserved for the
    * internal key and rejected up front rather than silently
    * overwritten.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 1L << 20,
      keys: Seq[String] = Nil): DataFrame =
    joinExpanded(points, ptCol,
      expandIntervals(intervals, loCol, hiCol, bucketWidth, maxBucketsPerInterval),
      loCol, hiCol, bucketWidth, keys)

  /** The interval side EXPANDED to one row per covered bucket (the
    * `__bkt` column) — the expensive half of the join, exposed so a
    * long-lived caller can compute it once and reuse it: stream-static
    * joins re-evaluate the static subplan every micro-batch, so a
    * streaming attributor caches THIS relation (the expansion), not
    * the raw intervals whose cache would still re-explode per batch.
    */
  def expandIntervals(intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be > 0, got $maxBucketsPerInterval")
    require(!intervals.columns.contains("__bkt"),
      "__bkt is reserved by RangeJoin; rename that column on the intervals input")
    val first = floor(col(loCol) / bucketWidth).cast("long")
    val last = floor((col(hiCol) - 1) / bucketWidth).cast("long")
    val boundedLast = when(last - first < maxBucketsPerInterval, last)
      .otherwise(raise_error(format_string(
        s"RangeJoin: interval [%d, %d) spans >= $maxBucketsPerInterval buckets " +
          s"of width $bucketWidth; raise maxBucketsPerInterval or widen buckets",
        col(loCol), col(hiCol))).cast("long"))
    intervals
      .where(col(hiCol) > col(loCol))
      .withColumn("__bkt", explode(sequence(first, boundedLast)))
  }

  /** Join points against a pre-expanded interval relation (from
    * [[expandIntervals]], possibly cached). `bucketWidth` MUST be the
    * width the expansion used — a mismatch silently drops matches,
    * which is why the one-shot [[pointInInterval]] wrapper is the
    * default entry point.
    *
    * `keys` are extra equi-join columns present on BOTH sides (the
    * temporal-join shape: match on entity key AND time). They join the
    * hash key, so per-bucket fan-out is per-(bucket, key) — without
    * them an SCD-style join would pair every point with every
    * same-bucket interval of every other entity and pay the residual
    * filter for the privilege.
    */
  def joinExpanded(points: DataFrame, ptCol: String,
      expanded: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(!points.columns.contains("__bkt"),
      "__bkt is reserved by RangeJoin; rename that column on the points input")
    require(expanded.columns.contains("__bkt"),
      "expanded must come from RangeJoin.expandIntervals (missing __bkt)")
    require(keys.forall(k => points.columns.contains(k) && expanded.columns.contains(k)),
      s"equi-key columns must exist on both sides: $keys")
    val pt = points.withColumn("__bkt",
      floor(col(ptCol) / bucketWidth).cast("long"))
    pt.join(expanded, "__bkt" +: keys)
      .where(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bkt")
  }
}
