package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) tooling: build a versioned
  * dimension from a change log, then join facts AT EVENT TIME — the
  * lakehouse pattern behind "what segment was this customer in when
  * they ordered", and behind reproducible training snapshots ("the
  * label the example had when it was sampled", not today's).
  */
object Scd2 {

  /** One row per version with `[valid_from, valid_to)` validity: each
    * key's changes sorted by effective time, `valid_to` = the next
    * change via `lead()`, last version closed at `horizon`. Half-open
    * intervals tile each key's timeline exactly — every instant in
    * `[first change, horizon)` belongs to exactly one version, so a
    * point-in-time join preserves fact row counts by construction.
    *
    * `horizon` is an explicit CLOSED end, not an open sentinel: the
    * downstream bucketized join expands intervals to their covered
    * buckets, and a Long.MaxValue "open end" is exactly the
    * million-bucket trap RangeJoin's guard exists for. Pick the end of
    * the fact horizon (e.g. max event day + 1).
    *
    * Contract: one change per (key, eff) — a duplicate effective time
    * would produce an empty [e, e) version that the join drops
    * silently. One window over the (small) change log; no shuffle of
    * facts here.
    */
  def fromChangeLog(changes: DataFrame, keyCol: String, effCol: String,
      horizon: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(effCol))
    val eff = col(effCol).cast("long")
    changes
      // a change at/after the horizon would build an inverted
      // [eff, horizon) version that the downstream join silently
      // discards — fail per-row instead (RangeJoin's raise_error
      // convention), since "facts quietly lose their dimension rows"
      // is the worst failure mode a point-in-time join can have
      // NULL checked FIRST: eff < horizon is NULL for a NULL eff (a
      // bad upstream cast), and the horizon message would misdiagnose
      // the data problem as a horizon problem
      .withColumn("valid_from",
        when(eff.isNull, raise_error(lit(
          s"Scd2: NULL effective time in '$effCol' (unparseable upstream value?)"))
          .cast("long"))
        .when(eff < horizon, eff)
        .otherwise(raise_error(format_string(
          s"Scd2: change at effective time %d is at/after horizon $horizon" +
            " — re-stamp the horizon", eff)).cast("long")))
      .withColumn("valid_to", coalesce(lead(eff, 1).over(w), lit(horizon)))
      .drop(effCol)
  }

  /** Facts joined to the dimension version valid at the fact's time:
    * equi-key on `keyCol` plus the bucketized range join (hash join on
    * (bucket, key) + residual — never a BNLJ). Both inputs keep their
    * columns; `ptCol` must be on the same integer axis as the
    * dimension's validity bounds.
    */
  def pointInTimeJoin(facts: DataFrame, ptCol: String, dim: DataFrame,
      keyCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame =
    RangeJoin.pointInInterval(facts, ptCol, dim, "valid_from", "valid_to",
      bucketWidth, maxBucketsPerInterval, keys = Seq(keyCol))

  /** Streaming face: enrich a fact STREAM with the dimension version
    * valid at event time — per-row bucket math plus a stream-static
    * equi-join on (bucket, key), zero streaming state. The dimension's
    * bucket expansion is computed once and CACHED: stream-static joins
    * re-evaluate the static subplan every micro-batch (the trap
    * DedupStreams/EventStreams document), and re-exploding the
    * dimension per batch is exactly what the cache prevents. Returns
    * the enriched stream plus a release handle for the cached
    * expansion (call it after the query stops).
    */
  def streamingPointInTimeJoin(factStream: DataFrame, ptCol: String,
      dim: DataFrame, keyCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 20): (DataFrame, () => Unit) = {
    val expanded = RangeJoin.expandIntervals(dim, "valid_from", "valid_to",
      bucketWidth, maxBucketsPerInterval).cache()
    val joined = RangeJoin.joinExpanded(factStream, ptCol, expanded,
      "valid_from", "valid_to", bucketWidth, keys = Seq(keyCol))
    (joined, () => { expanded.unpersist(); () })
  }
}
