package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §2C scale tooling): AQE's skew-join handles
  * sort-merge skew automatically, but aggregation hot keys and
  * deliberately partitioned pipelines still want explicit salting.
  */
object SkewJoin {

  /** Two-phase (salted) aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. Breaks a hot key into `saltBuckets`
    * parallel partials — the classic fix when one key holds a large
    * fraction of all rows.
    *
    * `aggs` must be decomposable (sum/count/min/max): the same
    * expression is applied in both phases.
    */
  def saltedSumAgg(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pcount"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__pcount")).as("n"))

  /** Salted broadcast-free inner join for one-sided skew: replicate
    * each right row `saltBuckets` times with a salt column, salt left
    * rows, join on (key, salt). Row-for-row equivalent to
    * `left.join(right, Seq(key))` for ANY salt function — a (l, r)
    * match on `key` pairs exactly once because l carries ONE salt and r
    * is replicated across ALL salts. Right side grows saltBuckets-fold;
    * left skew spreads over saltBuckets partitions per key — the right
    * trade exactly when |right| << |left| but right still exceeds the
    * broadcast threshold (otherwise broadcast; if AQE's skew-join can
    * see the stage, prefer that).
    *
    * The salt is a hash of the row's POSITION
    * (`monotonically_increasing_id`), not of its content: a hot key's
    * rows are often content-identical (retries, boilerplate events),
    * and a content hash would send every duplicate to the SAME salt
    * bucket — zero spreading in exactly the case salting exists for.
    * Position salts are not stable under recomputation (a lost shuffle
    * block may re-salt a row differently), which is safe here BECAUSE
    * the result is salt-independent; never reuse this salt as a
    * deterministic partition assignment elsewhere.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
