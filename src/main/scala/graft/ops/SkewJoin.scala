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

  /** Salted broadcast-free join for one-sided skew: replicate each right
    * row `saltBuckets` times with a salt column, salt left rows by a
    * deterministic hash of their position, join on (key, salt). Right
    * side grows saltBuckets-fold; left skew spreads over saltBuckets
    * partitions per key.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
