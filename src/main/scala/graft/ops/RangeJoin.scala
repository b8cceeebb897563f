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
    * and are dropped before expansion (a descending `sequence` would
    * throw).
    *
    * Both inputs keep all their columns (caller ensures no name
    * collisions); the bucket key never leaks into the output.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val iv = intervals
      .where(col(hiCol) > col(loCol))
      .withColumn("__bkt", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor((col(hiCol) - 1) / bucketWidth).cast("long"))))
    val pt = points.withColumn("__bkt",
      floor(col(ptCol) / bucketWidth).cast("long"))
    pt.join(iv, Seq("__bkt"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bkt")
  }
}
