package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution gates: the 100 TB plans this library emits
  * lean on AQE for runtime re-planning (SCALING.md cites it for skew
  * and for join-strategy correction), so these tests pin that the
  * session's AQE actually performs the two re-plans we rely on —
  * a statically-planned sort-merge join becoming a broadcast join once
  * the built side turns out small, and post-shuffle partition
  * coalescing. If a Spark upgrade or a config regression turned AQE
  * off, every "AQE handles it" claim in SCALING.md would silently rot;
  * these fail instead.
  */
class AqeSpec extends AnyFunSuite with SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE upgrades a sort-merge join to broadcast when the built side is runtime-small") {
    withConf("spark.sql.adaptive.enabled" -> "true") {
      // the right side is an aggregate: its STATIC row estimate tracks
      // the pre-agg child (large), so the initial plan is a shuffle
      // join; at runtime it collapses to 5 rows and AQE must swap in a
      // broadcast join
      val left = spark.range(50000).withColumn("k", col("id") % 5)
      val right = spark.range(50000).withColumn("k", col("id") % 5)
        .groupBy("k").agg(count(lit(1)).as("c"))
      val joined = left.join(right, "k")
      joined.collect() // materialize so the adaptive plan is final
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"), p)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }
  }

  test("AQE coalesces undersized post-shuffle partitions") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "32") {
      val agg = spark.range(10000).withColumn("k", col("id") % 100)
        .groupBy("k").agg(sum(col("id")).as("s"))
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead coalesced"), p)
      // 32 shuffle partitions of ~100 tiny groups must land far below 32
      assert(agg.rdd.getNumPartitions < 32, s"got ${agg.rdd.getNumPartitions}")
    }
  }
}
