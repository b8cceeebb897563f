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
    // an 8 KB broadcast threshold puts BOTH static size estimates
    // (range(50000) ≈ 400 KB) above it, so the static plan is a shuffle
    // join; the aggregate's RUNTIME output (5 rows ≈ bytes) is far
    // below it, so AQE must swap in a broadcast join. The first half of
    // the test PROVES the static premise with AQE off — without that,
    // this test passed vacuously on a statically-broadcast plan
    // (caught by review).
    def joined = {
      val left = spark.range(50000).withColumn("k", col("id") % 5)
      val right = spark.range(50000).withColumn("k", col("id") % 5)
        .groupBy("k").agg(count(lit(1)).as("c"))
      left.join(right, "k")
    }
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "8192") {
      val staticPlan = joined.queryExecution.executedPlan.toString
      assert(staticPlan.contains("SortMergeJoin") &&
        !staticPlan.contains("BroadcastHashJoin"), staticPlan)
    }
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "8192") {
      val j = joined
      j.collect() // materialize so the adaptive plan is final
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"), p)
      // the executed plan prints BOTH stages: the initial (static) plan
      // must be the sort-merge join and the final plan the broadcast
      // upgrade — the re-plan itself, visible in one string
      val Array(finalPlan, initialPlan) = p.split("== Initial Plan ==", 2)
      assert(finalPlan.contains("BroadcastHashJoin") &&
        !finalPlan.contains("SortMergeJoin"), p)
      assert(initialPlan.contains("SortMergeJoin"), p)
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
