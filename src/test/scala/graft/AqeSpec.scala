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

  test("runtime Bloom-filter join pruning injects might_contain on the probe side") {
    // the row-level runtime filter a selective shuffle join earns at
    // scale: the filtered build side's keys become a Bloom filter
    // applied to the probe scan BEFORE the shuffle — SCALING.md's
    // "filter early" rule done by the engine at runtime. Thresholds
    // floored so the sf0.001-sized spec input qualifies; broadcast
    // disabled because a broadcast join already prunes via its hash
    // relation (no bloom needed or injected there).
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_spec").toString
    spark.range(100000).withColumn("k", col("id") % 5000)
      .write.mode("overwrite").parquet(s"$dir/probe")
    spark.range(5000).withColumn("k", col("id"))
      .withColumn("sel", col("id") % 100)
      .write.mode("overwrite").parquet(s"$dir/build")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val probe = spark.read.parquet(s"$dir/probe")
      val build = spark.read.parquet(s"$dir/build").where(col("sel") === 7)
      val j = probe.join(build, Seq("k"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("might_contain") ||
        p.toLowerCase.contains("bloomfilter"), p)
      assert(j.count() > 0)
    }
  }

  test("dynamic partition pruning: a dimension filter prunes fact partitions at runtime") {
    // DPP = q32's planning-time directory pruning driven by a JOIN's
    // runtime keys — the mechanism that keeps a date-partitioned 100 TB
    // fact scan proportional to the dimension filter's selectivity.
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp_spec").toString
    spark.range(20000).withColumn("part", col("id") % 20)
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/fact")
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // force the non-broadcast path to exercise the reused-exchange
      // subquery form too? No — broadcast is the common shape; keep it.
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.range(20).withColumn("part", col("id"))
        .where(col("id").isin(3, 4))
      val j = fact.join(dim, Seq("part"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"), p)
      assert(j.count() === 2000)
    }
  }
}
