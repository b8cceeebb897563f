package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout gates for the q30/q31 operators: bucketing must
  * remove the join-time exchange entirely, salting must change the plan
  * but never the answer.
  */
class LayoutSkewSpec extends AnyFunSuite with graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed co-located join: no shuffle exchange anywhere in the join plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed_spec").toString
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.sources.Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment")
    Layout.writeBucketed(o, "spec_orders_b", s"$dir/o", buckets = 4, key = "o_custkey")
    Layout.writeBucketed(c, "spec_customer_b", s"$dir/c", buckets = 4, key = "c_custkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path: with broadcast off, only the bucket
      // layout can remove the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ob = Layout.readBucketed(spark, "spec_orders_b")
      val cb = Layout.readBucketed(spark, "spec_customer_b")
      val joined = ob.join(cb, ob("o_custkey") === cb("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p)
      // and the same join WITHOUT the bucketed layout does shuffle —
      // proving the absence above is the layout's doing
      val plain = o.join(c, o("o_custkey") === c("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(plain.contains("Exchange"), plain)
      // layout never changes answers
      assert(joined.count() === o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS spec_orders_b")
      spark.sql("DROP TABLE IF EXISTS spec_customer_b")
    }
  }

  test("partitioned layout: a partition-column filter prunes directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_spec").toString
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("order_year", year(col("o_orderdate")))
    Layout.writePartitioned(o, dir, "order_year")
    val pruned = spark.read.parquet(dir).where(col("order_year") === 1996)
    val p = pruned.queryExecution.executedPlan.toString
    // the year filter must be a planning-time partition filter, not a
    // row filter after a full scan — and the partition column must not
    // be read from the data files
    assert(p.contains("PartitionFilters: [isnotnull(order_year") &&
      p.contains("= 1996)"), p)
    assert(!p.replaceAll("(?s).*ReadSchema: ", "").contains("order_year"), p)
    // pruning never changes answers
    val expected = o.where(col("order_year") === 1996).count()
    assert(pruned.count() === expected && expected > 0)
  }

  test("salted join: row-for-row the plain join, on keys with duplicates both sides") {
    import spark.implicits._
    // skewed left: key 1 dominates; right has duplicate keys too (the
    // general many-to-many case the equivalence proof must cover)
    val left = ((1 to 500).map(i => (1L, s"l$i")) ++
      (1 to 50).map(i => (2L, s"m$i")) :+ ((3L, "x"))).toDF("k", "lv")
    val right = Seq((1L, "r1"), (1L, "r2"), (2L, "r3"), (4L, "r4")).toDF("k", "rv")
    val salted = SkewJoin.saltedJoin(left, right, "k", saltBuckets = 4)
      .orderBy("k", "lv", "rv").collect()
    val plain = left.join(right, Seq("k"))
      .orderBy("k", "lv", "rv").collect()
    assert(salted.toSeq === plain.toSeq)
    // the salt column must not leak into the output schema
    assert(!salted.head.schema.fieldNames.contains("__salt"))
  }

  test("salted join plan: build side replicated by explode, probe never duplicated") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong % 3, i)).toDF("k", "v")
    val right = Seq((0L, "a"), (1L, "b")).toDF("k", "w")
    val p = SkewJoin.saltedJoin(left, right, "k", saltBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
