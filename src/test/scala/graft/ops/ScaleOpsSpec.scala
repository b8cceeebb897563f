package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Scale tooling: salted aggregation/join correctness, and bucketed
  * tables joining without a shuffle (the co-located-join strategy for
  * repeated large-large joins at 100 TB).
  */
class ScaleOpsSpec extends AnyFunSuite with SparkSpec {

  test("salted aggregation equals plain aggregation on a skewed key") {
    import spark.implicits._
    // one hot key with 10k rows, many cold keys
    val df = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"cold$i", i.toDouble))).toDF("k", "v")
    val salted = SkewJoin.saltedSumAgg(df, "k", "v", saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val left = ((1 to 5000).map(_ => ("hot", 1)) ++ Seq(("a", 2), ("b", 3))).toDF("k", "lv")
    val right = Seq(("hot", 10), ("a", 20), ("c", 30)).toDF("k", "rv")
    val salted = SkewJoin.saltedJoin(left, right, "k", saltBuckets = 4)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = left.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bl")
      (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("br")
      val joined = spark.table("bl").join(spark.table("br"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bl")
      spark.sql("DROP TABLE IF EXISTS br")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
