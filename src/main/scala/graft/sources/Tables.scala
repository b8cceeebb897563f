package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated TPC-H-ish test data
  * (see /root/repo/TESTDATA.md). At cluster scale these would be catalog
  * tables; the parquet read path is identical (vectorized scan, predicate
  * pushdown, column pruning all apply).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as long (legacy conf) and convert to a microsecond
    * TimestampType column via integer division (a double division would lose
    * precision above 2^53 ns). Truncation toward zero == floor for the
    * positive epochs in this data.
    *
    * The nanosAsLong conf stays set for the session: it must hold at
    * SCAN time (executors read footers when the query actually runs),
    * so a set-then-restore scope around this method would break lazy
    * execution. Side effect: other TIMESTAMP(NANOS) reads in the same
    * session get BIGINT nanos instead of an error — acceptable for this
    * engine, whose only nanos source is events (see SCALING.md).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
