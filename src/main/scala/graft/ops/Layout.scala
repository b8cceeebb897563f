package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout operators: bucketed tables for shuffle-free
  * co-located joins. Writing both sides of a recurring join bucketed by
  * the join key (same bucket count) lets every later join read
  * bucket i against bucket i directly — the exchange that would
  * re-shuffle 100 TB per query is paid ONCE at write time. This is the
  * standard warehouse layout for fact-to-fact joins too big to
  * broadcast; sorting within buckets additionally drops the sort from
  * the sort-merge join.
  */
object Layout {

  /** Write `df` as a parquet table bucketed (and sorted) by `key` into
    * `dir`, registered as `table` in the session catalog (bucketed
    * reads go through the catalog — bucket metadata lives there, not in
    * the files). Overwrites any previous contents; re-registering the
    * same name re-points it.
    */
  def writeBucketed(df: DataFrame, table: String, dir: String,
      buckets: Int, key: String): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // the name is interpolated into SQL below — restrict to a plain
    // identifier rather than trusting callers to quote
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name must be a plain identifier, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", dir)
      .saveAsTable(table)
  }

  /** Read a previously written bucketed table. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write `df` hive-style partitioned by `cols` (one directory level
    * per column, e.g. `order_year=1996/`). The complementary layout
    * lever to bucketing: bucketing removes JOIN shuffles, directory
    * partitioning removes SCAN bytes — a filter on a partition column
    * prunes whole directories at planning time (`PartitionFilters` in
    * the scan node), which at 100 TB is the difference between reading
    * a year and reading everything. Choose low-cardinality columns
    * (date buckets, source); a high-cardinality partition column
    * degenerates into millions of tiny files.
    */
  def writePartitioned(df: DataFrame, dir: String, cols: String*): Unit = {
    require(cols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(dir)
  }
}
