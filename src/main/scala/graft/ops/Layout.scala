package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Morton z-value: interleave the low `bits` bits of two bucket
    * indexes (x at even bit positions, y at odd). Rows close in z are
    * close in BOTH x and y — the property directory partitioning
    * (one column) and plain sorting (first column only) can't give.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-ordered parquet layout over two columns — the multi-column
    * data-skipping lever (Delta/Iceberg's OPTIMIZE ZORDER): each column
    * is scaled to a 2^bits bucket index by its min/max, the indexes are
    * bit-interleaved into a z-value, and the data is range-partitioned
    * and sorted by it. Every file (row group) then covers a small
    * rectangle of (x, y) space, so its parquet min/max stats on BOTH
    * columns are tight and a two-column box predicate skips almost
    * everything — where a sort by x alone leaves y's stats useless.
    * The min/max pass is one tiny aggregate (at 100 TB it comes from
    * table metadata); sorting cost is paid ONCE at write time, like
    * bucketing pays its shuffle. Layout must never change answers —
    * q41 oracles the z-ordered read against the plain table.
    */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
      bits: Int = 8, files: Int = 16): Unit = {
    require(bits >= 1 && 2 * bits <= 62, s"bits must be in 1..31, got $bits")
    require(files >= 1, s"files must be >= 1, got $files")
    // case-insensitive: Spark column resolution is case-insensitive
    require(!df.columns.exists(_.equalsIgnoreCase("__z")),
      "__z is reserved by writeZOrdered; rename that column on the input")
    val r = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"writeZOrdered: no non-NULL values in $xCol/$yCol (empty input?)")
    def bucket(c: Column, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit((1L << bits) - 1),
        ((c.cast("double") - lo) / span * (1L << bits)).cast("long"))
    }
    val z = zValue(bucket(col(xCol), r.getDouble(0), r.getDouble(1)),
      bucket(col(yCol), r.getDouble(2), r.getDouble(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Distributed 0-based global row index in `orderCol` order — the
    * general operator behind c18's sequence packing, exposed because
    * "number every row of a 100 TB table" is its own primitive
    * (training-order assignment, stable surrogate keys, offset files).
    * `row_number() OVER (ORDER BY x)` funnels the corpus into ONE
    * task; this is the two-pass form: (1) an intra-granule row_number
    * partitioned by granule = floor(order/`granule`) (monotone in the
    * order value, so granule order IS the global order; distributed),
    * (2) a prefix sum over the per-granule COUNTS (the only global
    * window runs over that rows/granule-sized relation) broadcast
    * back. Size `granule` so the totals relation stays driver-small:
    * order-domain/granule ≈ thousands of granules at any corpus size.
    *
    * `orderCol` must be a non-null long expression — the full signed
    * range is supported: the granule uses FLOOR division (Spark's
    * `div` truncates toward zero, which would collapse the −granule..
    * +granule window into one granule straddling 0 and break the
    * global order for negative keys). `tie` breaks equal order values
    * deterministically (pass the unique id — with a unique `orderCol`
    * it never fires but keeps the operator total-order-safe under
    * collisions, e.g. hash orders).
    */
  def globalIndex(df: DataFrame, orderCol: Column, tie: Column,
      granule: Long, out: String = "global_idx"): DataFrame = {
    require(granule > 0, s"granule must be positive, got $granule")
    // integer FLOOR div, not `/`+cast (a double quotient loses
    // exactness past 2^53 — hash-valued orders live in [0, 2^60))
    // and not bare `div` (truncation toward zero maps -1 and +1 to
    // the same granule 0, silently interleaving negative and
    // positive orders)
    val base = df.withColumn("__ord", orderCol.cast("long"))
      .withColumn("__g", expr(
        s"(__ord div ${granule}L) - " +
          s"(CASE WHEN __ord % ${granule}L < 0 THEN 1 ELSE 0 END)"))
    val intra = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__ord"), tie)
    val gTotals = base.groupBy(col("__g")).agg(count(lit(1)).as("__gt"))
    val gw = org.apache.spark.sql.expressions.Window.orderBy(col("__g"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val gOffsets = gTotals
      .withColumn("__goff", coalesce(sum(col("__gt")).over(gw), lit(0L)))
      .select(col("__g"), col("__goff"))
    base
      .withColumn("__rn", row_number().over(intra).cast("long"))
      .join(broadcast(gOffsets), Seq("__g"))
      .withColumn(out, col("__goff") + col("__rn") - 1)
      .drop("__g", "__rn", "__goff", "__ord")
  }
}
