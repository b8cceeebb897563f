package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The z-order layout's contract: results are layout-invariant (q41's
  * oracle proves that against DuckDB), and the SECOND column's parquet
  * min/max stats actually skip row groups — the property a plain sort
  * by the first column cannot give, measured here via the scan node's
  * output-row metric (rows surviving parquet row-group pruning).
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("zValue interleaves bits: x at even positions, y at odd") {
    import spark.implicits._
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 4).as("z"))
      .head().getLong(0)
    // x=0101 contributes bits 0 and 4; y=0011 contributes bits 1 and 3
    assert(got == ((1L << 0) | (1L << 1) | (1L << 3) | (1L << 4)))
    // monotone in each argument when the other is fixed
    val zs = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted && zs.distinct == zs)
  }

  /** Rows emitted by the parquet scan AFTER row-group pruning (and
    * before Spark's own Filter) — the data-skipping signal.
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scans = unwrap(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  private def deleteDir(p: java.nio.file.Path): Unit = {
    val s = java.nio.file.Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
    finally s.close()
  }

  test("the second column's stats skip under z-order; a single-column sort reads everything") {
    val n = 200000L
    val df = spark.range(n).select(
      pmod(hash(col("id")), lit(1000)).cast("long").as("x"),
      pmod(hash(col("id") * 7 + 1), lit(1000)).cast("long").as("y"),
      col("id"))
    val zdir = java.nio.file.Files.createTempDirectory("graft_ztest")
    val ldir = java.nio.file.Files.createTempDirectory("graft_ltest")
    try {
      Layout.writeZOrdered(df, zdir.toString, "x", "y", bits = 8, files = 32)
      df.repartitionByRange(32, col("x")).sortWithinPartitions("x")
        .write.mode("overwrite").parquet(ldir.toString)

      // predicate on y ALONE: the x-sorted layout has useless y stats
      // (every file spans y's full range) and must read ~all rows; the
      // z layout confines each file to a y-band and skips most of them
      def yOnly(dir: String) = spark.read.parquet(dir)
        .where(col("y").between(100, 199))
      val zRead = scanRows(yOnly(zdir.toString))
      val lRead = scanRows(yOnly(ldir.toString))
      assert(lRead >= (n * 9) / 10, s"x-sorted layout unexpectedly skipped: $lRead")
      assert(zRead * 2 <= lRead, s"zRead=$zRead lRead=$lRead")

      // a two-column box returns identical answers under both layouts
      def box(dir: String) = spark.read.parquet(dir)
        .where(col("x").between(100, 199) && col("y").between(100, 199))
      val zIds = box(zdir.toString).select("id").collect().map(_.getLong(0)).sorted.toSeq
      val lIds = box(ldir.toString).select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(zIds.nonEmpty && zIds == lIds)
    } finally {
      deleteDir(zdir); deleteDir(ldir)
    }
  }
}
