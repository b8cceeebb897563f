package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SegmentationSpec extends AnyFunSuite with SparkSpec {

  test("exact threshold tiles equal ntile on distinct-valued data (asc and desc, n not divisible by k)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 20 distinct values, n % 3 != 0 exercises the uneven-tile ranks
    val vals = rnd.shuffle((1L to 200L).toList).take(20)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    for (asc <- Seq(true, false)) {
      val tiled = Segmentation.quantileTiles(df, Seq(("v", asc)), k = 3)
      val w = if (asc) Window.orderBy(col("v").asc, col("id"))
              else Window.orderBy(col("v").desc, col("id"))
      val expected = df.withColumn("nt", ntile(3).over(w).cast("long"))
      val joined = tiled.join(expected.select("id", "nt"), "id")
      assert(joined.where(col("v_tile") =!= col("nt")).count() == 0,
        s"asc=$asc: ${joined.orderBy("v").collect().mkString("\n")}")
    }
  }

  test("ntileBoundaryRanks matches ntile's uneven split") {
    // n=10, k=3 -> tiles of 4,3,3 -> boundaries at ranks 4 and 7
    assert(Segmentation.ntileBoundaryRanks(10L, 3) == Seq(4L, 7L))
    // n=9, k=3 -> 3,3,3 -> 3 and 6
    assert(Segmentation.ntileBoundaryRanks(9L, 3) == Seq(3L, 6L))
    // n=5, k=4 -> 2,1,1,1 -> 2,3,4
    assert(Segmentation.ntileBoundaryRanks(5L, 4) == Seq(2L, 3L, 4L))
  }

  test("tie groups land in ONE tile (the at-scale semantics ntile cannot state)") {
    import spark.implicits._
    // 6 rows, 2 distinct values; ntile(3) would split each tie group
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("id", "v")
    val tiled = Segmentation.quantileTiles(df, Seq(("v", true)), k = 3)
      .select("v", "v_tile").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tiled.size == 2, s"each value maps to exactly one tile: $tiled")
    assert(tiled(10L) < tiled(20L))
  }

  test("null metric rows carry no threshold mass (both paths), matching the streaming histogram rule") {
    import spark.implicits._
    val clean = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(30L)))
    val withNulls = clean ++ Seq((4L, None: Option[Long]), (5L, None: Option[Long]))
    def df(rows: Seq[(Long, Option[Long])]) = rows.toDF("id", "v")
    assert(Segmentation.exactThresholds(df(withNulls), "v", 2) ==
      Segmentation.exactThresholds(df(clean), "v", 2))
    assert(Segmentation.approxThresholds(df(withNulls), "v", 2) ==
      Segmentation.approxThresholds(df(clean), "v", 2))
  }

  test("empty histogram (no data / all-null metric) yields no thresholds and tile 1, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("v", "c")
    assert(Segmentation.thresholdsFromCounts(empty, 3) == Seq.empty)
    val allNull = Seq((1L, None: Option[Long]), (2L, None: Option[Long]))
      .toDF("id", "v")
    val tiled = Segmentation.quantileTiles(allNull, Seq(("v", true)), k = 3)
      .select("v_tile").collect().map(_.getLong(0)).toSet
    assert(tiled == Set(1L))
  }

  test("approx path: tiles are monotone in the metric and within [1, k]") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, i * 7L % 501L)).toDF("id", "v")
    val tiled = Segmentation.quantileTiles(df, Seq(("v", true)), k = 4,
        exact = false)
      .select("v", "v_tile").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tiled.forall { case (_, t) => t >= 1 && t <= 4 })
    val sorted = tiled.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
      "tile must be non-decreasing in the metric")
    assert(sorted.distinct.length == 4, "all four tiles populated at n=500")
  }

  test("no global per-row sort in the tiled plan: the only window runs over the value axis") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 7L)).toDF("id", "v")
    val tiled = Segmentation.quantileTiles(df, Seq(("v", true)), k = 3)
    // tile assignment itself is pure column math: no Window, no Sort
    // over the row relation in the final plan
    val plan = tiled.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"), plan)
  }
}
