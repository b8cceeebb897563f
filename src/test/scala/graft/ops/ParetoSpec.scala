package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ParetoSpec extends AnyFunSuite with SparkSpec {

  private def frontier(pts: Seq[(Long, Double, Double)],
      buckets: Int = 1024): Set[Long] = {
    import spark.implicits._
    Curation.paretoFrontier2d(pts.toDF("id", "x", "y"), "id", "x", "y",
        buckets = buckets)
      .collect().map(_.getLong(0)).toSet
  }

  // reference dominance: q beats p iff (q.x > p.x && q.y >= p.y) ||
  // (q.x == p.x && q.y > p.y) || (same point, lower id)
  private def naive(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filterNot { case (id, x, y) =>
      pts.exists { case (id2, x2, y2) =>
        (x2 > x && y2 >= y) || (x2 == x && y2 > y) ||
          (x2 == x && y2 == y && id2 < id)
      }
    }.map(_._1).toSet

  test("staircase with interior, duplicate and equal-x points") {
    val pts = Seq(
      (1L, 1.0, 9.0), (2L, 5.0, 5.0), (3L, 9.0, 1.0), // the staircase
      (4L, 4.0, 4.0),  // dominated by 2
      (5L, 5.0, 5.0),  // duplicate of 2 -> lowest id wins
      (6L, 5.0, 4.0),  // equal x, lower y -> dominated
      (7L, 9.0, 1.0))  // duplicate of 3
    val expect = Set(1L, 2L, 3L)
    assert(frontier(pts) == expect)
    assert(naive(pts) == expect)
  }

  test("property: matches brute-force dominance on randomized points") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      // duplicated x and y values on purpose (integer grid)
      val pts = (1L to 120L).map(i =>
        (i, rnd.nextInt(12).toDouble, rnd.nextInt(12).toDouble))
      assert(frontier(pts) == naive(pts))
    }
  }

  test("bucket-count invariance: 1 bucket == 1024 buckets == 7 buckets") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 80L).map(i =>
      (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val expect = naive(pts)
    assert(frontier(pts, buckets = 1) == expect)
    assert(frontier(pts, buckets = 7) == expect)
    assert(frontier(pts, buckets = 1024) == expect)
  }

  test("nulls dropped; single point survives; reserved columns rejected") {
    import spark.implicits._
    val withNulls = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 3.0, 3.0), (2L, null, 9.0), (3L, 9.0, null))
      .toDF("id", "x", "y")
    val out = Curation.paretoFrontier2d(withNulls, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
    val bad = Seq((1L, 1.0, 1.0, 0L)).toDF("id", "x", "y", "__B")
    val e = intercept[IllegalArgumentException] {
      Curation.paretoFrontier2d(bad, "id", "x", "y")
    }
    assert(e.getMessage.contains("reserved"))
  }
}
