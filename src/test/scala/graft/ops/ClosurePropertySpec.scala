package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property check: [[Graph.ancestorClosure]] must equal the
  * brute-force walk-to-root closure on random forests — including
  * multi-root forests, chains longer than a "typical" tree, and nodes
  * with many siblings. Seeded generation, a handful of Spark-sized
  * samples (each case is a real job).
  */
class ClosurePropertySpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  /** Random forest on n nodes: node i (2-indexed) gets a parent drawn
    * from [1, i) with probability p, else becomes a root. Parent < child
    * guarantees acyclicity.
    */
  private def randomForest(n: Int, p: Double, rnd: Random): Seq[(Long, Long)] =
    (2 to n).flatMap { i =>
      if (rnd.nextDouble() < p) Some(i.toLong -> (rnd.nextInt(i - 1) + 1).toLong)
      else None
    }

  private def walkClosure(edges: Seq[(Long, Long)],
      maxDepth: Int): Set[(Long, Long, Long)] = {
    val parent = edges.toMap
    edges.map(_._1).flatMap { n =>
      Iterator.iterate(Option(parent(n)))(a => a.flatMap(parent.get))
        .takeWhile(_.isDefined).take(maxDepth)
        .zipWithIndex
        .map { case (a, d) => (n, a.get, (d + 1).toLong) }
    }.toSet
  }

  test("closure equals the brute-force walk on random forests (seeded)") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 4) {
      val n = 20 + trial * 15
      val edges = randomForest(n, 0.8, rnd)
      val depth = 12
      val got = Graph.ancestorClosure(edges.toDF("node", "parent"), depth)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = walkClosure(edges, depth)
      assert(got === want, s"trial $trial (n=$n, ${edges.size} edges)")
    }
  }

  test("path-doubling closure equals the unrolled closure on random forests (seeded)") {
    val rnd = new Random(20260815L)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 15
      val edges = randomForest(n, 0.8, rnd)
      // a NON-power-of-two depth exercises the final-round overshoot
      // filter; the unrolled variant is already walk-proven above
      val depth = 11
      val viaDoubling =
        Graph.ancestorClosureDoubling(edges.toDF("node", "parent"), depth)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaDoubling === walkClosure(edges, depth),
        s"trial $trial (n=$n, ${edges.size} edges)")
    }
  }

  test("path-doubling handles a chain deeper than any practical unroll in log rounds") {
    // a 100-deep chain: the unrolled variant would need 100 sequential
    // joins; doubling needs 7 checkpointed rounds. Every (node,
    // ancestor, depth) pair of the full chain must appear.
    val chain = (2 to 101).map(i => (i.toLong, (i - 1).toLong))
    val got = Graph.ancestorClosureDoubling(chain.toDF("node", "parent"), 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === walkClosure(chain, 128))
    assert(got.size === (100 * 101) / 2) // Σ depth-of-node pairs
    assert(got.contains((101L, 1L, 100L))) // the deepest pair
  }
}
