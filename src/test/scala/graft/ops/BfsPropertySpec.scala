package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property check: [[Graph.bfsDistances]] must equal the brute-force
  * level-by-level reference on random directed graphs — including
  * cycles, diamonds (multiple paths of different lengths to one node)
  * and unreachable islands. Seeded generation; each case is a real
  * Spark job.
  */
class BfsPropertySpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  /** Random directed graph: m edges drawn uniformly over [1, n]², self
    * loops discarded. Cycles and diamonds arise naturally.
    */
  private def randomGraph(n: Int, m: Int, rnd: Random): Seq[(Long, Long)] =
    Seq.fill(m)((rnd.nextInt(n) + 1).toLong -> (rnd.nextInt(n) + 1).toLong)
      .filter { case (a, b) => a != b }.distinct

  /** Reference BFS: plain level-by-level set expansion on the driver. */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      maxDepth: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (d <- 1 to maxDepth) {
      frontier = frontier.flatMap(x => adj.getOrElse(x, Set.empty))
        .diff(dist.keySet)
      dist = dist ++ frontier.map(_ -> d.toLong)
    }
    dist
  }

  test("bfsDistances equals the reference expansion on random digraphs (seeded)") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 4) {
      val n = 15 + trial * 10
      val edges = randomGraph(n, n * 2, rnd)
      val seeds = (1 to n).filter(_ => rnd.nextDouble() < 0.15)
        .map(_.toLong).toSet + 1L
      val depth = 2 + trial
      val got = Graph.bfsDistances(edges.toDF("src", "dst"),
          seeds.toSeq.toDF("id"), maxDepth = depth)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === refBfs(edges, seeds, depth),
        s"trial=$trial n=$n seeds=$seeds depth=$depth")
    }
  }
}
