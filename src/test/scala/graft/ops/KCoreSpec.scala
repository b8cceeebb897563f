package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Graph.kCore vs a reference peel loop: equality on random graphs
  * (survivor set AND in-core degrees), the cascade case (removing one
  * node pushes a chain under k), loud non-convergence, and duplicate/
  * self-loop edge hygiene.
  */
class KCoreSpec extends AnyFunSuite with SparkSpec {

  private def refKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges
    var stable = false
    while (!stable) {
      val deg = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = e.filter { case (a, b) => keep(a) && keep(b) }
      stable = next == e
      e = next
    }
    e.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 20): Map[Long, Long] = {
    import spark.implicits._
    Graph.kCore(edges.toDF("src", "dst"), k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("property: equals the reference peel on random graphs, several k") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (1 to 300).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (a, b)
      }.filter { case (a, b) => a != b }
      val canonical = edges.map { case (a, b) => (a min b, a max b) }.toSet
      for (k <- Seq(2, 5, 9)) {
        assert(run(edges, k) == refKCore(canonical, k), s"trial $trial k $k")
      }
    }
  }

  test("cascade: peeling one leaf unravels a chain; the clique core survives") {
    // 4-clique {1,2,3,4} + pendant chain 4-5-6: at k=2 the chain dies
    // over CASCADING rounds (6 first, then 5), the clique stays
    val clique = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val got = run(clique ++ Seq((4L, 5L), (5L, 6L)), k = 2)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.toSet == Set(3L))
  }

  test("not converged within maxRounds throws loudly, never a partial peel") {
    // a 12-node path at k=2 unravels one node per end per round — needs
    // ~6 rounds; cap at 2 must throw
    val path = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] { run(path, k = 2, maxRounds = 2) }
    assert(e.getMessage.contains("not converged"), e.getMessage)
    // with enough rounds the same path converges to the empty core
    assert(run(path, k = 2).isEmpty)
  }

  test("self-loops and duplicate/reversed edges do not inflate degrees") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L), (3L, 1L))
    // triangle at k=2; the self-loop and duplicates add nothing
    val got = run(edges, k = 2)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
