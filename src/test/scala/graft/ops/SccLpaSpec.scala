package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** stronglyConnectedComponents: property-checked against brute-force
  * Warshall closure + mutual-reachability on randomized directed
  * graphs, planted-cycle shapes pinned, the degenerate path regime's
  * loud guard exercised. labelPropagationCommunities: determinism
  * across partitionings and the bridge-vs-clique separation weak CC
  * cannot express.
  */
class SccLpaSpec extends AnyFunSuite with SparkSpec {

  /** Brute-force SCC ids via Warshall transitive closure. */
  private def bruteScc(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val reach = Array.fill(n + 1, n + 1)(false)
    edges.foreach { case (u, v) => reach(u.toInt)(v.toInt) = true }
    for (k <- 1 to n; i <- 1 to n; j <- 1 to n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    (1 to n).map { v =>
      val mutual = (1 to n).filter(u =>
        u == v || (reach(u)(v) && reach(v)(u)))
      v.toLong -> mutual.min.toLong
    }.toMap
  }

  private def runScc(edges: Seq[(Long, Long)], maxRounds: Int = 10) = {
    import spark.implicits._
    Graph.stronglyConnectedComponents(
        edges.toDF("src", "dst"), maxRounds = maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("empty or all-null edge input yields an EMPTY (id, scc) relation, not null") {
    import spark.implicits._
    val empty = runScc(Seq.empty)
    assert(empty.isEmpty)
    val allNull = Graph.stronglyConnectedComponents(
        Seq((Option.empty[Long], Option.empty[Long]))
          .toDF("src", "dst"))
    assert(allNull.columns.toSeq == Seq("id", "scc"))
    assert(allNull.count() == 0L)
  }

  test("planted cycles: two rings joined by a one-way bridge stay separate SCCs") {
    // ring 1-2-3-1, ring 5-6-7-5, bridge 3 -> 5 (one-way: no merge),
    // plus a dangling tail 7 -> 9 (singleton)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (5L, 6L), (6L, 7L), (7L, 5L), (3L, 5L), (7L, 9L))
    val got = runScc(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 9L -> 9L), got)
  }

  test("a two-way bridge merges the rings into ONE SCC") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (5L, 6L), (6L, 7L), (7L, 5L), (3L, 5L), (5L, 1L))
    val got = runScc(edges)
    assert(got.values.toSet == Set(1L), got)
  }

  test("property: equals brute-force mutual reachability on randomized digraphs") {
    val n = 24
    for (seed <- Seq(2, 41, 97)) {
      val rnd = new scala.util.Random(seed)
      // dense enough to breed multi-node SCCs, sparse enough to keep
      // singleton chains in play
      val edges = (1 to 70).map(_ =>
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))).distinct
        .filter { case (u, v) => u != v }
      val got = runScc(edges, maxRounds = 24)
      val nodes = edges.flatMap { case (u, v) => Seq(u, v) }.toSet
      val want = bruteScc(n, edges).filter { case (v, _) => nodes(v) }
      assert(got == want, s"seed $seed")
    }
  }

  test("degenerate path peels one pivot per round: loud guard, then success with enough rounds") {
    val path = (1L until 6L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] { runScc(path, maxRounds = 2) }
    assert(e.getMessage.contains("maxRounds"), e.getMessage)
    val got = runScc(path, maxRounds = 6)
    assert(got == (1L to 6L).map(v => v -> v).toMap, got)
  }

  test("self-loops and duplicate edges do not disturb the decomposition") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (3L, 3L))
    val got = runScc(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), got)
  }

  test("sccBounded: pinned to the distributed decomposition on randomized digraphs; guard refuses") {
    import spark.implicits._
    val n = 24
    for (seed <- Seq(2, 41, 97)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 70).map(_ =>
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))).distinct
        .filter { case (u, v) => u != v }
      // string ids: sccBounded's contract (the x06 table graph); pad
      // so string min-order == numeric min-order
      val sEdges = edges.map { case (u, v) => (f"n$u%03d", f"n$v%03d") }
        .toDF("src", "dst")
      val dist = Graph.stronglyConnectedComponents(sEdges, maxRounds = 24)
        .collect().map(r => r.getString(0) -> r.getString(1)).toSeq.sorted
      val bounded = Graph.sccBounded(sEdges)
        .collect().map(r => r.getString(0) -> r.getString(1)).toSeq.sorted
      assert(bounded == dist, s"seed $seed")
    }
    val big = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.sccBounded(big, maxEdges = 2)
    }
    assert(ex.getMessage.contains("maxEdges"))
  }

  test("LPA: a bridge edge joins weak components but NOT communities") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids; if a < b) yield (a, b)
    val edges = (clique(1L to 5L) ++ clique(6L to 10L) :+ ((5L, 6L)))
      .toDF("src", "dst")
    val comm = Graph.labelPropagationCommunities(edges, supersteps = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cA = (1L to 5L).map(comm).toSet
    val cB = (6L to 10L).map(comm).toSet
    assert(cA.size == 1 && cB.size == 1 && cA != cB,
      s"cliques must settle on two distinct labels: $comm")
    // weak CC sees ONE component across the same edges
    val sym = edges.select(col("src"), col("dst"))
    val cc = Graph.stronglyConnectedComponents(
      sym.unionByName(sym.select(col("dst").as("src"), col("src").as("dst"))),
      maxRounds = 10)
    assert(cc.select("scc").distinct().count() == 1)
  }

  test("LPA: identical labels across partitionings (synchronous + deterministic ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val edges = (1 to 120).map(_ =>
      (1L + rnd.nextInt(30), 1L + rnd.nextInt(30)))
      .filter { case (u, v) => u != v }
    def run(parts: Int) = Graph.labelPropagationCommunities(
        edges.toDF("src", "dst").repartition(parts), supersteps = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    assert(run(1) == run(13))
  }
}
