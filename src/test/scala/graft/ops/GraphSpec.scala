package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Graph family (g01/g02): chain-edge derivation (the k−1-edges-per-
  * group scale property), hand-computed integer PageRank, and
  * partitioning-invariance (the integer-determinism claim).
  */
class GraphSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("chainEdges links consecutive users per group - k-1 edges, never the clique") {
    val ev = Seq(
      ("click", ts(1), 10L), ("click", ts(2), 20L), ("click", ts(3), 30L),
      ("view", ts(4), 20L), ("view", ts(5), 10L),
      ("click", ts(6), 10L) // repeat user: min(ts) keeps first position
    ).toDF("event_type", "t", "user_id")
    val e = Graph.chainEdges(ev, Seq(col("event_type")), "user_id", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    // click group: 3 users -> exactly 2 edges (10->20, 20->30);
    // view group: 20 before 10 -> 20->10
    assert(e === Set(10L -> 20L, 20L -> 30L, 20L -> 10L))
  }

  test("pageRank matches the hand-computed integer fixpoint") {
    // a -> b, a -> c: outdeg(a)=2; b,c dangling.
    // iter1: r(a)=150000; r(b)=r(c)=150000 + 85*1000000/200 = 575000
    // iter2+: contrib from a = 85*150000/200 = 63750 -> b=c=213750, stable
    val e = Seq(1L -> 2L, 1L -> 3L).toDF("src", "dst")
    val r = Graph.pageRank(e, iterations = 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 150000L, 2L -> 213750L, 3L -> 213750L))
  }

  test("personalizedPageRank: teleport lands only on seeds; unreachable nodes are exactly 0") {
    // seed {1}: 1 -> 2, and an ISOLATED pair 3 -> 4 unreachable from
    // the seed. r0: 1=Scale, others 0.
    // iter1: r(1)=150000, r(2)=0+85*1000000/100=850000, r(3)=r(4)=0
    // iter2: r(2)=85*150000/100=127500; stable from iter3 on
    val e = Seq(1L -> 2L, 3L -> 4L).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r = Graph.personalizedPageRank(e, seeds, iterations = 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 150000L, 2L -> 127500L, 3L -> 0L, 4L -> 0L))
  }

  test("personalizedPageRank with ALL nodes seeded equals plain pageRank") {
    val e = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L).toDF("src", "dst")
    val all = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("node")
    val plain = Graph.pageRank(e, iterations = 6).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val pers = Graph.personalizedPageRank(e, all, iterations = 6).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(pers === plain)
  }

  test("a 2-cycle is the exact fixpoint (mass conserved by integer division)") {
    val e = Seq(1L -> 2L, 2L -> 1L).toDF("src", "dst")
    val r = Graph.pageRank(e, iterations = 7).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("triangleCounts: K4 puts every node in 3 triangles; a path has none") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + a path 10-11-12
    // (no triangle) + a duplicate/reversed edge and a self-loop that
    // must not change counts
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield a -> b
    val edges = (k4 ++ Seq(10L -> 11L, 11L -> 12L, 2L -> 1L, 5L -> 5L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts is invariant to edge direction and partitioning") {
    val es = (1L to 120L).flatMap(i =>
      Seq(i -> ((i * 7) % 40 + 1), i -> ((i * 11) % 40 + 1)))
    val a = Graph.triangleCounts(es.toDF("src", "dst"))
      .orderBy("node").collect().map(_.toSeq)
    val flipped = es.map { case (s, d) => (d, s) }
    val b = Graph.triangleCounts(flipped.toDF("src", "dst").repartition(13))
      .orderBy("node").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("ancestorClosure emits every (node, ancestor, depth) pair of a deep chain") {
    // 1 <- 2 <- ... <- 7: node i has parent i-1
    val chain = (2L to 7L).map(i => i -> (i - 1)).toDF("node", "parent")
    val got = Graph.ancestorClosure(chain, maxDepth = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      n <- 2L to 7L; a <- 1L until n
    } yield (n, a, n - a)).toSet
    assert(got === want)
  }

  test("ancestorClosure truncates at maxDepth and handles forests") {
    val forest = Seq(2L -> 1L, 3L -> 2L, 12L -> 11L).toDF("node", "parent")
    val got = Graph.ancestorClosure(forest, maxDepth = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((2L, 1L, 1L), (3L, 2L, 1L), (12L, 11L, 1L)))
  }

  test("ranks are invariant to edge partitioning (integer sums commute)") {
    val edges = (1L to 200L).map(i => i -> ((i * 13) % 50 + 1))
    val a = Graph.pageRank(edges.toDF("src", "dst"), 4)
      .orderBy("node").collect().map(_.toSeq)
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(11), 4)
      .orderBy("node").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("pageRankConverged stops at the integer fixpoint, far before maxIterations") {
    // a -> b, a -> c reaches its EXACT fixpoint at superstep 2 (see the
    // hand-computed test above); with checkEvery=1 the residual action
    // detects Δ=0 at superstep 3 and stops — not at maxIterations=50
    val e = Seq(1L -> 2L, 1L -> 3L).toDF("src", "dst")
    val (ranks, rounds) =
      Graph.pageRankConverged(e, maxIterations = 50, epsilonUnits = 1L,
        checkEvery = 1)
    assert(rounds < 10, s"expected early stop, ran $rounds supersteps")
    val r = ranks.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the converged ranks ARE the fixed-depth ranks at any depth >= 2
    assert(r === Map(1L -> 150000L, 2L -> 213750L, 3L -> 213750L))
    val fixed = Graph.pageRank(e, iterations = rounds).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === fixed)
  }

  test("pageRankConverged at maxIterations equals the fixed-depth variant on a slow graph") {
    // the path 1->2->3 only reaches its integer fixpoint at superstep
    // 4 (rank flows one hop per superstep), so with maxIterations=3
    // the loop must run exactly 3 and match pageRank(3)
    val path = Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst")
    val (ranks, rounds) =
      Graph.pageRankConverged(path, maxIterations = 3, epsilonUnits = 1L,
        checkEvery = 2)
    assert(rounds === 3)
    val got = ranks.orderBy("node").collect().map(_.toSeq)
    val want = Graph.pageRank(path, iterations = 3)
      .orderBy("node").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("bfsDistances: diamond paths resolve to the minimum, cycles terminate, bound respected") {
    import spark.implicits._
    // diamond 1->{2,3}->4 plus long way 1->5->6->4, a cycle 4->1, and
    // an unreachable island 8->9; seeds = {1, 7} (7 isolated)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L), (4L, 1L), (8L, 9L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 7L).toDF("id")
    val got = Graph.bfsDistances(edges, seeds, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 is reached at 2 (via 2 or 3), never relabeled by the length-3
    // path; the cycle back to 1 does not relabel 1; isolated seed 7
    // surfaces at 0; island {8,9} is absent
    assert(got === Map(1L -> 0L, 7L -> 0L, 2L -> 1L, 3L -> 1L,
      5L -> 1L, 4L -> 2L, 6L -> 2L))
  }

  /** The engine's register derivation replayed in pure Scala: 32-bit
    * md5 prefix hash, bucket = low 6 bits (mod 64), rho = leading
    * zeros of the 26-bit value + 1.
    */
  private def expectedSketch(ids: Set[Long]): (Long, Long) = {
    val regs = ids.toSeq.map { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val v = h / 64
      val rho = (1 to 26).find(i => v >= (1L << (26 - i))).getOrElse(27)
      (h % 64) -> rho
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    (regs.size.toLong, regs.values.map(r => 1L << (27 - r)).sum)
  }

  test("hyperBall: sketches equal the reachable-set registers on a path graph") {
    // 1 -> 2 -> 3: out-balls are r0 {v}, r1(1) = {1,2}, r2(1) = {1,2,3}
    val e = Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst")
    val got = Graph.hyperBall(e, radius = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val balls = Map(
      (1L, 0L) -> Set(1L), (2L, 0L) -> Set(2L), (3L, 0L) -> Set(3L),
      (1L, 1L) -> Set(1L, 2L), (2L, 1L) -> Set(2L, 3L), (3L, 1L) -> Set(3L),
      (1L, 2L) -> Set(1L, 2L, 3L), (2L, 2L) -> Set(2L, 3L),
      (3L, 2L) -> Set(3L))
    assert(got === balls.map { case (k, ids) => k -> expectedSketch(ids) })
  }

  test("hyperBall: partitioning-invariant and monotone in the radius") {
    val e = (1L to 40L).map(i => i -> (i % 40 + 1)).toDF("src", "dst")
    val a = Graph.hyperBall(e, radius = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val b = Graph.hyperBall(e.repartition(7), radius = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // registers only ever max-merge: n_regs never shrinks as r grows
    val byNode = a.groupBy(_._1._1)
    byNode.values.foreach { rows =>
      val ordered = rows.sortBy(_._1._2).map(_._2._1)
      assert(ordered.zip(ordered.tail).forall { case (x, y) => x <= y })
    }
  }

  test("bipartiteProjection: pair weights by shared nodes; hub nodes capped out") {
    // users 1,2 share items a,b; user 3 adds (b,c); hub user 9 touches
    // everything but exceeds the cap and must contribute NO pairs
    val m = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "c"),
      (9L, "a"), (9L, "b"), (9L, "c"), (9L, "d")
    ).toDF("user", "item")
    val got = Graph.bipartiteProjection(m, "user", "item",
        maxItemsPerNode = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("a", "b") -> 2L, ("b", "c") -> 1L))
    // duplicate membership rows must not inflate weights
    val got2 = Graph.bipartiteProjection(m.union(m), "user", "item",
        maxItemsPerNode = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got2 === got)
  }

  test("resourceAllocation: micro-unit 1/deg wedge sums, existing edges excluded") {
    // path graph 1-2-3 plus 2-4: center 2 has degree 3, so each wedge
    // through it contributes 1000000 div 3 = 333333. Non-adjacent
    // pairs via 2: (1,3), (1,4), (3,4). Pair (1,3) also has no other
    // common neighbor. Centers 1/3/4 have degree 1 -> no wedges.
    val e = Seq(1L -> 2L, 2L -> 3L, 2L -> 4L).toDF("src", "dst")
    val got = Graph.resourceAllocation(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(
      (1L, 3L) -> (1L, 333333L),
      (1L, 4L) -> (1L, 333333L),
      (3L, 4L) -> (1L, 333333L)))
    // adding edge 1-3 removes that pair from the prediction set
    val e2 = e.union(Seq(3L -> 1L).toDF("src", "dst"))
    val got2 = Graph.resourceAllocation(e2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got2.contains((1L, 3L)))
    // a center past maxWedgeDegree contributes nothing
    val capped = Graph.resourceAllocation(e, maxWedgeDegree = 2).collect()
    assert(capped.isEmpty)
  }
}
