package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Warm-start PageRank (round 7): resuming from persisted ranks is
  * exact (the integer superstep is a deterministic map) and, after a
  * small graph delta, re-reaches the converged fixpoint in a fraction
  * of the cold supersteps — the d17 settle pattern for the g-family.
  */
class WarmStartSpec extends AnyFunSuite with SparkSpec {

  private def ranksMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("resume(k from k) equals cold(2k) exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val edges = (1 to 60).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct
      .toDF("src", "dst")
    val cold10 = ranksMap(Graph.pageRank(edges, iterations = 10))
    val seed5 = Graph.pageRank(edges, iterations = 5).localCheckpoint(true)
    val resumed = ranksMap(Graph.pageRank(edges, iterations = 5,
      seed = Some(seed5)))
    assert(resumed == cold10)
  }

  test("warm-started convergence reaches the cold fixpoint in fewer supersteps after a small delta") {
    import spark.implicits._
    // a ring with chords converges slowly enough from uniform to make
    // the superstep count differences visible at checkEvery = 1
    val n = 30L
    val ring = (0L until n).map(i => (i, (i + 1) % n))
    val chords = (0L until n by 5).map(i => (i, (i + 7) % n))
    val base = (ring ++ chords).toDF("src", "dst")
    val (baseRanks, _) =
      Graph.pageRankConverged(base, maxIterations = 200, checkEvery = 1)
    val seed = baseRanks.localCheckpoint(true)
    // the delta: two new chords (and the nodes they touch re-rank)
    val delta = (ring ++ chords ++ Seq((3L, 17L), (11L, 23L)))
      .toDF("src", "dst")
    val (coldRanks, coldSteps) =
      Graph.pageRankConverged(delta, maxIterations = 200, checkEvery = 1)
    val (warmRanks, warmSteps) =
      Graph.pageRankConverged(delta, maxIterations = 200, checkEvery = 1,
        seed = Some(seed))
    assert(ranksMap(warmRanks) == ranksMap(coldRanks),
      "warm start must land on the same integer fixpoint")
    assert(warmSteps < coldSteps,
      s"warm start must converge faster: warm=$warmSteps cold=$coldSteps")
  }

  test("a seed with departed and missing nodes is handled: new nodes start at Scale, departed nodes drop") {
    import spark.implicits._
    val seed = Seq((1L, 999999L), (99L, 5L)).toDF("node", "pagerank")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = ranksMap(Graph.pageRank(edges, iterations = 1,
      seed = Some(seed)))
    assert(out.keySet == Set(1L, 2L, 3L), out)
    // node 2's single superstep used node 1's SEEDED rank:
    // 150000 + (85 * 999999) div 100
    assert(out(2L) == 150000L + (85L * 999999L) / 100L, out)
  }
}
