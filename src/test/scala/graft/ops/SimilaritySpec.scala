package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  test("ivfPqTopK probes only the query's lists and ranks by ADC") {
    import spark.implicits._
    // two well-separated clusters as the label/list structure; dim 4
    // splits into m=2 subspaces of 2. nprobe=1 must confine every
    // neighbor to the query's own cluster list.
    val corpus = Seq(
      (0L, 0L, Array(1.0f, 0.9f, 0.0f, 0.1f)),
      (1L, 0L, Array(0.9f, 1.0f, 0.1f, 0.0f)),
      (2L, 0L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
      (3L, 1L, Array(0.0f, 0.1f, 1.0f, 0.9f)),
      (4L, 1L, Array(0.1f, 0.0f, 0.9f, 1.0f)),
      (5L, 1L, Array(0.0f, 0.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val queries = corpus.where(col("vec_id") === 0L)
    val out = Similarity.ivfPqTopK(corpus, queries, topK = 5, nprobe = 1,
        m = 2, codebookK = 2, iters = 2)
      .orderBy("rank").collect()
    // cluster 0 has two other members; nprobe=1 must exclude cluster 1
    // entirely even though topK would admit it
    assert(out.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 2L))
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
    val dists = out.map(_.getAs[Long]("adc_dist"))
    assert(dists.sameElements(dists.sorted), "ranks must follow ADC order")
  }

  test("mmrRerank defers a redundant near-copy in favor of a diverse item") {
    import spark.implicits._
    // a and a2 are near-copies aligned with the query; b is moderately
    // relevant but diverse. Pure top-3 would pick (a, a2, b); MMR must
    // pick a, then b (a2's redundancy penalty ~1.0 sinks it), then a2.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f, 0.0f)),   // a
      (2L, Array(1.0f, 0.0f, 0.1f, 0.05f)),  // a2 ~ a
      (3L, Array(0.5f, 0.8f, 0.0f, 0.0f)),   // b: diverse
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f))    // c: irrelevant
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(corpus, queries, poolSize = 4, k = 3)
      .orderBy("pick").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 2L))
    // pick 1's mmr_score is its relevance; later scores are penalized
    assert(out(0).getAs[Double]("mmr_score") == out(0).getAs[Double]("rel"))
    assert(out(2).getAs[Double]("mmr_score") < out(2).getAs[Double]("rel"))
  }

  test("knnGraph edges stay within LSH buckets, rank top-k, and the plan never broadcasts the corpus") {
    import spark.implicits._
    // two sign-separated bucket families: +x-ish vectors and -x-ish
    val corpus = Seq(
      (1L, Array(1.0f, 0.2f, 0f, 0f)), (2L, Array(1.0f, 0.1f, 0f, 0f)),
      (3L, Array(0.9f, 0.3f, 0f, 0f)), (4L, Array(-1.0f, 0.2f, 0f, 0f)),
      (5L, Array(-0.9f, 0.1f, 0f, 0f))).toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(corpus, k = 2, bits = 2)
    val edges = g.collect().map(r =>
      (r.getAs[Long]("node_id"), r.getAs[Long]("neighbor_id"))).toSet
    // no cross-sign edge can exist (different sign buckets)
    assert(edges.forall { case (a, b) => (a <= 3) == (b <= 3) })
    // every node has a same-bucket peer, so every node emits edges
    assert(g.select("node_id").distinct().count() === 5)
    // rank bounded by k
    assert(g.agg(max("rank")).head().getLong(0) <= 2)
    // the self-join must be a shuffle equi-join on the bucket — a
    // broadcast of the corpus side is the anti-pattern this operator
    // exists to avoid (fine at 5 rows, fatal at 10^9)
    val p = g.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("knnGraph candidate-budget guard trips BEFORE the self-join on a skewed corpus") {
    import spark.implicits._
    // every vector lands in the same sign bucket (all dims positive):
    // 6 vectors -> C(6,2)=15 candidate pairs > the budget of 10. The
    // guard must fail fast with a diagnosis pointing at `bits`.
    val skewed = (1L to 6L).map(i =>
      (i, Array(1.0f, 0.5f + i * 0.01f, 0.3f, 0.2f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalStateException] {
      Similarity.knnGraph(skewed, k = 2, bits = 2, maxCandidatePairs = 10L)
    }
    assert(ex.getMessage.contains("bits"), ex.getMessage)
    assert(ex.getMessage.contains("budget"), ex.getMessage)
    // same corpus under an adequate budget still answers
    assert(Similarity.knnGraph(skewed, k = 2, bits = 2,
      maxCandidatePairs = 15L).count() > 0)
  }

  test("knnGraphBanded guard sums candidate volume across bands") {
    import spark.implicits._
    val skewed = (1L to 6L).map(i =>
      (i, Array(1.0f, 0.5f + i * 0.01f, 0.3f, 0.2f))).toDF("vec_id", "embedding")
    // 2 bands x (up to) C(6,2) pairs each; a 15-pair budget that a
    // single band could satisfy must still trip when both bands' sums
    // exceed it
    val ex = intercept[IllegalStateException] {
      Similarity.knnGraphBanded(skewed, k = 2, bands = 2, bitsPerBand = 1,
        dim = 4, maxCandidatePairs = 15L)
    }
    assert(ex.getMessage.contains("bitsPerBand"), ex.getMessage)
  }

  test("scaledBits keeps expected bucket size bounded and is monotone in n") {
    assert(Similarity.scaledBits(1024L) == 4)           // floor
    assert(Similarity.scaledBits(1L << 20) == 10)       // 2^20/2^10 = 1024
    assert(Similarity.scaledBits(3_000_000L) == 12)     // 3M/2^12 ~ 732
    val bs = Seq(1L << 10, 1L << 15, 1L << 20, 1L << 30).map(
      Similarity.scaledBits(_))
    assert(bs == bs.sorted, s"monotone: $bs")
    // the contract: n / 2^bits <= target once past the floor
    for (n <- Seq(1L << 16, 1L << 22, 1L << 28))
      assert((n >> Similarity.scaledBits(n)) <= 1024L)
  }

  test("occupancy-scaled bits: escalation survives a skewed corpus the fixed bits refuse") {
    import spark.implicits._
    // all 40 vectors share the sign pattern in every dim at 1 bit, so
    // fixed bitsPerBand=1 collapses them into one bucket per band:
    // 2 bands x C(40,2) = 1560 candidates > the 400 budget -> the
    // fixed form trips the guard. With targetP99Occupancy the operator
    // MEASURES the p99 occupancy (40), escalates bits by
    // ceil(log2(40/8)) and re-measures until the tail fits — same
    // corpus, same budget, answers instead of refusing.
    val rnd = new scala.util.Random(11)
    val skewed = (1L to 40L).map(i =>
      (i, Array.fill(8)(0.2f + rnd.nextFloat() * 0.8f))).toDF("vec_id", "embedding")
    intercept[IllegalStateException] {
      Similarity.knnGraphBanded(skewed, k = 2, bands = 2, bitsPerBand = 1,
        dim = 8, maxCandidatePairs = 400L)
    }
    val g = Similarity.knnGraphBanded(skewed, k = 2, bands = 2,
      bitsPerBand = 1, dim = 8, maxCandidatePairs = 400L,
      targetP99Occupancy = 8L)
    assert(g.count() >= 0) // ran: the guard was satisfied post-escalation
  }

  test("occupancy-scaled bits: identical output to fixed bits when the target is already met") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 24L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    def edges(target: Long) =
      Similarity.knnGraphBanded(corpus, k = 3, bands = 2, bitsPerBand = 3,
        dim = 8, targetP99Occupancy = target)
        .collect().map(r => (r.getAs[Long]("node_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
    // 24 vectors over 2^3 buckets: p99 occupancy is well under 24, so
    // a generous target must leave the plan and the output untouched
    assert(edges(0L) == edges(24L))
  }

  test("knnGraphBanded is the OR-construction: adding a band only grows the candidate pair set") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 24L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    // k >= n makes the top-k filter vacuous, so the output IS the
    // scored candidate set — band-2's must be a superset of band-1's
    def pairs(bands: Int) =
      Similarity.knnGraphBanded(corpus, k = 30, bands = bands,
        bitsPerBand = 3, dim = 8)
        .select("node_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1); val two = pairs(2)
    assert(one.subsetOf(two), s"missing: ${one -- two}")
    // distinct'd: no duplicate edge survives the cross-band union
    val g = Similarity.knnGraphBanded(corpus, k = 30, bands = 2,
      bitsPerBand = 3, dim = 8)
    assert(g.count() ==
      g.select("node_id", "neighbor_id").distinct().count())
    // symmetric candidate generation: the self-join admits (a,b) iff
    // (b,a), and k is vacuous, so the edge set is symmetric
    assert(two.forall { case (a, b) => two.contains((b, a)) })
    val p = g.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("multiprobeTopK: superset of single-probe candidates, recovers one-plane misses") {
    import spark.implicits._
    val planes = graft.functions.VectorFunctions.srpPlanes(bits = 8, dim = 16)
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 200L).map(i =>
      (i, 0, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "label", "embedding")
    val queries = corpus.where(col("vec_id") < 5)
    def neighbors(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => r.getLong(0) -> r.getLong(2)).toSet
    // k large enough that ranking never hides a candidate: the
    // multiprobe result must CONTAIN every single-probe neighbor
    val single = neighbors(Similarity.srpTopK(corpus, queries, k = 200, planes))
    val multi = neighbors(Similarity.multiprobeTopK(corpus, queries, k = 200, planes))
    assert(single.subsetOf(multi), s"missing: ${single -- multi}")
    // and the ring genuinely widens it on a random corpus
    assert(multi.size > single.size,
      s"radius-1 probing added nothing (single=${single.size})")
    // plan: bucket equi-join, never a cartesian
    val p = Similarity.multiprobeTopK(corpus, queries, k = 3, planes)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("hardNegatives: same-label excluded, near-dup ceiling fires, ranking by cosine") {
    import spark.implicits._
    // anchor 0 (label 0); 1 = same-label twin (must never appear);
    // 2 = DIFFERENT-label exact twin (cosine 1.0 -> cut by dupMax);
    // 3, 4 = genuine negatives at decreasing cosine
    val corpus = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f)),
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 1, Array(1.0f, 0.0f, 0.0f)),
      (3L, 1, Array(0.9f, 0.4f, 0.0f)),
      (4L, 2, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val anchors = corpus.where(col("vec_id") === 0L)
    val got = Similarity.hardNegatives(corpus, anchors, k = 5, dupMax = 0.95)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    // 1 is same-label (excluded by rule), 2 is a flipped-label dup
    // (excluded by the ceiling); 3 then 4 rank by cosine
    assert(got.toSeq === Seq((3L, 1L, 1L), (4L, 2L, 2L)))
  }

  test("mipsTopK equals brute-force inner-product ranking (pruning invisible)") {
    import spark.implicits._
    // magnitudes 1..10 spread norms over several log2 bands, so the
    // seed pass covers only the top bands and low bands must actually
    // prune — while the result stays EXACTLY the brute-force ranking
    val vecs = (0L until 40L).map { i =>
      val m = (i % 10 + 1).toFloat
      (i, Array(m, (i % 3).toFloat - 1f, 0.5f * (i % 5).toFloat, -m / 4))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.mipsTopK(df, df.where(col("vec_id") < 3), k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // brute force over the SAME quantized integers, in the driver
    def q(a: Array[Float]): Array[Long] =
      a.map(x => Math.round(x.toDouble * 1000))
    val qv = vecs.map { case (id, a) => id -> q(a) }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = (0L until 3L).flatMap { qid =>
      vecs.map(_._1).filter(_ != qid)
        .map(nid => (nid, dot(qv(qid), qv(nid))))
        .sortBy { case (nid, d) => (-d, nid) }
        .take(5).zipWithIndex
        .map { case ((nid, d), i) => (qid, (i + 1).toLong, nid, d) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected)
    // degenerate seedMul covering everything still agrees
    val all = Similarity.mipsTopK(df, df.where(col("vec_id") < 3), k = 5,
        seedMul = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(all.toSeq === expected)
  }
}
