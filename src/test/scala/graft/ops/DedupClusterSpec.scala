package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkSpec

class DedupClusterSpec extends AnyFunSuite with SparkSpec {

  test("connected components label chains, triangles and singleton pairs") {
    import spark.implicits._
    // chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("star contraction: a dense bucket emits O(m) edges, not C(m,2); singleton buckets emit none") {
    import spark.implicits._
    // 100 byte-identical docs: every band bucket holds all 100 members,
    // so the pair expansion would be 4 * C(100,2) = 19800 rows — the
    // star form emits (hub=1, member) once per member, and distinct()
    // collapses the 4 bands to 99 edges total
    val same = (1L to 100L).map(i => (i, "the quick brown fox jumps over the lazy dog once more"))
      .toDF("doc_id", "text")
    val edges = Dedup.bucketStarEdges(same, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.length == 99)
    assert(edges.forall(_._1 == 1L)) // hub = bucket minimum
    val labels = Dedup.connectedComponentsOverBuckets(same, "doc_id", "text")
    assert(labels.select("label").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(labels.count() == 100)

    // all-distinct docs: every bucket is a singleton -> zero edges,
    // zero labeled docs (the pair relation has no singletons either)
    val distinctDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "red orange yellow green blue indigo violet crimson amber teal"))
      .toDF("doc_id", "text")
    assert(Dedup.bucketStarEdges(distinctDocs, "doc_id", "text").count() == 0)
    assert(Dedup.connectedComponentsOverBuckets(distinctDocs, "doc_id", "text").count() == 0)
  }

  test("property: star-contracted components equal pair components on randomized corpora") {
    import spark.implicits._
    // fixed seeds -> deterministic corpora, but shapes the hand-written
    // cases can't cover: shared bases, chained mutations, cross-bucket
    // hubs. The star form must produce EXACTLY the pair form's labels.
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val bases = (0 until 6).map(_ =>
        (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val docs = (0 until 24).map { i =>
        val base = bases(rnd.nextInt(bases.size))
        val text = if (rnd.nextBoolean()) base + " " + vocab(rnd.nextInt(vocab.size)) else base
        (i.toLong, text)
      }.toDF("doc_id", "text")
      val pairLabels = Dedup.connectedComponents(
          Dedup.minHashCandidatePairs(docs, "doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val starLabels = Dedup.connectedComponentsOverBuckets(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(starLabels == pairLabels, s"seed $seed")
    }
  }

  test("local pre-contraction: a 150-hop chain converges inside the default step budget") {
    import spark.implicits._
    // min-label propagation alone moves the minimum one hop per step —
    // a 150-node chain would blow the default maxIter=20; the
    // partition-local union-find collapses each partition's stretch of
    // the chain to a star, leaving only the 3 cross-partition hops.
    // Range partitioning keeps stretches contiguous — the locality real
    // edge streams have (LSH star edges arrive grouped by hub); a
    // round-robin scatter would defeat any LOCAL contraction by
    // construction.
    val chain = (1L until 150L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .repartitionByRange(4, col("id_a"))
    val labels = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (1L to 150L).map(_ -> 1L).toMap)
  }

  test("local pre-contraction: labels invariant to edge partitioning, string ids included") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 300).map { _ =>
      val a = s"d${rnd.nextInt(120)}"; val b = s"d${rnd.nextInt(120)}"
      if (a <= b) (a, b) else (b, a)
    }.filter(e => e._1 != e._2).distinct
    def labelsAt(parts: Int): Map[String, String] =
      Dedup.connectedComponents(edges.toDF("id_a", "id_b").repartition(parts))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val one = labelsAt(1)
    assert(one == labelsAt(5))
    assert(one == labelsAt(13))
    // cross-check against a driver-side union-find ground truth
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(rb) = ra
    }
    val truth = parent.keys.map { n =>
      n -> parent.keys.filter(m => find(m) == find(n)).min
    }.toMap
    assert(one == truth)
  }

  test("incrementalNew drops history fingerprints, collapses within-batch copies") {
    import spark.implicits._
    val hist = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA  "),  // normalizes to history's "alpha" -> dropped
      (11L, "gamma"), (12L, "gamma"),  // within-batch pair -> one row, 2 copies
      (13L, "delta")).toDF("doc_id", "text")
    val out = Dedup.incrementalNew(batch, hist, "doc_id", "text")
      .select("canonical_id", "n_copies")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(11L -> 2L, 13L -> 1L))
  }

  test("bloom pre-filter: string ids kept, null text never flags, release allows re-use") {
    import spark.implicits._
    val hist = Seq(("a", "alpha text here"), ("b", "beta text here"),
      ("c", null.asInstanceOf[String])).toDF("doc_id", "text")
    val inc = Seq(("x", "alpha text here"), ("y", "totally new content"),
      ("z", null.asInstanceOf[String])).toDF("doc_id", "text")
    val probe = Dedup.bloomSeenFlags(hist, inc, "doc_id", "text",
      expectedItems = 100, fpp = 0.01)
    val out = probe.flags.collect()
      .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(out("x")) // true duplicate must flag: no false negatives
    assert(!out("z")) // null text has no identity — excluded both sides
    probe.release()
    // flags survives release: the driver-held value re-broadcasts
    assert(probe.flags.count() == 3)
  }

  test("reliable-checkpoint mode produces the same labels and writes checkpoints") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    // a 7-hop chain forces several rounds, crossing the every-3rd-round
    // checkpoint cadence in reliable mode
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == reliable)
    assert(reliable == (1L to 8L).map(_ -> 1L).toMap)
    // checkpoint data actually landed in the reliable dir
    def count(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.count() finally s.close()
    }
    assert(count(dir) > 1)
  }

  test("incrementalClusters: a batch edge bridging two history clusters merges them to the global min") {
    import spark.implicits._
    // history: {1,2} and {5,6} (labels 1 and 5); batch node 9 bridges
    // both, batch pair (10,11) forms a fresh cluster, node 20 has an
    // edge into {1,2} only
    val histLabels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "label")
    val newEdges = Seq((2L, 9L), (6L, 9L), (10L, 11L), (1L, 20L))
      .toDF("id_a", "id_b")
    val got = Dedup.incrementalClusters(histLabels, newEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // direct CC over (hist edges implied by labels) ∪ newEdges:
    // {1,2,5,6,9,20} all reach min 1; {10,11} labels 10
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      9L -> 1L, 20L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("incrementalClusters leaves untouched history clusters byte-identical") {
    import spark.implicits._
    val histLabels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "label")
    val newEdges = Seq((2L, 9L)).toDF("id_a", "id_b") // touches {1,2} only
    val got = Dedup.incrementalClusters(histLabels, newEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }
}
