package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The containment join's contract is COMPLETENESS in the asymmetric
  * form: every ordered pair with |A∩B|/|A| >= tau must be found. The
  * property test compares against brute-force all-ordered-pairs
  * containment — equality both ways also catches false positives in
  * the verify step. The headline behavioral claim — an excerpt is
  * found by containment but invisible to the Jaccard join at the same
  * threshold — is pinned directly.
  */
class ContainmentSpec extends AnyFunSuite with SparkSpec {

  private def bruteForce(docs: Seq[(Long, String)], tauNum: Int,
      tauDen: Int): Set[(Long, Long)] = {
    val sets = docs.map { case (i, t) =>
      i -> t.split(" ").filter(_.nonEmpty).toSet }
    (for {
      (a, sa) <- sets
      (b, sb) <- sets
      if a != b && sa.nonEmpty
      inter = (sa & sb).size
      if inter * tauDen >= sa.size * tauNum
    } yield (a, b)).toSet
  }

  test("property: containment pairs equal brute-force on randomized corpora") {
    import spark.implicits._
    val vocab = ('a' to 't').map(_.toString)
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 60L).map { i =>
        val n = 3 + rnd.nextInt(8)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", tauNum = 3, tauDen = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == bruteForce(docs, 3, 5), s"seed $seed")
    }
  }

  test("excerpt scores containment 1.0 in its source; the Jaccard join misses it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon"), // subset: C(2,1)=1.0, J=0.5
      (3L, "unrelated words entirely here"))
    val df = docs.toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text",
        tauNum = 9, tauDen = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // asymmetric: (2 contained-in 1) qualifies, (1 in 2) is C=0.5 and must not
    assert(cont.keySet == Set((2L, 1L)))
    assert(cont((2L, 1L)) == 1.0)
    val jacc = Dedup.prefixFilterPairs(df, "doc_id", "text",
        tauNum = 9, tauDen = 10)
      .collect()
    assert(jacc.isEmpty, "J(1,2)=0.5 must be invisible at tau=9/10")
  }

  test("identical docs qualify in BOTH directions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"))
    val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 9, tauDen = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map((1L, 2L) -> 1.0, (2L, 1L) -> 1.0))
  }

  test("candidate-budget guard trips on a low-entropy corpus with a diagnosis") {
    import spark.implicits._
    val lowEntropy = (1L to 40L)
      .map(i => (i, s"alpha beta gamma delta w${i % 2}"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.containmentPairs(lowEntropy, "doc_id", "text",
        tauNum = 3, tauDen = 5, maxCandidatePairs = 50L)
    }
    assert(e.getMessage.contains("candidate volume"), e.getMessage)
    // same corpus under a sufficient budget returns normally
    assert(Dedup.containmentPairs(lowEntropy, "doc_id", "text",
      tauNum = 3, tauDen = 5, maxCandidatePairs = 100000L).count() >= 0)
  }

  test("supersetDrops: contained members drop with attribution; mutual keeps lower id") {
    import spark.implicits._
    // chain (10 in 20), (10 in 30), (20 in 30): greedy drops 10 and
    // 20, keeps 30; kept_in = smallest qualifying container.
    // (40, 50) mutual: only 50 (the higher id) drops.
    val pairs = Seq(
      (10L, 20L), (10L, 30L), (20L, 30L),
      (40L, 50L), (50L, 40L))
      .toDF("id_a", "id_b")
    val got = Dedup.supersetDrops(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 20L, 20L -> 30L, 50L -> 40L))
  }

  test("supersetDrops composed over an excerpt corpus drops exactly the excerpts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "unrelated words entirely here"))
    val pairs = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", tauNum = 9, tauDen = 10)
    val got = Dedup.supersetDrops(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L))
  }

  test("incremental == direct-on-union restricted to batch-touching pairs (frozen order is exact)") {
    import spark.implicits._
    val vocab = ('a' to 'p').map(_.toString)
    for (seed <- Seq(5, 77)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 50L).map { i =>
        val n = 3 + rnd.nextInt(8)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val (hist, batch) = docs.partition(_._1 % 3 != 0)
      val batchIds = batch.map(_._1).toSet
      val direct = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", tauNum = 3, tauDen = 5)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .filter { case ((a, b), _) => batchIds(a) || batchIds(b) }.toMap
      val idx = Dedup.containmentIndex(hist.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 3, tauDen = 5)
      val inc = Dedup.incrementalContainmentPairs(idx,
          batch.toDF("doc_id", "text"), "doc_id", "text",
          tauNum = 3, tauDen = 5)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(inc == direct, s"seed $seed")
    }
  }

  test("incremental finds BOTH asymmetric directions across the index boundary") {
    import spark.implicits._
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "mu nu xi"))
    val batch = Seq(
      (30L, "alpha beta gamma delta epsilon"),      // contained IN history
      (31L, "mu nu xi omicron pi rho sigma tau"))   // CONTAINS history doc 2
    val idx = Dedup.containmentIndex(hist.toDF("doc_id", "text"),
      "doc_id", "text", tauNum = 9, tauDen = 10)
    val got = Dedup.incrementalContainmentPairs(idx,
        batch.toDF("doc_id", "text"), "doc_id", "text",
        tauNum = 9, tauDen = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map((30L, 1L) -> 1.0, (2L, 31L) -> 1.0))
  }

  test("incremental budget guard trips across all three probe terms") {
    import spark.implicits._
    val hist = (1L to 30L).map(i => (i, "alpha beta gamma delta"))
    val batch = (100L to 130L).map(i => (i, "alpha beta gamma delta"))
    val idx = Dedup.containmentIndex(hist.toDF("doc_id", "text"),
      "doc_id", "text", tauNum = 3, tauDen = 5)
    val e = intercept[IllegalStateException] {
      Dedup.incrementalContainmentPairs(idx, batch.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 3, tauDen = 5, maxCandidatePairs = 50L)
    }
    assert(e.getMessage.contains("candidate volume"), e.getMessage)
  }

  test("length lower-bound admits a mixed-length corpus whose UNFILTERED volume exceeds budget") {
    import spark.implicits._
    // 5 identical long docs (12 shared tokens) + 200 two-token shorts
    // each carrying one shared token: the long probes' prefix tokens
    // are high-df, so the unfiltered volume (Σ dfp·(df−1) ≈ 500+)
    // refused a 150 budget before r8 — but every long×short candidate
    // is provably dead (|B|=2 < ⌈3/5·12⌉=8), so the length-filtered
    // volume is ~100 and the operator must now RUN, and still agree
    // with brute force.
    val commons = (1 to 12).map(j => s"c$j")
    val longs = (1L to 5L).map(i => (i, commons.mkString(" ")))
    val shorts = (100L until 300L).map(i =>
      (i, s"c${(i % 12) + 1} s$i"))
    val docs = longs ++ shorts
    val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 3, tauDen = 5, maxCandidatePairs = 150L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteForce(docs, 3, 5))
    assert(got == (for { a <- 1L to 5L; b <- 1L to 5L; if a != b }
      yield (a, b)).toSet, "exactly the identical-long pairs")
  }

  test("incremental refuses loudly when batch re-ingests a history id") {
    import spark.implicits._
    val hist = Seq((1L, "alpha beta gamma"), (2L, "mu nu xi"))
    val idx = Dedup.containmentIndex(hist.toDF("doc_id", "text"),
      "doc_id", "text", tauNum = 3, tauDen = 5)
    val batch = Seq((2L, "mu nu xi omicron"), (9L, "alpha beta"))
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalContainmentPairs(idx, batch.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 3, tauDen = 5)
    }
    assert(e.getMessage.contains("disjoint"), e.getMessage)
  }

  test("blockBy == union of per-block runs; cross-block pairs are out of scope") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vocab = ('a' to 'j').map(_.toString)
    // two blocks SHARING texts: unblocked finds cross-block pairs,
    // blocked must not — and within each block must match a solo run
    val base = (1L to 30L).map { i =>
      val n = 3 + rnd.nextInt(6)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = base.map { case (i, t) => (i, t, "blockA") } ++
      base.map { case (i, t) => (i + 100L, t, "blockB") }
    val toks: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => array_distinct(Dedup.shingleHashes(t))
    def pairsOf(df: org.apache.spark.sql.DataFrame,
        block: Option[org.apache.spark.sql.Column]) =
      Dedup.containmentPairs(df, "doc_id", "text", tauNum = 3, tauDen = 5,
          tokens = toks, blockBy = block)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = docs.toDF("doc_id", "text", "source")
    val blocked = pairsOf(all, Some(col("source")))
    val soloA = pairsOf(all.where(col("source") === "blockA"), None)
    val soloB = pairsOf(all.where(col("source") === "blockB"), None)
    assert(blocked == (soloA ++ soloB))
    // the unblocked run DOES see cross-block pairs (every doc has an
    // exact twin in the other block), proving the blocked run pruned
    // real candidates rather than matching vacuously
    val unblocked = pairsOf(all, None)
    assert(unblocked.exists { case (a, b) => (a < 100L) != (b < 100L) })
    assert(blocked.forall { case (a, b) => (a < 100L) == (b < 100L) })
  }

  test("auto router: plain within budget, pre-blocked past it, refusal last") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // low-entropy ON PURPOSE: four texts, each repeated in both
    // blocks, so the unblocked candidate volume is real (and ~4× the
    // per-block volume — a budget window exists strictly between)
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta shared tail words",
      "unrelated content lives here entirely",
      "alpha beta gamma delta epsilon zeta eta theta")
    val docs = for {
      (blk, off) <- Seq(("blockA", 0L), ("blockB", 100L))
      rep <- 0 until 3
      (t, ti) <- texts.zipWithIndex
    } yield (off + rep * 10L + ti, t, blk)
    val all = docs.toDF("doc_id", "text", "source")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // generous budget: auto == the plain unblocked operator
    val plain = pairs(Dedup.containmentPairs(all, "doc_id", "text",
      tauNum = 3, tauDen = 5,
      tokens = t => array_distinct(Dedup.shingleHashes(t))))
    assert(pairs(Dedup.containmentPairsAuto(all, "doc_id", "text",
      tauNum = 3, tauDen = 5, blockBy = col("source"))) == plain)
    // budget below the unblocked volume but above the per-block one:
    // auto must ROUTE to the blocked form (== d26), not refuse. The
    // guard message carries the measured volume — read both volumes
    // from budget-1 trips and pick a budget strictly between.
    def volumeOf(block: Option[org.apache.spark.sql.Column]): Long = {
      val msg = intercept[IllegalStateException] {
        Dedup.containmentPairs(all, "doc_id", "text", tauNum = 3,
          tauDen = 5, tokens = t => array_distinct(Dedup.shingleHashes(t)),
          maxCandidatePairs = 1L, blockBy = block)
      }.getMessage
      "volume (\\d+)".r.findFirstMatchIn(msg)
        .getOrElse(fail(s"no volume in guard message: $msg"))
        .group(1).toLong
    }
    val vPlain = volumeOf(None)
    val vBlocked = volumeOf(Some(col("source")))
    assert(vBlocked < vPlain, s"no routing window: $vBlocked vs $vPlain")
    val blocked = pairs(Dedup.containmentPairs(all, "doc_id", "text",
      tauNum = 3, tauDen = 5,
      tokens = t => array_distinct(Dedup.shingleHashes(t)),
      blockBy = Some(col("source"))))
    assert(pairs(Dedup.containmentPairsAuto(all, "doc_id", "text",
      tauNum = 3, tauDen = 5, blockBy = col("source"),
      maxCandidatePairs = vBlocked)) == blocked)
    // below even the blocked volume: refusal is the LAST resort
    val e = intercept[IllegalStateException] {
      Dedup.containmentPairsAuto(all, "doc_id", "text",
        tauNum = 3, tauDen = 5, blockBy = col("source"),
        maxCandidatePairs = 1L)
    }
    assert(e.getMessage.contains("budget"))
  }

  test("blockBy refuses non-integer tokenizers loudly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "a b c", "s1")).toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      Dedup.containmentPairs(docs, "doc_id", "text", tauNum = 1, tauDen = 2,
        blockBy = Some(col("source")))
    }
    assert(e.getMessage.contains("integer-hash tokenizer"))
  }

  test("empty docs and doubled spaces produce no phantom tokens or pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha  beta"),
      (2L, "alpha beta"),
      (3L, ""))
    val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 3, tauDen = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map((1L, 2L) -> 1.0, (2L, 1L) -> 1.0))
  }
}
