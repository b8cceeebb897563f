package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class CurationSpec extends AnyFunSuite with SparkSpec {

  test("splitAssign is hash-stable: growing the corpus never moves a doc") {
    import spark.implicits._
    val small = (1L to 50L).toDF("id")
      .select(col("id"), Curation.splitAssign(col("id")).as("split"))
    val big = (1L to 500L).toDF("id")
      .select(col("id"), Curation.splitAssign(col("id")).as("split"))
    val s = small.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = big.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s.forall { case (id, sp) => b(id) == sp })
    // all three splits are populated at n=500
    assert(b.values.toSet == Set("train", "val", "test"))
  }

  test("snapshotMerge: latest wins, version-ties prefer delta, tombstone retained, re-apply is a no-op") {
    import spark.implicits._
    val snap = Seq(
      (1L, "one v1", 1L, false),
      (2L, "two v5", 5L, false),   // same version in the delta -> delta must win
      (3L, "three v1", 1L, false), // tombstoned by the delta
      (4L, "four v9", 9L, false)   // delta carries an OLDER version -> snapshot wins
    ).toDF("id", "text", "version", "deleted")
    val delta = Seq(
      (2L, "two v5 delta", 5L, false),
      (3L, "gone", 2L, true),
      (4L, "four v2 late", 2L, false),
      (5L, "five new", 1L, false)
    ).toDF("id", "text", "version", "deleted")
    def live(df: org.apache.spark.sql.DataFrame) =
      df.where(!col("deleted")).select("id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val merged = Curation.snapshotMerge(snap, delta, "id", "version", "deleted")
    assert(live(merged) == Map(1L -> "one v1", 2L -> "two v5 delta",
      4L -> "four v9", 5L -> "five new"))
    // the tombstone winner is RETAINED (deleted=true), not dropped —
    // that is what makes the merge closed under composition
    assert(merged.where(col("deleted")).select("id").as[Long].collect().toSeq == Seq(3L))
    // idempotence: merging the SAME delta into the result changes nothing
    val again = Curation.snapshotMerge(merged, delta, "id", "version", "deleted")
    assert(live(again) == live(merged))
  }

  test("snapshotMerge: a late delta with an OLDER version cannot resurrect a deleted key") {
    import spark.implicits._
    val snap = Seq((7L, "seven v5", 5L, false)).toDF("id", "text", "version", "deleted")
    val deltaA = Seq((7L, "dead", 6L, true)).toDF("id", "text", "version", "deleted")
    val deltaB = Seq((7L, "seven v4 late", 4L, false)).toDF("id", "text", "version", "deleted")
    // sequential application == one-shot application of A ∪ B
    val seqApplied = Curation.snapshotMerge(
      Curation.snapshotMerge(snap, deltaA, "id", "version", "deleted"),
      deltaB, "id", "version", "deleted")
    val oneShot = Curation.snapshotMerge(snap, deltaA.unionByName(deltaB),
      "id", "version", "deleted")
    for (m <- Seq(seqApplied, oneShot)) {
      val r = m.select("id", "version", "deleted").collect()
      assert(r.length == 1 && r.head.getLong(1) == 6L && r.head.getBoolean(2), m.collect().toSeq)
    }
  }

  test("snapshotMerge: duplicate (key, version) delta rows settle deterministically") {
    import spark.implicits._
    val snap = Seq.empty[(Long, String, Long, Boolean)]
      .toDF("id", "text", "version", "deleted")
    // an at-least-once feed retried a write with amended text: same key,
    // same version, different payload — the survivor must be a function
    // of the DATA (fingerprint order), not of shuffle order
    val delta = Seq(
      (1L, "payload b", 1L, false),
      (1L, "payload a", 1L, false)
    ).toDF("id", "text", "version", "deleted")
    val winners = (1 to 5).map { i =>
      Curation.snapshotMerge(snap, delta.repartition(i), "id", "version", "deleted")
        .select("text").as[String].collect().toSeq
    }
    assert(winners.distinct.size == 1, winners)
  }

  test("redactPii replaces every class; counts come from the original text") {
    import spark.implicits._
    val df = Seq(
      ("a", "mail bob.smith+x@corp.example.org and 203.0.113.9 then 555-123-4567"),
      ("b", "no pii here at all"),
      ("c", "two mails a@b.co c@d.io one ip 10.0.0.1")).toDF("id", "text")
    val Seq(email, phone, ip) = Curation.PiiRules.map(_._2)
    val out = df.select(col("id"), Curation.redactPii(col("text")).as("r"),
        Curation.piiCount(col("text"), email).as("ne"),
        Curation.piiCount(col("text"), phone).as("np"),
        Curation.piiCount(col("text"), ip).as("ni"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a")._1 == "mail <EMAIL> and <IP> then <PHONE>")
    assert(out("a") == (("mail <EMAIL> and <IP> then <PHONE>", 1L, 1L, 1L)))
    assert(out("b") == (("no pii here at all", 0L, 0L, 0L)))
    assert(out("c") == (("two mails <EMAIL> <EMAIL> one ip <IP>", 2L, 0L, 1L)))
  }

  test("packShards: sequential bins by cumulative token start, per key") {
    import spark.implicits._
    // tokens 5,5,5 with budget 10: doc1 starts at 0 (shard 0), doc2 at 5
    // (shard 0), doc3 at 10 (shard 1); key 'b' packs independently
    val docs = Seq(
      ("a", 1L, "w w w w w"), ("a", 2L, "w w w w w"), ("a", 3L, "w w w w w"),
      ("b", 9L, "w w w w w w w w w w w")).toDF("k", "id", "text")
    val out = Curation.packShards(docs, "k", "id",
        TextAnalysis.wsTokenCount(col("text")), budget = 10L)
      .select("k", "id", "shard").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("b", 9L) -> 0L))
  }

  test("contaminationScores: exact overlap against a broadcast benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), // grams: ab,bg,gd -> 2/3 hit
      (2L, "x y z"),                  // 0/2
      (3L, "alpha beta")              // 1/1
    ).toDF("doc_id", "text")
    val out = Curation.contaminationScores(corpus, bench, "doc_id", "text")
      .select("doc_id", "n_grams", "n_hits").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((3L, 2L)), 2L -> ((2L, 0L)), 3L -> ((1L, 1L))))
  }

  test("splitAssign runs unchanged in Structured Streaming, batch-identical") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // per-row column ops compose into readStream pipelines as-is: a
    // streaming corpus gets its stable split assignment per micro-batch
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), Curation.splitAssign(col("doc_id")).as("split"))
      .writeStream.format("memory").queryName("stream_split")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((3L, "c"))
      q.processAllAvailable()
      val out = spark.table("stream_split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // identical assignments to the batch path, batch boundaries ignored
      val batch = Seq(1L, 2L, 3L).toDF("doc_id")
        .select(col("doc_id"), Curation.splitAssign(col("doc_id")).as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == batch)
    } finally q.stop()
  }

  test("weightedSample: deterministic, monotone in weight, zero-weight empty, guard on bad weights") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    def kept(wa: Double): Set[Long] =
      Curation.weightedSample(docs, "doc_id", "source", Map("a" -> wa), 1.0)
        .where(col("source") === "a").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val k30 = kept(0.3)
    // deterministic across invocations
    assert(k30 == kept(0.3))
    // upsampling keeps every previously kept doc (threshold superset)
    assert(k30.subsetOf(kept(0.6)))
    assert(kept(0.0).isEmpty && kept(1.0).size == 200)
    // roughly proportional (hash uniformity; wide tolerance)
    assert(k30.size > 20 && k30.size < 100, k30.size.toString)
    // unlisted source keeps defaultWeight
    val bAll = Curation.weightedSample(docs, "doc_id", "source", Map("a" -> 0.0), 1.0)
      .where(col("source") === "b").count()
    assert(bAll == 200)
    intercept[IllegalArgumentException] {
      Curation.weightedSample(docs, "doc_id", "source", Map("a" -> 1.5))
    }
  }

  test("chunkTokens: overlap coverage, short docs one chunk, guard on bad params") {
    import spark.implicits._
    val words100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words100), (2L, "tiny doc"), (3L, "")).toDF("doc_id", "text")
    val chunks = Curation.chunkTokens(docs, "text", chunkSize = 64, overlap = 16)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_words"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2)))
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // 100 tokens, stride 48: chunk 0 = w1..w64, chunk 1 = w49..w100
    assert(doc1.map(_._2).toSeq == Seq(0L, 1L))
    assert(doc1(0)._3.head == "w1" && doc1(0)._3.size == 64)
    assert(doc1(1)._3.head == "w49" && doc1(1)._3.size == 52)
    // consecutive chunks share exactly the overlap window
    assert(doc1(0)._3.toSet.intersect(doc1(1)._3.toSet).size == 16)
    // short and empty docs are one chunk of themselves
    assert(chunks.filter(_._1 == 2L).map(_._3.toSeq).toSeq == Seq(Seq("tiny", "doc")))
    assert(chunks.count(_._1 == 3L) == 1)
    intercept[IllegalArgumentException] {
      Curation.chunkTokens(docs, "text", chunkSize = 16, overlap = 16)
    }
  }

  test("stratifiedSample: exact floor quota per stratum, deterministic, subset of input") {
    import spark.implicits._
    // strata of deliberately unequal sizes: 25, 10, 3 (3/10 -> quota 0)
    val docs = ((1L to 25L).map(i => (i, "a")) ++
      (26L to 35L).map(i => (i, "b")) ++
      (36L to 38L).map(i => (i, "c"))).toDF("doc_id", "source")
    val kept = Curation.stratifiedSample(docs, "doc_id", "source", 3, 10)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // floor(25*3/10)=7, floor(10*3/10)=3, floor(3*3/10)=0
    assert(bySrc == Map("a" -> 7, "b" -> 3))
    // deterministic: a second run keeps the identical ids
    val again = Curation.stratifiedSample(docs, "doc_id", "source", 3, 10)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sorted.toSeq == again.sorted.toSeq)
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(docs, "doc_id", "source", 11, 10)
    }
  }

  test("stratifiedSample: a NULL stratum samples like any other stratum") {
    import spark.implicits._
    // 10 docs with source NULL, 10 with "a": both must contribute
    // floor(10/2) = 5 (an equi-join formulation would drop the NULLs)
    val docs = ((1L to 10L).map(i => (i, None: Option[String])) ++
      (11L to 20L).map(i => (i, Some("a")))).toDF("doc_id", "source")
    val kept = Curation.stratifiedSample(docs, "doc_id", "source", 1, 2)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(kept.count(_._2.isEmpty) == 5)
    assert(kept.count(_._2.contains("a")) == 5)
    // reserved temp columns rejected up front
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(docs.withColumn("__rk", col("doc_id")),
        "doc_id", "source", 1, 2)
    }
  }

  test("keepBest ranks by quality desc then id, and carries cluster size") {
    import spark.implicits._
    val labeled = Seq(
      (1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 9L), // best: 11 (9 chars, min id)
      (2L, 20L, 3L)).toDF("label", "doc_id", "q")
    val kept = Curation.keepBest(labeled, "label", "doc_id", col("q"))
      .select("label", "doc_id", "cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set((1L, 11L, 3L), (2L, 20L, 1L)))
  }

  test("temperatureRates flattens a skewed mix: small source upweighted (capped at 1), hand-checked") {
    import spark.implicits._
    val docs = ((1L to 90L).map(i => i -> "A") ++ (91L to 100L).map(i => i -> "B"))
      .toDF("doc_id", "source")
    val rates = Curation.temperatureRates(docs, "source") // target = 50
    val bySrc = rates.map(r => r.source -> r).toMap
    // p_A = sqrt(0.9)/Z, Z = sqrt(0.9)+sqrt(0.1): rate_A = 50*p_A/90,
    // rate_B = 50*p_B/10 = 1.25 -> capped at 1.0
    val z = math.sqrt(0.9) + math.sqrt(0.1)
    assert(bySrc("B").rate === 1.0)
    assert(bySrc("A").rate === (50.0 * (math.sqrt(0.9) / z)) / 90.0)
    // the whole point: B's post-mix share beats its 10% input share
    assert(bySrc("B").rate * 10 / (bySrc("A").rate * 90 + bySrc("B").rate * 10) > 0.15)
    // keep rule is the c05 hash threshold: deterministic, a subset
    val kept = Curation.applyMixRates(docs, "doc_id", "source", rates)
    val again = Curation.applyMixRates(docs.repartition(7), "doc_id", "source", rates)
    assert(kept.collect().map(_.getLong(0)).toSet ===
      again.collect().map(_.getLong(0)).toSet)
    assert(kept.where(col("source") === "B").count() === 10) // rate 1.0 keeps all
  }

  test("sequencePack: granule size never changes the packing (two-pass cumsum == global scan)") {
    import spark.implicits._
    // irregular ids (gaps, non-aligned) and token counts crossing the
    // ctx boundary mid-doc; ctx 10 so spans are exercised
    val docs = Seq((1L, 3L), (2L, 9L), (5L, 12L), (7L, 1L), (100L, 4L),
      (101L, 10L), (203L, 7L)).toDF("id", "nt")
    def packed(g: Long) =
      Curation.sequencePack(docs, "id", col("nt"), ctxLen = 10L, granule = g)
        .select("id", "n_tokens", "start_off", "pack_first", "pack_last", "n_packs")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue)
    val base = packed(1L) // every doc its own granule: pure prefix path
    assert(packed(3L) === base)
    assert(packed(1024L) === base) // one granule: pure intra-window path
    // hand-check the spans: doc 2 (start 3, 9 tokens) crosses pack 0->1;
    // doc 5 (start 12, 12 tokens) spans packs 1..2
    val byId = base.map(r => r.head -> (r(2), r(3), r(4), r(5))).toMap
    assert(byId(2L) === ((3L, 0L, 1L, 2L)))
    assert(byId(5L) === ((12L, 1L, 2L, 2L)))
  }
}
