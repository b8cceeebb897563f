package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by PREFIX DOUBLING
  * (Manber–Myers, SIAM J. Comput. 1993) — the primitive behind exact
  * substring-level dedup at corpus scale (Lee et al. 2022 build suffix
  * arrays per shard to find every duplicated span of ANY length, where
  * the fixed-l gram families d19/d25 see only length >= l).
  *
  * Each round upgrades "suffixes ordered by their first h characters"
  * to 4h using only RANKS: the sort key for suffix i becomes
  * (rank(i), rank(i+h), rank(i+2h), rank(i+3h)) — Manber–Myers'
  * doubling key extended to quadrupling, valid because each tie on a
  * key prefix pins twice the character prefix and licenses the next
  * component — with the past-the-end sentinel −1 ordering a proper
  * prefix before any extension: exactly lexicographic suffix order.
  * Positions are dense per document, so every +d lookup is
  * `lead(rank, d)` over position order — windows on the ONE doc
  * partitioning the loop holds throughout (a single exchange at the
  * chain head, in-partition sorts after); no string is compared after
  * round 0, no suffix is ever materialized.
  *
  * Scale shape: rows are (doc, pos, rank) triples — n rows total for
  * an n-char corpus, never n² suffix bytes. Per-doc ranking windows
  * parallelize across documents (skew bound = the longest document);
  * a single giant text would swap the window for the range-partitioned
  * two-pass dense rank (the `Curation.runningSum` granule discipline)
  * — same algebra, documented in SCALING.md. Each round is
  * checkpointed (the iterative-operator lineage discipline) and the
  * loop EXITS EARLY once every rank in every document is unique —
  * natural text separates in far fewer than log₂(len) rounds.
  */
object SuffixArray {

  /** (doc_id, pos, suffix_rank): the rank (1-based, dense, per
    * document) of the suffix starting at 1-based `pos` in the
    * document's lexicographic suffix order. Empty/null texts yield no
    * rows (they have no suffixes).
    */
  def suffixRanks(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxRounds: Int = 40): DataFrame = {
    val base = docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val maxLen = base.agg(coalesce(max(length(col("text"))), lit(0)))
      .head().getInt(0) // bounded driver scalar: the round count
    // round 0 covers an 8-char prefix in ONE ranking: dense per-doc
    // rank of the first 8 character codes as a composite sort key
    // (ascii('') = 0 past the end — sorting a proper prefix first,
    // the same contract as the doubling sentinel). Cuts ⌈log₂ L⌉
    // rounds to ⌈log₂(L/8)⌉ for tie depth L; docs whose suffixes
    // separate within 8 chars never iterate at all.
    val k0 = 8L
    // per-position char codes come from ONE split per document —
    // `substring(text, pos, 1)` per position is O(pos) on UTF-8 bytes
    // (quadratic per doc: measured 16 s of a 19 s build at sf0.1) and
    // would also ship the whole text per position row. The codes at
    // pos+1..pos+7 are lead() columns over the same per-doc window the
    // ranking sorts in (one exchange, two in-partition sorts); 0 past
    // the end — the proper-prefix-first sentinel (texts must not
    // contain NUL, which shares code 0; the corpus contract).
    val wPos = Window.partitionBy("doc_id").orderBy("pos")
    val codeCols = col("c0") +: (1 until k0.toInt).map(o =>
      coalesce(lead(col("c0"), o).over(wPos), lit(0)).as(s"c$o"))
    // EXPLICIT doc_id repartition at the chain head: every round's
    // windows require hashpartitioning(doc_id), so this one exchange
    // is the only one in the whole loop (localCheckpoint preserves
    // partitioning) — and being user-specified, AQE won't coalesce it
    // to a single partition the way it does the auto-planned window
    // exchange at bench scale (~50 MB input ⇒ 1 partition ⇒ every
    // CPU-bound rank sort serialized; measured 10x on the suite box)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    var r = base
      .select(col("doc_id"),
        posexplode(split(col("text"), "")).as(Seq("p0", "ch")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
        ascii(col("ch")).as("c0"))
      .repartition(par, col("doc_id"))
      .select(Seq(col("doc_id"), col("pos")) ++ codeCols: _*)
      .select(col("doc_id"), col("pos"),
        dense_rank().over(Window.partitionBy("doc_id")
            .orderBy((0 until k0.toInt).map(o => col(s"c$o")): _*))
          .cast("long").as("rank"))
      .localCheckpoint(true)
    def allUnique(): Boolean = r.groupBy("doc_id")
      .agg(max("rank").as("m"), count(lit(1)).as("n"))
      .where(col("m") =!= col("n")).limit(1).count() == 0
    var h = k0
    var rounds = 0
    var done = allUnique()
    while (!done && h < maxLen) {
      require(rounds < maxRounds,
        s"suffixRanks did not converge in $maxRounds rounds " +
          s"(maxLen=$maxLen) — corpus shape unexpected, refusing to spin")
      // positions are dense 1..n per doc, so "rank of the suffix d
      // ahead" is lead(rank, d) over pos order — a WINDOW on the doc
      // partitioning the loop already holds (no exchange at all),
      // never a self-join shuffle. QUADRUPLING, not doubling: the
      // same window pass also reads the ranks at +2h and +3h, so the
      // composite key (r, r₊ₕ, r₊₂ₕ, r₊₃ₕ) orders by a 4h-prefix —
      // (r, r₊ₕ) ties fix the 2h-prefix, making r₊₂ₕ the valid next
      // refinement, and so on. Each extra lead is one more column in
      // a sort the round pays anyway; rounds drop from log₂ to log₄.
      val wPos = Window.partitionBy("doc_id").orderBy("pos")
      val stepped = (1 to 3).foldLeft(r) { (df, m) =>
        df.withColumn(s"rank$m",
          coalesce(lead(col("rank"), (m * h).toInt).over(wPos), lit(-1L)))
      }
      r = stepped
        .select(col("doc_id"), col("pos"),
          dense_rank().over(Window.partitionBy("doc_id")
            .orderBy("rank", "rank1", "rank2", "rank3"))
            .cast("long").as("rank"))
        .localCheckpoint(true)
      // converged when every document's ranks are all distinct: the
      // dense max equals the position count (one action per round,
      // the iterative-operator discipline)
      done = allUnique()
      h *= 4
      rounds += 1
    }
    r.select(col("doc_id"), col("pos"), col("rank").as("suffix_rank"))
  }

  /** Longest repeated substring per document — THE suffix-array
    * application: the longest text that occurs at two different
    * positions equals the maximum LCP over RANK-ADJACENT suffix pairs
    * (any two occurrences' suffixes share that prefix, and moving
    * closer in rank order never shrinks an LCP). One self-equi-join on
    * rank+1, one in-place LCP scan per adjacent pair (`lcp_at` — no
    * suffix copies), then an argmax with the house deterministic
    * tie-break (lexicographically smallest witness). Documents whose
    * suffixes all diverge immediately report ('', 0).
    */
  def longestRepeatedSubstring(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .localCheckpoint(true) // two consumers below (pairs + per-doc face)
    val sr = suffixRanks(base, "doc_id", "text")
    // rank-adjacent pairs via lead over rank order — the same
    // per-doc window family as the ranking rounds, no self-join
    val pairs = sr
      .withColumn("pos_b", lead(col("pos"), 1).over(
        Window.partitionBy("doc_id").orderBy("suffix_rank")))
      .where(col("pos_b").isNotNull)
      .select(col("doc_id"), col("pos").as("pos_a"), col("pos_b"))
    // fold each doc's pairs into ONE array row before touching text:
    // the LCP scan needs the document string, and joining it onto
    // every pair row re-ships ~n characters per PAIR; per-doc it
    // ships them once. Array length is bounded by the doc length
    // (one pair per suffix) — document-sized driver-free state.
    val perDoc = pairs.groupBy("doc_id")
      .agg(collect_list(struct(col("pos_a"), col("pos_b"))).as("ps"))
    val lcpOf = (p: Column) => graft.functions.TextHashExpressions
      .lcp_at(col("text"), p.getField("pos_a"), p.getField("pos_b"))
    base.join(perDoc, Seq("doc_id"), "left")
      .withColumn("lrs_len",
        coalesce(array_max(transform(col("ps"), lcpOf)), lit(0))
          .cast("long"))
      .withColumn("lrs",
        coalesce(
          array_min(transform(
            filter(col("ps"), p => lcpOf(p) === col("lrs_len")),
            p => col("text").substr(p.getField("pos_a"),
              col("lrs_len").cast("int")))),
          lit("")))
      .select(col("doc_id"), col("lrs_len"), col("lrs"))
  }
}
