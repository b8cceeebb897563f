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
  * Positions are dense per group, so every +d lookup is
  * `lead(rank, d)` over position order — windows on the ONE group
  * partitioning the loop holds throughout (a single exchange at the
  * chain head, in-partition sorts after); no string is compared after
  * round 0, no suffix is ever materialized.
  *
  * Scale shape: rows are (group, pos, rank) triples — n rows total for
  * an n-char corpus, never n² suffix bytes. Per-group ranking windows
  * parallelize across groups (skew bound = the largest group);
  * a single giant text would swap the window for the range-partitioned
  * two-pass dense rank (the `Curation.runningSum` granule discipline)
  * — same algebra, documented in SCALING.md. Each round is
  * checkpointed (the iterative-operator lineage discipline) and the
  * loop EXITS EARLY once every rank in every group is unique —
  * natural text separates in far fewer than log₂(len) rounds.
  */
object SuffixArray {

  /** The rank-refinement core over a (gid, pos, c0[, tag]) relation
    * with pos dense 1..N per gid: round-0 dense rank of an 8-char
    * composite code key (codes at pos+1..pos+7 are lead() columns —
    * never an O(pos) substring probe, never the text in the shuffle),
    * then quadrupling rounds until every group's ranks are unique.
    * An optional `tag` column (e.g. the owning doc of a position in
    * the generalized form) rides through every round — one narrow
    * column per checkpoint instead of a post-hoc (gid, pos) re-join
    * over the whole relation (measured 3.3 s of d32's 20 s).
    * Returns (gid, pos, rank[, tag]).
    */
  private def ranksFromCodes(codes: DataFrame, maxLen: Long,
      maxRounds: Int): DataFrame = {
    val tagCols: Seq[Column] =
      if (codes.columns.contains("tag")) Seq(col("tag")) else Nil
    val k0 = 8L
    val wPos = Window.partitionBy("gid").orderBy("pos")
    val codeCols = col("c0") +: (1 until k0.toInt).map(o =>
      coalesce(lead(col("c0"), o).over(wPos), lit(0)).as(s"c$o"))
    // EXPLICIT gid repartition at the chain head: every round's
    // windows require hashpartitioning(gid), so this one exchange
    // is the only one in the whole loop (localCheckpoint preserves
    // partitioning) — and being user-specified, AQE won't coalesce it
    // to a single partition the way it does the auto-planned window
    // exchange at bench scale (~50 MB input ⇒ 1 partition ⇒ every
    // CPU-bound rank sort serialized; measured 10x on the suite box)
    val par = codes.sparkSession.sparkContext.defaultParallelism
    var r = codes
      .repartition(par, col("gid"))
      .select(Seq(col("gid"), col("pos")) ++ codeCols ++ tagCols: _*)
      .select(Seq(col("gid"), col("pos"),
        dense_rank().over(Window.partitionBy("gid")
            .orderBy((0 until k0.toInt).map(o => col(s"c$o")): _*))
          .cast("long").as("rank")) ++ tagCols: _*)
      .localCheckpoint(true)
    def allUnique(): Boolean = r.groupBy("gid")
      .agg(max("rank").as("m"), count(lit(1)).as("n"))
      .where(col("m") =!= col("n")).limit(1).count() == 0
    var h = k0
    var rounds = 0
    var done = allUnique()
    while (!done && h < maxLen) {
      require(rounds < maxRounds,
        s"suffix ranking did not converge in $maxRounds rounds " +
          s"(maxLen=$maxLen) — corpus shape unexpected, refusing to spin")
      // positions are dense 1..n per group, so "rank of the suffix d
      // ahead" is lead(rank, d) over pos order — a WINDOW on the
      // partitioning the loop already holds (no exchange at all),
      // never a self-join shuffle. QUADRUPLING, not doubling: the
      // same window pass also reads the ranks at +2h and +3h, so the
      // composite key (r, r₊ₕ, r₊₂ₕ, r₊₃ₕ) orders by a 4h-prefix —
      // (r, r₊ₕ) ties fix the 2h-prefix, making r₊₂ₕ the valid next
      // refinement, and so on. Each extra lead is one more column in
      // a sort the round pays anyway; rounds drop from log₂ to log₄.
      val stepped = (1 to 3).foldLeft(r) { (df, m) =>
        // clamp: 3h can pass Int.MaxValue on a near-2^31-char group,
        // and a negative lead offset is an error — any offset past
        // Int.MaxValue is past every position, so the clamp still
        // yields the correct all-(-1) column
        val d = math.min(m * h, Int.MaxValue.toLong).toInt
        df.withColumn(s"rank$m",
          coalesce(lead(col("rank"), d).over(wPos), lit(-1L)))
      }
      r = stepped
        .select(Seq(col("gid"), col("pos"),
          dense_rank().over(Window.partitionBy("gid")
            .orderBy("rank", "rank1", "rank2", "rank3"))
            .cast("long").as("rank")) ++ tagCols: _*)
        .localCheckpoint(true)
      // converged when every group's ranks are all distinct: the
      // dense max equals the position count (one action per round,
      // the iterative-operator discipline)
      done = allUnique()
      h *= 4
      rounds += 1
    }
    r
  }

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
    // per-position char codes come from ONE split per document —
    // `substring(text, pos, 1)` per position is O(pos) on UTF-8 bytes
    // (quadratic per doc: measured 16 s of a 19 s build at sf0.1).
    // Codes are ints from round 0 on; texts must not contain NUL,
    // which shares code 0 with the past-the-end padding (the corpus
    // contract, as the sibling expressions' BMP rule).
    val codes = base
      .select(col("doc_id").as("gid"),
        posexplode(split(col("text"), "")).as(Seq("p0", "ch")))
      .select(col("gid"), (col("p0") + 1).as("pos"),
        ascii(col("ch")).as("c0"))
    ranksFromCodes(codes, maxLen.toLong, maxRounds)
      .select(col("gid").as("doc_id"), col("pos"),
        col("rank").as("suffix_rank"))
  }

  /** Longest repeated substring per document — THE suffix-array
    * application: the longest text that occurs at two different
    * positions equals the maximum LCP over RANK-ADJACENT suffix pairs
    * (any two occurrences' suffixes share that prefix, and moving
    * closer in rank order never shrinks an LCP). One lead window over
    * rank order, one in-place LCP scan per adjacent pair (`lcp_at` —
    * no suffix copies), then an argmax with the house deterministic
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
    // lcp_pairs: ALL of a doc's pair LCPs in one evaluation — a
    // per-pair scalar inside transform() re-decodes the whole text
    // every element (UTF8String.toString is a full copy)
    base.join(perDoc, Seq("doc_id"), "left")
      .withColumn("lcps", graft.functions.TextHashExpressions
        .lcp_pairs(col("text"), col("ps")))
      .withColumn("lrs_len",
        coalesce(array_max(col("lcps")), lit(0)).cast("long"))
      .withColumn("lrs",
        coalesce(
          array_min(transform(
            filter(
              zip_with(col("ps"), col("lcps"), (p, l) =>
                struct(p.getField("pos_a").as("pos_a"), l.as("l"))),
              x => x.getField("l") === col("lrs_len")),
            x => col("text").substr(x.getField("pos_a"),
              col("lrs_len").cast("int")))),
          lit("")))
      .select(col("doc_id"), col("lrs_len"), col("lrs"))
  }

  /** Cross-document repeated text per group (the GENERALIZED suffix
    * array): each group's documents, doc_id-ordered and joined with a
    *  sentinel, form one virtual string; the longest substring
    * of it occurring at two positions IN DIFFERENT DOCUMENTS is the
    * group's shared-boilerplate measure — found exactly, at any
    * length, where the gram families see only >= l-gram repeats.
    *
    * Sentinel suffixes (code 1 < every text char) rank in one
    * contiguous block before all real suffixes, so dropping them
    * keeps real-suffix adjacency intact; and for any cross-document
    * pair (a, b), the rank path from a to b contains an ADJACENT
    * cross-document pair whose LCP is >= LCP(a, b) (LCP(a, b) is the
    * min over the path) — so the max over rank-adjacent cross-doc
    * pairs IS the max over all cross-doc pairs. A repeat may span a
    * sentinel (both engines state the same concatenation, so the
    * corner is defined, not divergent).
    *
    * Scale: the ranking is [[ranksFromCodes]] over (group, global pos)
    * — positions come from per-doc explodes plus a per-group offset
    * cumsum, the concatenated string is materialized ONLY in the final
    * per-group witness row (group-sized state: at lake scale groups
    * are shards, the Lee et al. contract — see SCALING.md).
    */
  def crossDocRepeats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      maxRounds: Int = 40): DataFrame = {
    val nn = docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(srcCol).as("gid"), col(idCol).as("doc_id"),
        col(textCol).as("text"))
    // 0-based offset of each doc in its group's sentinel-joined
    // concatenation: cumsum of (len + 1) over the doc_id order
    val off = nn.withColumn("off",
      coalesce(sum(length(col("text")).cast("long") + 1L).over(
        Window.partitionBy("gid").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .localCheckpoint(true) // feeds chars, sentinels and maxLen
    val maxLen = off
      .agg(coalesce(max(col("off") + length(col("text"))), lit(0L)))
      .head().getLong(0)
    require(maxLen <= Int.MaxValue,
      s"group concatenation exceeds Int positions ($maxLen) — shard the group")
    // the owning doc rides the loop as the `tag` passthrough
    // (sentinel rows: null tag — dropped after ranking)
    val chars = off
      .select(col("gid"), col("doc_id"), col("off"),
        posexplode(split(col("text"), "")).as(Seq("p0", "ch")))
      .select(col("gid"),
        (col("off") + col("p0") + 1).cast("int").as("pos"),
        ascii(col("ch")).as("c0"), col("doc_id").as("tag"))
    val sentinels = off.where(col("off") > 0)
      .select(col("gid"), col("off").cast("int").as("pos"),
        lit(1).as("c0"), lit(null).cast("long").as("tag"))
    val ranks = ranksFromCodes(chars.unionByName(sentinels),
      maxLen, maxRounds)
    // real positions only (sentinel block dropped)
    val real = ranks.where(col("tag").isNotNull)
      .select(col("gid"), col("pos"), col("rank"),
        col("tag").as("doc_id"))
    val wRank = Window.partitionBy("gid").orderBy("rank")
    // checkpointed: decouples the window sort from the collect_list
    // below — pipelined, one task holds the sort buffers AND the
    // per-group list-aggregation buffers at once, and the stage
    // spills (measured 38 s for work that runs in ~4 s staged)
    val pairs = real
      .withColumn("pos_b", lead(col("pos"), 1).over(wRank))
      .withColumn("doc_b", lead(col("doc_id"), 1).over(wRank))
      .where(col("pos_b").isNotNull && col("doc_b") =!= col("doc_id"))
      .select(col("gid"), col("pos").as("pos_a"), col("pos_b"))
      .localCheckpoint(true)
    val perSrc = pairs.groupBy("gid")
      .agg(collect_list(struct(col("pos_a"), col("pos_b"))).as("ps"))
      .localCheckpoint(true)
    // the one group-sized row: doc_id-ordered sentinel-joined text
    // (array_sort on (doc_id, text) structs makes collect_list's
    // order irrelevant — the house determinism discipline)
    val cat = nn.groupBy("gid")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("text")))),
        x => x.getField("text")), "\u0001").as("text"))
    cat.join(perSrc, Seq("gid"), "left")
      .withColumn("lcps", graft.functions.TextHashExpressions
        .lcp_pairs(col("text"), col("ps")))
      .withColumn("cross_len",
        coalesce(array_max(col("lcps")), lit(0)).cast("long"))
      .withColumn("witness",
        coalesce(
          array_min(transform(
            filter(
              zip_with(col("ps"), col("lcps"), (p, l) =>
                struct(p.getField("pos_a").as("pos_a"), l.as("l"))),
              x => x.getField("l") === col("cross_len")),
            x => col("text").substr(x.getField("pos_a"),
              col("cross_len").cast("int")))),
          lit("")))
      .select(col("gid").as("source"), col("cross_len"), col("witness"))
  }
}
