package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines (SURVEY §2C
  * extension): deterministic split assignment, token-budget shard
  * packing, benchmark-contamination checks, and quality-based canonical
  * selection inside near-dup clusters. Everything is column algebra or
  * bounded joins — and everything is deterministic, so the DuckDB
  * oracle can replay it bit-for-bit (no RNG: "random" choices are
  * content-hash-based, which is also what makes them reproducible
  * across runs and engines at 100 TB).
  */
object Curation {

  /** Deterministic train/val/test assignment by content-stable hash:
    * bucket = md5-prefix(id) mod 100; [0,trainPct) -> train,
    * [trainPct, trainPct+valPct) -> val, rest -> test. Hash-based (not
    * row_number/rand) so the split of a document never changes when the
    * corpus grows or reorders — the property training pipelines need.
    * Pure per-row column math; no shuffle until the caller aggregates.
    */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = Dedup.md5Hash32(id.cast("string")) % 100
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** GPT-style training-sequence packing — concat-and-chunk: documents
    * in global `idCol` order are conceptually concatenated into one
    * token stream and cut into fixed `ctxLen` windows; every token
    * position belongs to exactly one pack, and a document may SPAN
    * pack boundaries (unlike [[packShards]], which assigns whole docs
    * to a shard per group). Returns per-document
    * (n_tokens, start_off, pack_first, pack_last, n_packs) — the
    * layout a sequence-packing data loader materializes.
    *
    * The global running sum is computed the 100 TB way: a naive
    * `Window.orderBy(id)` with no partition funnels the corpus into
    * ONE task, so instead the cumsum is two-pass — (1) an intra-granule
    * window partitioned by granule = floor(id/`granule`) (monotone in
    * id, so granule order IS id order; distributed), and (2) a prefix
    * sum over the per-granule TOTALS (a rows/granule-sized relation —
    * the only global window runs over that tiny table) broadcast back.
    * This is the per-partition-offsets pattern every distributed scan
    * uses, stated declaratively so Catalyst still prunes/pushes.
    *
    * Ids must be unique non-null (the order tiebreak and the granule
    * math both assume it); token counts must be ≥ 0. Long cumsum is
    * exact; pack ids are floor divisions of exact nonneg longs.
    */
  /** Distributed INCLUSIVE running sum of `valueCol` in `idCol`
    * order — the two-pass granule cumsum (intra-granule window +
    * broadcast granule prefix offsets) shared by [[sequencePack]],
    * the q54 global index, and t27's vocabulary-growth curve. The one
    * global window runs over the granule-totals axis (corpus/granule
    * rows), never the corpus — the c21_naive single-task funnel
    * designed out. Hash-matching any consumer against a plain global
    * cumsum oracle PROVES the decomposition.
    */
  def runningSum(df: DataFrame, idCol: String, valueCol: String,
      granule: Long, out: String): DataFrame = {
    require(granule > 0, s"granule must be positive (got $granule)")
    val base = df.withColumn("__g", floor(col(idCol) / granule).cast("long"))
    val intra = Window.partitionBy(col("__g")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gw = Window.orderBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gOffsets = base.groupBy(col("__g"))
      .agg(sum(col(valueCol)).as("__gt"))
      .withColumn("__goff", coalesce(sum(col("__gt")).over(gw), lit(0L)))
      .select(col("__g"), col("__goff"))
    base
      .withColumn("__ic", sum(col(valueCol)).over(intra))
      .join(broadcast(gOffsets), Seq("__g"))
      .withColumn(out, col("__goff") + col("__ic"))
      .drop("__g", "__ic", "__goff")
  }

  def sequencePack(docs: DataFrame, idCol: String, tokens: Column,
      ctxLen: Long, granule: Long = 1024L): DataFrame = {
    require(ctxLen > 0 && granule > 0,
      s"ctxLen and granule must be positive (got $ctxLen, $granule)")
    runningSum(docs.withColumn("n_tokens", tokens), idCol, "n_tokens",
        granule, "__cum")
      .withColumn("start_off", col("__cum") - col("n_tokens"))
      .withColumn("pack_first",
        floor(col("start_off") / ctxLen).cast("long"))
      .withColumn("pack_last",
        floor((col("__cum") - 1) / ctxLen).cast("long"))
      .withColumn("n_packs", col("pack_last") - col("pack_first") + 1)
      .drop("__cum")
  }

  /** Token-budget shard packing: within each `packKey` group (e.g.
    * source/domain), documents in `orderCol` order are packed
    * sequentially into shards of ~`budget` tokens — shard id = the
    * shard containing the document's first token. One window sort per
    * group; partitioning by packKey keeps the sort distributed (a
    * single global pack would funnel into one task — pack per domain,
    * as real pipelines do, or pre-range-partition).
    *
    * Adds `n_tokens` and `shard` columns.
    */
  def packShards(docs: DataFrame, packKey: String, orderCol: String,
      tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(packKey)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tokens", tokens)
      .withColumn("shard",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget).cast("long"))
  }

  /** CCNet's paragraph-granularity quality filter (c23, and stage 1
    * of the p06 pipeline): segment every doc into `chunkSize`-word
    * windows ([[chunkTokens]], overlap 0), score each segment with
    * the self-trained t16 bigram LM, tercile-bucket per source
    * (head/middle/tail — the c17 ntile discipline at segment grain),
    * drop the tail third, and REASSEMBLE each doc from its surviving
    * segments in order. Returns (doc_id, source, n_segments, n_kept,
    * cleaned) — `cleaned` may be '' when every segment fell in the
    * tail. Segment ids pack as doc_id·1000 + chunk_idx, bounds
    * enforced loudly (the oracle states the same packing).
    */
  def segmentLmFilter(docs: DataFrame, chunkSize: Int = 32): DataFrame = {
    val segs = chunkTokens(docs.where(col("text").isNotNull), "text",
        chunkSize, overlap = 0)
      .select(col("doc_id"), col("source"), col("chunk_idx"),
        array_join(col("chunk_words"), " ").as("seg_text"))
      .localCheckpoint(true) // feeds the id bound, the LM, and the rebuild
    val maxIdx = segs.agg(max("chunk_idx")).head().getLong(0)
    require(maxIdx < 1000,
      s"segmentLmFilter seg-id packing overflows: max chunk_idx $maxIdx " +
        ">= 1000 — raise the multiplier here AND in the c23/p06 oracles")
    val withId = segs
      .withColumn("seg_id", col("doc_id") * 1000 + col("chunk_idx"))
    val scored = graft.ops.LangModel
      .selfScore(withId.select("seg_id", "seg_text"), "seg_id", "seg_text")
      .select(col("seg_id"), coalesce(col("mean_prob"), lit(0.0)).as("mp"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("mp").desc, col("seg_id"))
    val kept = withId.join(scored, Seq("seg_id"))
      .withColumn("terc", ntile(3).over(w))
      .where(col("terc") <= 2)
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(expr(
        "transform(sort_array(collect_list(struct(chunk_idx, seg_text))), x -> x.seg_text)"),
        " ").as("cleaned"))
    segs.groupBy("doc_id", "source").agg(count(lit(1)).as("n_segments"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Benchmark-contamination check via bigram-hash overlap: the
    * benchmark's distinct bigram hashes are collected into ONE set
    * (benchmark suites are small by nature) and broadcast; each corpus
    * document then computes `array_intersect` against it per-row — no
    * shuffle of corpus n-grams at all. Returns (id, extra cols,
    * n_grams, n_hits, overlap) for docs with >= 2 words.
    *
    * The 32-bit gram hash matches Dedup.ngramJaccardPairs (and the
    * oracle); a collision inflates overlap identically in both engines.
    */
  def contaminationScores(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, keep: Seq[String] = Seq.empty): DataFrame = {
    // gram arrays are SORTED so the per-row hit count is the native
    // two-pointer merge (SortedIntersectSize) instead of
    // array_intersect's per-row hash-set build over the whole benchmark
    // set — same count on these distinct sets, no per-row allocation
    def grams(df: DataFrame, cols: Seq[Column]): DataFrame =
      df.where(size(split(col(textCol), " ")) >= 2)
        .select(cols :+ sort_array(array_distinct(
          graft.functions.TextHashExpressions.bigram_hash32(col(textCol)))).as("gs"): _*)
    val benchSet = grams(benchmark, Seq.empty)
      .select(explode(col("gs")).as("g")).distinct()
      .agg(sort_array(collect_set(col("g"))).as("bench_gs"))
    grams(corpus, (idCol +: keep).map(col))
      .crossJoin(broadcast(benchSet))
      .withColumn("n_grams", size(col("gs")).cast("long"))
      .withColumn("n_hits",
        graft.functions.VecExpressions.sorted_intersect_size(col("gs"), col("bench_gs")))
      .withColumn("overlap", col("n_hits") / col("n_grams").cast("double"))
      .drop("gs", "bench_gs")
  }

  /** NEAR-duplicate benchmark decontamination via MinHash LSH — the
    * fuzzy complement of [[contaminationScores]] (which measures exact
    * n-gram overlap): a corpus document is flagged when it shares ANY
    * LSH band bucket with a benchmark document, i.e. when MinHash
    * considers it a near-duplicate CANDIDATE of held-out data. This is
    * the recall-first shape eval decontamination wants (a flagged doc
    * goes to exact verification or is just dropped; a missed near-dup
    * poisons the benchmark).
    *
    * Scale shape: the benchmark's distinct band keys are tiny by nature
    * (suites are small) and broadcast, so the corpus is ONE scan + a
    * broadcast semi-join — the 100 TB side never shuffles, unlike a
    * corpus-vs-corpus LSH join. Returns the distinct flagged corpus ids
    * as (id). Band keys/permutations are [[Dedup]]'s literals, so the
    * DuckDB oracle replays the flagging exactly.
    */
  def lshDecontaminateIds(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val benchBuckets = Dedup.bandKeys(benchmark, idCol, textCol)
      .select("band_idx", "band_key").distinct()
    Dedup.bandKeys(corpus, idCol, textCol)
      .join(broadcast(benchBuckets), Seq("band_idx", "band_key"), "left_semi")
      .select(col("id")).distinct()
  }

  /** Token-window document chunking — the training-prep step between
    * curation and shard packing: each document becomes overlapping
    * windows of `chunkSize` whitespace tokens advancing by
    * `chunkSize - overlap` (so consecutive chunks share `overlap`
    * tokens of context; the final chunk may be shorter). Pure per-row
    * array math — `split` → `transform(sequence(...))` over slice
    * windows → one `explode` — so chunking never shuffles; a document
    * always yields at least one chunk (short/empty docs are one chunk
    * of themselves), and chunk membership is deterministic, so the
    * DuckDB oracle replays it exactly.
    *
    * Adds (chunk_idx long, chunk_words array<string>) one row per
    * chunk; chunk token counts come from `size(chunk_words)`.
    */
  def chunkTokens(docs: DataFrame, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    docs
      .withColumn("__ws", split(col(textCol), " "))
      .withColumn("__chunk", explode(expr(
        s"""transform(
           |  sequence(0, cast(greatest(ceil((size(__ws) - $overlap) / $stride.0D) - 1, 0) as int)),
           |  i -> struct(cast(i as bigint) as idx, slice(__ws, i * $stride + 1, $chunkSize) as words))""".stripMargin)))
      .withColumn("chunk_idx", col("__chunk.idx"))
      .withColumn("chunk_words", col("__chunk.words"))
      .drop("__ws", "__chunk")
  }

  /** Deterministic weighted (per-source) subsampling — the data-MIXING
    * primitive: each source keeps a `weights(source)` fraction of its
    * documents, membership decided by a content-stable hash threshold
    * (md5-bucket of the id against weight·10⁴), never `rand()`/
    * `sampleBy` — the same document is kept on every rerun and every
    * engine (so the DuckDB oracle can replay it exactly), and the
    * filter is pure per-row column math: no shuffle, no RNG state, and
    * upsampling a source later keeps every previously kept document (a
    * higher threshold is a superset — the property that makes mixture
    * sweeps reproducible). Sources absent from `weights` keep
    * `defaultWeight`.
    */
  def weightedSample(docs: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 1),
      s"sampling weights must be in [0,1]: $weights / $defaultWeight")
    val bucket = Dedup.md5Hash32(col(idCol).cast("string")) % 10000
    val rate = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (src, w)) => when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    docs.where(bucket < rate * 10000)
  }

  /** EXACT-size stratified sample: each stratum contributes precisely
    * floor(|stratum| * fracNum / fracDen) rows — the output preserves
    * the corpus mix BY CONSTRUCTION, where [[weightedSample]]'s
    * Bernoulli draw only hits its rate in expectation (a small stratum
    * can come back 30% off). Membership is a deterministic hash-rank
    * within the stratum (ties by id), so the sample is reproducible
    * and, like c10's cap, stable-prefix under corpus growth. Cost at
    * 100 TB: stratum counts are group-cardinality-sized (broadcast
    * back), and the one window is partitioned BY STRATUM — the same
    * per-key skew bound as any per-source window in the suite.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, strataCol: String,
      fracNum: Int, fracDen: Int): DataFrame = {
    require(fracNum >= 0 && fracDen > 0 && fracNum <= fracDen,
      s"sampling fraction must be in [0,1]: $fracNum/$fracDen")
    // case-INsensitive: Spark resolves columns case-insensitively by
    // default, so a user '__N' would be silently overwritten+dropped
    require(!docs.columns.exists(c =>
        c.equalsIgnoreCase("__n") || c.equalsIgnoreCase("__rk")),
      "__n/__rk are reserved by stratifiedSample; rename those columns")
    // stratum size via a window COUNT sharing the rank's partitioning —
    // no join, one shuffle, and a NULL stratum samples like any other
    // (the equi-join formulation would silently drop NULL-strata rows:
    // NULL never equi-matches)
    val part = Window.partitionBy(col(strataCol))
    val w = part.orderBy(
      Dedup.md5Hash32(col(idCol).cast("string")).asc_nulls_last,
      col(idCol).asc_nulls_last)
    docs.withColumn("__n", count(lit(1)).over(part))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= expr(s"(__n * $fracNum) div $fracDen"))
      .drop("__n", "__rk")
  }

  /** PII scrubbing rules as (class, pattern, placeholder). The patterns
    * stay inside the RE2-compatible subset (no backreferences, no
    * lookaround) so every regex engine a pipeline might replay them on
    * — Spark's java.util.regex here, RE2-family engines elsewhere —
    * matches the same spans. Ordered: emails first (an email would
    * otherwise leave its user digits behind for the looser rules),
    * then phones, then IPv4s.
    */
  val PiiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\d{3}-\\d{3}-\\d{4}", "<PHONE>"),
    ("ip", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>"))

  /** Redacted copy of `text`: every [[PiiRules]] match replaced by its
    * class placeholder, applied in rule order. Pure per-row column math
    * (a fold of codegen'd `regexp_replace`s) — no shuffle, no UDF; at
    * 100 TB this runs at scan speed inside whole-stage codegen.
    */
  def redactPii(text: Column): Column =
    PiiRules.foldLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Number of matches of one PII class in the ORIGINAL text (counts
    * must not depend on what an earlier rule already replaced).
    */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Canonical selection inside near-dup clusters: instead of "keep the
    * min id" (d06), keep the HIGHEST-QUALITY member — rank cluster
    * members by (quality desc, id asc) and return ONLY rank 1, one row
    * per cluster, with a `cluster_size` column. Input: the cluster
    * labels from [[Dedup.connectedComponents]] joined back to the
    * corpus. One window over the cluster key.
    */
  def keepBest(labeled: DataFrame, labelCol: String, idCol: String,
      quality: Column): DataFrame = {
    val w = Window.partitionBy(col(labelCol))
      .orderBy(quality.desc, col(idCol).asc)
    labeled
      .withColumn("__rank", row_number().over(w))
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy(col(labelCol))))
      .where(col("__rank") === 1)
      .drop("__rank")
  }

  /** Snapshot + delta MERGE — the incremental-corpus settle step: the
    * next snapshot keeps, per key, the row with the highest version
    * across `snapshot ∪ delta`. Inserts, updates and deletes are all
    * just delta rows. Ties on version prefer the delta side (the later
    * write), so re-applying a delta is idempotent; a residual tie (two
    * delta rows with the same key AND version) is broken by a
    * fingerprint of the whole row, so the survivor is a deterministic
    * function of the data, never of shuffle order.
    *
    * A winning tombstone (deleteCol true) is RETAINED in the output,
    * still carrying deleteCol = true — not dropped. That keeps the
    * merge closed under composition: merging a late-arriving delta
    * that carries an OLDER version of a deleted key into the output
    * sees the tombstone win again instead of resurrecting the key
    * (merge(merge(S, A), B) == merge(S, A ∪ B) for out-of-order A, B).
    * Filter `!deleteCol` for the live view; drop tombstones only in a
    * compaction step once no older delta can still arrive.
    *
    * One row_number window over the key — a single hash shuffle of
    * snapshot+delta, the minimum any latest-wins merge pays. At 100 TB
    * the snapshot is bucketed by key so only the delta shuffles
    * (q30's layout machinery); the logical plan here is unchanged.
    *
    * Column contract: both inputs share a schema containing keyCol,
    * versionCol and deleteCol (boolean). Returns the winning row per
    * key (helper columns dropped).
    */
  def snapshotMerge(snapshot: DataFrame, delta: DataFrame,
      keyCol: String, versionCol: String, deleteCol: String): DataFrame = {
    val all = snapshot.withColumn("__src", lit(0))
      .unionByName(delta.withColumn("__src", lit(1)))
    val fingerprint =
      md5(to_json(struct(snapshot.columns.map(col).toIndexedSeq: _*)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc_nulls_last, col("__src").desc,
        fingerprint.asc)
    all.withColumn("__rank", row_number().over(w))
      .where(col("__rank") === 1)
      .drop("__rank", "__src")
  }

  /** 2-D Pareto frontier (skyline): the rows no other row dominates,
    * where q dominates p iff q.x > p.x ∧ q.y ≥ p.y, or q.x = p.x ∧
    * q.y > p.y; exact (x, y) ties collapse to the lowest id. The
    * curation use: keep documents maximal in two quality axes at once
    * (e.g. length AND lexical diversity) instead of thresholding each
    * axis independently.
    *
    * Scale shape — the textbook skyline needs a GLOBAL running max
    * over x order, which as a bare `Window.orderBy` is a
    * single-partition scan of the whole corpus. Decomposed instead:
    * (1) per-x winners via a window PARTITIONED by x; (2) cross-x
    * dominance as a two-level prefix max — winners get a coarse bucket
    * key (min/max-scaled exactly like `Layout.writeZOrdered`), the
    * strictly-higher-BUCKET running max runs over the `buckets`-row
    * bucket-max relation (bounded axis — q39's single-partition
    * envelope), and the strictly-higher-x-SAME-bucket running max is a
    * window partitioned by bucket. Bucket monotonicity makes the union
    * of the two maxima exactly max{y' : x' > x}, so the result is
    * bucket-count-invariant and the oracle may replay the naive global
    * window instead. NULL x/y rows cannot sit on a frontier and are
    * dropped.
    */
  def paretoFrontier2d(df: DataFrame, idCol: String, xCol: String,
      yCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    Seq("__b", "__bymax", "__brun", "__wrun", "__rn").foreach { r =>
      require(!df.columns.exists(_.equalsIgnoreCase(r)),
        s"$r is reserved by paretoFrontier2d; rename that column on the input")
    }
    val pts = df.select(col(idCol), col(xCol), col(yCol))
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
    // winners are materialized ONCE (the input lineage may be an
    // expensive aggregation, as in c13): the eager checkpoint feeds the
    // min/max head(), the join's left side, and the bucket-max groupBy
    // without recomputing the upstream three times. min/max over
    // winners == min/max over pts (one winner survives per distinct x).
    val winners = pts
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(xCol))
          .orderBy(col(yCol).desc, col(idCol))))
      .where(col("__rn") === 1).drop("__rn")
      .localCheckpoint(true)
    val r = winners.agg(min(col(xCol)).cast("double"),
      max(col(xCol)).cast("double")).head()
    if (r.isNullAt(0)) return winners // empty input: no rows, any schema
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    val bucket = least(lit(buckets - 1),
      ((col(xCol).cast("double") - lo) / span * buckets).cast("long"))
    val wb = winners.withColumn("__b", bucket)
    val brun = wb.groupBy("__b").agg(max(col(yCol)).as("__bymax"))
      .withColumn("__brun", max(col("__bymax")).over(
        Window.orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("__b", "__brun")
    val wrun = max(col(yCol)).over(
      Window.partitionBy(col("__b")).orderBy(col(xCol).desc)
        .rowsBetween(Window.unboundedPreceding, -1))
    wb.join(broadcast(brun), "__b")
      .withColumn("__wrun", wrun)
      .where((col("__brun").isNull || col("__brun") < col(yCol)) &&
        (col("__wrun").isNull || col("__wrun") < col(yCol)))
      .drop("__b", "__brun", "__wrun")
  }

  /** Per-source rate under temperature-rebalanced mixing — see
    * [[temperatureRates]].
    */
  final case class SourceRate(source: String, n: Long, rate: Double)

  /** Temperature-rebalanced source mixing (the multilingual /
    * multi-source rebalancing rule mBERT/XLM-R popularized:
    * p_s ∝ share_s^(1/T) flattens the source distribution so small
    * sources aren't drowned): per-source keep rates that hit a target
    * of `total · targetNum / targetDen` rows in expectation,
    * rate_s = min(1, M·p_s / n_s). T is fixed at 2 — the common
    * setting — BECAUSE that makes the exponent `sqrt`, which IEEE 754
    * requires correctly rounded, so the rates replay bit-for-bit in
    * any engine (a general `pow` is libm-rounded and would not; the
    * t14 no-ln rule, applied to the exponent). The normalizer is a
    * source-sorted left fold (the ordered-sum house rule).
    *
    * The rate table is group-cardinality-sized driver state (the s08
    * centroid rule): sources are bounded by nature. Returns one
    * [[SourceRate]] per source, sorted by source.
    */
  def temperatureRates(docs: DataFrame, sourceCol: String,
      targetNum: Long = 1, targetDen: Long = 2): Seq[SourceRate] = {
    require(targetNum >= 0 && targetDen > 0,
      s"target fraction must be >= 0 with positive denominator, got $targetNum/$targetDen")
    // null sources carry no rate (applyMixRates' when-chain gives them
    // 0.0 and drops them); excluding them here keeps the sort total
    val counts = docs.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    if (total == 0) return Seq.empty
    val m = total * targetNum / targetDen
    val ws = counts.map { case (s, n) =>
      (s, n, math.sqrt(n.toDouble / total.toDouble))
    }
    val z = ws.foldLeft(0.0)((acc, x) => acc + x._3)
    ws.map { case (s, n, w) =>
      SourceRate(s, n, math.min(1.0, (m.toDouble * (w / z)) / n.toDouble))
    }.toSeq
  }

  /** Keep rows by the [[temperatureRates]] table: the c05 hash-
    * threshold rule (md5 bucket of the id vs rate·10⁴) with the rate
    * chosen per source — deterministic, reproducible, per-row column
    * math (the rate table enters the plan as a when-chain of
    * literals). Sources absent from `rates` are dropped (rate 0).
    */
  def applyMixRates(docs: DataFrame, idCol: String, sourceCol: String,
      rates: Seq[SourceRate]): DataFrame = {
    val rateCol = rates.sortBy(_.source).foldLeft(lit(0.0)) {
      case (acc, r) => when(col(sourceCol) === r.source, lit(r.rate)).otherwise(acc)
    }
    docs.where(
      Dedup.md5Hash32(col(idCol).cast("string")) % 10000 < rateCol * 10000)
  }

  /** DSIR-style importance scoring for targeted data selection (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every document by how much more likely its
    * hashed-token features are under a TARGET distribution (e.g. the
    * high-quality or in-domain slice) than under the raw corpus — the
    * principled upgrade of c05's per-source weights to CONTENT-based
    * mixture steering.
    *
    * Deterministic variant (the t14/t16 house rules): the paper's
    * per-feature log-ratio Σ log(p̂_t(b)/p̂_r(b)) drops the log AND the
    * constant normalizer (N_r+B)/(N_t+B) — both strictly monotone /
    * constant per corpus, so top-k selection order changes only where
    * the log's gap compression would reorder sums, and the score stays
    * bit-reproducible: per token position, ratio = (ct(b)+1)/(cr(b)+1)
    * as one double division; per document, the positions are summed by
    * the ordered list fold and divided by the token count. Resampling
    * is deterministic too: rank by (score desc, id) instead of
    * Gumbel-top-k — reproducibility is the property a 100 TB pipeline
    * actually wants from its selection step.
    *
    * Scale shape: the "model" is the bucket-count relation — at most
    * `buckets` rows (default 1024) after two map-side-combined
    * groupBys over ONE tokenize pass (checkpointed; three consumers).
    * It broadcasts to the per-token scoring join, so the only
    * data-sized shuffle is the per-document fold's groupBy on id.
    * Incremental maintenance is algebraic (counts sum — q42/t15).
    *
    * Returns (idCol, n_tokens long, dsir_score double) for every
    * non-null-text document; `isTarget` marks the target slice.
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), col(textCol), isTarget.as("__t"))
    val toks = base
      .select(col(idCol), col("__t"), posexplode(split(col(textCol), " ")))
      .select(col(idCol), col("__t"), col("pos"),
        pmod(Dedup.md5Hash32(col("col")), lit(buckets.toLong)).as("__b"))
      .localCheckpoint(true)
    val raw = toks.groupBy("__b").agg(count(lit(1)).as("cr"))
    val tgt = toks.where(col("__t")).groupBy("__b").agg(count(lit(1)).as("ct"))
    // every observed bucket is in `raw` by construction; unseen-in-target
    // buckets smooth to ct=0 via the +1 in the ratio
    val model = raw.join(tgt, Seq("__b"), "left")
      .select(col("__b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    toks.join(broadcast(model), Seq("__b"))
      .withColumn("__r",
        (col("ct") + lit(1L)).cast("double") / (col("cr") + lit(1L)).cast("double"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("__r")))).as("__rs"),
        count(lit(1)).as("n_tokens"))
      .withColumn("dsir_score",
        aggregate(col("__rs"), lit(0.0), (acc, x) => acc + x.getField("__r"))
          / col("n_tokens").cast("double"))
      .select(col(idCol), col("n_tokens"), col("dsir_score"))
  }

  /** The DSIR bucket-count model relation alone — (__b, cr long,
    * ct long), the ≤ `buckets`-row state [[dsirScores]] builds
    * internally. Standalone so the model can be maintained
    * INCREMENTALLY (counts sum across disjoint batches — the q42/t15
    * rule; [[graft.streaming.ModelStreams]] persists per-batch
    * partials of exactly this relation) and applied later via
    * [[dsirScoresWith]].
    */
  def dsirModel(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val toks = docs.where(col(textCol).isNotNull)
      .select(isTarget.as("__t"), explode(split(col(textCol), " ")).as("__w"))
      .select(col("__t"),
        pmod(Dedup.md5Hash32(col("__w")), lit(buckets.toLong)).as("__b"))
    toks.groupBy("__b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
  }

  /** Score documents under a PREBUILT [[dsirModel]] relation — the
    * incremental-model path (train the model on yesterday's corpus or
    * a maintained stream state, score today's batch without
    * re-counting history). Identical scoring math to [[dsirScores]]:
    * per token position, ratio = (ct+1)/(cr+1); per document, the
    * position-ordered fold sum divided by the token count. Buckets
    * absent from the model (never observed at train time) smooth to
    * cr=0, ct=0 → ratio 1.0 — a no-evidence token is neutral.
    */
  def dsirScoresWith(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val toks = docs.where(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), col("pos"),
        pmod(Dedup.md5Hash32(col("col")), lit(buckets.toLong)).as("__b"))
    toks.join(broadcast(model), Seq("__b"), "left")
      .withColumn("__r",
        (coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("__r")))).as("__rs"),
        count(lit(1)).as("n_tokens"))
      .withColumn("dsir_score",
        aggregate(col("__rs"), lit(0.0), (acc, x) => acc + x.getField("__r"))
          / col("n_tokens").cast("double"))
      .select(col(idCol), col("n_tokens"), col("dsir_score"))
  }

  /** Deterministic top-`k` selection under [[dsirScores]] — the
    * resampling step with rank-by-(score, id) in place of Gumbel noise.
    * `orderBy.limit` plans as a distributed TakeOrdered (per-partition
    * top-k + driver merge of k·partitions rows), never a global sort.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, buckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    dsirScores(docs, idCol, textCol, isTarget, buckets)
      .orderBy(col("dsir_score").desc, col(idCol).asc)
      .limit(k)
  }
}
