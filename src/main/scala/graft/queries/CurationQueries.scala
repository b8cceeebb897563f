package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, TextAnalysis}
import graft.sources.Tables

/** Dataset-curation pack over `documents` (SURVEY §2C extension): the
  * four operations a training-data pipeline runs between "deduped" and
  * "ready to train" — deterministic splits, shard packing, benchmark
  * decontamination, quality-based cluster canonicalization. All
  * hash-deterministic, so every query has a DuckDB oracle.
  */
object CurationQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // content-hash split: membership is stable under corpus growth and
    // reordering (the reproducibility property rand()/row_number lacks)
    // DSIR-style importance selection toward the English slice — the
    // content-based mixture-steering upgrade of c05, deterministic
    // variant (ratio for log-ratio, rank for Gumbel) documented in
    // graft.ops.Curation.dsirScores
    "c14_dsir_selection" -> ((s, d) => {
      Curation.dsirSelect(
          Tables.load(s, d, "documents").select("doc_id", "text", "lang"),
          "doc_id", "text", col("lang") === "en", k = 100)
        .orderBy(col("dsir_score").desc, col("doc_id"))
    }),

    // CCNet's perplexity bucketing in the deterministic t16 form: every
    // doc scored by the corpus-trained bigram LM, then terciled per
    // source by (mean_prob desc, id) — head = most in-distribution.
    // CCNet trains on the head, studies the middle, drops the tail;
    // this emits the per-(source, bucket) profile that decision reads.
    // The ntile window totally orders within source, never globally.
    "c17_perplexity_buckets" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "text", "source").where(col("text").isNotNull)
      val scored = graft.ops.LangModel
        .selfScore(docs.select("doc_id", "text"), "doc_id", "text")
        .select(col("doc_id"), coalesce(col("mean_prob"), lit(0.0)).as("mp"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("mp").desc, col("doc_id"))
      docs.select("doc_id", "source").join(scored, Seq("doc_id"))
        .withColumn("terc", ntile(3).over(w))
        .select(col("source"),
          when(col("terc") === 1, "head").when(col("terc") === 2, "middle")
            .otherwise("tail").as("ppl_bucket"),
          col("doc_id"), col("mp"))
        .groupBy("source", "ppl_bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_ids"),
          min(col("mp")).as("min_mp"),
          max(col("mp")).as("max_mp"))
        .orderBy("source", "ppl_bucket")
    }),

    // CURRICULUM packing — c17's difficulty signal composed with c02's
    // shard packing through e15's threshold tiles: every doc scored by
    // the corpus LM (t16 chain), terciled into curriculum stages by
    // quantile THRESHOLDS (no global sort — the e15 machinery; tile 1
    // = most in-distribution = trains first), then token-budget-packed
    // WITHIN each stage in id order. The easy→hard data ordering
    // curriculum training consumes, with every constituent already
    // proven: LM scores are engine-exact doubles, floor(mp·1e9) puts
    // them on the integer grid both engines share, and the only
    // windows are per-stage pack cumsums.
    "c20_curriculum_pack" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "text").where(col("text").isNotNull)
      val scored = graft.ops.LangModel.selfScore(docs, "doc_id", "text")
        .select(col("doc_id"), coalesce(col("mean_prob"), lit(0.0)).as("mp"))
      val withUnits = docs.join(scored, Seq("doc_id"))
        .withColumn("mp_units", floor(col("mp") * 1000000000d).cast("long"))
        .localCheckpoint(true) // quantileTiles runs driver actions over it
      val staged = graft.ops.Segmentation.quantileTiles(withUnits,
          Seq(("mp_units", false)), k = 3)
        .withColumnRenamed("mp_units_tile", "stage")
      Curation.packShards(
          staged.withColumn("__k", col("stage").cast("string")),
          "__k", "doc_id", TextAnalysis.wsTokenCount(col("text")), 4096L)
        .select("doc_id", "stage", "n_tokens", "shard")
        .orderBy("doc_id")
    }),

    // deterministic training-order shuffle: the global permutation a
    // trainer consumes, as hash order — every doc's position is
    // reproducible (reruns, audits, resume-from-step all need the
    // SAME order; rand() or a cluster-dependent shuffle is neither)
    // and sources interleave uniformly because md5 ignores them. The
    // position is assigned by Layout.globalIndex's two-pass form (the
    // c18 machinery generalized), never a single-task global sort;
    // the 32-bit hash WILL collide at corpus scale, so (hash, id) is
    // the total order in both engines — collisions cost nothing
    "c21_shuffle_order" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "source")
        .withColumn("__h", Dedup.md5Hash32(col("doc_id").cast("string")))
      graft.ops.Layout.globalIndex(docs, col("__h"), col("doc_id"),
          granule = 1L << 24, out = "shuffle_pos")
        .select("doc_id", "source", "shuffle_pos")
        .orderBy("doc_id")
    }),

    // CCNet's ACTUAL granularity (c17 buckets whole documents; the
    // paper scores and drops PARAGRAPHS, keeping the document): segment
    // every doc into 32-word windows (c06's chunker, overlap 0), score
    // each segment with the self-trained t16 bigram LM, tercile-bucket
    // per source (head/middle/tail, the c17 ntile discipline over the
    // segment relation), drop the tail third, and REASSEMBLE each doc
    // from its surviving segments in order. Output: per doc, segment
    // counts and the md5 of the rebuilt text (the d20 rewrite-gate
    // pattern — an all-tail doc must hash as ''). Segment ids are
    // doc_id·1000 + chunk_idx, bounds enforced loudly.
    "c23_segment_lm_filter" -> ((s, d) => {
      Curation.segmentLmFilter(
          Tables.load(s, d, "documents").select("doc_id", "text", "source"))
        .select(col("doc_id"), col("n_segments"), col("n_kept"),
          md5(col("cleaned").cast("binary")).as("cleaned_md5"))
        .orderBy("doc_id")
    }),

    // hard-negative mining for contrastive training: per anchor (every
    // 50th vector), the top-5 highest-cosine DIFFERENT-label vectors
    // with near-duplicates excluded (cosine > 0.95 ≈ label noise, the
    // d05/d13 finding applied as a mining rule). The corpus is unioned
    // with a label-flipped id-shifted copy of itself (the d13 planted-
    // twin pattern) so the exclusion is non-vacuous: WITHOUT the dup
    // ceiling every anchor's rank-1 would be its own flipped twin at
    // cosine 1.0; with it, no twin may surface at all — both engines
    // state the same ceiling, so the gate proves the rule fires.
    "c22_hard_negatives" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
        .select("vec_id", "label", "embedding")
      val maxId = e.agg(max("vec_id")).head().getLong(0)
      require(maxId < 100000,
        s"c22's twin-id shift collides: max(vec_id)=$maxId >= 100000 — " +
          "raise the shift in the query AND its oracle together")
      val all = e.unionByName(e.select(
        (col("vec_id") + 100000).as("vec_id"),
        (col("label") + 1).as("label"), col("embedding")))
      val anchors = e.where(pmod(col("vec_id"), lit(50L)) === 0)
      graft.ops.Similarity.hardNegatives(all, anchors, k = 5, dupMax = 0.95)
        .orderBy("query_id", "rank")
    }),

    // GPT-style concat-and-chunk sequence packing (Curation
    // .sequencePack): the corpus as one token stream cut into fixed
    // 4096-token context windows, docs spanning boundaries — per-doc
    // stream offsets and pack span, computed via the distributed
    // two-pass cumsum (intra-granule window + broadcast granule
    // prefix offsets), never a single global window. The oracle states
    // the same quantity as one plain global cumsum — hash-matching
    // PROVES the two-pass decomposition equals the naive global scan.
    "c18_sequence_packing" -> ((s, d) => {
      Curation.sequencePack(
          Tables.load(s, d, "documents").select("doc_id", "text")
            .where(col("text").isNotNull),
          "doc_id", TextAnalysis.wsTokenCount(col("text")),
          ctxLen = 4096L, granule = 64L)
        .select("doc_id", "n_tokens", "start_off",
          "pack_first", "pack_last", "n_packs")
        .orderBy("doc_id")
    }),

    // temperature-rebalanced source mixing (T = 2, sqrt — the IEEE-
    // exact exponent; see Curation.temperatureRates): per-source rates
    // toward a half-corpus target, hash-threshold keep, the rates
    // themselves in the hashed output
    "c16_temperature_mix" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents").select("doc_id", "source")
      val rates = Curation.temperatureRates(docs, "source")
      val kept = Curation.applyMixRates(docs, "doc_id", "source", rates)
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      rates.toDF("source", "n_docs", "rate")
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("rate"))
        .orderBy("source")
    }),

    // per-group winsorization — outlier clipping at the exact [p5, p95]
    // band (the numeric-feature curation step; q23 proved Spark's
    // interpolated `percentile` == DuckDB's quantile_cont). Per-row
    // output: no double SUMS, so the clipped doubles stay hash-safe.
    "c15_winsorize" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val bounds = docs.groupBy("lang").agg(
        expr("percentile(n_chars, 0.05D)").as("lo"),
        expr("percentile(n_chars, 0.95D)").as("hi"))
      docs.join(broadcast(bounds), "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          least(greatest(col("n_chars").cast("double"), col("lo")), col("hi"))
            .as("clipped"),
          (col("n_chars").cast("double") < col("lo") ||
            col("n_chars").cast("double") > col("hi")).as("was_clipped"))
        .orderBy("doc_id")
    }),

    "c01_hash_split" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(Curation.splitAssign(col("doc_id")).as("split"), col("text"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.wsTokenCount(col("text"))).as("total_tokens"))
        .orderBy("split")
    }),

    // token-budget packing per source: shard = the 4096-token bin a
    // document's first token lands in, packing docs in doc_id order
    "c02_shard_packing" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "source", "text")
      Curation.packShards(docs, "source", "doc_id",
          TextAnalysis.wsTokenCount(col("text")), budget = 4096L)
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
        .orderBy("source", "shard")
    }),

    // decontamination: docs whose bigram sets overlap the benchmark
    // slice (doc_id % 100 == 0) beyond thresholds, counted per source
    "c03_contamination" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text", "source")
      val bench = docs.where(col("doc_id") % 100 === 0)
      val corpus = docs.where(col("doc_id") % 100 =!= 0)
      Curation.contaminationScores(corpus, bench, "doc_id", "text", keep = Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("overlap") >= 0.25, 1L).otherwise(0L)).as("n_over_25"),
          sum(when(col("overlap") >= 0.5, 1L).otherwise(0L)).as("n_over_50"),
          sum(when(col("overlap") >= 0.75, 1L).otherwise(0L)).as("n_over_75"))
        .orderBy("source")
    }),

    // LEAKAGE-SAFE splits: a near-dup pair straddling train/test leaks
    // evaluation data into training (the hazard c08 detects post-hoc);
    // here it is impossible BY CONSTRUCTION — the split hash keys on
    // the near-dup cluster's canonical label (min id), own id for
    // non-clustered docs, so a whole cluster lands in one split. Same
    // split rule as c01, keyed one level up.
    "c19_leakage_safe_split" -> ((s, d) => {
      val docs = DedupQueries.docsWithMutations(s, d)
      val labels = Dedup.connectedComponentsOverBuckets(docs, "doc_id", "text")
      docs.join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("split_key", coalesce(col("label"), col("doc_id")))
        .select(col("doc_id"), col("split_key"),
          Curation.splitAssign(col("split_key")).as("split"))
        .orderBy("doc_id")
    }),

    // near-dup clusters canonicalized by QUALITY (longest member, ties
    // to min id) instead of d06's min-id rule — the keep-best shape
    // real dedup pipelines want. Clusters come from the star-contracted
    // bucket edges (identical components to the pair relation, O(m) per
    // bucket instead of O(m²) — see Dedup.bucketStarEdges); the oracle
    // keeps the pair form.
    "c04_cluster_keep_best" -> ((s, d) => {
      val docs = DedupQueries.docsWithMutations(s, d)
      val labeled = Dedup.connectedComponentsOverBuckets(docs, "doc_id", "text")
        .join(docs, col("id") === col("doc_id"))
        .select(col("label"), col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      Curation.keepBest(labeled, "label", "doc_id", col("n_chars"))
        .select(col("label").as("cluster_id"), col("doc_id").as("kept_id"),
          col("n_chars").as("kept_chars"), col("cluster_size"))
        .orderBy("cluster_id")
    }),
    // deterministic source mixing: down-weight three sources, keep the
    // rest at 90% — hash-threshold membership, so the oracle replays
    // the exact kept set (and upsampling later is a superset)
    "c05_weighted_sample" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "source", "text")
      Curation.weightedSample(docs, "doc_id", "source", MixWeights, MixDefault)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(TextAnalysis.wsTokenCount(col("text"))).as("kept_tokens"))
        .orderBy("source")
    }),

    // LSH decontamination: the benchmark slice (doc_id % 100 = 0) is
    // "leaked" into the corpus as one near-duplicate per bench doc
    // (id + 1_000_000, one word appended — the realistic contamination
    // shape); flag corpus docs sharing any MinHash band bucket with a
    // bench doc, counted per source. The planted leaks guarantee a
    // non-trivial flag rate at every SF.
    "c08_decontaminate" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text", "source")
      val bench = docs.where(col("doc_id") % 100 === 0)
      val leaked = bench.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" spark")).as("text"), col("source"))
      val corpus = docs.where(col("doc_id") % 100 =!= 0).unionByName(leaked)
      val flagged = Curation.lshDecontaminateIds(corpus, bench, "doc_id", "text")
        .withColumnRenamed("id", "doc_id").withColumn("hit", lit(1L))
      corpus.join(flagged, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("hit"), lit(0L))).as("n_flagged"))
        .orderBy("source")
    }),

    // PII redaction — the scrub pass every training corpus runs before
    // anything ships: regex-redact emails / phones / IPv4s to typed
    // placeholders and account for what was removed, per source. The
    // synthetic corpus carries no PII, so a deterministic doc_id-keyed
    // plant (the c08 leak pattern) injects all three classes in both
    // engines; counts are computed on the ORIGINAL text, the redacted
    // copy via ordered regexp_replace folds (Curation.PiiRules).
    "c07_pii_redaction" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "source", "text")
      val planted = docs.withColumn("text", concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"), ((col("doc_id") % 900) + 100).cast("string"),
            lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" from 203.0."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") % 200) + 1).cast("string")))
          .otherwise(lit(""))))
      val aggs = (count(lit(1)).as("n_docs") +:
        Curation.PiiRules.map { case (cls, pat, _) =>
          sum(Curation.piiCount(col("text"), pat)).as(s"n_$cls")
        }) :+ sum(length(col("text")) - length(col("red")))
          .cast("long").as("chars_redacted")
      planted
        .select(col("source"), col("text"),
          Curation.redactPii(col("text")).as("red"))
        .groupBy("source")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("source")
    }),

    // fixed-SIZE source capping — the mixture control c05's rate
    // sampling can't express ("no source contributes more than N
    // documents"): rank each source's docs by content-stable hash
    // (ties by id) and keep rank <= N. Hash-rank membership is stable
    // under corpus growth ONLY for the kept prefix property (a new doc
    // can displace the rank-N member — that is what a hard cap means);
    // one window per source, no global sort.
    // snapshot + delta MERGE — the settle step every incremental
    // corpus runs daily: updates, inserts and tombstones are all just
    // delta rows; latest version wins per key. The merged snapshot
    // RETAINS winning tombstones (out-of-order delta safety); the
    // live view filtered here is what the corpus consumer reads. The
    // delta is built deterministically from the table itself (update /
    // delete / insert slices kept EXCLUSIVE so the expected winner is
    // well-defined); output is per-row, so the hash-match checks every
    // survivor, not a summary
    "c11_snapshot_merge" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val snap = docs.withColumn("version", lit(1L)).withColumn("deleted", lit(false))
      val updates = docs.where(col("doc_id") % 10 === 0 && col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          lit(2L).as("version"), lit(false).as("deleted"))
      val tombstones = docs.where(col("doc_id") % 17 === 0)
        .select(col("doc_id"), col("text"),
          lit(2L).as("version"), lit(true).as("deleted"))
      val inserts = docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
          lit(2L).as("version"), lit(false).as("deleted"))
      Curation.snapshotMerge(snap,
          updates.unionByName(tombstones).unionByName(inserts),
          "doc_id", "version", "deleted")
        .where(!col("deleted"))
        .select(col("doc_id"), col("version"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // exact-size stratified sample at 1/10: every source contributes
    // floor(n/10) docs precisely (c05's Bernoulli rate only holds in
    // expectation). n_expected rides along so the exactness claim is
    // itself hash-checked, not just asserted in a spec.
    "c12_stratified_sample" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      Curation.stratifiedSample(docs, "doc_id", "source", 1, 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(TextAnalysis.wsTokenCount(col("text"))).as("kept_tokens"),
          min(col("doc_id")).as("min_kept_id"))
        .join(docs.groupBy("source")
          .agg(expr("count(1) div 10").as("n_expected")), "source")
        .orderBy("source")
    }),

    // Pareto frontier (skyline) over two quality axes: the documents
    // maximal in BOTH length and lexical diversity — no other doc is
    // longer without being less diverse. The operator runs the
    // two-level bucketed prefix-max (no global data-sized window); the
    // oracle replays the naive global-window skyline, which the
    // bucket-invariance argument in Curation.paretoFrontier2d makes
    // exactly equal.
    "c13_pareto_frontier" -> ((s, d) => {
      val pts = Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          countDistinct(col("w")).as("n_distinct"))
        .withColumn("diversity",
          col("n_distinct") / col("n_words").cast("double"))
      Curation.paretoFrontier2d(pts, "doc_id", "n_words", "diversity")
        .orderBy("doc_id")
    }),

    "c10_source_cap" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      // NULLS LAST pinned explicitly: Spark's bare asc is NULLS FIRST,
      // DuckDB's is NULLS LAST — a NULL doc_id would silently claim
      // rank 1 in one engine and rank last in the other
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        .orderBy(Dedup.md5Hash32(col("doc_id").cast("string")).asc_nulls_last,
          col("doc_id").asc_nulls_last)
      docs.withColumn("rk", row_number().over(w))
        .where(col("rk") <= SourceCap)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(TextAnalysis.wsTokenCount(col("text"))).as("kept_tokens"),
          min(col("doc_id")).as("min_kept_id"))
        .orderBy("source")
    }),

    // column-level data profiling — the observability pass a curation
    // pipeline runs before and after every transform (null creep and
    // cardinality collapse are how upstream breakage shows up). Every
    // column is stringified into one generic (column, value) relation
    // so ONE pipeline profiles any schema: explode is per-row (no
    // shuffle), then a single groupBy(column) computes rows / nulls /
    // exact distinct / min / max. Exact distinct is the oracle-able
    // demo; at 100 TB swap in approx_count_distinct (q19) — same shape.
    "c09_profile" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      docs.select(explode(array(ProfileCols.map { c =>
          struct(lit(c).as("column"), col(c).cast("string").as("v"))
        }: _*)).as("p"))
        .select(col("p.column"), col("p.v"))
        .groupBy("column")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .orderBy("column")
    }),

    // token-window chunking: 64-token windows advancing by 48 (16-token
    // overlap) — one row per chunk, deterministic membership
    "c06_chunking" -> ((s, d) => {
      Curation.chunkTokens(
          Tables.load(s, d, "documents").select("doc_id", "text"),
          "text", chunkSize = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk_words")).cast("long").as("n_chunk_tokens"),
          element_at(col("chunk_words"), 1).as("first_word"))
        .orderBy("doc_id", "chunk_idx")
    }),
  )

  /** c09's profiled columns — ONE list shared by the Spark query and
    * the oracle builder (the sides must profile the same schema or the
    * hash compare fails / silently under-profiles).
    */
  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** c10's per-source document cap, shared with the oracle. 20 keeps
    * the cap BINDING at every SF (sources hold 25+ docs from sf0.01
    * up), so the query never degenerates into "keep everything".
    */
  private val SourceCap = 20

  /** c05's mixture, shared with the oracle so the thresholds can never
    * drift between engines.
    */
  private val MixWeights: Map[String, Double] =
    Map("src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.0)
  private val MixDefault = 0.9

  private val tokenExpr =
    "(length(text) - length(replace(text, ' ', '')) + 1)"

  /** The segment-LM-filter chain (Curation.segmentLmFilter restated:
    * c06 slicing at 32/0 → t16 LM scoring over packed seg_ids → c17
    * per-source ntile → ordered rebuild), ending in `k(doc_id,
    * n_kept, cleaned)` + `ns(doc_id, n_segments)`. Shared by the c23
    * and p06 oracles — the d06/d07 one-statement rule.
    */
  private[queries] val segmentFilterCtes: String =
    s"""d0 AS (SELECT doc_id, source, string_split(text, ' ') AS dws
       |  FROM documents WHERE text IS NOT NULL),
       |seg AS (SELECT doc_id, source, CAST(i AS BIGINT) AS chunk_idx,
       |    doc_id * 1000 + i AS seg_id,
       |    list_slice(dws, i * 32 + 1, i * 32 + 32) AS ws
       |  FROM (SELECT doc_id, source, dws,
       |      unnest(generate_series(0,
       |        CAST(greatest(ceil(len(dws) / 32.0) - 1, 0) AS INT))) AS i
       |    FROM d0)),
       |nn AS (SELECT seg_id AS doc_id, ws FROM seg),
       |${TextQueries.lmScoreCtes},
       |mp AS (SELECT s.seg_id, s.doc_id AS real_doc, s.source,
       |    s.chunk_idx, s.ws,
       |    COALESCE(CASE WHEN c.n_bigrams > 0
       |      THEN c.lm_score / CAST(c.n_bigrams AS DOUBLE) END,
       |      CAST(0 AS DOUBLE)) AS mp
       |  FROM seg s LEFT JOIN sc c ON s.seg_id = c.doc_id),
       |t AS (SELECT *, ntile(3) OVER (PARTITION BY source
       |    ORDER BY mp DESC, seg_id) AS terc FROM mp),
       |k AS (SELECT real_doc AS doc_id, count(*) AS n_kept,
       |    array_to_string(flatten(list(ws ORDER BY chunk_idx)), ' ')
       |      AS cleaned
       |  FROM t WHERE terc <= 2 GROUP BY 1),
       |ns AS (SELECT doc_id, count(*) AS n_segments FROM seg GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    // ONE naive global row_number over (hash, id) — the permutation
    // the two-pass global index must (and does) reproduce exactly
    "c21_shuffle_order" ->
      """WITH h AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |  FROM documents)
        |SELECT doc_id, source,
        |  row_number() OVER (ORDER BY hv, doc_id) - 1 AS shuffle_pos
        |FROM h ORDER BY doc_id""".stripMargin,

    // the c06 segmentation + t16 LM CTEs (both shared: the segment
    // slicing restates Curation.chunkTokens at 32/0, the scoring CTE
    // is TextQueries.lmScoreCtes verbatim over seg_ids), then the c17
    // ntile + the d20-style ordered rebuild; the CTE chain itself is
    // shared with the p06 pipeline oracle (one statement)
    "c23_segment_lm_filter" ->
      s"""WITH $segmentFilterCtes
         |SELECT ns.doc_id AS doc_id, n_segments,
         |  COALESCE(n_kept, 0) AS n_kept,
         |  md5(COALESCE(cleaned, '')) AS cleaned_md5
         |FROM ns LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin,

    // the planted-twin corpus (id + 100000, label + 1), then the
    // label-inequality + dup-ceiling scored join and per-anchor
    // ranking — quantExpr/cosine shared with the s-family oracles
    // (one copy), anchors drawn from the REAL corpus only
    "c22_hard_negatives" ->
      s"""WITH all_e AS (
         |  SELECT vec_id, label, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 100000, label + 1, embedding
         |    FROM embeddings),
         |qv AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    ${SimilarityQueries.quantExpr} AS q
         |  FROM all_e),
         |n AS (SELECT vec_id, label, q,
         |    CAST(list_dot_product(q, q) AS BIGINT) AS norm FROM qv),
         |scored AS (
         |  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    c.label AS neighbor_label,
         |    ${SimilarityQueries.cosineSql("qs.q", "c.q", "qs.norm", "c.norm")} AS cosine
         |  FROM n qs JOIN n c
         |    ON c.vec_id <> qs.vec_id AND c.label <> qs.label
         |  WHERE qs.vec_id % 50 = 0 AND qs.vec_id < 100000)
         |SELECT query_id, rank, neighbor_id, neighbor_label, cosine FROM (
         |  SELECT query_id, neighbor_id, neighbor_label, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored WHERE cosine <= 0.95)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // ONE naive global running sum — the semantic spec the operator's
    // two-pass distributed cumsum must (and does) reproduce exactly
    "c18_sequence_packing" ->
      s"""WITH t AS (SELECT doc_id, CAST($tokenExpr AS BIGINT) AS n_tokens
         |  FROM documents WHERE text IS NOT NULL),
         |cum AS (SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  CAST(c - n_tokens AS BIGINT) AS start_off,
         |  CAST(floor((c - n_tokens) / 4096) AS BIGINT) AS pack_first,
         |  CAST(floor((c - 1) / 4096) AS BIGINT) AS pack_last,
         |  CAST(floor((c - 1) / 4096) - floor((c - n_tokens) / 4096)
         |    + 1 AS BIGINT) AS n_packs
         |FROM cum ORDER BY doc_id""".stripMargin,

    // t16's LM chain + e15's histogram/boundary-rank threshold rule on
    // -floor(mp·1e9) + c02's per-stage pack cumsum, chained — every
    // constituent CTE shape reused from its standalone oracle
    "c20_curriculum_pack" ->
      s"""WITH nn AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |${TextQueries.lmScoreCtes},
         |mp AS (SELECT n.doc_id,
         |    COALESCE(CASE WHEN s.n_bigrams > 0
         |      THEN s.lm_score / CAST(s.n_bigrams AS DOUBLE) END,
         |      CAST(0 AS DOUBLE)) AS mp
         |  FROM (SELECT doc_id FROM nn) n
         |  LEFT JOIN sc s ON n.doc_id = s.doc_id),
         |u AS (SELECT doc_id, CAST(floor(mp * 1000000000) AS BIGINT) AS mpu
         |  FROM mp),
         |nr AS (SELECT count(*) AS n FROM u),
         |bounds AS (SELECT t, t * (n // 3) + least(t, n % 3) AS b
         |  FROM nr CROSS JOIN (VALUES (1), (2)) v(t)),
         |h AS (SELECT -mpu AS v, count(*) AS c FROM u GROUP BY 1),
         |cm AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
         |thr AS (SELECT max(CASE WHEN t = 1 THEN x END) AS t1,
         |    max(CASE WHEN t = 2 THEN x END) AS t2
         |  FROM (SELECT t, min(v) AS x FROM cm
         |    JOIN bounds ON cum >= b GROUP BY t)),
         |st AS (SELECT doc_id,
         |    CAST(1 + CASE WHEN -mpu > t1 THEN 1 ELSE 0 END
         |      + CASE WHEN -mpu > t2 THEN 1 ELSE 0 END AS BIGINT) AS stage
         |  FROM u CROSS JOIN thr),
         |tk AS (SELECT nn.doc_id, st.stage,
         |    CAST(len(ws) AS BIGINT) AS n_tokens
         |  FROM nn JOIN st USING (doc_id)),
         |cum2 AS (SELECT doc_id, stage, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY stage ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM tk)
         |SELECT doc_id, stage, n_tokens,
         |  CAST(floor((c - n_tokens) / 4096) AS BIGINT) AS shard
         |FROM cum2 ORDER BY doc_id""".stripMargin,

    // t16's LM chain (TextQueries.lmScoreCtes — identical model math)
    // rebased onto an nn that carries source, then the same
    // (mean_prob desc, id) tercile window per source
    "c17_perplexity_buckets" ->
      s"""WITH nn AS (SELECT doc_id, source, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |${TextQueries.lmScoreCtes},
         |mp AS (SELECT n.doc_id, n.source,
         |    COALESCE(CASE WHEN s.n_bigrams > 0
         |      THEN s.lm_score / CAST(s.n_bigrams AS DOUBLE) END,
         |      CAST(0 AS DOUBLE)) AS mp
         |  FROM (SELECT doc_id, source FROM nn) n
         |  LEFT JOIN sc s ON n.doc_id = s.doc_id),
         |t AS (SELECT source, doc_id, mp,
         |    ntile(3) OVER (PARTITION BY source ORDER BY mp DESC, doc_id) AS terc
         |  FROM mp)
         |SELECT source,
         |  CASE terc WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |    ELSE 'tail' END AS ppl_bucket,
         |  count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |  min(mp) AS min_mp, max(mp) AS max_mp
         |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // replays count → sqrt-share → source-sorted fold normalizer →
    // rate → hash-threshold keep with the identical association
    "c16_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents
        |  WHERE source IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
        |w AS (SELECT source, n,
        |    sqrt(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)) AS wt
        |  FROM c CROSS JOIN tot),
        |z AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(list_sort(list(struct_pack(s := source, w := wt))),
        |      x -> x.w)), (acc, x) -> acc + x) AS zz FROM w),
        |r AS (SELECT source, n,
        |    least(CAST(1 AS DOUBLE),
        |      (CAST((nn * 1) // 2 AS DOUBLE) * (wt / zz)) / CAST(n AS DOUBLE)) AS rate
        |  FROM w CROSS JOIN z CROSS JOIN tot),
        |k AS (SELECT d.source, count(*) AS n_kept
        |  FROM documents d JOIN r USING (source)
        |  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000)
        |    < rate * 10000
        |  GROUP BY 1)
        |SELECT source, n AS n_docs, COALESCE(n_kept, 0) AS n_kept, rate
        |FROM r LEFT JOIN k USING (source) ORDER BY source""".stripMargin,

    "c15_winsorize" ->
      """WITH b AS (SELECT lang,
        |    quantile_cont(n_chars, 0.05) AS lo,
        |    quantile_cont(n_chars, 0.95) AS hi
        |  FROM documents GROUP BY 1)
        |SELECT doc_id, lang, n_chars,
        |  least(greatest(CAST(n_chars AS DOUBLE), lo), hi) AS clipped,
        |  (CAST(n_chars AS DOUBLE) < lo OR CAST(n_chars AS DOUBLE) > hi) AS was_clipped
        |FROM documents JOIN b USING (lang)
        |ORDER BY doc_id""".stripMargin,

    // replays tokenize → md5 bucket → count ratios → position-ordered
    // fold mean → top-100 by (score, id) verbatim
    "c14_dsir_selection" ->
      """WITH nn AS (SELECT doc_id, text, (lang = 'en') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, t, p.pos AS pos,
        |    (('0x' || substr(md5(p.w), 1, 8))::BIGINT) % 1024 AS b
        |  FROM (SELECT doc_id, t,
        |      unnest(list_transform(range(len(string_split(text, ' '))),
        |        i -> struct_pack(pos := i, w := string_split(text, ' ')[i + 1]))) AS p
        |    FROM nn)),
        |raw AS (SELECT b, count(*) AS cr FROM toks GROUP BY 1),
        |tgt AS (SELECT b, count(*) AS ct FROM toks WHERE t GROUP BY 1),
        |model AS (SELECT b, cr, COALESCE(ct, 0) AS ct
        |  FROM raw LEFT JOIN tgt USING (b)),
        |sc AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list_sort(list(struct_pack(p := pos, c := r))),
        |        x -> x.c)), (acc, x) -> acc + x)
        |      / CAST(count(*) AS DOUBLE) AS dsir_score,
        |    count(*) AS n_tokens
        |  FROM (SELECT doc_id, pos,
        |      CAST(ct + 1 AS DOUBLE) / CAST(cr + 1 AS DOUBLE) AS r
        |    FROM toks JOIN model USING (b))
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens, dsir_score FROM sc
        |ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin,

    "c01_hash_split" ->
      s"""WITH b AS (SELECT text,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt
         |  FROM documents)
         |SELECT CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum($tokenExpr) AS BIGINT) AS total_tokens
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "c02_shard_packing" ->
      s"""WITH t AS (SELECT doc_id, source, $tokenExpr AS n_tokens FROM documents),
         |cum AS (SELECT source, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM t)
         |SELECT source, CAST(floor((c - n_tokens) / 4096) AS BIGINT) AS shard,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "c03_contamination" ->
      s"""WITH split_docs AS (SELECT doc_id, source, string_split(text, ' ') AS ws
         |  FROM documents WHERE $tokenExpr >= 2),
         |gsets AS (SELECT doc_id, source,
         |    list_distinct(${graft.functions.TextHashExpressions.bigramFoldSql("ws")}) AS gs
         |  FROM split_docs),
         |bench AS (SELECT list(DISTINCT g) AS bg FROM (
         |  SELECT unnest(gs) AS g FROM gsets WHERE doc_id % 100 = 0)),
         |scored AS (SELECT source,
         |    len(list_intersect(gs, bg)) / CAST(len(gs) AS DOUBLE) AS overlap
         |  FROM gsets CROSS JOIN bench WHERE doc_id % 100 <> 0)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN overlap >= 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_25,
         |  CAST(sum(CASE WHEN overlap >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_50,
         |  CAST(sum(CASE WHEN overlap >= 0.75 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_75
         |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,

    // the same recursive-walk labels as c04's oracle, then c01's split
    // rule keyed on COALESCE(label, doc_id)
    "c19_leakage_safe_split" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
         |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |walk(src, dst) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT w.src, s.dst FROM walk w JOIN sym s ON w.dst = s.src),
         |labels AS (SELECT src AS id, least(src, min(dst)) AS label
         |  FROM walk GROUP BY src),
         |keyed AS (SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS split_key
         |  FROM all_docs d LEFT JOIN labels l ON l.id = d.doc_id),
         |b AS (SELECT doc_id, split_key,
         |    ('0x' || substr(md5(CAST(split_key AS VARCHAR)), 1, 8))::BIGINT % 100
         |      AS bkt
         |  FROM keyed)
         |SELECT doc_id, split_key,
         |  CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    "c04_cluster_keep_best" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
         |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |walk(src, dst) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT w.src, s.dst FROM walk w JOIN sym s ON w.dst = s.src),
         |labels AS (SELECT src AS id, least(src, min(dst)) AS label
         |  FROM walk GROUP BY src),
         |members AS (SELECT l.label, d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
         |  FROM labels l JOIN all_docs d ON l.id = d.doc_id),
         |ranked AS (SELECT label, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY label ORDER BY n_chars DESC, doc_id ASC) AS rn,
         |    count(*) OVER (PARTITION BY label) AS cluster_size
         |  FROM members)
         |SELECT label AS cluster_id, doc_id AS kept_id, n_chars AS kept_chars,
         |  cluster_size
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    // chunk windows replayed with list_slice; same ceil/stride math as
    // Curation.chunkTokens (64/16 -> stride 48)
    "c06_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, ws,
        |    unnest(generate_series(0,
        |      CAST(greatest(ceil((len(ws) - 16) / 48.0) - 1, 0) AS INT))) AS i
        |  FROM t)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(len(list_slice(ws, i * 48 + 1, i * 48 + 64)) AS BIGINT) AS n_chunk_tokens,
        |  ws[i * 48 + 1] AS first_word
        |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin,

    // same plant, same patterns (single-sourced from Curation.PiiRules),
    // same rule order; DuckDB needs the explicit 'g' flag (its
    // regexp_replace is first-match by default, Spark's is global)
    "c07_pii_redaction" -> {
      val Seq(email, phone, ip) = Curation.PiiRules.map(_._2)
      val red = Curation.PiiRules.foldLeft("text") { case (acc, (_, pat, repl)) =>
        s"regexp_replace($acc, '$pat', '$repl', 'g')"
      }
      s"""WITH planted AS (SELECT source, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' call 555-' ||
         |      CAST((doc_id % 900) + 100 AS VARCHAR) || '-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 0 THEN ' from 203.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
         |      CAST((doc_id % 200) + 1 AS VARCHAR) ELSE '' END AS text
         |  FROM documents),
         |red AS (SELECT source, text, $red AS r FROM planted)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(len(regexp_extract_all(text, '$email'))) AS BIGINT) AS n_email,
         |  CAST(sum(len(regexp_extract_all(text, '$phone'))) AS BIGINT) AS n_phone,
         |  CAST(sum(len(regexp_extract_all(text, '$ip'))) AS BIGINT) AS n_ip,
         |  CAST(sum(length(text) - length(r)) AS BIGINT) AS chars_redacted
         |FROM red GROUP BY source ORDER BY source""".stripMargin
    },

    "c09_profile" -> {
      ProfileCols.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
           |  min(CAST($c AS VARCHAR)) AS min_v,
           |  max(CAST($c AS VARCHAR)) AS max_v
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    // the two corpora are banded side by side with DedupQueries'
    // prefix-parameterized CTE chain (identical shingle/minhash/band
    // literals as d02/d06/d07), then flagged = corpus bands ∩ bench
    // band keys
    "c08_decontaminate" ->
      s"""WITH bench_docs AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 100 = 0),
         |corpus_docs AS (
         |  SELECT doc_id, text, source FROM documents WHERE doc_id % 100 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' spark', source FROM documents
         |  WHERE doc_id % 100 = 0),
         |${DedupQueries.bandsCtesFor("bench_docs", "b")},
         |${DedupQueries.bandsCtesFor("corpus_docs", "c")},
         |flagged AS (SELECT DISTINCT c.doc_id FROM cbands c
         |  JOIN (SELECT DISTINCT band_idx, band_key FROM bbands) b
         |    ON c.band_idx = b.band_idx AND c.band_key = b.band_key)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         |FROM corpus_docs LEFT JOIN flagged f USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // stratified replay: the same per-stratum hash-rank, the same
    // integer floor(n/10) quota
    "c12_stratified_sample" ->
      s"""WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
         |ranked AS (SELECT d.source, d.doc_id, d.text, n.n,
         |    row_number() OVER (PARTITION BY d.source
         |      ORDER BY ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT, d.doc_id) AS rk
         |  FROM documents d JOIN n USING (source))
         |SELECT source, count(*) AS n_kept,
         |  CAST(sum($tokenExpr) AS BIGINT) AS kept_tokens,
         |  min(doc_id) AS min_kept_id,
         |  CAST(min(n) // 10 AS BIGINT) AS n_expected
         |FROM ranked WHERE rk <= n // 10
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // naive skyline replay: per-x winners, then one global running max
    // over x descending; keep iff strictly above it
    "c13_pareto_frontier" ->
      """WITH stats AS (
        |  SELECT doc_id, count(*) AS n_words, count(DISTINCT w) AS n_distinct
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1),
        |pts AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |    n_distinct / CAST(n_words AS DOUBLE) AS diversity FROM stats),
        |win AS (SELECT doc_id, n_words, diversity FROM (
        |    SELECT *, row_number() OVER (PARTITION BY n_words
        |      ORDER BY diversity DESC, doc_id) AS rn FROM pts)
        |  WHERE rn = 1),
        |rm AS (SELECT *, max(diversity) OVER (ORDER BY n_words DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
        |  FROM win)
        |SELECT doc_id, n_words, diversity FROM rm
        |WHERE runmax IS NULL OR diversity > runmax
        |ORDER BY doc_id""".stripMargin,

    "c10_source_cap" ->
      s"""WITH ranked AS (SELECT source, doc_id, text,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id) AS rk
         |  FROM documents)
         |SELECT source, count(*) AS n_kept,
         |  CAST(sum($tokenExpr) AS BIGINT) AS kept_tokens,
         |  min(doc_id) AS min_kept_id
         |FROM ranked WHERE rk <= $SourceCap
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // merge replay: the same exclusive delta slices, the same
    // latest-wins-prefer-delta window, the same tombstone filter
    "c11_snapshot_merge" ->
      """WITH snap AS (SELECT doc_id, text, 1 AS version, false AS deleted, 0 AS src
        |  FROM documents),
        |delta AS (
        |  SELECT doc_id, text || ' v2' AS text, 2 AS version, false AS deleted, 1 AS src
        |    FROM documents WHERE doc_id % 10 = 0 AND doc_id % 17 <> 0
        |  UNION ALL SELECT doc_id, text, 2, true, 1
        |    FROM documents WHERE doc_id % 17 = 0
        |  UNION ALL SELECT doc_id + 1000000, text, 2, false, 1
        |    FROM documents WHERE doc_id % 13 = 0),
        |all_rows AS (SELECT * FROM snap UNION ALL SELECT * FROM delta),
        |rk AS (SELECT doc_id, text, version, deleted,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC, src DESC) AS rn
        |  FROM all_rows)
        |SELECT doc_id, CAST(version AS BIGINT) AS version, length(text) AS n_chars
        |FROM rk WHERE rn = 1 AND NOT deleted ORDER BY doc_id""".stripMargin,

    "c05_weighted_sample" -> {
      val rateCases = MixWeights.toSeq.sortBy(_._1).reverse.foldLeft(MixDefault.toString) {
        case (acc, (src, w)) => s"CASE WHEN source = '$src' THEN $w ELSE $acc END"
      }
      s"""WITH b AS (SELECT source, text,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS bkt,
         |    $rateCases AS rate
         |  FROM documents)
         |SELECT source, count(*) AS n_kept,
         |  CAST(sum($tokenExpr) AS BIGINT) AS kept_tokens
         |FROM b WHERE bkt < rate * 10000
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
  )
}
