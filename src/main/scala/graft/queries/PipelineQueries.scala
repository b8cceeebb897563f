package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.ops.Pipeline
import graft.sources.Tables
import graft.streaming.PipelineStreams

/** The composed-pipeline pack: [[graft.ops.Pipeline]] run end to end as
  * ONE oracle-checked dataflow (the reference's own shape — one flow
  * per file, `main_ingest.py:331-690` — not thirteen isolated stages).
  *
  * The corpus plants both duplicate classes so every dedup stage is
  * non-trivial at every SF: ids +1M are EXACT copies (stage 1 must kill
  * them), ids +2M are near-dup mutations, one word appended (stage 2
  * must cluster them with their base and keep one member). The
  * benchmark slice is doc_id % 100 == 0 of the base table, so stage 3
  * drops the surviving member of every benchmark cluster (overlap 1.0
  * or ~1.0) — eval data never reaches the shards.
  *
  * Output is the SHARD MANIFEST — per (split, source, shard): doc
  * count, token count, min id. Any upstream wrongness (a copy
  * surviving stage 1, a cluster keeping two members, a missed
  * contamination, a quality verdict flipped, a split or shard off by
  * one) changes manifest membership and fails the hash compare.
  */
object PipelineQueries {

  /** Contamination threshold and shard token budget — ONE definition
    * for the Spark flow and the oracle SQL.
    */
  private val ContaminationTau = 0.5
  private val ShardBudget = 4096L

  /** The planted-duplicate id shifts must stay DISJOINT from real doc
    * ids — a collision would duplicate a doc_id with different text
    * (violating Pipeline.curate's unique-id contract) in BOTH engines
    * at once, so the compare would stay green while the plants verify
    * nothing. The d13 rule (`DedupQueries`): fail loudly instead.
    */
  private val plantRoomOk =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def requirePlantRoom(docs: org.apache.spark.sql.DataFrame,
      sfDir: String): Unit =
    // one max(doc_id) scan per sf directory per JVM — not per
    // invocation: the bench times each query 3x and this guard is a
    // Spark-only action the oracle side never pays
    if (!plantRoomOk.contains(sfDir)) {
      val row = docs.agg(max("doc_id")).head()
      // an empty (or all-null-text) corpus has no ids to collide with
      val maxId = if (row.isNullAt(0)) -1L else row.getLong(0)
      require(maxId < 1000000,
        s"p01/p02 plant ids at +1000000/+2000000 but max(doc_id) = $maxId — " +
          "raise the shifts (Spark AND oracle) for this scale factor")
      plantRoomOk.add(sfDir); ()
    }

  /** p03 knobs — one definition for the Spark flow and the oracle. */
  private val P03SelectK = 150
  private val P03GateK = 120
  private val P03Budget = 2048L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the TARGETED-selection pipeline (round 5) — the DSIR paper's
    // actual workflow composed as one dataflow from this round's
    // operators: exact dedup → content-based importance selection
    // toward the English slice (c14) → LM fluency gate over the
    // selection (t16; top P03GateK by (mean_prob, id) — the rank
    // window is over the BOUNDED P03SelectK-row selection, the s12/c13
    // bounded-axis rule) → hash split → token-budget shard packing.
    // Output = the shard manifest; the oracle replays every stage as
    // one CTE chain reusing c14's and t16's standalone SQL.
    "p03_targeted_selection" -> ((s, d) => {
      import graft.ops.{Dedup, LangModel}
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "text", "lang", "source")
        .where(col("text").isNotNull)
      val canon = Dedup.exactGroups(docs, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
      val s1 = docs.join(canon, Seq("doc_id")).localCheckpoint(true)
      val sel = graft.ops.Curation
        .dsirSelect(s1, "doc_id", "text", col("lang") === "en", k = P03SelectK)
        .select("doc_id")
      val lm = LangModel.selfScore(s1.select("doc_id", "text"), "doc_id", "text")
        .select(col("doc_id"), coalesce(col("mean_prob"), lit(0.0)).as("__mp"))
      val wGate = org.apache.spark.sql.expressions.Window
        .orderBy(col("__mp").desc, col("doc_id"))
      val gated = sel.join(lm, Seq("doc_id"))
        .withColumn("__rn", row_number().over(wGate))
        .where(col("__rn") <= P03GateK).select("doc_id")
      val s4 = s1.join(gated, Seq("doc_id"))
        .withColumn("split", graft.ops.Curation.splitAssign(col("doc_id")))
        .withColumn("__grp", concat_ws("|", col("split"), col("source")))
      graft.ops.Curation.packShards(s4, "__grp", "doc_id",
          graft.ops.TextAnalysis.wsTokenCount(col("text")), P03Budget)
        .groupBy("split", "source", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("shard_tokens"),
          min("doc_id").as("min_doc_id"))
        .orderBy("split", "source", "shard")
    }),

    // the CONTAINMENT-curated pipeline (the p03 composition pattern
    // for the r7 containment family): exact dedup → superset-keep
    // removal (d21 detection + d22 rewrite — excerpts/quotes drop
    // into their sources, a class p01's Jaccard stage can't see) →
    // quality gate → hash split → shard pack. Plants: +1M exact
    // copies (stage 1 kills), +2M half-excerpts (the containment
    // stage drops each into its source; sub-16-char docs yield an
    // excerpt equal to the whole text, killed at stage 1 — same rule
    // both engines). Output = the shard manifest; any stage wrongness
    // changes membership and breaks the hash.
    "p05_containment_pipeline" -> ((s, d) => {
      import graft.ops.{Curation, Dedup, TextAnalysis}
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "text", "source").where(col("text").isNotNull)
      requirePlantRoom(docs, d)
      val corpus = docs
        .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"),
          col("text"), col("source")))
        .unionByName(docs.select((col("doc_id") + 2000000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) div 2, 8))")
            .as("text"), col("source")))
      val canon = Dedup.exactGroups(corpus, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
      val s1 = corpus.join(canon, Seq("doc_id")).localCheckpoint(true)
      val pairs = Dedup.containmentPairs(s1, "doc_id", "text",
        tauNum = 9, tauDen = 10,
        tokens = t => array_distinct(Dedup.shingleHashes(t)))
      val drops = Dedup.supersetDrops(pairs)
        .select(col("id").as("doc_id"))
      val s2 = s1.join(drops, Seq("doc_id"), "left_anti")
      val passAll = TextAnalysis.qualityRules
        .map { case (_, rule) => !rule(col("text")) }.reduce(_ && _)
      val s4 = s2.where(passAll)
        .withColumn("split", Curation.splitAssign(col("doc_id")))
        .withColumn("__grp", concat_ws("|", col("split"), col("source")))
      Curation.packShards(s4, "__grp", "doc_id",
          TextAnalysis.wsTokenCount(col("text")), ShardBudget)
        .groupBy("split", "source", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("shard_tokens"),
          min("doc_id").as("min_doc_id"))
        .orderBy("split", "source", "shard")
    }),

    // the round-9 composition: segment-level LM cleaning (c23's
    // operator as stage 1 — docs survive with their tail third cut),
    // exact dedup ON THE CLEANED TEXT (cleaning collapses docs that
    // differed only in their dropped segments — dedup must run after
    // the rewrite, the ordering this pipeline exists to state), then
    // per-source shard packing of the survivors. Fully-cut docs
    // (cleaned = '') drop before dedup so the empty string never
    // becomes a canonical text.
    // the approximate→exact substring-dedup FUNNEL (the practiced
    // 100 TB shape): d29's winnow index names candidate sources
    // cheaply — a source is flagged iff some fingerprint hash is
    // selected by >= 2 of ITS OWN documents and the grams at those
    // positions REALLY match (Dedup.funnelCandidateSources — 32-bit
    // hashes birthday-collide at scale, and an unverified flag
    // forfeits the skip) — and only flagged sources pay d32's exact
    // generalized-suffix-array pass. The
    // skip is SOUND, not heuristic: winnowing guarantees any shared
    // substring of >= k+w-1 (= 31 at the funnel's k=24/w=8) chars
    // selects the same hash in both copies, so an unflagged source
    // has cross_len < 31 by construction; flagged sources report the
    // exact length and witness. The funnel's k is LONGER than d29's
    // (24 vs 5): a shared 5-gram is any common word, a shared
    // 12-gram is any repeated long word (measured: k=12 flagged
    // every source of a salted no-boilerplate corpus), and a
    // candidate rule that flags every source skips nothing. Both
    // stages reuse their standalone oracles verbatim
    // (crossDocCtes / the d29 chain) so funnel and operators cannot
    // drift.
    "p07_substring_funnel" -> ((s, d) => {
      import graft.ops.{Dedup, SuffixArray}
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "text", "source").where(col("text").isNotNull)
        .localCheckpoint(true) // feeds fingerprints, the exact pass, and the source list
      val cand = Dedup.funnelCandidateSources(docs)
      val flagged = docs.join(broadcast(cand), Seq("source"), "left_semi")
      val exact = SuffixArray.crossDocRepeats(flagged,
        "doc_id", "text", "source")
      docs.select("source").distinct()
        .join(broadcast(cand.withColumn("__c", lit(true))),
          Seq("source"), "left")
        .join(exact, Seq("source"), "left")
        .select(col("source"),
          coalesce(col("__c"), lit(false)).as("candidate"),
          col("cross_len"), col("witness"))
        .orderBy("source")
    }),

    "p06_segment_curated" -> ((s, d) => {
      import graft.ops.{Curation, Dedup, TextAnalysis}
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "text", "source").where(col("text").isNotNull)
      val reb = Curation.segmentLmFilter(docs)
        .select(col("doc_id"), col("source"), col("cleaned").as("text"))
        .where(length(col("text")) > 0)
        .localCheckpoint(true) // feeds the canon groupBy AND the keep join
      val canon = Dedup.exactGroups(reb, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
      val s2 = reb.join(canon, Seq("doc_id"))
      Curation.packShards(s2, "source", "doc_id",
          TextAnalysis.wsTokenCount(col("text")), ShardBudget)
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("shard_tokens"),
          min("doc_id").as("min_doc_id"))
        .orderBy("source", "shard")
    }),

    "p01_curation_pipeline" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text", "source")
      requirePlantRoom(docs, d)
      val corpus = docs
        .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"),
          col("text"), col("source")))
        .unionByName(docs.select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" spark")).as("text"), col("source")))
      val bench = docs.where(col("doc_id") % 100 === 0)
      Pipeline.curate(corpus, bench, "doc_id", "text", "source",
          ContaminationTau, ShardBudget)
        .groupBy("split", "source", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("shard_tokens"),
          min("doc_id").as("min_doc_id"))
        .orderBy("split", "source", "shard")
    }),

    // per-document DISPOSITION audit over p01's exact corpus — the
    // "why did my document disappear" debugging face
    // (Pipeline.dropAudit): every input doc attributed to the stage
    // that dropped it, or 'kept'. Hash-matching the full per-doc
    // relation pins every stage's membership, not just the survivor
    // manifest p01 checks.
    "p04_drop_audit" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text", "source")
      requirePlantRoom(docs, d)
      val corpus = docs
        .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"),
          col("text"), col("source")))
        .unionByName(docs.select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" spark")).as("text"), col("source")))
      val bench = docs.where(col("doc_id") % 100 === 0)
      Pipeline.dropAudit(corpus, bench, "doc_id", "text", ContaminationTau)
        .orderBy("doc_id")
    }),

    // the INCREMENTAL face of the pipeline (PipelineStreams.settleBatch,
    // the per-micro-batch body of incrementalCurate) run as two "days"
    // in one batch job: day2 settles against day1's persisted
    // fingerprints. Plants make every path non-vacuous: ids +1M are
    // exact copies of day-1 docs (only the HISTORY anti-join can kill
    // them), ids +2M are in-batch copies of day-2 docs (the in-batch
    // canonical groupBy must collapse them); the benchmark slice
    // decontaminates both days.
    "p02_incremental_settle" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "text", "source").where(col("text").isNotNull)
      requirePlantRoom(docs, d)
      val bench = docs.where(col("doc_id") % 100 === 0)
      val day1 = docs.where(col("doc_id") % 2 === 1)
      val day2 = docs.where(col("doc_id") % 2 === 0)
        .unionByName(day1.where(col("doc_id") % 10 === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source")))
        .unionByName(docs.where(col("doc_id") % 2 === 0 && col("doc_id") % 10 === 2)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"), col("source")))
      val noHistory = s.createDataFrame(s.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("fingerprint", StringType))))
      val (cur1, fp1) = PipelineStreams.settleBatch(day1, bench, noHistory,
        "doc_id", "text", ContaminationTau)
      val (cur2, _) = PipelineStreams.settleBatch(day2, bench, fp1,
        "doc_id", "text", ContaminationTau)
      cur1.withColumn("day", lit(1L))
        .unionByName(cur2.withColumn("day", lit(2L)))
        .select("day", "doc_id", "source")
        .orderBy("day", "doc_id")
    }),
  )

  private val tokenExpr =
    "(length(text) - length(replace(text, ' ', '')) + 1)"

  private val passAllSql = TextQueries.qualityFailSqls
    .map { case (_, c) => s"NOT ($c)" }.mkString("\n    AND ")

  /** The settle tail — decontaminate against the shared `bgs` gram-set
    * CTE, then quality-gate — over one settled-day relation `in`
    * (doc_id, text, source), CTE names suffixed `sfx`. The SQL bodies
    * are the p01 stages verbatim, so p01 and p02 cannot drift.
    */
  private def settleTailCtes(in: String, sfx: String): String =
    s"""gs$sfx AS (SELECT doc_id,
       |    list_distinct(${graft.functions.TextHashExpressions.bigramFoldSql("ws")}) AS gs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $in
       |    WHERE $tokenExpr >= 2)),
       |drop$sfx AS (SELECT doc_id FROM gs$sfx CROSS JOIN bgs
       |  WHERE len(list_intersect(gs, bg)) / CAST(len(gs) AS DOUBLE) >= $ContaminationTau),
       |s3$sfx AS (SELECT doc_id, text, source FROM $in
       |  WHERE doc_id NOT IN (SELECT doc_id FROM drop$sfx)),
       |s4$sfx AS (SELECT doc_id, text, source FROM (
       |    SELECT doc_id, text, source,
       |      CAST(length(text) AS BIGINT) AS n_chars,
       |      CAST($tokenExpr AS BIGINT) AS n_words,
       |      ${TextQueries.stopHitsSql} AS stop_hits
       |    FROM (SELECT doc_id, text, source, ' ' || text || ' ' AS p FROM s3$sfx))
       |  WHERE $passAllSql)""".stripMargin

  /** The p01 stage chain (planted corpus → exact dedup s1 → near-dup
    * keep-best s2 → decontamination dropset/s3 → quality s4), each
    * stage the exact SQL its standalone oracle uses: d01's fingerprint
    * groupBy, d06's bands/pairs/walk (`DedupQueries.bandsCtesFor` —
    * identical shingle/minhash/band literals), c04's keep-best window,
    * c03's bigram-overlap scoring, t09's rule conditions
    * (`TextQueries.qualityFailSqls`). ONE definition shared by the p01
    * manifest oracle and p04's disposition audit, so the two cannot
    * drift.
    */
  private def p01StageCtes: String =
    s"""all_docs AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL SELECT doc_id + 1000000, text, source FROM documents
       |  UNION ALL SELECT doc_id + 2000000, text || ' spark', source FROM documents),
       |ex AS (SELECT min(doc_id) AS doc_id FROM all_docs
       |  GROUP BY md5(lower(trim(text)))),
       |s1 AS (SELECT d.doc_id, d.text, d.source FROM all_docs d JOIN ex USING (doc_id)),
       |${DedupQueries.bandsCtesFor("s1")},
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |walk(src, dst) AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT w.src, s.dst FROM walk w JOIN sym s ON w.dst = s.src),
       |labels AS (SELECT src AS id, least(src, min(dst)) AS label
       |  FROM walk GROUP BY src),
       |members AS (SELECT l.label, d.doc_id, d.text, d.source,
       |    CAST(length(d.text) AS BIGINT) AS n_chars
       |  FROM labels l JOIN s1 d ON l.id = d.doc_id),
       |winners AS (SELECT doc_id, text, source FROM (
       |    SELECT doc_id, text, source,
       |      row_number() OVER (PARTITION BY label ORDER BY n_chars DESC, doc_id ASC) AS rn
       |    FROM members) WHERE rn = 1),
       |s2 AS (SELECT doc_id, text, source FROM winners
       |  UNION ALL
       |  SELECT doc_id, text, source FROM s1
       |  WHERE doc_id NOT IN (SELECT id FROM labels)),
       |gs2 AS (SELECT doc_id,
       |    list_distinct(${graft.functions.TextHashExpressions.bigramFoldSql("ws")}) AS gs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM s2
       |    WHERE $tokenExpr >= 2)),
       |bgs AS (SELECT list(DISTINCT g) AS bg FROM (
       |  SELECT unnest(list_distinct(${graft.functions.TextHashExpressions.bigramFoldSql("ws")})) AS g
       |  FROM (SELECT string_split(text, ' ') AS ws FROM documents
       |    WHERE doc_id % 100 = 0 AND $tokenExpr >= 2))),
       |dropset AS (SELECT doc_id FROM gs2 CROSS JOIN bgs
       |  WHERE len(list_intersect(gs, bg)) / CAST(len(gs) AS DOUBLE) >= $ContaminationTau),
       |s3 AS (SELECT doc_id, text, source FROM s2
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dropset)),
       |s4 AS (SELECT doc_id, text, source FROM (
       |    SELECT doc_id, text, source,
       |      CAST(length(text) AS BIGINT) AS n_chars,
       |      CAST($tokenExpr AS BIGINT) AS n_words,
       |      ${TextQueries.stopHitsSql} AS stop_hits
       |    FROM (SELECT doc_id, text, source, ' ' || text || ' ' AS p FROM s3))
       |  WHERE $passAllSql)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the whole composition as one CTE chain, each stage reusing the
    // exact SQL its standalone oracle uses: d01's fingerprint groupBy,
    // d06's bands/pairs/walk (DedupQueries.bandsCtesFor — identical
    // shingle/minhash/band literals), c04's keep-best window, c03's
    // bigram-overlap scoring, t09's rule conditions
    // (TextQueries.qualityFailSqls), c01's split CASE, c02's
    // running-sum packing
    // every stage restated verbatim from its standalone oracle (c14's
    // tokenize/bucket/ratio/fold, t16's smoothed bigram fold), rebased
    // from `documents` onto the deduped s1 relation
    "p03_targeted_selection" ->
      s"""WITH nn AS (SELECT doc_id, text, lang, source FROM documents
         |  WHERE text IS NOT NULL),
         |ex AS (SELECT min(doc_id) AS doc_id FROM nn
         |  GROUP BY md5(lower(trim(text)))),
         |s1 AS (SELECT d.doc_id, d.text, d.lang, d.source
         |  FROM nn d JOIN ex USING (doc_id)),
         |dtoks AS (SELECT doc_id, t, p.pos AS pos,
         |    (('0x' || substr(md5(p.w), 1, 8))::BIGINT) % 1024 AS b
         |  FROM (SELECT doc_id, (lang = 'en') AS t,
         |      unnest(list_transform(range(len(string_split(text, ' '))),
         |        i -> struct_pack(pos := i, w := string_split(text, ' ')[i + 1]))) AS p
         |    FROM s1)),
         |draw AS (SELECT b, count(*) AS cr FROM dtoks GROUP BY 1),
         |dtgt AS (SELECT b, count(*) AS ct FROM dtoks WHERE t GROUP BY 1),
         |dmodel AS (SELECT b, cr, COALESCE(ct, 0) AS ct
         |  FROM draw LEFT JOIN dtgt USING (b)),
         |dsc AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(list_sort(list(struct_pack(p := pos, c := r))),
         |        x -> x.c)), (acc, x) -> acc + x)
         |      / CAST(count(*) AS DOUBLE) AS dsir_score
         |  FROM (SELECT doc_id, pos,
         |      CAST(ct + 1 AS DOUBLE) / CAST(cr + 1 AS DOUBLE) AS r
         |    FROM dtoks JOIN dmodel USING (b))
         |  GROUP BY doc_id),
         |sel AS (SELECT doc_id FROM dsc
         |  ORDER BY dsir_score DESC, doc_id LIMIT $P03SelectK),
         |lws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM s1),
         |luni AS (SELECT w1, count(*) AS cu
         |  FROM (SELECT unnest(ws) AS w1 FROM lws) GROUP BY 1),
         |lv AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM luni),
         |lpp AS (SELECT doc_id, p.pos AS pos, p.w1 AS w1, p.w2 AS w2 FROM (
         |  SELECT doc_id, unnest(list_transform(range(len(ws) - 1),
         |      i -> struct_pack(pos := i, w1 := ws[i + 1], w2 := ws[i + 2]))) AS p
         |  FROM lws)),
         |lbi AS (SELECT w1, w2, count(*) AS cb FROM lpp GROUP BY 1, 2),
         |lprobs AS (SELECT doc_id, pos,
         |    CAST(COALESCE(cb, 0) + 1 AS DOUBLE)
         |      / CAST(COALESCE(cu, 0) + vocab AS DOUBLE) AS pr
         |  FROM lpp LEFT JOIN lbi USING (w1, w2) LEFT JOIN luni USING (w1)
         |    CROSS JOIN lv),
         |lsc AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(list_sort(list(struct_pack(p := pos, c := pr))),
         |        x -> x.c)), (acc, x) -> acc + x)
         |      / CAST(count(*) AS DOUBLE) AS mean_prob
         |  FROM lprobs GROUP BY doc_id),
         |gate AS (SELECT doc_id FROM (
         |  SELECT s.doc_id,
         |    row_number() OVER (ORDER BY COALESCE(l.mean_prob, CAST(0 AS DOUBLE)) DESC,
         |      s.doc_id) AS rn
         |  FROM sel s LEFT JOIN lsc l USING (doc_id)) WHERE rn <= $P03GateK),
         |sp AS (SELECT doc_id, source,
         |    CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val'
         |      ELSE 'test' END AS split,
         |    n_tokens
         |  FROM (SELECT d.doc_id, d.source,
         |      ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt,
         |      CAST((length(d.text) - length(replace(d.text, ' ', '')) + 1) AS BIGINT) AS n_tokens
         |    FROM s1 d JOIN gate USING (doc_id))),
         |cum AS (SELECT split, source, doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM sp)
         |SELECT split, source,
         |  CAST(floor((c - n_tokens) / $P03Budget) AS BIGINT) AS shard,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  min(doc_id) AS min_doc_id
         |FROM cum GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // every stage verbatim from its standalone oracle: d01's
    // fingerprint groupBy, d21's verify chain + d22's keep rule
    // (DedupQueries.containmentVerCtes — shared, cannot drift), t09's
    // quality conditions, c01's split CASE, c02's running-sum packing
    "p05_containment_pipeline" ->
      s"""WITH nn AS (SELECT doc_id, text, source FROM documents
         |  WHERE text IS NOT NULL),
         |all_docs AS (
         |  SELECT doc_id, text, source FROM nn
         |  UNION ALL SELECT doc_id + 1000000, text, source FROM nn
         |  UNION ALL SELECT doc_id + 2000000,
         |    substr(text, 1, greatest(length(text) // 2, 8)), source FROM nn),
         |ex AS (SELECT min(doc_id) AS doc_id FROM all_docs
         |  GROUP BY md5(lower(trim(text)))),
         |s1 AS (SELECT d.doc_id, d.text, d.source
         |  FROM all_docs d JOIN ex USING (doc_id)),
         |${DedupQueries.containmentVerCtes("s1")},
         |cpairs AS (SELECT id_a, id_b FROM ver
         |  WHERE inter * 10 >= n_a * 9),
         |dr AS (SELECT p.id_a AS doc_id FROM cpairs p
         |  LEFT JOIN cpairs q ON q.id_a = p.id_b AND q.id_b = p.id_a
         |  WHERE q.id_a IS NULL OR p.id_a > p.id_b
         |  GROUP BY 1),
         |s2 AS (SELECT doc_id, text, source FROM s1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dr)),
         |s4 AS (SELECT doc_id, text, source FROM (
         |    SELECT doc_id, text, source,
         |      CAST(length(text) AS BIGINT) AS n_chars,
         |      CAST($tokenExpr AS BIGINT) AS n_words,
         |      ${TextQueries.stopHitsSql} AS stop_hits
         |    FROM (SELECT doc_id, text, source, ' ' || text || ' ' AS p FROM s2))
         |  WHERE $passAllSql),
         |sp AS (SELECT doc_id, source,
         |    CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val'
         |      ELSE 'test' END AS split,
         |    n_tokens
         |  FROM (SELECT doc_id, source,
         |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt,
         |      CAST($tokenExpr AS BIGINT) AS n_tokens
         |    FROM s4)),
         |cum AS (SELECT split, source, doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM sp)
         |SELECT split, source,
         |  CAST(floor((c - n_tokens) / $ShardBudget) AS BIGINT) AS shard,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  min(doc_id) AS min_doc_id
         |FROM cum GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // the d29 winnow chain grouped per (source, hash) for the
    // candidate set, then the d32 chain (crossDocCtes verbatim)
    // restricted to flagged sources
    "p07_substring_funnel" ->
      s"""WITH nn AS (SELECT doc_id, source, text FROM documents
         |  WHERE text IS NOT NULL),
         |g AS (SELECT doc_id, source, text,
         |    ${graft.functions.TextHashExpressions.winnowGramsSql(graft.ops.Dedup.FunnelK)} AS gs
         |  FROM nn),
         |sel AS (SELECT doc_id, source, text, gs,
         |    ${graft.functions.TextHashExpressions.winnowSelectSql(graft.ops.Dedup.FunnelW)} AS ps
         |  FROM g),
         |fp AS (SELECT doc_id, source,
         |    substr(text, u.p::INT, ${graft.ops.Dedup.FunnelK}) AS gram,
         |    gs[u.p::INT] AS h
         |  FROM sel, unnest(ps) AS u(p)),
         |cand AS (SELECT DISTINCT source FROM (
         |  SELECT source FROM fp GROUP BY source, h, gram
         |  HAVING count(DISTINCT doc_id) >= 2)),
         |flagged AS (SELECT source, doc_id, text FROM nn
         |  WHERE source IN (SELECT source FROM cand)),
         |${DedupQueries.crossDocCtes("flagged")}
         |SELECT s.source AS source, (c.source IS NOT NULL) AS candidate,
         |  e.cross_len AS cross_len, e.witness AS witness
         |FROM (SELECT DISTINCT source FROM nn) s
         |LEFT JOIN cand c USING (source)
         |LEFT JOIN cdex e USING (source)
         |ORDER BY source""".stripMargin,

    // the shared segment-filter chain (CurationQueries.segmentFilterCtes
    // — c23's statement verbatim), then d01's fingerprint dedup over
    // the REBUILT text and the p01 packing cumsum per source
    "p06_segment_curated" ->
      s"""WITH ${CurationQueries.segmentFilterCtes},
         |reb AS (SELECT ns.doc_id AS doc_id, d.source, k.cleaned AS text
         |  FROM ns JOIN (SELECT DISTINCT doc_id, source FROM d0) d USING (doc_id)
         |  JOIN k USING (doc_id)
         |  WHERE length(k.cleaned) > 0),
         |canon AS (SELECT min(doc_id) AS doc_id FROM reb
         |  GROUP BY md5(lower(trim(text)))),
         |s2 AS (SELECT r.doc_id, r.source, r.text
         |  FROM reb r JOIN canon USING (doc_id)),
         |tok AS (SELECT doc_id, source,
         |    CAST($tokenExpr AS BIGINT) AS n_tokens FROM s2),
         |cum AS (SELECT source, doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM tok)
         |SELECT source,
         |  CAST(floor((c - n_tokens) / $ShardBudget) AS BIGINT) AS shard,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  min(doc_id) AS min_doc_id
         |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p01_curation_pipeline" ->
      s"""WITH RECURSIVE
         |$p01StageCtes,
         |sp AS (SELECT doc_id, source,
         |    CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val'
         |      ELSE 'test' END AS split,
         |    n_tokens
         |  FROM (SELECT doc_id, source,
         |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt,
         |      CAST($tokenExpr AS BIGINT) AS n_tokens
         |    FROM s4)),
         |cum AS (SELECT split, source, doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM sp)
         |SELECT split, source,
         |  CAST(floor((c - n_tokens) / $ShardBudget) AS BIGINT) AS shard,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  min(doc_id) AS min_doc_id
         |FROM cum GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // every input doc's disposition: the CASE walks the stage
    // relations in pipeline order (dropset ⊂ s2, so the contaminated
    // arm is reachable only for stage-3 survivors of stages 1-2)
    "p04_drop_audit" ->
      s"""WITH RECURSIVE
         |$p01StageCtes
         |SELECT d.doc_id,
         |  CASE WHEN m1.doc_id IS NULL THEN 'dup_exact'
         |       WHEN m2.doc_id IS NULL THEN 'dup_near'
         |       WHEN mf.doc_id IS NOT NULL THEN 'contaminated'
         |       WHEN m4.doc_id IS NULL THEN 'low_quality'
         |       ELSE 'kept' END AS disposition
         |FROM all_docs d
         |LEFT JOIN (SELECT doc_id FROM s1) m1 ON d.doc_id = m1.doc_id
         |LEFT JOIN (SELECT doc_id FROM s2) m2 ON d.doc_id = m2.doc_id
         |LEFT JOIN (SELECT doc_id FROM dropset) mf ON d.doc_id = mf.doc_id
         |LEFT JOIN (SELECT doc_id FROM s4) m4 ON d.doc_id = m4.doc_id
         |ORDER BY d.doc_id""".stripMargin,


    // two-day incremental settle: day2's exact dedup anti-joins
    // against ALL of day1's fingerprints (g1 — including docs the
    // gates later dropped: a recurring duplicate of a rejected doc
    // must stay rejected), then each day runs the shared
    // decontaminate + quality tail
    "p02_incremental_settle" ->
      s"""WITH
         |nn AS (SELECT doc_id, text, source FROM documents WHERE text IS NOT NULL),
         |day1 AS (SELECT doc_id, text, source FROM nn WHERE doc_id % 2 = 1),
         |day2 AS (SELECT doc_id, text, source FROM nn WHERE doc_id % 2 = 0
         |  UNION ALL SELECT doc_id + 1000000, text, source FROM day1 WHERE doc_id % 10 = 1
         |  UNION ALL SELECT doc_id + 2000000, text, source FROM nn
         |    WHERE doc_id % 2 = 0 AND doc_id % 10 = 2),
         |bgs AS (SELECT list(DISTINCT g) AS bg FROM (
         |  SELECT unnest(list_distinct(${graft.functions.TextHashExpressions.bigramFoldSql("ws")})) AS g
         |  FROM (SELECT string_split(text, ' ') AS ws FROM nn
         |    WHERE doc_id % 100 = 0 AND $tokenExpr >= 2))),
         |g1 AS (SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS doc_id
         |  FROM day1 GROUP BY 1),
         |s1d1 AS (SELECT d.doc_id, d.text, d.source FROM day1 d JOIN g1 USING (doc_id)),
         |g2 AS (SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS doc_id
         |  FROM day2 GROUP BY 1),
         |u2 AS (SELECT doc_id FROM g2 WHERE fp NOT IN (SELECT fp FROM g1)),
         |s1d2 AS (SELECT d.doc_id, d.text, d.source FROM day2 d JOIN u2 USING (doc_id)),
         |${settleTailCtes("s1d1", "d1")},
         |${settleTailCtes("s1d2", "d2")}
         |SELECT CAST(1 AS BIGINT) AS day, doc_id, source FROM s4d1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT) AS day, doc_id, source FROM s4d2
         |ORDER BY day, doc_id""".stripMargin,
  )
}
