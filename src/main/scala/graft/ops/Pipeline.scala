package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed end-to-end curation pipeline (SURVEY §2C): the stages a
  * training corpus actually runs BETWEEN ingest and tokenization, wired
  * as ONE dataflow instead of thirteen isolated queries. Reference
  * analogue: the reference's value is also the composed flow, not its
  * stages (`main_ingest.py:331-690` runs parse → delete → insert → FK →
  * audit as a single pipeline per file).
  *
  * Stage order is the canonical one (cheapest-first kills most rows
  * before the expensive stages see them is NOT the rule here — exact
  * dedup must precede near-dup clustering or cluster sizes double, and
  * decontamination must precede the quality gate or a contaminated doc
  * can be "rescued" by failing quality first in one engine and not the
  * other; this order is deterministic end to end):
  *
  *   1. exact dedup           — one canonical (min-id) row per
  *                              normalized-text fingerprint
  *                              ([[Dedup.exactGroups]]);
  *   2. near-dup keep-best    — LSH bucket star-edges → connected
  *                              components → keep the LONGEST member
  *                              per cluster (ties to min id), cluster
  *                              non-members pass through
  *                              ([[Dedup.connectedComponentsOverBuckets]],
  *                              [[Curation.keepBest]]);
  *   3. decontamination       — drop docs whose bigram-hash overlap with
  *                              the benchmark's gram set reaches
  *                              `contaminationTau`
  *                              ([[Curation.contaminationScores]]);
  *   4. quality gate          — keep docs passing EVERY
  *                              [[TextAnalysis.qualityRules]] rule;
  *   5. split assignment      — content-hash train/val/test
  *                              ([[Curation.splitAssign]]);
  *   6. shard packing         — token-budget bins per (split, source)
  *                              ([[Curation.packShards]]).
  *
  * Every stage is deterministic (hash-based, no RNG), so a DuckDB CTE
  * chain replays the WHOLE composition bit-for-bit — the p01 oracle.
  *
  * Scale/lineage shape: stages 1–2 are consumed by multiple downstream
  * branches (the cluster join, the singleton anti-join, the bigram
  * scorer), and stage 2 contains an iterative fixpoint whose lineage
  * must not re-expand into its input (the round-4 MMR bug class). Each
  * multi-consumer stage boundary is therefore materialized with an
  * eager `localCheckpoint` — exactly where a 100 TB pipeline would
  * persist an intermediate table between stages; swap the checkpoint
  * for a parquet write and the plan is unchanged.
  */
object Pipeline {

  /** Run the six-stage curation flow over `docs`, decontaminating
    * against `benchmark`. Returns the packed per-document relation:
    * the input columns plus (split string, n_tokens long, shard long).
    *
    * `docs` must carry (idCol, textCol, sourceCol); ids must be
    * non-null and unique; texts non-null.
    */
  def curate(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      contaminationTau: Double = 0.5, shardBudget: Long = 4096L): DataFrame = {
    require(contaminationTau > 0 && contaminationTau <= 1,
      s"contaminationTau must be in (0,1], got $contaminationTau")
    require(shardBudget > 0, s"shardBudget must be > 0, got $shardBudget")
    Seq("split", "n_tokens", "shard").foreach { r =>
      require(!docs.columns.exists(_.equalsIgnoreCase(r)),
        s"$r is produced by Pipeline.curate; rename that input column")
    }

    // stage 1: exact dedup — keep the canonical (min-id) row per
    // fingerprint. The join against the canonical-id relation is a
    // key-sized semi-join (one id per distinct text), the same shuffle
    // d01 pays and nothing more.
    val canon = Dedup.exactGroups(docs, idCol, textCol)
      .select(col("canonical_id").as(idCol))
    val s1 = docs.join(canon, Seq(idCol)).localCheckpoint(true)

    // stage 2: near-dup clusters over the SURVIVORS (running it before
    // exact dedup would re-discover every exact copy as a "near" dup).
    // Components come from the O(m)-per-bucket star edges; winners are
    // the longest member (ties min id); docs in no cluster pass through
    // via one anti-join against the label relation.
    val labels = Dedup.connectedComponentsOverBuckets(s1, idCol, textCol)
    val labeled = labels.join(s1, labels("id") === s1(idCol))
      .select(col("label") +: docs.columns.map(s1(_)) :+
        length(s1(textCol)).cast("long").as("__q"): _*)
    val winners = Curation.keepBest(labeled, "label", idCol, col("__q"))
      .select(docs.columns.map(col).toIndexedSeq: _*)
    val singles = s1.join(labels.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .select(docs.columns.map(col).toIndexedSeq: _*)
    val s2 = winners.unionByName(singles).localCheckpoint(true)

    // stage 3: benchmark decontamination. contaminationScores only
    // scores docs with >= 2 words (no bigram exists below that), so the
    // drop set is built from the scored side and removed by anti-join —
    // sub-bigram docs are definitionally uncontaminated and pass.
    val flagged = Curation.contaminationScores(s2, benchmark, idCol, textCol)
      .where(col("overlap") >= contaminationTau)
      .select(col(idCol))
    val s3 = s2.join(flagged, Seq(idCol), "left_anti")

    // stage 4: quality gate — pass ALL rules (t09's profile view counts
    // per-rule kills; the pipeline applies the conjunction).
    val passAll = TextAnalysis.qualityRules
      .map { case (_, rule) => !rule(col(textCol)) }.reduce(_ && _)
    val s4 = s3.where(passAll)

    // stages 5+6: content-hash split, then token-budget packing within
    // (split, source) — the pack key is the concatenation, so the
    // window sort stays partitioned (never a global sort).
    val withSplit = s4
      .withColumn("split", Curation.splitAssign(col(idCol)))
      .withColumn("__grp", concat_ws("|", col("split"), col(sourceCol)))
    Curation.packShards(withSplit, "__grp", idCol,
        TextAnalysis.wsTokenCount(col(textCol)), shardBudget)
      .drop("__grp")
  }

  /** Per-document DISPOSITION audit for [[curate]]'s gate stages — the
    * "why did my document disappear" answer a 100 TB curation run
    * needs operationally (debugging a yield drop means attributing it
    * to a stage, not re-running the pipeline with print statements).
    * Returns (idCol, disposition string) for EVERY input document:
    *
    *   - `dup_exact`    — lost stage 1 (not the canonical min-id row
    *                      of its normalized-text fingerprint);
    *   - `dup_near`     — survived 1, lost stage 2 (clustered, not the
    *                      keep-best winner);
    *   - `contaminated` — survived 1–2, dropped by the benchmark
    *                      overlap gate;
    *   - `low_quality`  — survived 1–3, failed a quality rule;
    *   - `kept`         — reaches the split/pack stages.
    *
    * Stages replay [[curate]]'s operators verbatim (same fingerprints,
    * same cluster winners, same thresholds), so `kept` here is exactly
    * curate's output membership. Cost shape: the audit IS stages 1–4
    * plus id-sized marker joins — the split/pack tail is skipped, and
    * each marker relation carries ids only (never text), so the extra
    * joins shuffle keys, not documents.
    */
  def dropAudit(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, contaminationTau: Double = 0.5): DataFrame = {
    require(contaminationTau > 0 && contaminationTau <= 1,
      s"contaminationTau must be in (0,1], got $contaminationTau")
    val canon = Dedup.exactGroups(docs, idCol, textCol)
      .select(col("canonical_id").as(idCol))
    val s1 = docs.join(canon, Seq(idCol)).localCheckpoint(true)

    val labels = Dedup.connectedComponentsOverBuckets(s1, idCol, textCol)
    val labeled = labels.join(s1, labels("id") === s1(idCol))
      .select(col("label"), s1(idCol).as(idCol),
        length(s1(textCol)).cast("long").as("__q"))
    val winners = Curation.keepBest(labeled, "label", idCol, col("__q"))
      .select(col(idCol))
    val singles = s1.select(col(idCol))
      .join(labels.select(col("id").as(idCol)), Seq(idCol), "left_anti")
    val s2ids = winners.unionByName(singles).localCheckpoint(true)
    val s2 = s1.join(s2ids, Seq(idCol))

    val flagged = Curation.contaminationScores(s2, benchmark, idCol, textCol)
      .where(col("overlap") >= contaminationTau)
      .select(col(idCol))
    val passAll = TextAnalysis.qualityRules
      .map { case (_, rule) => !rule(col(textCol)) }.reduce(_ && _)
    val s4ids = s2.join(flagged, Seq(idCol), "left_anti")
      .where(passAll).select(col(idCol))

    def mark(ids: DataFrame, name: String): DataFrame =
      ids.select(col(idCol), lit(true).as(name))
    docs.select(col(idCol))
      .join(mark(s1.select(col(idCol)), "__s1"), Seq(idCol), "left")
      .join(mark(s2ids, "__s2"), Seq(idCol), "left")
      .join(mark(flagged, "__fl"), Seq(idCol), "left")
      .join(mark(s4ids, "__s4"), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__s1").isNull, "dup_exact")
          .when(col("__s2").isNull, "dup_near")
          .when(col("__fl").isNotNull, "contaminated")
          .when(col("__s4").isNull, "low_quality")
          .otherwise("kept").as("disposition"))
  }
}
