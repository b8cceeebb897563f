package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis
import graft.sources.Tables

/** Text-analysis pack over `documents` (SURVEY §2C): token counting,
  * language-ID, quality scoring, fingerprinting. Marker/stopword
  * occurrence counts use the length-difference identity (no regex), so
  * the DuckDB oracle is bit-identical; ratios are single int/int double
  * divisions (IEEE-deterministic).
  */
object TextQueries {

  /** t19 probes, single-sourced into the Spark literals AND the oracle
    * SQL: canonically-equivalent but byte-different suffixes — composed
    * U+00E9 vs e + combining acute U+0301.
    */
  private[queries] val NfcProbeComposed = " caf\u00e9 r\u00e9sum\u00e9"
  private[queries] val NfcProbeDecomposed = " cafe\u0301 re\u0301sume\u0301"

  /** The t14 query workload — one row per (query id, term), shared
    * with the oracle's VALUES list. Terms are pre-deduped per query
    * (Search.bm25TopK's contract).
    */
  private val Bm25Queries: Seq[(Long, String)] = Seq(
    (1L, "hash"), (1L, "join"),
    (2L, "stream"), (2L, "window"), (2L, "agg"),
    (3L, "customer"), (3L, "order"), (3L, "data"), (3L, "big"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 ranked retrieval through the t06/t10 index relations — the
    // deterministic variant (rational idf, ordered-fold score sum)
    // documented in graft.ops.Search
    "t14_bm25_topk" -> ((s, d) => {
      import s.implicits._
      graft.ops.Search.bm25TopK(
          Tables.load(s, d, "documents").select("doc_id", "text"),
          "doc_id", "text",
          Bm25Queries.toDF("qid", "term"), "qid", "term", k = 10)
        .orderBy("qid", "rank")
    }),

    // the index built INCREMENTALLY — two disjoint halves indexed
    // separately and merged algebraically (df term-sums, tf/lens
    // appends, scalar adds) — must score byte-identically to t14's
    // direct build: the two queries share ONE oracle, so any merge
    // wrongness (a double-counted df, a dropped posting, drifted
    // corpus scalars) breaks the hash compare
    "t15_bm25_incremental_index" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val snap = graft.ops.Search.buildIndex(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
      val batch = graft.ops.Search.buildIndex(
        docs.where(col("doc_id") % 2 =!= 0), "doc_id", "text")
      graft.ops.Search.bm25FromIndex(
          graft.ops.Search.mergeIndex(snap, batch),
          Bm25Queries.toDF("qid", "term"), "qid", "term", k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("qid", "rank")
    }),

    // corpus-trained add-one bigram LM scoring — the CCNet-style
    // "perplexity filter" in its deterministic form (probabilities,
    // not logs; position-ordered fold sum) — graft.ops.LangModel
    "t16_bigram_lm_score" -> ((s, d) => {
      graft.ops.LangModel.selfScore(
          Tables.load(s, d, "documents").select("doc_id", "text"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // the LM trained INCREMENTALLY — two disjoint halves trained
    // separately and merged algebraically — must score byte-identically
    // to t16's direct train: the two queries share ONE oracle (the
    // t14/t15 pattern), so any merge wrongness breaks this hash while
    // t16 stays green
    "t18_bigram_lm_merge" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val m = graft.ops.LangModel.merge(
        graft.ops.LangModel.train(docs.where(col("doc_id") % 2 === 0), "text"),
        graft.ops.LangModel.train(docs.where(col("doc_id") % 2 =!= 0), "text"))
      graft.ops.LangModel.score(docs, "doc_id", "text", m).orderBy("doc_id")
    }),

    // Unicode NFC canonicalization (native graft expression vs DuckDB
    // nfc_normalize): every doc is probed with a composed-form and a
    // decomposed-form suffix — raw md5s differ, NFC md5s must collide,
    // and all four digests ride in the hash so any normalization
    // divergence between the engines breaks the compare
    "t19_nfc_normalize" -> ((s, d) => {
      import graft.functions.TextNormExpressions.nfc_normalize
      Tables.load(s, d, "documents").where(col("text").isNotNull)
        .select(col("doc_id"),
          md5(concat(col("text"), lit(NfcProbeComposed))).as("raw_c_md5"),
          md5(concat(col("text"), lit(NfcProbeDecomposed))).as("raw_d_md5"),
          md5(nfc_normalize(concat(col("text"), lit(NfcProbeComposed))))
            .as("nfc_c_md5"),
          md5(nfc_normalize(concat(col("text"), lit(NfcProbeDecomposed))))
            .as("nfc_d_md5"))
        .withColumn("raw_equal", col("raw_c_md5") === col("raw_d_md5"))
        .withColumn("nfc_equal", col("nfc_c_md5") === col("nfc_d_md5"))
        .orderBy("doc_id")
    }),

    // trained NB-style language classifier, self-applied — confusion
    // matrix vs the true labels (t02's heuristic upgraded to a model;
    // min/max of best_score ride along — order-independent double
    // aggregates, so the fold arithmetic is in the hash)
    "t17_nb_lang_classify" -> ((s, d) => {
      graft.ops.LangModel.nbSelfClassify(
          Tables.load(s, d, "documents").select("doc_id", "text", "lang"),
          "doc_id", "text", "lang")
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n_docs"),
          min("best_score").as("min_score"),
          max("best_score").as("max_score"))
        .orderBy("lang", "predicted")
    }),

    // vocabulary coverage / OOV rate: the held-out half scored against
    // the vocabulary the training half induces — the "will my tokenizer
    // cover tomorrow's data" check run before committing a vocab (t11's
    // encode assumes full coverage; this measures where that breaks).
    // One distinct-vocab relation + one left equi-join; per-lang rates
    // are single int/int double divisions.
    "t20_oov_rate" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select("doc_id", "lang", "text").where(col("text").isNotNull)
      val vocab = docs.where(col("doc_id") % 2 === 0)
        .select(explode(split(col("text"), " ")).as("w")).distinct()
        .withColumn("__known", lit(1L))
      docs.where(col("doc_id") % 2 =!= 0)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .join(vocab, Seq("w"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__known").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
        .orderBy("lang")
    }),

    // trained linear classifier with EXACT integer training (ops
    // .LinearModel): batch perceptron, lr 1, K epochs — weights,
    // gradients and margins stay BIGINT end to end, so the trained
    // model is bit-identical across engines and cluster topologies
    // (float-gradient training is not). The oracle replays every epoch
    // as a chained CTE over the same integer feature relation.
    "t21_perceptron_classify" -> ((s, d) => {
      val padded = concat(lit(" "), col("text"), lit(" "))
      val feats = Tables.load(s, d, "documents")
        .where(col("text").isNotNull && col("lang").isNotNull)
        .select(col("doc_id") +:
          when(col("lang") === "en", 1L).otherwise(-1L).as("y") +:
          PerceptronMarkers.zipWithIndex.map { case (m, i) =>
            TextAnalysis.occurrencesLit(padded, m).as(s"x${i + 1}")
          }: _*)
        .localCheckpoint(true) // every epoch + the scoring pass re-scan
      val featCols = PerceptronMarkers.indices.map(i => s"x${i + 1}")
      val w = graft.ops.LinearModel.perceptronTrain(
        feats, featCols, "y", PerceptronEpochs)
      graft.ops.LinearModel.perceptronScore(feats, featCols, "y", w)
        .select("doc_id", "y", "margin", "predicted", "correct")
        .orderBy("doc_id")
    }),

    // closed-form OLS via exact integer normal equations (ops
    // .LinearModel.olsFit): the five sums are one map-side-combined
    // aggregate, Cramer's rule stays in long arithmetic, and only the
    // final divisions are IEEE doubles in a fixed shape the oracle
    // restates — the heuristic-score calibration a curation pipeline
    // runs (fit expected token count from char count, flag outliers by
    // residual).
    "t22_ols_residuals" -> ((s, d) => {
      val data = Tables.load(s, d, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"),
          TextAnalysis.wsTokenCount(col("text")).as("n_words"))
        .localCheckpoint(true) // two passes: the fit, then residuals
      val (a, b) = graft.ops.LinearModel.olsFit(data, "n_chars", "n_words")
      graft.ops.LinearModel.olsResiduals(data, "n_chars", "n_words", a, b)
        .select("doc_id", "n_chars", "n_words", "pred", "residual")
        .orderBy("doc_id")
    }),

    // corpus drift monitor: chi-square token-distribution divergence
    // between the en slice and the rest (TextAnalysis.tokenDrift) —
    // the top drifted tokens are the language markers, found by the
    // statistic rather than hand-listed (t02's markers, rediscovered)
    "t23_token_drift" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select("lang", "text").where(col("text").isNotNull)
      TextAnalysis.tokenDrift(
          docs.where(col("lang") === "en"),
          docs.where(col("lang") =!= "en"),
          "text", k = 50)
        .orderBy("rank")
    }),

    // tokenizer fertility per language: BPE tokens per word and BYTES
    // per BPE token (UTF-8 octet length, not chars — zh costs ~3 bytes
    // per char, which is the whole point of the metric). The
    // vocabulary-budget planning view: fertility tells you which
    // languages a byte-level tokenizer taxes. Single int/int double
    // divisions over map-side-combined sums.
    "t24_tokenizer_fertility" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .where(col("text").isNotNull)
        .select(col("lang"),
          octet_length(col("text")).cast("long").as("nb"),
          TextAnalysis.wsTokenCount(col("text")).as("ws"),
          TextAnalysis.bpeTokenCount(split(col("text"), " ")).as("bpe"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("nb").as("total_bytes"),
          sum("ws").as("ws_tokens"),
          sum("bpe").as("bpe_tokens"))
        .withColumn("fertility",
          col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))
        .withColumn("bytes_per_bpe",
          col("total_bytes").cast("double") / col("bpe_tokens").cast("double"))
        .orderBy("lang")
    }),

    "t01_token_stats" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("lang"),
          TextAnalysis.wsTokenCount(col("text")).as("ws"),
          TextAnalysis.bpeTokenCount(split(col("text"), " ")).as("bpe"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("ws").as("total_ws_tokens"),
          sum("bpe").as("total_bpe_tokens"))
        .orderBy("lang")
    }),

    "t02_lang_id" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("lang"), TextAnalysis.predictedLang(col("text")).as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    "t03_quality" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("doc_id") +: TextAnalysis.qualityColumns(col("text")): _*)
        .orderBy("doc_id")
    }),

    // PMI collocations in the house no-ln form (t06's precedent): the
    // association ratio p(w1,w2)/(p(w1)p(w2)) = c12·N²/(M·c1·c2) is an
    // exact rational — numerator and denominator ride as BIGINTs, the
    // ONE double division is shape-identical in both engines. Corpus
    // totals N/M are two driver scalars (the model-rides-the-driver
    // pattern); top-k is orderBy+limit — Spark plans TakeOrdered, a
    // distributed heap top-k, never a single-partition global sort.
    "t25_pmi_collocations" -> ((s, d) => {
      val t = Tables.load(s, d, "documents").where(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .localCheckpoint(true) // unigram + bigram passes share the scan
      val uni = t.select(explode(col("ws")).as("w"))
      val uc = uni.groupBy("w").agg(count(lit(1)).as("c"))
      val n = uni.count()
      val bg = t.where(size(col("ws")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ws) - 1),
            |  i -> struct(element_at(ws, i) AS w1,
            |              element_at(ws, i + 1) AS w2))""".stripMargin))
          .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .localCheckpoint(true) // counted twice (M and the pair groupBy)
      val m = bg.count()
      bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .where(col("c12") >= 5)
        .join(uc.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uc.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .withColumn("score_num", col("c12") * lit(n) * lit(n))
        .withColumn("score_den", lit(m) * col("c1") * col("c2"))
        .withColumn("pmi_ratio",
          col("score_num").cast("double") / col("score_den"))
        .select("w1", "w2", "c12", "score_num", "score_den", "pmi_ratio")
        .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
        .limit(50)
    }),

    // encoding-anomaly gate: bare C0 control chars (binary-as-text,
    // transport mangling) and U+FFFD replacement chars (lossy-decode
    // tombstones) counted per source. The clean synthetic corpus
    // would make the check vacuous, so probe twins are planted: +1M
    // Heaps-law vocabulary growth (t27): the corpus as one doc_id-
    // ordered token stream, reporting cumulative tokens vs cumulative
    // DISTINCT tokens at every document — the V ≈ K·N^β curve that
    // sizes tokenizer vocabularies and predicts OOV decay. "New at
    // doc d" = tokens whose FIRST containing doc is d (one groupBy
    // min), so the distinct-count cumsum needs no stateful scan; both
    // running sums ride the two-pass granule cumsum (runningSum — the
    // c18 discipline), and the oracle states each as ONE plain global
    // cumsum, hash-proving the decomposition.
    "t27_vocab_growth" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .where(col("text").isNotNull).select("doc_id", "text")
      val newPerDoc = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(min("doc_id").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("new_tokens"))
      val base = docs
        .select(col("doc_id"),
          graft.ops.TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
        .join(newPerDoc, Seq("doc_id"), "left")
        .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L)))
      val c1 = graft.ops.Curation.runningSum(base, "doc_id", "n_tokens",
        granule = 64L, out = "cum_tokens")
      graft.ops.Curation.runningSum(c1, "doc_id", "new_tokens",
          granule = 64L, out = "cum_vocab")
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
          col("cum_vocab"))
        .orderBy("doc_id")
    }),

    // blocklist scan (the curation badword/PII-trigger gate) via ONE
    // Aho-Corasick pass: P patterns counted (overlapping starts
    // included) in a single generated text walk — the per-pattern
    // builtin costs P passes and cannot count overlaps. The list
    // deliberately nests patterns ("can" inside "scan", "ark" inside
    // "spark") and self-overlaps ("a a" in "a a a") so the automaton's
    // fail-closure is load-bearing, not decorative.
    "t28_blocklist_scan" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").where(col("text").isNotNull)
      val patArr = array(blocklist.map(lit): _*)
      docs.select(col("source"),
          graft.functions.PatternScanExpressions
            .multi_pattern_counts(col("text"), blocklist).as("c"))
        .select(col("source"), posexplode(col("c")).as(Seq("pi", "n")))
        .select(col("source"),
          element_at(patArr, col("pi") + 1).as("pattern"), col("n"))
        .groupBy("source", "pattern")
        .agg(sum("n").as("n_hits"),
          count(when(col("n") > 0, 1)).as("n_docs_hit"))
        .orderBy("source", "pattern")
    }),

    // Good-Turing count-of-counts (the KenLM/SRILM smoothing input):
    // N_r = how many token types occur exactly r times, and the GT
    // adjusted count r* = (r+1)·N_{r+1}/N_r kept as an exact RATIONAL
    // (numerator/denominator integers — no libm, the house rule), for
    // the low-r rows smoothing actually uses. Two-level aggregation:
    // token → r (map-side combined), r → N_r (tiny), one equi-join on
    // r+1. The r=1 row's N_1/N is the unseen-mass estimate that
    // decides how much probability a corpus LM reserves for OOV.
    "t29_good_turing" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .where(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
      val byType = toks.groupBy("w").agg(count(lit(1)).as("r"))
      val nr = byType.groupBy("r").agg(count(lit(1)).as("n_r"))
      val nxt = nr.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
      // the 20 SMALLEST occurrence counts present (not r <= 20: where
      // the low-count tail sits is corpus-dependent, and an absolute
      // cut can select nothing). The count-of-counts relation is
      // vocab-bounded, so the ordering window is tiny.
      nr.withColumn("ord", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("r"))))
        .where(col("ord") <= 20).drop("ord")
        .join(nxt, Seq("r"), "left")
        .select(col("r"), col("n_r"),
          coalesce(col("n_next"), lit(0L)).as("n_next"),
          ((col("r") + 1) * coalesce(col("n_next"), lit(0L)))
            .as("gt_num"),
          col("n_r").as("gt_den"))
        .orderBy("r")
    }),

    // Zipf octave profile (the rank-frequency sanity check run on
    // every corpus): token types bucketed by rank OCTAVE [2^k, 2^(k+1))
    // — the exact-integer form of the log-log Zipf plot (octave =
    // floor(log2 rank) via binary-string length, never floating log2:
    // the ADVICE.md log2-rounding hazard designed out). A Zipfian
    // corpus has near-constant occurrence mass per octave; collapse or
    // explosion flags synthetic/degenerate text. Vocab-sized state
    // only: the global rank window orders TYPES, never corpus rows.
    "t30_zipf_octaves" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byType = Tables.load(s, d, "documents")
        .where(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      byType
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("w").asc)).cast("long"))
        .withColumn("octave",
          (length(conv(col("rank"), 10, 2)) - 1).cast("long"))
        .groupBy("octave")
        .agg(count(lit(1)).as("n_types"), sum("cnt").as("occurrences"))
        .orderBy("octave")
    }),

    // ids carry two bell chars, +2M ids carry one replacement char —
    // every planted anomaly must surface in exactly its class, and
    // every original doc must stay clean, or the hash breaks
    "t26_encoding_quality" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text", "source")
      DedupQueries.requireDisjointShift(docs, "doc_id", 1000000L)
      val probed = docs
        .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit("\u0007\u0007")).as("text"), col("source")))
        .unionByName(docs.select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit("\uFFFD")).as("text"), col("source")))
      TextAnalysis.encodingProfile(probed, "text", "source")
        .orderBy("source")
    }),

    "t05_top_terms" -> ((s, d) => {
      // term frequency + top-k per group: explode tokens, count, rank
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("freq").desc, col("word"))
      Tables.load(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .groupBy("lang", "word").agg(count(lit(1)).as("freq"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 5)
        .orderBy("lang", "rank")
    }),

    "t06_tfidf_topk" -> ((s, d) => {
      // tf-idf-style salience without ln() (libm log is not identically
      // rounded across engines): score = tf * N / df, an exact rational
      // in doubles. Top salient term per document for a doc sample.
      val docs = Tables.load(s, d, "documents")
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val df = words.select("doc_id", "word").distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
      val n = docs.count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
      tf.join(df, "word")
        .withColumn("score", col("tf") * lit(n.toDouble) / col("df"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 1 && col("doc_id") < 100)
        .select("doc_id", "word", "tf", "df", "score")
        .orderBy("doc_id")
    }),

    "t07_filter_funnel" -> ((s, d) => {
      // quality-filter funnel with kill attribution: each document is
      // charged to the FIRST filter that rejects it (the observability
      // view curation pipelines use to tune thresholds) — too short,
      // then stopword-starved, then not-English, else kept
      val docs = Tables.load(s, d, "documents")
        .select(col("lang") +: TextAnalysis.qualityColumns(col("text"))
          :+ TextAnalysis.predictedLang(col("text")).as("predicted"): _*)
      docs.withColumn("verdict",
          when(col("n_words") < 20, "1_too_short")
            .when(col("stopword_ratio") < 0.03, "2_low_stopword")
            .when(col("predicted") =!= "en", "3_non_english")
            .otherwise("0_kept"))
        .groupBy("lang", "verdict")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "verdict")
    }),

    "t04_fingerprint" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"),
          TextAnalysis.rollingHash(col("text")).as("fp_rolling"))
        .orderBy("doc_id")
    }),

    "t09_quality_rules" -> ((s, d) => {
      // independent per-rule kill profile (vs t07's first-fail funnel):
      // for each source, how many documents each Gopher-style rule
      // would reject ON ITS OWN, plus how many pass every rule — the
      // view used to TUNE thresholds before wiring the funnel. One
      // per-row projection + one groupBy(source); no joins.
      val docs = Tables.load(s, d, "documents")
      val flagged = docs.select(
        col("source") +: TextAnalysis.qualityRules.map {
          case (n, rule) => rule(col("text")).as(s"fail_$n")
        }: _*)
      val failCounts = TextAnalysis.qualityRules.map { case (n, _) =>
        sum(when(col(s"fail_$n"), 1L).otherwise(0L)).as(s"n_fail_$n")
      }
      val passAll = TextAnalysis.qualityRules
        .map { case (n, _) => !col(s"fail_$n") }.reduce(_ && _)
      flagged.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          failCounts :+ sum(when(passAll, 1L).otherwise(0L)).as("n_pass"): _*)
        .orderBy("source")
    }),

    // vocabulary build + token-id encoding — the tokenizer-prep step
    // every pretraining pipeline runs: rank the corpus vocabulary by
    // (frequency desc, token) into contiguous ids (id 1 = most
    // frequent, the BPE/unigram convention), then encode every
    // document against it. The ranking window is GLOBAL but runs over
    // the VOCABULARY relation (|vocab| ≪ corpus — bounded by language,
    // not data size; the same single-partition envelope as q39's bin
    // axis). Encoding is one equi-join of the exploded corpus against
    // the vocab. Output is per-doc scalar digests of the id sequence
    // (count/sum/min/max) — id ARRAYS would defeat the driver's
    // row-probe (the q29 lesson) while these digests still pin every
    // assignment: one swapped id anywhere moves sum_ids.
    "t11_vocab_encode" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("freq"))
        .withColumn("token_id", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("freq").desc, col("w"))).cast("long"))
      toks.join(vocab, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum("token_id").as("sum_ids"),
          min("token_id").as("min_id"),
          max("token_id").as("max_id"))
        .orderBy("doc_id")
    }),

    // BPE merge learning (tokenizer training): the top-k most frequent
    // adjacent symbol pairs, merged greedily — the merge table IS the
    // trained tokenizer. Corpus scanned once (word counts); each of the
    // k steps runs over the vocab-sized relation. Output is the k-row
    // merge table (driver-side model state), all scalar columns.
    "t12_bpe_merges" -> ((s, d) => {
      val words = graft.ops.Bpe.wordTable(Tables.load(s, d, "documents"), "text")
      val (merges, _) = graft.ops.Bpe.learnMerges(words, graft.ops.Bpe.DefaultMerges)
      s.createDataFrame(merges)
        .select("step", "left_sym", "right_sym", "merged", "pair_freq")
        .orderBy("step")
    }),

    // the trained tokenizer APPLIED: every document encoded against the
    // final word→representation map (one vocab-sized equi-join, t11's
    // shape), reported as per-doc scalar digests — token and symbol
    // counts pin every word's merge state without shipping id arrays
    // (the q29 row-probe lesson).
    "t13_bpe_encode" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val words = graft.ops.Bpe.wordTable(docs, "text")
      val (_, finalWords) =
        graft.ops.Bpe.learnMerges(words, graft.ops.Bpe.DefaultMerges)
      val syms = finalWords.select(col("w"),
        graft.ops.Bpe.symbolCount(col("repr")).as("n_syms"))
      graft.ops.Bpe.tokens(docs, "text")
        .select("doc_id", "w")
        .join(syms, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("n_syms").as("n_symbols"),
          max("n_syms").as("max_word_syms"))
        .withColumn("avg_syms_per_word",
          col("n_symbols") / col("n_words").cast("double"))
        .orderBy("doc_id")
    }),

    "t10_rarity" -> ((s, d) => {
      // corpus-level rarity: a document's mean document-frequency over
      // its distinct word-bigram hashes — low = novel phrasing, high =
      // boilerplate. The df table is ONE groupBy over exploded distinct
      // grams (map-side combined); scoring re-joins only the sampled
      // docs (doc_id % 5 = 0) against it, so the expensive side scales
      // with the probe sample, not the corpus. Integer sums + a single
      // int/int double division — oracle-exact.
      val grams = Tables.load(s, d, "documents").select("doc_id", "text")
        .where(size(split(col("text"), " ")) >= 2)
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.TextHashExpressions.bigram_hash32(col("text")))).as("g"))
      val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
      grams.where(col("doc_id") % 5 === 0)
        .join(df, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), sum("df").as("df_sum"))
        .withColumn("rarity", col("df_sum") / col("n_grams").cast("double"))
        .orderBy("doc_id")
    }),

    "t08_repetition" -> ((s, d) => {
      // Gopher-style within-doc repetition: the fraction of a document
      // owed to its single most frequent word (degenerate boilerplate
      // shows up as top_freq/n_words near 1). One explode + per-doc
      // groupBy + one window sort, all partitioned by doc_id — the
      // whole pipeline shares the doc_id shuffle, no global state.
      val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val ranked = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("f").desc, col("w").asc)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("f"))
        .withColumn("rn", row_number().over(ranked))
        .withColumn("n_words", sum(col("f")).over(byDoc))
        .withColumn("n_distinct", count(lit(1)).over(byDoc))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          col("w").as("top_word"), col("f").as("top_freq"),
          (col("f") / col("n_words").cast("double")).as("repetition_ratio"))
        .orderBy("doc_id")
    }),

    // TextRank keyword extraction — integer PageRank over the word
    // co-occurrence graph (adjacent qualifying words, window 2); the
    // oracle replays the SAME 5-round ladder as g01 via the shared
    // GraphQueries.pagerankRoundsSql generator
    "t31_textrank_keywords" -> ((s, d) => {
      TextAnalysis.textRankKeywords(
          Tables.load(s, d, "documents").where(col("text").isNotNull),
          "doc_id", "text", minLen = 4, iterations = 5, topK = 20)
        .orderBy("kw_rank")
    }),

    // integer Flesch–Kincaid readability (×100) — vowel-run syllable
    // heuristic, sentence runs, exact integer divisions; the
    // quality-scoring family's grade-level member
    "t32_readability" -> ((s, d) => {
      TextAnalysis.readability(
          Tables.load(s, d, "documents").where(col("text").isNotNull),
          "doc_id", "text")
        .orderBy("doc_id")
    }),
  )

  private val markerSql: Map[String, String] =
    TextAnalysis.langMarkers.map { case (lang, ms) =>
      lang -> ms.map(m =>
        s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS BIGINT)")
        .mkString("(", " + ", ")")
    }.toMap

  // shared oracle-SQL builders: ONE derivation from TextAnalysis's
  // stopword and marker lists, so adding a language or stopword cannot
  // silently diverge between the t02/t03/t07 oracles
  /** t09's per-rule fail conditions over a relation exposing (n_chars,
    * n_words, stop_hits) — restated from TextAnalysis.qualityRules via
    * the SAME named constants, so a threshold change recompiles into
    * both engines or neither. Shared with p01's composed-pipeline
    * oracle (its quality gate is the conjunction of these).
    */
  private[queries] val qualityFailSqls: Seq[(String, String)] = {
    import TextAnalysis._
    Seq(
      "short" -> s"n_words < $RuleMinWords",
      "long" -> s"n_words > $RuleMaxWords",
      "word_len" -> (s"((n_chars - n_words + 1) / CAST(n_words AS DOUBLE) < $RuleWordLenLo" +
        s" OR (n_chars - n_words + 1) / CAST(n_words AS DOUBLE) > $RuleWordLenHi)"),
      "stopword" -> s"stop_hits * $RuleStopDen < n_words * $RuleStopNum")
  }

  /** t21's integer feature set — padded marker-occurrence counts —
    * single-sourced into the Spark exprs AND the oracle SQL so the two
    * engines cannot drift on what the model sees. x0 is the implicit
    * bias (always 1); x1.. are these markers in order.
    */
  private val PerceptronMarkers: Seq[String] =
    Seq(" the ", " and ", " la ", " und ")
  private val PerceptronEpochs = 3

  private def pOccSql(m: String): String =
    s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS BIGINT)"
  private val perceptronFeatSelects: String =
    PerceptronMarkers.zipWithIndex.map { case (m, i) =>
      s"${pOccSql(m)} AS x${i + 1}"
    }.mkString(",\n    ")
  private val pMarginSql: String =
    "w0 + " + PerceptronMarkers.indices
      .map(i => s"w${i + 1} * x${i + 1}").mkString(" + ")
  /** One perceptron epoch as SQL: the new weights are the old plus the
    * misclassified-gradient integer sums, grouped on the (single-row)
    * previous-epoch weights carried in by cross join.
    */
  private def pEpochSql(prev: String): String = {
    val upd = (0 to PerceptronMarkers.size).map { j =>
      val g = if (j == 0) "y" else s"y * x$j"
      s"w$j + CAST(sum(CASE WHEN y * ($pMarginSql) <= 0" +
        s" THEN $g ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS w$j"
    }.mkString(",\n    ")
    val grp = (0 to PerceptronMarkers.size).map(j => s"w$j").mkString(", ")
    s"SELECT $upd\n  FROM f CROSS JOIN $prev GROUP BY $grp"
  }

  private[queries] val stopHitsSql: String =
    TextAnalysis.stopwords.map(m =>
      s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS BIGINT)")
      .mkString("(", "\n     + ", ")")
  private val langScoreCols: String =
    TextAnalysis.langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")
  private val langScoreSelects: String =
    TextAnalysis.langMarkers.map { case (l, _) => s"${markerSql(l)} AS s_$l" }.mkString(",\n  ")
  private val langBest: String =
    TextAnalysis.langMarkers.map { case (l, _) => s"s_$l" }.mkString("GREATEST(", ", ", ")")
  private val langCases: String =
    TextAnalysis.langMarkers.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")

  /** BPE training replayed as k chained CTE blocks: w0 is the
    * word-frequency table with `@`-delimited char representations;
    * step i counts adjacent pairs over w(i-1) (symbols sit at 1-based
    * positions 2..len-1 of string_split, so pairs span j = 2..len-2;
    * generate_series is empty when start > stop, unlike Spark's
    * sequence), picks the (freq desc, l, r) argmax, and re-encodes via
    * the same literal `replace` the engine applies — both engines scan
    * the original left-to-right non-overlapping, so the replay is
    * bit-identical. The re-encode is a LEFT JOIN ON true: when a step
    * finds no pair left (vocab fully merged before k steps — the
    * engine stops early there), b$i is empty and w$i must pass
    * w$(i-1) through unchanged, not vanish via a CROSS JOIN with an
    * empty side. Shared by the t12/t13 oracles. */
  private def bpeCtes(k: Int): String = {
    val w0 =
      """w0 AS (
        |  SELECT w, '@' || array_to_string(string_split_regex(w, ''), '@') || '@' AS repr, freq
        |  FROM (SELECT t.w AS w, count(*) AS freq
        |        FROM documents, unnest(string_split(text, ' ')) AS t(w)
        |        WHERE text IS NOT NULL AND length(t.w) > 0 AND t.w NOT LIKE '%@%'
        |        GROUP BY t.w))""".stripMargin
    val steps = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT ss[j] AS l, ss[j + 1] AS r, CAST(sum(freq) AS BIGINT) AS f
         |  FROM (SELECT freq, string_split(repr, '@') AS ss FROM w${i - 1}) t,
         |       unnest(generate_series(2, len(ss) - 2)) AS g(j)
         |  WHERE len(ss) >= 4
         |  GROUP BY 1, 2),
         |b$i AS (SELECT l, r, f FROM p$i ORDER BY f DESC, l, r LIMIT 1),
         |w$i AS (
         |  SELECT w.w,
         |    CASE WHEN b.l IS NULL THEN w.repr
         |         ELSE replace(w.repr, '@' || b.l || '@' || b.r || '@', '@' || b.l || b.r || '@') END AS repr,
         |    w.freq
         |  FROM w${i - 1} w LEFT JOIN b$i b ON true)""".stripMargin
    }
    (w0 +: steps).mkString("WITH ", ",\n", "")
  }

  // every literal is CAST AS DOUBLE so DuckDB never slips into
  // DECIMAL arithmetic; (1.2 + 1.0) is summed, not written 2.2 —
  // the engine adds Bm25K1 + 1.0 in IEEE doubles and 2.2's parse is
  // a DIFFERENT double; the fold states the engine's sorted-term
  // left association exactly
  private val bm25OracleSql: String = {
    val qVals = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    """WITH q AS (SELECT CAST(v.q AS BIGINT) AS qid, v.t AS term
        |  FROM (VALUES QVALS) v(q, t)),
        |nn AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM nn),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
        |dfr AS (SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM words) GROUP BY 1),
        |lens AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM nn),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
        |    CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM nn),
        |c AS (SELECT q.qid, tf.doc_id, q.term,
        |    ((nd - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
        |      * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        |      / (tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |          + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS contrib
        |  FROM q JOIN tf USING (term) JOIN dfr USING (term)
        |    JOIN lens USING (doc_id) CROSS JOIN st),
        |s AS (SELECT qid, doc_id,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list_sort(list(struct_pack(t := term, c := contrib))),
        |        x -> x.c)), (a, b) -> a + b) AS score,
        |    count(*) AS n_terms_hit
        |  FROM c GROUP BY 1, 2)
        |SELECT qid, doc_id, rank, score, n_terms_hit FROM (
        |  SELECT qid, doc_id, score, n_terms_hit,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
        |  FROM s) WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin.replace("QVALS", qVals)
  }

  /** t16/t18 shared oracle: replays train + score verbatim — same
    * tokenize (string_split), same smoothed division shape, same
    * position-ordered fold; t18 must land on the identical bytes.
    */
  /** t16's self-trained bigram-LM CTE chain (uni → vocab → pairs →
    * bi → probs → per-doc fold `sc`) over an `nn` relation the caller
    * defines with at least (doc_id, ws). ONE definition shared by
    * t16/t18's score oracle and c17's perplexity-bucket oracle, so the
    * model math cannot drift between them.
    */
  private[queries] val lmScoreCtes: String =
    """uni AS (SELECT w1, count(*) AS cu
        |  FROM (SELECT unnest(ws) AS w1 FROM nn) GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni),
        |pp AS (SELECT doc_id, p.pos AS pos, p.w1 AS w1, p.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(range(len(ws) - 1),
        |      i -> struct_pack(pos := i, w1 := ws[i + 1], w2 := ws[i + 2]))) AS p
        |  FROM nn)),
        |bi AS (SELECT w1, w2, count(*) AS cb FROM pp GROUP BY 1, 2),
        |probs AS (SELECT doc_id, pos,
        |    CAST(COALESCE(cb, 0) + 1 AS DOUBLE)
        |      / CAST(COALESCE(cu, 0) + vocab AS DOUBLE) AS pr
        |  FROM pp LEFT JOIN bi USING (w1, w2) LEFT JOIN uni USING (w1)
        |    CROSS JOIN v),
        |sc AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list_sort(list(struct_pack(p := pos, c := pr))),
        |        x -> x.c)), (a, b) -> a + b) AS lm_score,
        |    count(*) AS n_bigrams
        |  FROM probs GROUP BY 1)""".stripMargin

  private val t16OracleSql: String =
    s"""WITH nn AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |$lmScoreCtes
        |SELECT doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
        |  COALESCE(lm_score, CAST(0 AS DOUBLE)) AS lm_score,
        |  CASE WHEN COALESCE(n_bigrams, 0) > 0
        |    THEN lm_score / CAST(n_bigrams AS DOUBLE) END AS mean_prob
        |FROM (SELECT doc_id FROM nn) LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin

  /** t28's blocklist: nested and self-overlapping patterns so the AC
    * fail-closure is exercised; shared by the query and its oracle.
    */
  private val blocklist =
    Seq("scan", "can", "spark", "ark", "a a", "slow")

  private val t28OracleSql: String = {
    val per = blocklist.map { p =>
      val esc = p.replace("'", "''")
      s"SELECT source, '$esc' AS pattern, " +
        graft.functions.PatternScanExpressions.patternCountSql(p) +
        " AS c FROM nn"
    }.mkString("\n  UNION ALL ")
    s"""WITH nn AS (SELECT source, text FROM documents WHERE text IS NOT NULL),
       |h AS ($per)
       |SELECT source, pattern, CAST(sum(c) AS BIGINT) AS n_hits,
       |  CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_docs_hit
       |FROM h GROUP BY source, pattern ORDER BY source, pattern""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "t28_blocklist_scan" -> t28OracleSql,

    // two-level counting + the rational GT adjustment as integers
    "t29_good_turing" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |tt AS (SELECT w FROM toks WHERE length(w) > 0),
        |bt AS (SELECT w, CAST(count(*) AS BIGINT) AS r FROM tt GROUP BY w),
        |nr0 AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM bt GROUP BY r),
        |nr AS (SELECT r, n_r FROM nr0
        |  QUALIFY row_number() OVER (ORDER BY r) <= 20),
        |nx AS (SELECT r - 1 AS r, n_r AS n_next FROM nr0)
        |SELECT nr.r AS r, nr.n_r AS n_r,
        |  COALESCE(nx.n_next, 0) AS n_next,
        |  CAST((nr.r + 1) * COALESCE(nx.n_next, 0) AS BIGINT) AS gt_num,
        |  nr.n_r AS gt_den
        |FROM nr LEFT JOIN nx USING (r)
        |ORDER BY r""".stripMargin,

    // octave via minimal binary-string length — bin() here == Spark's
    // conv(rank, 10, 2), both exact where floating log2 rounds
    "t30_zipf_octaves" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |tt AS (SELECT w FROM toks WHERE length(w) > 0),
        |bt AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tt GROUP BY w),
        |rk AS (SELECT cnt,
        |    row_number() OVER (ORDER BY cnt DESC, w ASC) AS rank FROM bt)
        |SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS octave,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(cnt) AS BIGINT) AS occurrences
        |FROM rk GROUP BY 1 ORDER BY octave""".stripMargin,

    // the naive statement: plain global cumsums over the same
    // first-doc relation — the engine's two-pass granule form must
    // reproduce them exactly (the c18 proof pattern, twice)
    "t27_vocab_growth" ->
      """WITH nn AS (SELECT doc_id, text FROM documents
        |  WHERE text IS NOT NULL),
        |t AS (SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS n_tokens
        |  FROM nn),
        |fd AS (SELECT w, min(doc_id) AS doc_id FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM nn)
        |  GROUP BY w),
        |nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS new_tokens
        |  FROM fd GROUP BY 1),
        |j AS (SELECT t.doc_id, t.n_tokens,
        |    COALESCE(nw.new_tokens, 0) AS new_tokens
        |  FROM t LEFT JOIN nw USING (doc_id))
        |SELECT doc_id, n_tokens,
        |  CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(sum(new_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM j ORDER BY doc_id""".stripMargin,

    // same probes (chr(7)/chr(65533) = the Spark literals), same
    // C0-minus-whitespace class (RE2 and Java both read \xNN), same
    // length-difference counts; the rate is the one double division
    "t26_encoding_quality" ->
      """WITH probed AS (SELECT doc_id, text, source FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text || chr(7) || chr(7),
        |    source FROM documents
        |  UNION ALL SELECT doc_id + 2000000, text || chr(65533),
        |    source FROM documents),
        |per AS (SELECT source,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS BIGINT) AS c,
        |    CAST(length(text) - length(replace(text, chr(65533), ''))
        |      AS BIGINT) AS r
        |  FROM probed)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN c + r > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(sum(coalesce(c, 0)) AS BIGINT) AS ctrl_chars,
        |  CAST(sum(coalesce(r, 0)) AS BIGINT) AS repl_chars,
        |  CAST(sum(CASE WHEN c + r > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(count(*) AS DOUBLE) AS flagged_rate
        |FROM per GROUP BY source ORDER BY source""".stripMargin,

    "t14_bm25_topk" -> bm25OracleSql,
    // the merged index is definitionally buildIndex of the union —
    // same oracle (the d06/d07 shared-oracle pattern): any merge
    // wrongness breaks t15's hash while t14 stays green
    "t15_bm25_incremental_index" -> bm25OracleSql,

    // replays train + score verbatim: same tokenize (string_split),
    // same smoothed division shape, same position-ordered fold
    // the probe constants interpolate from the SAME Scala vals the
    // Spark literals use — the engines cannot drift on the test data
    "t19_nfc_normalize" ->
      s"""SELECT doc_id, raw_c_md5, raw_d_md5, nfc_c_md5, nfc_d_md5,
         |  (raw_c_md5 = raw_d_md5) AS raw_equal,
         |  (nfc_c_md5 = nfc_d_md5) AS nfc_equal
         |FROM (SELECT doc_id,
         |    md5(text || '$NfcProbeComposed') AS raw_c_md5,
         |    md5(text || '$NfcProbeDecomposed') AS raw_d_md5,
         |    md5(nfc_normalize(text || '$NfcProbeComposed')) AS nfc_c_md5,
         |    md5(nfc_normalize(text || '$NfcProbeDecomposed')) AS nfc_d_md5
         |  FROM documents WHERE text IS NOT NULL)
         |ORDER BY doc_id""".stripMargin,

    "t20_oov_rate" ->
      """WITH nn AS (SELECT doc_id, lang, text FROM documents
        |  WHERE text IS NOT NULL),
        |v AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        |  FROM nn WHERE doc_id % 2 = 0),
        |held AS (SELECT lang, unnest(string_split(text, ' ')) AS w
        |  FROM nn WHERE doc_id % 2 <> 0),
        |j AS (SELECT lang, (v.w IS NULL) AS oov
        |  FROM held LEFT JOIN v ON held.w = v.w)
        |SELECT lang, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS oov_rate
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // every training epoch replayed as a chained CTE: new weights = old
    // + the misclassified integer gradient sums; all BIGINT, so the
    // engines agree exactly on the model, the margins and the labels
    "t21_perceptron_classify" ->
      s"""WITH f AS (SELECT doc_id,
         |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
         |         ELSE CAST(-1 AS BIGINT) END AS y,
         |    $perceptronFeatSelects
         |  FROM (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents
         |        WHERE text IS NOT NULL AND lang IS NOT NULL)),
         |e0 AS (SELECT ${(0 to PerceptronMarkers.size)
             .map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
         |e1 AS (${pEpochSql("e0")}),
         |e2 AS (${pEpochSql("e1")}),
         |e3 AS (${pEpochSql("e2")})
         |SELECT doc_id, y,
         |  $pMarginSql AS margin,
         |  CASE WHEN $pMarginSql > 0 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(-1 AS BIGINT) END AS predicted,
         |  (CASE WHEN $pMarginSql > 0 THEN CAST(1 AS BIGINT)
         |        ELSE CAST(-1 AS BIGINT) END) = y AS correct
         |FROM f CROSS JOIN e3 ORDER BY doc_id""".stripMargin,

    // pooled-expectation chi-square in the same fixed double shape;
    // totals enter via a cross-joined scalar CTE where Spark uses
    // driver literals — identical values (long→double is exact)
    "t23_token_drift" ->
      """WITH ta AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL AND lang = 'en'),
        |tb AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL AND lang <> 'en'),
        |ca AS (SELECT w, count(*) AS o1 FROM ta GROUP BY 1),
        |cb AS (SELECT w, count(*) AS o2 FROM tb GROUP BY 1),
        |j AS (SELECT COALESCE(ca.w, cb.w) AS w,
        |    CAST(COALESCE(o1, 0) AS BIGINT) AS o1,
        |    CAST(COALESCE(o2, 0) AS BIGINT) AS o2
        |  FROM ca FULL OUTER JOIN cb ON ca.w = cb.w),
        |n AS (SELECT CAST(sum(o1) AS BIGINT) AS n1,
        |    CAST(sum(o2) AS BIGINT) AS n2 FROM j),
        |sc AS (SELECT w, o1, o2,
        |    CAST(o1 + o2 AS DOUBLE) * CAST(n1 AS DOUBLE)
        |      / CAST(n1 + n2 AS DOUBLE) AS e1,
        |    CAST(o1 + o2 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      / CAST(n1 + n2 AS DOUBLE) AS e2
        |  FROM j CROSS JOIN n),
        |x AS (SELECT w, o1, o2,
        |    (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / e1
        |    + (CAST(o2 AS DOUBLE) - e2) * (CAST(o2 AS DOUBLE) - e2) / e2
        |      AS chi2
        |  FROM sc)
        |SELECT w, o1, o2, chi2, rank FROM (
        |  SELECT w, o1, o2, chi2,
        |    CAST(row_number() OVER (ORDER BY chi2 DESC, w) AS BIGINT)
        |      AS rank
        |  FROM x)
        |WHERE rank <= 50 ORDER BY rank""".stripMargin,

    // the normal-equation sums stay integer; slope/intercept/pred/
    // residual restate the operator's fixed double shapes verbatim
    "t22_ols_residuals" ->
      """WITH f AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS n_words
        |  FROM documents WHERE text IS NOT NULL),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(n_words) AS BIGINT) AS sy,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx,
        |    CAST(sum(n_chars * n_words) AS BIGINT) AS sxy
        |  FROM f),
        |m AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |    n, sx, sy FROM sums),
        |m2 AS (SELECT slope,
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS intercept FROM m)
        |SELECT doc_id, n_chars, n_words,
        |  intercept + slope * CAST(n_chars AS DOUBLE) AS pred,
        |  CAST(n_words AS DOUBLE)
        |    - (intercept + slope * CAST(n_chars AS DOUBLE)) AS residual
        |FROM f CROSS JOIN m2 ORDER BY doc_id""".stripMargin,

    "t16_bigram_lm_score" -> t16OracleSql,
    // merged == direct, hash-proven by the shared oracle
    "t18_bigram_lm_merge" -> t16OracleSql,

    "t17_nb_lang_classify" ->
      """WITH nn AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, lang, p.pos AS pos, p.w AS w FROM (
        |  SELECT doc_id, lang, unnest(list_transform(range(len(ws)),
        |      i -> struct_pack(pos := i, w := ws[i + 1]))) AS p
        |  FROM nn)),
        |cw AS (SELECT lang AS c, w, count(*) AS cw FROM toks GROUP BY 1, 2),
        |ctot AS (SELECT lang AS c, count(*) AS ctok FROM toks GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab FROM toks),
        |sc AS (SELECT doc_id, lang, c,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list_sort(list(struct_pack(p := pos, q := pr))),
        |        x -> x.q)), (acc, x) -> acc + x) AS score
        |  FROM (SELECT t.doc_id, t.lang, ct.c AS c, t.pos,
        |      CAST(COALESCE(cw.cw, 0) + 1 AS DOUBLE)
        |        / CAST(ct.ctok + vocab AS DOUBLE) AS pr
        |    FROM toks t CROSS JOIN ctot ct
        |      LEFT JOIN cw ON cw.c = ct.c AND cw.w = t.w
        |      CROSS JOIN v)
        |  GROUP BY 1, 2, 3),
        |pred AS (SELECT doc_id, lang, c AS predicted, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c ASC) AS rn
        |  FROM sc)
        |SELECT lang, predicted, count(*) AS n_docs,
        |  min(score) AS min_score, max(score) AS max_score
        |FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t24_tokenizer_fertility" ->
      """SELECT lang, n_docs, total_bytes, ws_tokens, bpe_tokens,
        |  CAST(bpe_tokens AS DOUBLE) / CAST(ws_tokens AS DOUBLE)
        |    AS fertility,
        |  CAST(total_bytes AS DOUBLE) / CAST(bpe_tokens AS DOUBLE)
        |    AS bytes_per_bpe
        |FROM (SELECT lang, count(*) AS n_docs,
        |    CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT)
        |      AS total_bytes,
        |    CAST(sum(CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT)) AS BIGINT) AS ws_tokens,
        |    CAST(sum(CAST(list_sum(list_transform(string_split(text, ' '),
        |      w -> ceil(length(w) / 4.0))) AS BIGINT)) AS BIGINT)
        |      AS bpe_tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1)
        |ORDER BY lang""".stripMargin,

    "t01_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(CAST(list_sum(list_transform(string_split(text, ' '), w -> ceil(length(w) / 4.0))) AS BIGINT)) AS BIGINT) AS total_bpe_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "t02_lang_id" ->
      s"""SELECT lang, predicted, count(*) AS n FROM (
         |  SELECT lang, CASE $langCases ELSE 'und' END AS predicted FROM (
         |    SELECT lang, $langBest AS best, $langScoreCols FROM (
         |      SELECT lang, $langScoreSelects
         |      FROM (SELECT lang, ' ' || text || ' ' AS p FROM documents))))
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t03_quality" ->
      s"""SELECT doc_id, n_chars, n_words,
         |  (n_chars - n_words + 1) / CAST(n_words AS DOUBLE) AS avg_word_len,
         |  stop_hits / CAST(n_words AS DOUBLE) AS stopword_ratio
         |FROM (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
         |    $stopHitsSql AS stop_hits
         |  FROM (SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents))
         |ORDER BY doc_id""".stripMargin,

    // bigram enumeration via the parallel-unnest list idiom; the
    // integer products associate left like the engine's, and the one
    // double division is shape-identical
    "t25_pmi_collocations" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |uni AS (SELECT unnest(ws) AS w FROM t),
        |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM uni),
        |bgl AS (SELECT
        |    list_transform(generate_series(1, len(ws) - 1), i -> ws[i]) AS w1s,
        |    list_transform(generate_series(1, len(ws) - 1), i -> ws[i + 1]) AS w2s
        |  FROM t WHERE len(ws) >= 2),
        |bg AS (SELECT unnest(w1s) AS w1, unnest(w2s) AS w2 FROM bgl),
        |mm AS (SELECT count(*) AS m FROM bg),
        |bc AS (SELECT w1, w2, count(*) AS c12 FROM bg
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |scored AS (SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
        |    CAST(c12 * n * n AS BIGINT) AS score_num,
        |    CAST(m * u1.c * u2.c AS BIGINT) AS score_den,
        |    CAST(c12 * n * n AS DOUBLE) / CAST(m * u1.c * u2.c AS DOUBLE)
        |      AS pmi_ratio
        |  FROM bc CROSS JOIN nn CROSS JOIN mm
        |    JOIN uc u1 ON u1.w = bc.w1 JOIN uc u2 ON u2.w = bc.w2)
        |SELECT w1, w2, c12, score_num, score_den, pmi_ratio FROM scored
        |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 50""".stripMargin,

    "t05_top_terms" ->
      """SELECT lang, word, freq, rank FROM (
        |  SELECT lang, word, freq,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY freq DESC, word) AS BIGINT) AS rank
        |  FROM (SELECT lang, word, count(*) AS freq FROM (
        |          SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
        |        GROUP BY 1, 2)) q
        |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    "t06_tfidf_topk" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
        |df AS (SELECT word, count(*) AS df FROM (SELECT DISTINCT doc_id, word FROM words) GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |scored AS (SELECT t.doc_id, t.word, t.tf, d.df, t.tf * nn.n / d.df AS score
        |  FROM tf t JOIN df d USING (word) CROSS JOIN nn),
        |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, word) AS BIGINT) AS rank FROM scored)
        |SELECT doc_id, word, tf, df, score FROM ranked
        |WHERE rank <= 1 AND doc_id < 100 ORDER BY doc_id""".stripMargin,

    "t07_filter_funnel" ->
      s"""SELECT lang, verdict, count(*) AS n_docs FROM (
         |  SELECT lang, CASE
         |      WHEN n_words < 20 THEN '1_too_short'
         |      WHEN stop_hits / CAST(n_words AS DOUBLE) < 0.03 THEN '2_low_stopword'
         |      WHEN (CASE $langCases ELSE 'und' END) <> 'en' THEN '3_non_english'
         |      ELSE '0_kept' END AS verdict
         |  FROM (
         |    SELECT lang, n_words, stop_hits, $langBest AS best, $langScoreCols
         |    FROM (
         |      SELECT lang,
         |        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
         |        $stopHitsSql AS stop_hits,
         |        $langScoreSelects
         |      FROM (SELECT lang, text, ' ' || text || ' ' AS p FROM documents))))
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t04_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp_md5,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT), list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp_rolling
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t09_quality_rules" -> {
      val fails = qualityFailSqls
      val failSums = fails.map { case (n, c) =>
        s"CAST(sum(CASE WHEN $c THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_$n"
      }.mkString(",\n  ")
      val passCond = fails.map { case (_, c) => s"NOT ($c)" }.mkString(" AND ")
      s"""SELECT source, count(*) AS n_docs,
         |  $failSums,
         |  CAST(sum(CASE WHEN $passCond THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         |FROM (
         |  SELECT source,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
         |    $stopHitsSql AS stop_hits
         |  FROM (SELECT source, text, ' ' || text || ' ' AS p FROM documents))
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // encode replay: identical (freq desc, token) id assignment,
    // identical per-doc digests
    "t11_vocab_encode" ->
      """WITH toks AS (SELECT doc_id, t.w
        |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
        |  WHERE text IS NOT NULL AND length(t.w) > 0),
        |vocab AS (SELECT w,
        |    row_number() OVER (ORDER BY count(*) DESC, w) AS token_id
        |  FROM toks GROUP BY w)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(token_id) AS BIGINT) AS sum_ids,
        |  min(token_id) AS min_id, max(token_id) AS max_id
        |FROM toks JOIN vocab USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t12_bpe_merges" -> {
      val union = (1 to graft.ops.Bpe.DefaultMerges).map { i =>
        s"SELECT CAST($i AS BIGINT) AS step, l AS left_sym, r AS right_sym, l || r AS merged, f AS pair_freq FROM b$i"
      }.mkString("\nUNION ALL\n")
      s"""${bpeCtes(graft.ops.Bpe.DefaultMerges)}
         |SELECT * FROM (
         |$union
         |) ORDER BY step""".stripMargin
    },

    "t13_bpe_encode" -> {
      val k = graft.ops.Bpe.DefaultMerges
      s"""${bpeCtes(k)},
         |toks AS (SELECT doc_id, t.w AS w
         |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
         |  WHERE text IS NOT NULL AND length(t.w) > 0 AND t.w NOT LIKE '%@%'),
         |syms AS (SELECT w, CAST(len(string_split(repr, '@')) - 2 AS BIGINT) AS n_syms FROM w$k)
         |SELECT doc_id, count(*) AS n_words, CAST(sum(n_syms) AS BIGINT) AS n_symbols,
         |  max(n_syms) AS max_word_syms,
         |  CAST(sum(n_syms) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_syms_per_word
         |FROM toks JOIN syms USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "t10_rarity" ->
      s"""WITH docs2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |  WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 2),
         |grams AS (SELECT DISTINCT doc_id,
         |    unnest(${graft.functions.TextHashExpressions.bigramFoldSql("ws")}) AS g
         |  FROM docs2),
         |dfr AS (SELECT g, count(*) AS df FROM grams GROUP BY 1)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(df) AS BIGINT) AS df_sum,
         |  CAST(sum(df) AS BIGINT) / CAST(count(*) AS DOUBLE) AS rarity
         |FROM grams JOIN dfr USING (g)
         |WHERE doc_id % 5 = 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t08_repetition" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |freqs AS (SELECT doc_id, w, count(*) AS f FROM words GROUP BY 1, 2),
        |agg AS (SELECT doc_id, w, f,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY f DESC, w ASC) AS rn,
        |    CAST(sum(f) OVER (PARTITION BY doc_id) AS BIGINT) AS n_words,
        |    CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_distinct
        |  FROM freqs)
        |SELECT doc_id, n_words, n_distinct, w AS top_word,
        |  CAST(f AS BIGINT) AS top_freq,
        |  f / CAST(n_words AS DOUBLE) AS repetition_ratio
        |FROM agg WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // the word-graph derivation (tokenize → qualify → adjacency →
    // symmetrize) feeding the SHARED g01 PageRank ladder — any drift
    // between engine and oracle PageRank breaks g01/g06/t31 together
    "t31_textrank_keywords" ->
      s"""WITH nn AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |toks AS (SELECT doc_id, p.pos AS pos, lower(p.w) AS w FROM (
         |  SELECT doc_id, unnest(list_transform(range(len(ws)),
         |      i -> struct_pack(pos := i, w := ws[i + 1]))) AS p
         |  FROM nn)),
         |fw AS (SELECT doc_id, pos, w FROM toks
         |  WHERE length(w) >= 4 AND regexp_matches(w, '^[a-z]+$$')),
         |pr AS (SELECT doc_id, w,
         |    lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS pw
         |  FROM fw),
         |ed AS (SELECT pw AS src, w AS dst FROM pr
         |  WHERE pw IS NOT NULL AND pw <> w),
         |e AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed)),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |od AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |${GraphQueries.pagerankRoundsSql(5)}
         |SELECT kw_rank, word, pagerank FROM (
         |  SELECT node AS word, r AS pagerank,
         |    CAST(row_number() OVER (ORDER BY r DESC, node) AS BIGINT)
         |      AS kw_rank
         |  FROM r5)
         |WHERE kw_rank <= 20 ORDER BY kw_rank""".stripMargin,

    // runs counted by the collapse-to-'#' length-difference identity;
    // DuckDB regexp_replace needs the explicit 'g' flag to match
    // Spark's replace-all default
    "t32_readability" ->
      """WITH d AS (SELECT doc_id, text,
        |    regexp_replace(text, '[.!?]+', '#', 'g') AS s1,
        |    regexp_replace(lower(text), '[aeiouy]+', '#', 'g') AS v1
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS n_words,
        |    greatest(CAST(length(s1) - length(replace(s1, '#', ''))
        |      AS BIGINT), 1) AS n_sentences,
        |    CAST(length(v1) - length(replace(v1, '#', ''))
        |      AS BIGINT) AS n_syllables
        |  FROM d)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST((39 * n_words) // n_sentences
        |    + (1180 * n_syllables) // greatest(n_words, 1) - 1559
        |    AS BIGINT) AS fk_grade_x100
        |FROM c ORDER BY doc_id""".stripMargin,
  )
}
