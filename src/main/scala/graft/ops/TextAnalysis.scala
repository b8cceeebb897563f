package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the documents table (SURVEY §2C): token
  * counting, language identification, quality scoring, fingerprinting.
  * All pure column expressions (codegen'd, no UDFs) and engine-portable:
  * substring-occurrence counts use the length-difference identity rather
  * than regex, so the DuckDB oracle computes bit-identical results
  * without cross-dialect regex risk.
  */
object TextAnalysis {

  /** Occurrences of literal `needle` in `c` via the length-difference
    * identity: (len(c) - len(replace(c, needle, ''))) / len(needle).
    * Non-overlapping, left-to-right — same in every engine.
    */
  def occurrencesLit(c: Column, needle: String): Column =
    ((length(c) - length(replace(c, lit(needle), lit("")))) / needle.length).cast("long")

  /** Whitespace token count for single-space-joined text. */
  def wsTokenCount(c: Column): Column =
    (occurrencesLit(c, " ") + 1).cast("long")

  /** BPE-ish subword count: ceil(len/4) per whitespace word — a
    * deterministic stand-in for a byte-pair vocabulary with max merge
    * length 4 (real BPE would be a dictionary lookup with the same
    * per-word shape).
    */
  def bpeTokenCount(words: Column): Column =
    aggregate(words, lit(0L), (acc, w) => acc + ceil(length(w) / 4.0).cast("long"))

  /** Language-marker scoring: count occurrences of each marker word and
    * pick the arg-max language (ties -> lexicographically first). A
    * deterministic n-gram/stopword heuristic whose machinery — not its
    * accuracy on synthetic text — is the operator under test.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " nicht "),
    "en" -> Seq(" the ", " a ", " is "),
    "es" -> Seq(" el ", " los ", " una "),
    "fr" -> Seq(" le ", " les ", " une "),
    "zh" -> Seq(" de5 ", " shi4 ", " le5 "))

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => occurrencesLit(padded, m)).reduce(_ + _)
    }
  }

  /** Predicted language = arg-max marker score, ties to the
    * lexicographically first language (stable across engines).
    */
  def predictedLang(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Shared with the oracle-SQL builders in graft.queries. */
  private[graft] val stopwords = Seq(" the ", " a ", " of ", " and ", " is ")

  /** Mean word length of single-space-joined text — ONE definition
    * shared by t03's avg_word_len and t09's word_len rule (they must
    * never disagree about the same document): total word chars =
    * chars - (words - 1) separators, over the word count. A single
    * int/int double division (IEEE-deterministic).
    */
  def meanWordLen(text: Column): Column = {
    val words = wsTokenCount(text)
    (length(text).cast("long") - words + 1) / words.cast("double")
  }

  /** Quality signals: exact integer counts + deterministic ratios
    * (single int/int divisions).
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val padded = concat(lit(" "), text, lit(" "))
    val words = wsTokenCount(text)
    val chars = length(text).cast("long")
    val stopHits = stopwords.map(m => occurrencesLit(padded, m)).reduce(_ + _)
    Seq(
      chars.as("n_chars"),
      words.as("n_words"),
      meanWordLen(text).as("avg_word_len"),
      (stopHits / words.cast("double")).as("stopword_ratio"))
  }

  /** Gopher/C4-style rule-based quality filters, each an independent
    * per-row predicate (true = the document FAILS the rule). All
    * comparisons are exact-integer (the stopword ratio is cross-
    * multiplied rather than divided) except the mean-word-length band,
    * whose operands are single int/int divisions — IEEE-deterministic,
    * so the DuckDB oracle replays every verdict. Thresholds are tuned
    * to the synthetic corpus (words ~10..99, mean word length ~4.2-4.8)
    * so each rule fires on a real fraction of documents; production
    * values differ, the machinery doesn't.
    *
    * Rule order matters only for first-fail attribution (t07 does
    * that); here each rule is reported independently — the filter-
    * TUNING profile view (how much each rule would kill on its own).
    */
  val RuleMinWords = 25
  val RuleMaxWords = 90
  val RuleWordLenLo = 4.3
  val RuleWordLenHi = 4.7
  val RuleStopNum = 3    // stopword ratio floor = RuleStopNum / RuleStopDen
  val RuleStopDen = 100

  val qualityRules: Seq[(String, Column => Column)] = Seq(
    // too few words to be a useful training document
    "short" -> ((text: Column) => wsTokenCount(text) < RuleMinWords),
    // suspiciously long (boilerplate/concatenation artifacts)
    "long" -> ((text: Column) => wsTokenCount(text) > RuleMaxWords),
    // mean word length outside the natural-language band
    "word_len" -> ((text: Column) =>
      meanWordLen(text) < RuleWordLenLo || meanWordLen(text) > RuleWordLenHi),
    // stopword-starved: stop_hits / n_words < RuleStopNum/RuleStopDen,
    // cross-multiplied to stay in exact integers
    "stopword" -> { (text: Column) =>
      val padded = concat(lit(" "), text, lit(" "))
      val hits = stopwords.map(m => occurrencesLit(padded, m)).reduce(_ + _)
      hits * RuleStopDen < wsTokenCount(text) * RuleStopNum
    })

  /** Content fingerprint: md5 of normalized text (lower + trim) — the
    * exact-dedup key.
    */
  def fingerprintMd5(text: Column): Column = md5(lower(trim(text)))

  /** Polynomial rolling hash mod 1e9+7 over characters — a simhash/
    * shingling-style fingerprint computed as a left fold (deterministic,
    * matches DuckDB's `list_reduce` fold).
    */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)

  /** Token-distribution drift between two corpora (t23): per-token
    * chi-square contribution against the pooled expectation — the
    * train/serve (or yesterday/today) drift monitor every corpus
    * pipeline runs before a model ships. No logs (the KL form needs
    * `ln`, which isn't identically rounded across engines): chi-square
    * is +, −, ×, ÷ on integer-derived doubles in a fixed shape, so the
    * statistic is engine-exact, and it ranks drifted tokens the same
    * way KL would for filtering purposes.
    *
    * Scale shape: two map-side-combined token counts, one full-outer
    * merge on the token key (vocabulary-sized), two scalar totals, and
    * a per-token projection; the only sort is the top-k window over
    * the vocabulary relation. Counts merge algebraically across
    * batches (the t18 rule), so the drift monitor is incrementally
    * maintainable. Returns the k most drifted tokens:
    * (w, o1, o2, chi2, rank), ties broken on the token.
    */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String,
      k: Int): DataFrame = {
    def counts(df: DataFrame, name: String): DataFrame =
      df.select(explode(split(col(textCol), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as(name))
    val joined = counts(a, "o1").join(counts(b, "o2"), Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("o1"), lit(0L)).as("o1"),
        coalesce(col("o2"), lit(0L)).as("o2"))
      .localCheckpoint(true) // totals action + the scored pass
    val tot = joined.agg(sum("o1"), sum("o2")).head()
    val (n1, n2) = (tot.getLong(0), tot.getLong(1))
    require(n1 > 0 && n2 > 0,
      s"tokenDrift: both corpora must be non-empty (n1=$n1, n2=$n2)")
    val t = (col("o1") + col("o2")).cast("double")
    val e1 = t * lit(n1.toDouble) / lit((n1 + n2).toDouble)
    val e2 = t * lit(n2.toDouble) / lit((n1 + n2).toDouble)
    val o1d = col("o1").cast("double")
    val o2d = col("o2").cast("double")
    val chi2 = (o1d - e1) * (o1d - e1) / e1 + (o2d - e2) * (o2d - e2) / e2
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("chi2").desc, col("w"))
    joined.withColumn("chi2", chi2)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Per-source encoding-anomaly profile — the decode-sanity gate a
    * pretraining pipeline runs BEFORE any text operator trusts its
    * input: bare C0 control characters (minus \t \n \r, which are
    * legitimate text) betray binary-as-text and transport mangling;
    * U+FFFD replacement characters are the tombstones a lossy decode
    * leaves behind (every one is a byte sequence some upstream reader
    * could not interpret). Both are counted per document as a
    * length-difference after codegen'd regexp/replace stripping —
    * pure per-row column math, no shuffle until the one map-side-
    * combined per-source rollup. NULL text contributes to n_docs but
    * to no anomaly count (stated, not inherited: a NULL length would
    * silently vanish from a bare sum in both engines anyway — the
    * coalesce makes the rule explicit).
    *
    * Returns (source, n_docs, n_flagged, ctrl_chars, repl_chars,
    * flagged_rate) — rate is the one int/int double division.
    */
  def encodingProfile(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val t = col(textCol)
    val ctrl =
      (length(t) - length(regexp_replace(t,
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long")
    val repl =
      (length(t) - length(regexp_replace(t, "\uFFFD", ""))).cast("long")
    docs.select(col(sourceCol).as("source"), ctrl.as("__c"), repl.as("__r"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__c") + col("__r") > 0, 1L).otherwise(0L))
          .as("n_flagged"),
        sum(coalesce(col("__c"), lit(0L))).as("ctrl_chars"),
        sum(coalesce(col("__r"), lit(0L))).as("repl_chars"))
      .withColumn("flagged_rate",
        col("n_flagged") / col("n_docs").cast("double"))
  }

  /** TextRank keyword extraction (t31, Mihalcea–Tarau 2004): build the
    * word co-occurrence graph — an undirected edge between every pair
    * of ADJACENT qualifying words (lowercased, all-ASCII-alpha, length
    * ≥ `minLen`; adjacency in the FILTERED sequence, the standard
    * sliding-window-2 formulation) — and rank words by
    * [[Graph.pageRank]]'s deterministic integer PageRank. The top
    * words by rank are the corpus's keywords: PageRank over
    * co-occurrence is exactly the "centrality = importance" transfer
    * TextRank made famous, and because the house PageRank is
    * integer-exact, the keyword list (and every rank value) replays
    * bit-for-bit in the oracle's unrolled SQL.
    *
    * Scale shape: tokenization is one generated pass; the filtered
    * re-sequencing window partitions per document (never global); the
    * edge relation is ≤ one row per token before the distinct;
    * PageRank's supersteps are the g01 equi-join + integer-sum shape
    * on the (bounded) distinct-vocabulary graph — at 100 TB the word
    * graph is millions of nodes against trillions of tokens, so every
    * shuffle past tokenization is vocabulary-sized, not corpus-sized.
    *
    * Output: (kw_rank 1..topK, word, pagerank) — tie-break on word.
    */
  def textRankKeywords(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 4, iterations: Int = 5, topK: Int = 20): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w0")))
      .select(col("__doc"), col("__pos"), lower(col("__w0")).as("__w"))
      .where(length(col("__w")) >= minLen &&
        col("__w").rlike("^[a-z]+$"))
    val w = Window.partitionBy(col("__doc")).orderBy(col("__pos"))
    val edges = words.withColumn("__prev", lag(col("__w"), 1).over(w))
      .where(col("__prev").isNotNull && col("__prev") =!= col("__w"))
      .select(col("__prev").as("src"), col("__w").as("dst"))
    val und = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val ranked = Graph.pageRank(und, iterations)
    // top-k via orderBy().limit() — planned as TakeOrderedAndProject
    // (the t25 discipline), so no vocabulary-sized single-partition
    // window sort reaches the plan; the row_number only numbers the
    // ≤ topK surviving rows
    val wTop = Window.orderBy(col("pagerank").desc, col("node"))
    ranked.orderBy(col("pagerank").desc, col("node")).limit(topK)
      .withColumn("kw_rank", row_number().over(wTop).cast("long"))
      .select(col("kw_rank"), col("node").as("word"), col("pagerank"))
  }

  /** Integer readability profile (t32): Flesch–Kincaid grade level in
    * exact integer hundredths — 0.39·(words/sentences) +
    * 11.8·(syllables/word) − 15.59, scaled ×100 with integer division
    * at each term so the value replays bit-for-bit in any engine
    * (the house no-transcendental discipline; float readability
    * scores differ in the last ulp across libraries and are
    * unhashable). Syllables are approximated as maximal vowel runs
    * ([aeiouy]+ on the lowercased text) — the standard cheap
    * heuristic, stated as part of the metric's semantics; sentences
    * as maximal [.!?] runs, floored at 1 so fragments don't divide by
    * zero. One generated pass per document, no shuffle at all — the
    * quality-scoring shape (t03) with a grade formula on top.
    *
    * Returns (id, n_words, n_sentences, n_syllables, fk_grade_x100).
    */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val lowered = lower(t)
    // count of maximal runs: collapse each run to one '#' then count
    // by the length-difference identity (both engines agree on regex
    // '+' greediness; '#' never appears in the corpus alphabet checks)
    def runs(c: Column, pattern: String): Column = {
      val marked = regexp_replace(c, pattern, "#")
      (length(marked) - length(replace(marked, lit("#"), lit("")))).cast("long")
    }
    docs.select(col(idCol),
        wsTokenCount(t).as("n_words"),
        greatest(runs(t, "[.!?]+"), lit(1L)).as("n_sentences"),
        runs(lowered, "[aeiouy]+").as("n_syllables"))
      .withColumn("fk_grade_x100",
        expr("(39 * n_words) div n_sentences + " +
          "(1180 * n_syllables) div greatest(n_words, 1) - 1559"))
  }
}
