package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring (SURVEY §2C text
  * analysis): the "perplexity filter" every LLM-data pipeline runs
  * (CCNet scores documents with a KenLM n-gram model; Gopher keeps the
  * rule-based complement t09 implements). The model here is the
  * classic add-one-smoothed bigram LM estimated FROM the corpus
  * itself: fluent, in-distribution text scores high; shuffled or
  * out-of-distribution junk scores low. No external model artifact is
  * needed — the "model" is two count relations this module builds, the
  * same persisted-index discipline as [[Search.buildIndex]].
  *
  * DETERMINISM (the t14 house rules):
  *  - no `ln()`/`exp()`: libm rounding differs across engines, so the
  *    per-position quantity is the smoothed conditional PROBABILITY
  *    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V) itself, not its log —
  *    the deterministic "log dropped" variant (the [[Search]] idf
  *    precedent). Relative ordering of documents under the mean-prob
  *    score tracks the mean-log score closely for filtering purposes;
  *    the compression of gaps is the only difference, stated here.
  *  - float sums are order-dependent, so per-position probabilities
  *    are summed by an ordered list fold — collect (pos, p), sort by
  *    pos, fold left from 0.0 — the identical association on both
  *    engines; the oracle states the same fold with
  *    list_sort + list_reduce.
  *  - every step is +, −, ×, ÷ on doubles in the same left-associated
  *    shape; IEEE 754 then makes the score bit-reproducible.
  *
  * Scale shape: the unigram and bigram count relations are the
  * persisted model (vocabulary-sized and bigram-vocabulary-sized —
  * orders of magnitude smaller than the corpus; both from ONE
  * tokenize pass via map-side-combined groupBys). Scoring joins each
  * document's bigrams to the two count relations by key (shuffle on
  * the bigram/unigram key only; the document text never re-scans) and
  * folds per document. Incremental maintenance is the q42/t15
  * algebraic rule: per-batch counts SUM, so tomorrow's model is
  * yesterday's counts + the batch's counts — [[Search.mergeIndex]]'s
  * pattern applied to LM counts.
  */
object LangModel {

  /** The bigram-LM model relations + scalars. `uni` is
    * (w1 string, cu long); `bi` is (w1, w2, cb long); `vocab` is the
    * distinct-word count V used as the add-one smoothing denominator
    * mass.
    */
  final case class BigramModel(uni: DataFrame, bi: DataFrame, vocab: Long)

  /** Train the model: one tokenize pass (checkpointed — the
    * [[Search.buildIndex]] discipline), unigram counts over every
    * token position, bigram counts over every adjacent pair, V =
    * distinct words. Tokenization is `split(text, ' ')` — the t06/t14
    * contract the oracle replays with string_split. Null texts carry
    * no tokens and are excluded (both engines state the filter).
    */
  def train(docs: DataFrame, textCol: String): BigramModel = {
    val ws = docs.where(col(textCol).isNotNull)
      .select(split(col(textCol), " ").as("__ws"))
      .localCheckpoint(true)
    val uni = ws.select(explode(col("__ws")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val bi = ws
      .select(explode(arrays_zip(
        slice(col("__ws"), lit(1), size(col("__ws")) - 1),
        slice(col("__ws"), lit(2), size(col("__ws")) - 1))).as("__p"))
      .select(col("__p.0").as("w1"), col("__p.1").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val v = uni.count()
    BigramModel(uni, bi, v)
  }

  /** Score every non-null-text document under `model`: per adjacent
    * word pair at position i, p_i = (c(w1,w2)+1) / (c(w1)+V) — both
    * counts coalesced to 0 for unseen events — summed position-ordered.
    * Returns (idCol, n_bigrams long, lm_score double,
    * mean_prob double — lm_score/n_bigrams, NULL for sub-bigram docs).
    *
    * Sub-bigram documents (0 or 1 words) have no evidence either way:
    * they surface with n_bigrams 0, lm_score 0.0, mean_prob NULL, and
    * the caller's quality gate decides (t09's length rules already
    * kill them in the composed pipeline).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: BigramModel): DataFrame = {
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
    val pairs = base
      .select(col(idCol), posexplode(arrays_zip(
        slice(col("__ws"), lit(1), size(col("__ws")) - 1),
        slice(col("__ws"), lit(2), size(col("__ws")) - 1))))
      .select(col(idCol), col("pos"),
        col("col.0").as("w1"), col("col.1").as("w2"))
    val p = pairs
      .join(model.bi, Seq("w1", "w2"), "left")
      .join(model.uni, Seq("w1"), "left")
      .withColumn("__p",
        (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("cu"), lit(0L)) + lit(model.vocab)).cast("double"))
    val scored = p.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("__p")))).as("__ps"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("lm_score",
        aggregate(col("__ps"), lit(0.0), (acc, x) => acc + x.getField("__p")))
      .drop("__ps")
    base.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
      .withColumn("mean_prob",
        when(col("n_bigrams") > 0, col("lm_score") / col("n_bigrams").cast("double")))
  }

  /** Algebraic model merge for DISJOINT document sets (a snapshot + a
    * new batch): bigrams never cross document boundaries, so the
    * union's counts are exactly the per-part counts summed per key, and
    * the merged vocabulary is the merged unigram relation's row count —
    * [[Search.mergeIndex]]'s rule applied to LM counts, making the
    * model incrementally maintainable at batch cost (t18 shares t16's
    * oracle, so merged == direct is hash-proven).
    */
  def merge(a: BigramModel, b: BigramModel): BigramModel = {
    def sumBy(x: DataFrame, y: DataFrame, keys: Seq[String], cnt: String): DataFrame =
      x.withColumnRenamed(cnt, "__a")
        .join(y.withColumnRenamed(cnt, "__b"), keys, "full_outer")
        .select(keys.map(col) :+
          (coalesce(col("__a"), lit(0L)) + coalesce(col("__b"), lit(0L))).as(cnt): _*)
    val uni = sumBy(a.uni, b.uni, Seq("w1"), "cu")
    val bi = sumBy(a.bi, b.bi, Seq("w1", "w2"), "cb")
    BigramModel(uni, bi, uni.count())
  }

  /** Multinomial Naive-Bayes-style class scoring, trained on the
    * corpus's own labels and applied back to it (the fasttext-style
    * classifier shape every corpus pipeline runs for language/domain
    * ID — t02's fixed marker heuristic upgraded to a TRAINED model).
    * Per class c and token w, the add-one-smoothed conditional is
    * p̂(w|c) = (count(w,c)+1)/(tokens(c)+V); a document's class score
    * is the position-ordered fold sum of p̂(w_i|c) (the log dropped —
    * deterministic variant per the house rules; no prior term, stated:
    * with sum scoring a prior would enter additively per position,
    * compressing nothing), and the prediction is the top class by
    * (score desc, class asc) — a per-document window, never global.
    *
    * Scale shape: the model is the (class, w) count relation —
    * classes × vocab rows from one map-side-combined groupBy over the
    * SAME tokenize pass that scores (checkpointed once). Scoring
    * cross-joins each token position with the (tiny, broadcast) class
    * list and equi-joins the model — data-sized shuffles only on the
    * (class, w) key and the per-doc fold. Counts merge algebraically
    * across batches (q42/t15).
    *
    * Returns (idCol, classCol, predicted, best_score) per non-null-text
    * document.
    */
  def nbSelfClassify(docs: DataFrame, idCol: String, textCol: String,
      classCol: String): DataFrame = {
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), col(classCol), split(col(textCol), " ").as("__ws"))
    val toks = base
      .select(col(idCol), col(classCol), posexplode(col("__ws")))
      .withColumnRenamed("col", "w")
      .localCheckpoint(true)
    val cw = toks.groupBy(col(classCol).as("__c"), col("w"))
      .agg(count(lit(1)).as("cw"))
    val ctot = toks.groupBy(col(classCol).as("__c"))
      .agg(count(lit(1)).as("ctok"))
    val vocab = toks.select("w").distinct().count()
    val classes = ctot.select(col("__c"), col("ctok"))
    val scored = toks.select(col(idCol), col(classCol), col("pos"), col("w"))
      .join(broadcast(classes), lit(true))
      .join(cw, Seq("__c", "w"), "left")
      .withColumn("__p",
        (coalesce(col("cw"), lit(0L)) + lit(1L)).cast("double") /
          (col("ctok") + lit(vocab)).cast("double"))
      .groupBy(col(idCol), col(classCol), col("__c"))
      .agg(sort_array(collect_list(struct(col("pos"), col("__p")))).as("__ps"))
      .withColumn("score",
        aggregate(col("__ps"), lit(0.0), (acc, x) => acc + x.getField("__p")))
      .drop("__ps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("__c").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col(classCol), col("__c").as("predicted"),
        col("score").as("best_score"))
  }

  /** Train on the corpus and score it (the self-scored quality-filter
    * form CCNet uses when no external LM exists yet). Unlike
    * train-then-score over two relations, this tokenizes the corpus
    * ONCE: the positioned pair relation both feeds the bigram counts
    * and carries the per-doc positions for scoring (train+score share
    * the scan the way d14 shares its shingle pass).
    */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
      .localCheckpoint(true)
    val uni = base.select(explode(col("__ws")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val pairs = base
      .select(col(idCol), posexplode(arrays_zip(
        slice(col("__ws"), lit(1), size(col("__ws")) - 1),
        slice(col("__ws"), lit(2), size(col("__ws")) - 1))))
      .select(col(idCol), col("pos"),
        col("col.0").as("w1"), col("col.1").as("w2"))
      .localCheckpoint(true)
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val vocab = uni.count()
    val p = pairs
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .withColumn("__p",
        (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("cu"), lit(0L)) + lit(vocab)).cast("double"))
    val scored = p.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("__p")))).as("__ps"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("lm_score",
        aggregate(col("__ps"), lit(0.0), (acc, x) => acc + x.getField("__p")))
      .drop("__ps")
    base.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
      .withColumn("mean_prob",
        when(col("n_bigrams") > 0, col("lm_score") / col("n_bigrams").cast("double")))
  }
}
