package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over the corpus (SURVEY §2C text analysis): BM25
  * scoring through the inverted-index relations t06/t10 already
  * maintain (per-doc term frequencies + corpus document frequencies) —
  * the "find the training documents about X" query every corpus tool
  * grows, and the relevance-ranked complement of t06's per-doc salience
  * view.
  *
  * DETERMINISM (the t06 house rules, extended to a summed score):
  *  - no `ln()`: libm is not identically rounded across engines, so the
  *    idf factor is the monotone rational (N − df + 0.5) / (df + 0.5)
  *    — Robertson's idf with the log dropped. Rankings for a fixed
  *    query differ from textbook BM25 only by the log's compression of
  *    score GAPS between terms; per-term ordering is preserved.
  *  - float SUMS are order-dependent, so per-term contributions are
  *    summed by an ordered list fold — collect (term, contrib), sort
  *    by term, fold left from 0.0 — giving both engines the identical
  *    association ((0 + c₁) + c₂) + … The oracle states the same fold
  *    with list_sort + list_reduce.
  *  - every arithmetic step is +, −, ×, ÷ on doubles in the same
  *    left-associated shape on both sides; IEEE 754 makes those
  *    bit-reproducible given identical association.
  *
  * Scale shape: the INDEX is the persisted artifact — [[buildIndex]]'s
  * two map-side-combined groupBys run once per ingest batch, and
  * [[mergeIndex]] folds a batch's index into the snapshot with one
  * term-keyed sum (df) and appends (tf, lens): refresh cost is
  * proportional to the BATCH, the corpus text is never rescanned
  * (q42's algebraic-maintenance rule applied to search). A query then
  * touches only its terms' posting rows via an equi-join on term
  * (broadcast: the query relation is user-typed, always tiny), and the
  * top-k window partitions by query.
  */
object Search {

  /** BM25 k1 (term-frequency saturation) and b (length normalization),
    * the standard defaults, shared with the t14 oracle.
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** The inverted-index relations + corpus scalars BM25 needs —
    * column names are fixed (`id`, `term`, `tf`, `df`, `dl`) so merged
    * and freshly-built indexes compose. At 100 TB, `tf`/`df`/`lens`
    * are the parquet tables a deployment persists and incrementally
    * maintains; `nDocs`/`totalTokens` ride in a 1-row stats sidecar.
    */
  final case class TextIndex(tf: DataFrame, df: DataFrame, lens: DataFrame,
      nDocs: Long, totalTokens: Long)

  /** Build the index over `docs` — ONE tokenize pass: the exploded
    * token relation is eagerly checkpointed (the prefixFilterPairs
    * discipline) and every index relation derives from it — tf and df
    * by groupBy, lens as the per-doc token count (`split` always
    * yields ≥ 1 element, so lens covers every indexed doc), and the
    * corpus scalars from lens. Tokenization is `split(text, ' ')`, the
    * t06 contract the oracle replays with string_split. Null-text rows
    * are excluded from the index entirely (they have no terms; both
    * engines state the same filter).
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): TextIndex = {
    val words = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
      .localCheckpoint(true)
    val tf = words.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = words.select("id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val lens = words.groupBy("id").agg(count(lit(1)).as("dl"))
    val st = lens.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("toks")).head()
    TextIndex(tf, df, lens, st.getLong(0), st.getLong(1))
  }

  /** Algebraic index merge for DISJOINT document sets (a snapshot +
    * a new batch): tf and lens append, df sums per term, the scalars
    * add — so the merged index is EXACTLY [[buildIndex]] of the union
    * (spec- and oracle-proven via t15 == t14), at batch cost. Callers
    * ingesting overlapping doc ids must exact-dedup first (d09 /
    * PipelineStreams.settleBatch is the settle step for that).
    */
  def mergeIndex(a: TextIndex, b: TextIndex): TextIndex = {
    val df = a.df.withColumnRenamed("df", "__a")
      .join(b.df.withColumnRenamed("df", "__b"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("__a"), lit(0L)) + coalesce(col("__b"), lit(0L))).as("df"))
    TextIndex(a.tf.unionByName(b.tf), df, a.lens.unionByName(b.lens),
      a.nDocs + b.nDocs, a.totalTokens + b.totalTokens)
  }

  /** Top-`k` documents per query by deterministic BM25 (see object
    * doc) over a prebuilt [[TextIndex]]. `queries` is the
    * (qidCol, termCol) relation — one row per query term; duplicate
    * terms within a query must be pre-deduped (they would
    * double-count, as in any bag-of-terms BM25).
    *
    * Returns (qidCol, id, rank, score, n_terms_hit).
    */
  def bm25FromIndex(ix: TextIndex, queries: DataFrame,
      qidCol: String, termCol: String, k: Int = 10): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    require(ix.nDocs > 0, "bm25 needs a non-empty corpus")
    val avgdl = ix.totalTokens.toDouble / ix.nDocs
    // per-(query, doc, term) contribution — all shapes left-associated
    // identically to the oracle's SQL
    val contrib =
      ((lit(ix.nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(Bm25K1 + 1.0)) /
        (col("tf") + lit(Bm25K1) *
          (lit(1.0) - lit(Bm25B) + lit(Bm25B) * col("dl") / lit(avgdl)))
    val scored = queries
      .select(col(qidCol), col(termCol).as("term"))
      .join(ix.tf, "term")
      .join(ix.df, "term")
      .join(ix.lens, "id")
      .withColumn("__c", contrib)
      .groupBy(col(qidCol), col("id"))
      .agg(sort_array(collect_list(struct(col("term"), col("__c")))).as("__cs"),
        count(lit(1)).as("n_terms_hit"))
      .withColumn("score",
        aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("__c")))
      .drop("__cs")
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qidCol), col("id"), col("rank"), col("score"), col("n_terms_hit"))
  }

  /** One-shot convenience: build + query, renaming `id` back to the
    * caller's `idCol`.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, termCol: String,
      k: Int = 10): DataFrame =
    bm25FromIndex(buildIndex(docs, idCol, textCol), queries, qidCol, termCol, k)
      .withColumnRenamed("id", idCol)
}
