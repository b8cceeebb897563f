package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape: tf and df are the two map-side-combined groupBys any
  * index build pays (and what a 100 TB deployment persists — probe
  * THEM, not the text); a query then touches only its terms' posting
  * rows via an equi-join on term (broadcast: the query relation is
  * user-typed, always tiny), and the top-k window partitions by query.
  * Corpus text is scanned once for the index, never per query.
  */
object Search {

  /** BM25 k1 (term-frequency saturation) and b (length normalization),
    * the standard defaults, shared with the t14 oracle.
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** Top-`k` documents per query by deterministic BM25 (see object
    * doc). `queries` is the (qidCol, termCol) relation — one row per
    * query term; duplicate terms within a query must be pre-deduped
    * (they would double-count, as in any bag-of-terms BM25).
    *
    * Returns (qidCol, idCol, rank, score, n_terms_hit).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, termCol: String,
      k: Int = 10): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val words = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("__term"))
    val tf = words.groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfr = words.select(col(idCol), col("__term")).distinct()
      .groupBy("__term").agg(count(lit(1)).as("__df"))
    val lens = docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("__dl"))
    val st = docs.agg(count(lit(1)).as("n"),
      sum(size(split(col(textCol), " ")).cast("long")).as("toks")).head()
    val nDocs = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / nDocs
    // per-(query, doc, term) contribution — all shapes left-associated
    // identically to the oracle's SQL
    val contrib =
      ((lit(nDocs.toDouble) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))) *
        (col("__tf") * lit(Bm25K1 + 1.0)) /
        (col("__tf") + lit(Bm25K1) *
          (lit(1.0) - lit(Bm25B) + lit(Bm25B) * col("__dl") / lit(avgdl)))
    val scored = queries
      .select(col(qidCol), col(termCol).as("__term"))
      .join(tf, "__term")
      .join(dfr, "__term")
      .join(lens, idCol)
      .withColumn("__c", contrib)
      .groupBy(col(qidCol), col(idCol))
      .agg(sort_array(collect_list(struct(col("__term"), col("__c")))).as("__cs"),
        count(lit(1)).as("n_terms_hit"))
      .withColumn("score",
        aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("__c")))
      .drop("__cs")
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("rank"), col("score"), col("n_terms_hit"))
  }
}
