package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-TRAINING step of a pretraining data pipeline, plus the
  * corpus encode that applies the trained merges.
  *
  * Scale shape: the corpus is scanned ONCE (the word-frequency count);
  * every merge iteration after that runs over the VOCABULARY relation
  * (|vocab| ≪ corpus — bounded by the language, not the data), so
  * training cost is k·|vocab| and independent of corpus size. Each
  * iteration is one map-side-combined pair-count groupBy plus a 1-row
  * argmax collect (the learned merge is model state, like s08's
  * centroids — k rows total on the driver), and the merge apply is a
  * narrow `replace` projection. The vocab table is eagerly
  * localCheckpoint'ed per step so the k-step lineage cannot re-expand
  * and each argmax does not recompute the whole chain (the s12/MMR
  * lesson). Encoding joins the exploded corpus against the final
  * word→representation map — one vocab-sized broadcast-or-shuffle join,
  * the same shape as t11's vocab encode.
  *
  * Merge-step semantics: a word's symbols are kept `@`-delimited with
  * leading/trailing delimiters ('@' does not occur in corpus words;
  * guarded in [[wordTable]] and its oracle). Applying merge (l, r) is
  * ONE left-to-right non-overlapping `replace` of `@l@r@` with `@lr@`.
  * JVM `String.replace`, Spark's `StringReplace` and DuckDB's `replace`
  * all implement exactly this scan-the-original loop (verified on
  * overlapping-pattern cases), so the oracle can replay training
  * verbatim. The one divergence from textbook BPE: an odd run of the
  * same pair inside one word ('a a a' under merge a+a) keeps its tail
  * unmerged within that step, because the scan consumes the shared
  * boundary delimiter — deterministic, and identical in both engines.
  * Ties in pair frequency break on (left, right) symbol order, binary
  * collation in both engines.
  */
object Bpe {

  /** Symbol delimiter inside a word representation. Must not occur in
    * corpus words; [[wordTable]] drops (guards) words containing it. */
  val Delim = "@"

  /** Merge count shared by the t12/t13 queries and their oracles. */
  val DefaultMerges = 10

  final case class Merge(step: Long, left_sym: String, right_sym: String,
    merged: String, pair_freq: Long)

  /** `@`-delimited character representation: "ab" → "@a@b@". Built with
    * regexp_replace, NOT split(w, "") — Spark's split keeps a trailing
    * empty element under its -1 limit ("abc" → [a, b, c, ""]), which
    * would corrupt the representation with an empty symbol. (?s) so a
    * line terminator inside a word is a character like any other —
    * without DOTALL it would stay unprefixed and fuse into its
    * neighbor symbol, diverging from the oracle's per-character split. */
  private def charRepr(w: Column): Column =
    concat(regexp_replace(w, "(?s)(.)", Delim + "$1"), lit(Delim))

  /** The corpus tokenization every BPE stage shares — training's word
    * table, t13's per-document encode join, and (restated in SQL) their
    * oracles' toks CTEs. One definition, so the filters cannot drift
    * and silently drop join keys. */
  def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col("*"), explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0 && !col("w").contains(Delim))

  /** Word-frequency table with initial character representations — the
    * single corpus-wide scan of training. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    tokens(docs, textCol).select("w")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), charRepr(col("w")).as("repr"), col("freq"))

  /** Adjacent symbol pairs of every word, frequency-weighted. With
    * ss = split(repr, "@") = ["", s1..sn, ""] (0-based), the pairs are
    * (ss[j], ss[j+1]) for j in 1..size-3; the size >= 4 filter (>= 2
    * symbols) also keeps Spark's `sequence` ascending (sequence(1, 0)
    * would DESCEND, not return empty). */
  private def pairCounts(words: DataFrame): DataFrame =
    words.select(col("freq"), split(col("repr"), Delim).as("ss"))
      .where(size(col("ss")) >= 4)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(ss) - 3), j -> struct(ss[j] AS l, ss[j + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("f"))

  /** Learn up to `k` merges over a [[wordTable]]; returns the merge
    * table (driver-side model state, ≤ k rows) and the final word table
    * (word → merged representation — the trained tokenizer's vocab
    * map). Stops early when no adjacent pair remains. */
  def learnMerges(words0: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    var words = words0.localCheckpoint(true)
    val merges = ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.size < k && !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(merges.size + 1L, l, r, l + r, f)
        words = words.withColumn("repr", replace(col("repr"),
            lit(Delim + l + Delim + r + Delim), lit(Delim + l + r + Delim)))
          .localCheckpoint(true)
      }
    }
    (merges.toSeq, words)
  }

  /** Per-word symbol count of a final representation: n in ["", s1..sn,
    * ""]. */
  def symbolCount(repr: Column): Column =
    (size(split(repr, Delim)) - 2).cast("long")

  /** The tokenizer's INFERENCE path: apply an already-learned merge
    * table to arbitrary words — unseen words merge as far as their
    * learned pairs allow, exactly like a shipped BPE vocab encoding
    * new text. k stacked narrow `replace` projections (Catalyst
    * collapses them into one codegen stage); no shuffle, no state —
    * the merge table is k driver-side literals. Adds a `repr` column;
    * same one-pass replace semantics as training, applied in learned
    * order (order is load-bearing: later merges consume earlier
    * merges' symbols). */
  def applyMerges(words: DataFrame, wCol: String,
      merges: Seq[Merge]): DataFrame = {
    // inference takes ARBITRARY words, so the '@'-free precondition
    // wordTable enforces by dropping is enforced here by failing
    // loudly: charRepr of a word containing the delimiter produces a
    // corrupted representation ("x@y" -> "@x@@@y@") that learned
    // replaces can misapply to — a silent wrong encode, not an error
    val seed = when(col(wCol).contains(Delim),
        raise_error(concat(
          lit(s"applyMerges: word contains the '$Delim' symbol delimiter " +
            "(wordTable drops such words at training; reject or strip " +
            "them before encoding): "), col(wCol))))
      .otherwise(charRepr(col(wCol)))
    merges.foldLeft(words.withColumn("repr", seed)) {
      (df, m) =>
        df.withColumn("repr", replace(col("repr"),
          lit(Delim + m.left_sym + Delim + m.right_sym + Delim),
          lit(Delim + m.merged + Delim)))
    }
  }
}
