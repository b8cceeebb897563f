package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: match dirty strings (typos, truncations)
  * against a clean reference by MULTI-PASS BLOCKING + edit-distance
  * verification — the record-linkage step that reconciles vendor
  * feeds, user-typed names, and OCR output against a master table.
  *
  * An exact all-pairs `levenshtein` join is O(|dirty|·|clean|) — the
  * same 100 TB trap as a bare BETWEEN join. Blocking makes each pass
  * an equi-join: a candidate pair must agree on at least one block
  * key. One pass has structural misses (a typo inside the prefix
  * defeats a prefix block), so passes are UNIONed: PREFIX + SUFFIX
  * here. A single edit is at one position, so it leaves the first
  * `prefixLen` chars or the last `suffixLen` chars untouched
  * (deletions/insertions shift everything AFTER the edit — the suffix
  * survives any edit more than `suffixLen` from the end): for names
  * longer than prefixLen + suffixLen, single-edit recall is COMPLETE,
  * and only a pair edited in BOTH end regions is lost (the multi-pass
  * tradeoff; the oracle applies the identical rule, so the miss set
  * is part of the contract, not noise). A coarse pass like a length
  * band is NOT a usable substitute: with a handful of bands the
  * blocks are corpus-sized and the "blocked" join degenerates to
  * all-pairs — measured 196 s at sf0.1 against ~2 s for prefix+suffix.
  * Verification computes exact `levenshtein` only on candidates
  * (behind a cheap length pre-filter), and the integer distances make
  * the whole pipeline deterministic cross-engine.
  */
object Fuzzy {

  /** Block keys for one relation: pass 1 = first `prefixLen` chars,
    * pass 2 = last `suffixLen` chars. Output: (id, name, blk) with one
    * row per (row, pass).
    */
  private def blocks(df: DataFrame, idCol: String, nameCol: String,
      prefixLen: Int, suffixLen: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"))
    base.select(col("id"), col("name"),
        concat(lit("p:"), substring(col("name"), 1, prefixLen)).as("blk"))
      .unionByName(base.select(col("id"), col("name"),
        concat(lit("s:"), expr(s"right(name, $suffixLen)")).as("blk")))
  }

  /** Best clean match per dirty row: block-join candidates, keep pairs
    * within `maxDist` edits (cheap length pre-filter first — an edit
    * distance is at least the length difference), rank by (distance,
    * clean id) per dirty id and keep rank 1. Output:
    * (dirty_id, dirty_name, clean_id, clean_name, dist).
    */
  def bestMatch(dirty: DataFrame, dirtyId: String, dirtyName: String,
      clean: DataFrame, cleanId: String, cleanName: String,
      maxDist: Int, prefixLen: Int = 8, suffixLen: Int = 8): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    // a non-positive key makes a pass's block constant ('p:') and the
    // blocked join silently degenerates to the all-pairs cartesian
    // this operator exists to prevent
    require(prefixLen >= 1 && suffixLen >= 1,
      s"block key lengths must be >= 1: prefixLen=$prefixLen suffixLen=$suffixLen")
    val db = blocks(dirty, dirtyId, dirtyName, prefixLen, suffixLen)
      .select(col("id").as("dirty_id"), col("name").as("dirty_name"), col("blk"))
    val cb = blocks(clean, cleanId, cleanName, prefixLen, suffixLen)
      .select(col("id").as("clean_id"), col("name").as("clean_name"), col("blk"))
    val cand = db.join(cb, Seq("blk"))
      .select("dirty_id", "dirty_name", "clean_id", "clean_name")
      .distinct() // a pair agreeing on both passes must verify once
      .where(abs(length(col("dirty_name")) - length(col("clean_name"))) <= maxDist)
    val verified = cand
      .withColumn("dist",
        levenshtein(col("dirty_name"), col("clean_name")).cast("long"))
      .where(col("dist") <= maxDist)
    val w = Window.partitionBy("dirty_id")
      .orderBy(col("dist"), col("clean_id"))
    verified.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }
}
