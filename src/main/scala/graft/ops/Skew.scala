package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. At 100 TB the failure mode of a plain
  * shuffle join is one hot key funneling into one reducer task;
  * Spark's own answers are (in preference order) a broadcast join when
  * one side fits, and AQE's runtime skew-join splitting. Salting is the
  * remaining tool when neither applies — the build side is too big to
  * broadcast AND the skew is known ahead of time (or AQE is off, e.g.
  * inside a cached/bucketed stage): the probe side spreads each hot key
  * across `salts` sub-keys, the build side replicates each row once per
  * sub-key, and the join key becomes (key, salt) — every reducer gets
  * at most 1/salts of any key's probe rows.
  */
object Skew {

  /** Inner equi-join on `key`, salted `salts` ways. Row-for-row
    * equivalent to `left.join(right, Seq(key))` for any salt function:
    * a (l, r) match on `key` pairs exactly once because l carries ONE
    * salt value and r is replicated across ALL salt values. The salt is
    * a deterministic hash of the probe row (never `rand()` — retried
    * tasks must re-derive the same salt or a lost executor double-counts
    * rows); build-side replication is an `explode` over the literal
    * salt range, costing |right| * salts rows — salting trades build
    * duplication for probe balance, which is the right trade exactly
    * when |right| << |left|.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val lCols = left.columns.map(col).toSeq
    val saltedL = left.withColumn("__salt", pmod(hash(lCols: _*), lit(salts)))
    val saltedR = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedL.join(saltedR, Seq(key, "__salt")).drop("__salt")
  }
}
