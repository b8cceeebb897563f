package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * latest right row with the same key and `rightTs <= leftTs`.
  *
  * Spark-first implementation: instead of an O(L×R) theta-join + groupBy-max
  * (which explodes at scale), union both sides tagged, sort within key by
  * (ts, side), and carry the right payload forward with a running
  * `last(_, ignoreNulls)` window. One shuffle on the key, one sort — the
  * same cost profile as a sort-merge join, so it scales to 100 TB the way
  * any keyed sort does (AQE handles skewed keys).
  *
  * Right rows must be unique per (key, ts) — pre-deduplicate upstream,
  * otherwise which payload wins is undefined.
  */
object AsOfJoin {

  /** @param left       driving rows (all preserved, left-outer semantics)
    * @param right      lookup rows; only `payload` columns are attached
    * @param leftKey    join key column on `left`
    * @param rightKey   join key column on `right`
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param payload    right columns to attach (must not clash with left's)
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The payload travels as ONE struct, not bare columns: a struct built
    // from a right row is non-null even when every payload field in it is
    // null, so `last(_, ignoreNulls)` stops at the latest matching right
    // row and a legitimately-NULL payload value stays NULL (true as-of /
    // DuckDB ASOF semantics) instead of leaking an older non-null value.
    val payloadType = org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c)))
    // side=0 sorts right rows before left rows at equal ts => inclusive <=
    val taggedRight = right.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__t") +: lit(0).as("__side") +:
        struct(payload.map(col): _*).as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(payloadType).as("__p") +: leftCols.map(col)): _*)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .select(col("__side") +: last(col("__p"), ignoreNulls = true).over(w).as("__pc") +:
        leftCols.map(col): _*)
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col("__pc").getField(c).as(c)): _*)
  }
}
