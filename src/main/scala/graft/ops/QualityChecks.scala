package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/dbt-tests
  * shape): uniqueness, not-null, referential integrity, accepted
  * domains, range rules — each check one aggregate or one anti-join,
  * all results unioned into a single (check, target, violations,
  * total) relation a CI gate can assert on. The checks every warehouse
  * load and every training-data refresh runs before downstream jobs
  * trust the batch.
  *
  * Scale shape: per-check cost is the obvious one — not-null/domain/
  * range are map-side-combined conditional counts sharing one scan
  * when composed via [[suite]]; uniqueness is one groupBy on the key;
  * referential integrity is a left-anti join (broadcast when the
  * parent's key relation is dimension-sized, shuffle otherwise —
  * Catalyst picks). Nothing collects to the driver; the result
  * relation has one row per check.
  */
object QualityChecks {

  private def result(check: String, target: String, violations: Column,
      total: Column): Column =
    struct(lit(check).as("check"), lit(target).as("target"),
      violations.cast("long").as("violations"), total.cast("long").as("total"))

  /** Rows where any listed column is null. One row in the output per
    * column, sharing a single scan.
    */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("__n"),
        cols.map(c => coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)),
          lit(0L)).as(s"__$c")): _*)
      .select(explode(array(cols.map(c =>
        result("not_null", c, col(s"__$c"), col("__n"))): _*)).as("r"))
      .select("r.*")

  /** Key uniqueness: violations = rows carrying a duplicated key
    * (total duplicate-group membership beyond the first row).
    */
  def unique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dup = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(when(col("__c") > 1, col("__c") - 1L)
        .otherwise(0L)), lit(0L)).as("__viol"),
        coalesce(sum(col("__c")), lit(0L)).as("__n"))
    dup.select(result("unique", keyCols.mkString(","),
      col("__viol"), col("__n")).as("r")).select("r.*")
  }

  /** Referential integrity: child rows whose non-null key has no match
    * in the parent key relation (null keys are not orphans — that's
    * [[notNull]]'s job; stated, because both engines must agree).
    */
  def foreignKey(child: DataFrame, keyCol: String, parent: DataFrame,
      parentKeyCol: String): DataFrame = {
    val orphans = child.where(col(keyCol).isNotNull)
      .join(parent.select(col(parentKeyCol).as(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
      .agg(count(lit(1)).as("__viol"))
    val total = child.agg(count(lit(1)).as("__n"))
    orphans.crossJoin(total)
      .select(result("foreign_key", keyCol, col("__viol"), col("__n")).as("r"))
      .select("r.*")
  }

  /** Domain membership: non-null values outside the accepted set.
    * Violation sums coalesce to 0 on an empty input — an empty-load
    * regression must read as (0 violations, 0 total), not NULL, or a
    * `violations === 0` CI gate would pass the broken batch vacuously.
    */
  def accepted(df: DataFrame, colName: String,
      values: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("__n"),
        coalesce(sum(when(col(colName).isNotNull &&
          !col(colName).isin(values: _*), 1L).otherwise(0L)), lit(0L))
          .as("__viol"))
      .select(result("accepted_values", colName,
        col("__viol"), col("__n")).as("r")).select("r.*")

  /** Closed-interval range rule on non-null values (empty input reads
    * 0, not NULL — see [[accepted]]).
    */
  def inRange(df: DataFrame, colName: String, lo: Double,
      hi: Double): DataFrame =
    df.agg(count(lit(1)).as("__n"),
        coalesce(sum(when(col(colName).isNotNull &&
          (col(colName) < lo || col(colName) > hi), 1L).otherwise(0L)),
          lit(0L)).as("__viol"))
      .select(result("in_range", colName, col("__viol"), col("__n")).as("r"))
      .select("r.*")

  /** Union a set of check relations into the one suite report. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
