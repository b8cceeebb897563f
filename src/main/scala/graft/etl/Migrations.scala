package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema migrations (SURVEY A30): the reference's one Alembic migration
  * renames every dynamic table's `text_content` column to the
  * `{table}_value` contract (`alembic/versions/1941212973eb:35-83`, with
  * a reversible downgrade). Lake form: rewrite with `withColumnRenamed`;
  * JDBC mirror form: emit `ALTER TABLE ... RENAME COLUMN` DDL.
  */
object Migrations {

  /** Upgrade one wide per-tag DataFrame: text_content -> {table}_value.
    * No-op if the column is absent (idempotent, like the reference's
    * information_schema guard).
    */
  def renameValueColumn(df: DataFrame, tableRaw: String): DataFrame =
    if (df.columns.contains("text_content"))
      df.withColumnRenamed("text_content", Sanitize.valueColumnName(tableRaw))
    else df

  /** Downgrade: {table}_value -> text_content. */
  def revertValueColumn(df: DataFrame, tableRaw: String): DataFrame = {
    val vc = Sanitize.valueColumnName(tableRaw)
    if (df.columns.contains(vc)) df.withColumnRenamed(vc, "text_content") else df
  }

  /** JDBC mirror DDL for the same migration. */
  def renameValueColumnSql(schema: String, tableRaw: String): String =
    s"""ALTER TABLE "$schema"."${tableRaw.toLowerCase}" RENAME COLUMN "text_content" TO "${Sanitize.valueColumnName(tableRaw)}";"""
}
