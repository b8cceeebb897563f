package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Per-tag table routing (SURVEY A11/A12/A16): the reference fans each
  * element out to one Postgres table per sanitized tag, columns = 5 fixed
  * + one per observed attribute (`main_ingest.py:197-272`).
  *
  * Spark-first form: the canonical store is the single tall DataFrame
  * written `partitionBy("table_name")` — schema evolution is free
  * (attributes live in a MapType column), partition pruning turns
  * per-tag queries into per-tag scans, and no driver-side loop touches
  * row data. The reference's wide per-tag relational shape is a *view*
  * derived on demand (`wideView`), and only its attribute-key discovery
  * needs a (single, set-oriented) aggregation.
  */
object TagTables {

  /** Fixed columns of every dynamic table (`main_ingest.py:210-216`). */
  val CommonColumns: Seq[String] =
    Seq("element_id", "parent_element_id", "pcr_uuid_context", "original_tag_name")

  /** Distinct attribute keys per table in ONE distributed pass
    * (vs the reference's per-row `information_schema` probing).
    * Keys are lowercased as the DDL layer does (`main_ingest.py:221`).
    */
  def attributeColumns(tall: DataFrame): Map[String, Seq[String]] =
    tall.select(col("table_name"), explode(map_keys(col("attributes"))).as("k"))
      .select(col("table_name"), lower(col("k")).as("k"))
      .distinct()
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(_.getString(1)).toSeq
          .filterNot(CommonColumns.contains).sorted
      }

  /** The reference's per-tag wide table as a DataFrame view:
    * `element_id, parent_element_id, pcr_uuid_context, original_tag_name,
    * {table}_value, <attr columns...>` — all StringType ("typing is the
    * querier's job", SURVEY §1.2).
    */
  def wideView(tall: DataFrame, tableNameRaw: String, attrCols: Seq[String]): DataFrame = {
    val lowered = tableNameRaw.toLowerCase
    val valueCol = Sanitize.valueColumnName(tableNameRaw)
    // attribute COLUMN names are lowercased (DDL contract) but the map
    // keys keep the XML's original case — lookups must be case-blind
    val loweredAttrs = transform_keys(col("attributes"), (k, _) => lower(k))
    val attrs: Seq[Column] = attrCols.filterNot(c => CommonColumns.contains(c) || c == valueCol)
      .map(k => element_at(loweredAttrs, k.toLowerCase).as(k))
    tall.where(lower(col("table_name")) === lowered)
      .select(
        col("element_id") +:
          col("parent_element_id") +:
          col("pcr_uuid_context") +:
          col("element_tag").as("original_tag_name") +:
          col("text_value").as(valueCol) +:
          attrs: _*)
  }

  /** All wide views, attribute sets discovered in one pass. */
  def wideViews(tall: DataFrame): Map[String, DataFrame] = {
    val attrsByTable = attributeColumns(tall)
    tall.select(lower(col("table_name")).as("t")).distinct().collect()
      .map(_.getString(0))
      .map(t => t -> wideView(tall, t, attrsByTable.getOrElse(t, Seq.empty)))
      .toMap
  }

  /** Canonical lake write: tall table partitioned by tag. Dynamic
    * partition overwrite only rewrites the tags present in `tall`.
    */
  def writeTall(tall: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    tall.write
      .partitionBy("table_name")
      .option("partitionOverwriteMode", "dynamic")
      .mode(mode)
      .parquet(path)

  /** Parent->child FK edge set (SURVEY A18): distinct observed
    * (child_table, parent_table) pairs, the input to FK synthesis.
    */
  def fkEdges(tall: DataFrame): DataFrame =
    tall.select(col("table_name").as("child_table"),
        col("parent_table_name").as("parent_table"))
      .where(col("parent_table").isNotNull)
      .distinct()
}
