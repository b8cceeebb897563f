package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` is assembled from per-domain packs under graft.queries;
  * every entry has a matching DuckDB oracle in `oracleSql` unless the
  * operator is inherently non-SQL-expressible (then the driver records a
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The composed curation pipeline is the flagship: one call
    * drives exact dedup, near-dup clustering + keep-best,
    * decontamination, the quality gate, split assignment and shard
    * packing end to end (p01).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("p01_curation_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.XmlIngest.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.EventsQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.JsonlQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.GraphQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.XmlIngest.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.EventsQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.JsonlQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.GraphQueries.oracles
}
