package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed overwrite (SURVEY A15): the reference's idempotent re-ingest —
  * all rows belonging to a PatientCareReport UUID are deleted before the
  * new rows land (`main_ingest.py:276-328`).
  *
  * Spark-first form: an anti-join by key + union. The reference's
  * O(tables × PCRs) delete-scan roundtrips become one distributed join.
  * Null-keyed existing rows are never evicted (left_anti never matches
  * null), exactly like `DELETE WHERE pcr_uuid_context = ?`.
  *
  * At scale: the key set of one ingest batch is small (one distinct id
  * per document), so Catalyst broadcasts it and the "delete" costs one
  * scan with no shuffle. On a transactional lake table the same contract
  * is `MERGE`/`replaceWhere`; this composition is the storage-agnostic
  * equivalent.
  */
object KeyedOverwrite {

  def apply(existing: DataFrame, incoming: DataFrame, key: String = "pcr_uuid_context"): DataFrame =
    multiKey(existing, incoming, Seq(key))

  /** Evict existing rows matching the incoming batch on ANY of `keys`
    * (each key anti-joined independently), then append the batch once.
    */
  def multiKey(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val kept = keys.foldLeft(existing) { (acc, key) =>
      val ks = incoming.select(col(key)).where(col(key).isNotNull).distinct()
      acc.join(broadcast(ks), Seq(key), "left_anti")
        .select(existing.columns.map(col).toSeq: _*) // using-join moves key first; restore order
    }
    kept.unionByName(incoming.select(existing.columns.map(col).toSeq: _*))
  }
}
