package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.ops.Dedup

/** Streaming sketch maintenance (SURVEY §2C sketches × streaming): the
  * KMV bottom-k distinct sketch kept as keyed state across
  * micro-batches — the live face of the q35/q36 story. Batch jobs
  * persist per-partition sketches and merge them (q36); a stream keeps
  * the SAME k-longs-per-key state resident and folds every arriving
  * batch into it, emitting an updated distinct-count estimate per
  * touched key each trigger.
  *
  * Scale shape: state is exactly k longs per key (the sketch's whole
  * point), sharded by the group key into the state store (RocksDB at
  * cluster scale); arriving rows reduce to one 32-bit hash each before
  * grouping, so a trigger shuffles hashes, not documents. The fold is
  * the same merge rule as `BottomKHashes.merge` — distinct, keep the k
  * smallest — so a streaming estimate always equals the batch sketch
  * of everything ingested so far (pinned in `SketchStreamsSpec`).
  */
object SketchStreams {

  final case class KmvState(hashes: Seq[Long])
  final case class KmvEstimate(source: String, kmv_size: Long, kmv_estimate: Double)

  /** The q35 estimator: exact below k, (k-1)·2^32/h_k at k. */
  def estimate(hashes: Seq[Long], k: Int): Double =
    if (hashes.size < k) hashes.size.toDouble
    else (k - 1).toDouble * 4294967296.0 / hashes.last

  /** docs: streaming DataFrame with (sourceCol string, textCol string).
    * Returns an UPDATE-mode stream: one (source, kmv_size,
    * kmv_estimate) row per source touched by each micro-batch. Null
    * texts are skipped (a null has no hash identity — the batch
    * aggregate's rule).
    */
  def kmvBySource(docs: DataFrame, sourceCol: String, textCol: String,
      k: Int = 64): Dataset[KmvEstimate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .where(col(textCol).isNotNull)
      .select(col(sourceCol).as("source"), Dedup.md5Hash32(col(textCol)).as("hv"))
      .as[(String, Long)]
    hashed.groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvEstimate](GroupStateTimeout.NoTimeout) {
        case (source, rows, state: GroupState[KmvState]) =>
          val prev = state.getOption.map(_.hashes).getOrElse(Seq.empty)
          val merged = (prev.iterator ++ rows.map(_._2))
            .toArray.distinct.sorted.take(k).toSeq
          state.update(KmvState(merged))
          KmvEstimate(source, merged.size.toLong, estimate(merged, k))
      }
  }

  final case class HistState(bins: Map[Long, Long])
  final case class HistQuantiles(key: String, n_rows: Long,
      p50: Long, p95: Long, p99: Long)

  /** q39's integer-threshold quantile rule over a merged histogram:
    * value = binWidth × the smallest bin whose cumulative count
    * satisfies 100·cum ≥ q·total.
    */
  def histQuantile(bins: Map[Long, Long], q: Int, binWidth: Long): Long = {
    val total = bins.valuesIterator.sum
    var cum = 0L
    for ((bin, cnt) <- bins.toSeq.sortBy(_._1)) {
      cum += cnt
      if (cum * 100 >= total * q) return bin * binWidth
    }
    0L
  }

  /** The q39 histogram sketch kept as keyed state — the streaming face
    * of the mergeable-quantile story: rows reduce to a (key, bin) pair
    * before grouping (per-row column math — a streaming aggregation
    * ahead of mapGroupsWithState is unsupported, so the count-fold
    * happens in the state function), and the state fold is the SAME
    * merge rule as q39's level 2 — sum counts per bin. State per key
    * is bounded by the value range / binWidth, the histogram's whole
    * point. Emits updated integer p50/p95/p99 per touched key each
    * trigger; a streaming quantile always equals the batch q39 rule
    * applied to everything ingested so far (pinned in
    * `SketchStreamsSpec`).
    *
    * rows: streaming DataFrame with (keyCol string, valueCol long).
    */
  def histogramQuantiles(rows: DataFrame, keyCol: String, valueCol: String,
      binWidth: Long): Dataset[HistQuantiles] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val binned = rows
      .where(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"$valueCol div $binWidth").as("bin"))
      .as[(String, Long)]
    binned.groupByKey(_._1)
      .mapGroupsWithState[HistState, HistQuantiles](GroupStateTimeout.NoTimeout) {
        case (key, batch, state: GroupState[HistState]) =>
          val prev = state.getOption.map(_.bins).getOrElse(Map.empty[Long, Long])
          val merged = batch.foldLeft(prev) { case (acc, (_, bin)) =>
            acc.updated(bin, acc.getOrElse(bin, 0L) + 1L)
          }
          state.update(HistState(merged))
          HistQuantiles(key, merged.valuesIterator.sum,
            histQuantile(merged, 50, binWidth),
            histQuantile(merged, 95, binWidth),
            histQuantile(merged, 99, binWidth))
      }
  }
}
