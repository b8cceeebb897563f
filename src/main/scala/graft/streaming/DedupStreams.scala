package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming near-duplicate detection (SURVEY §2C streaming): the batch
  * MinHash-LSH banding (graft.ops.Dedup) is per-row column math, so it
  * composes into a readStream pipeline unchanged; what streaming adds is
  * MEMBERSHIP — which documents each band bucket has already seen — and
  * that lives in `flatMapGroupsWithState` keyed by (band_idx, band_key).
  *
  * Each arriving document emits one candidate pair per remembered
  * same-bucket member, then joins the bucket's state. Guarantees match
  * the batch operator's shape: a pair is emitted at most once per BAND
  * (the same pair surfacing via two bands arrives twice — batch d02
  * applies `distinct()`; downstream streaming consumers dedup by
  * (id_a, id_b) within their watermark, or treat pairs as idempotent
  * upserts).
  *
  * State per bucket is capped at `maxBucketSize` ids (LSH bucket sizes
  * are the Σ bucket² cost knob in batch too — an over-full streaming
  * bucket means the banding parameters need retuning, not more state);
  * overflow beyond the cap stops emitting new pairs for that bucket
  * rather than growing without bound. At cluster scale the state store
  * is RocksDB-backed and sharded by the group key — the same partition
  * key the batch equi-join shuffles on.
  */
object DedupStreams {

  final case class BucketState(ids: Seq[Long])
  final case class CandidatePair(id_a: Long, id_b: Long, band_idx: Int)

  val DefaultMaxBucketSize = 64

  /** docs: streaming DataFrame with (idCol long, textCol string).
    * Returns an append-mode stream of [[CandidatePair]]s.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxBucketSize: Int = DefaultMaxBucketSize): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = Dedup.bandKeys(docs.select(col(idCol), col(textCol)), idCol, textCol)
      .select(col("band_idx"), col("band_key"), col("id"))
      .as[(Int, String, Long)]
    banded
      .groupByKey { case (bandIdx, bandKey, _) => s"$bandIdx|$bandKey" }
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[BucketState]) =>
          val bandIdx = key.takeWhile(_ != '|').toInt
          var seen = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val out = Seq.newBuilder[CandidatePair]
          rows.foreach { case (_, _, id) =>
            if (!seen.contains(id) && seen.size < maxBucketSize) {
              seen.foreach { other =>
                out += CandidatePair(math.min(id, other), math.max(id, other), bandIdx)
              }
              seen = seen :+ id
            }
          }
          state.update(BucketState(seen))
          out.result().iterator
      }
  }
}
