package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  test("ivfPqTopK probes only the query's lists and ranks by ADC") {
    import spark.implicits._
    // two well-separated clusters as the label/list structure; dim 4
    // splits into m=2 subspaces of 2. nprobe=1 must confine every
    // neighbor to the query's own cluster list.
    val corpus = Seq(
      (0L, 0L, Array(1.0f, 0.9f, 0.0f, 0.1f)),
      (1L, 0L, Array(0.9f, 1.0f, 0.1f, 0.0f)),
      (2L, 0L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
      (3L, 1L, Array(0.0f, 0.1f, 1.0f, 0.9f)),
      (4L, 1L, Array(0.1f, 0.0f, 0.9f, 1.0f)),
      (5L, 1L, Array(0.0f, 0.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val queries = corpus.where(col("vec_id") === 0L)
    val out = Similarity.ivfPqTopK(corpus, queries, topK = 5, nprobe = 1,
        m = 2, codebookK = 2, iters = 2)
      .orderBy("rank").collect()
    // cluster 0 has two other members; nprobe=1 must exclude cluster 1
    // entirely even though topK would admit it
    assert(out.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 2L))
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
    val dists = out.map(_.getAs[Long]("adc_dist"))
    assert(dists.sameElements(dists.sorted), "ranks must follow ADC order")
  }
}
