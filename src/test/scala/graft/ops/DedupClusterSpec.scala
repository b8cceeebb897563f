package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class DedupClusterSpec extends AnyFunSuite with SparkSpec {

  test("connected components label chains, triangles and singleton pairs") {
    import spark.implicits._
    // chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("reliable-checkpoint mode produces the same labels and writes checkpoints") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    // a 7-hop chain forces several rounds, crossing the every-3rd-round
    // checkpoint cadence in reliable mode
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == reliable)
    assert(reliable == (1L to 8L).map(_ -> 1L).toMap)
    // checkpoint data actually landed in the reliable dir
    def count(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.count() finally s.close()
    }
    assert(count(dir) > 1)
  }
}
