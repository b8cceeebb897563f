package graft

import org.scalatest.funsuite.AnyFunSuite

/** StateCompactMain dispatch: each kind reaches its module's compact
  * (exercised end-to-end in StreamingCompactionSpec /
  * ModelStreamsSpec; here the CLI routing + the unknown-kind guard).
  */
class StateCompactMainSpec extends AnyFunSuite with SparkSpec {

  test("pipeline kind folds fingerprint partitions via the CLI path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scm").toString
    Seq("a", "b").toDF("fingerprint").write.parquet(s"$dir/batch_id=0")
    Seq("b", "c").toDF("fingerprint").write.parquet(s"$dir/batch_id=1")
    Seq("d").toDF("fingerprint").write.parquet(s"$dir/batch_id=2")
    StateCompactMain.run(spark, "pipeline", dir)
    val fp = graft.streaming.PipelineStreams.fingerprints(spark, dir)
    assert(fp.select("fingerprint").distinct().collect()
      .map(_.getString(0)).toSet === Set("a", "b", "c", "d"))
    // batches 0/1 fold into the base; the newest (2) stays put — the
    // markerless layout's possibly-uncommitted-batch conservatism
    // (round-7 review fix, pinned in StreamingCompactionSpec)
    assert(fp.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(-1L, 2L))
  }

  test("clusters kind routes to ClusterStreams.compact (no-op safe on fresh state)") {
    // routing check: an empty state dir (no commits) is a legal no-op —
    // the full fold + crash-window behavior lives in ClusterStreamsSpec
    val dir = java.nio.file.Files.createTempDirectory("graft_scm_cs").toString
    StateCompactMain.run(spark, "clusters", dir)
    assert(graft.streaming.ClusterStreams.loadLabels(spark, dir).count() === 0)
  }

  test("unknown kind fails loudly") {
    val e = intercept[IllegalArgumentException] {
      StateCompactMain.run(spark, "bogus", "/tmp/nowhere")
    }
    assert(e.getMessage.contains("unknown state kind"))
  }
}
