package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same codegen-cache sizing as Bench (see the comment there):
      // 229 queries × the default 100-entry cache = constant
      // regenerate/recompile churn; wall-time only, results unchanged
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Queries run from a small thread pool: Spark's scheduler accepts
    // concurrent job submission, and most of these queries are too small
    // to fill local[cpus] alone — 4-way submission roughly halves the
    // dump's wall time. Errors are captured per query, never swallowed.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt)
    // VERIFY_ONLY=t12_bpe_merges,t13_bpe_encode dumps a subset — the
    // iteration aid mirroring Bench's BENCH_ONLY; unknown names fail
    // loudly for the same reason (a typo must not verify nothing and
    // read as green). The full oracle_sql.json is still written, so
    // scripts/check.py must be pointed at the same subset when used.
    val selected = sys.env.get("VERIFY_ONLY") match {
      case Some(list) =>
        val want = list.split(',').map(_.trim).filter(_.nonEmpty).toSet
        require(want.nonEmpty,
          "VERIFY_ONLY is set but names no queries - an empty subset must not verify nothing and read as green")
        val unknown = want -- SparkEntry.queries.keySet
        if (unknown.nonEmpty)
          throw new IllegalArgumentException(
            s"VERIFY_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
        SparkEntry.queries.filter { case (n, _) => want(n) }
      case None => SparkEntry.queries
    }
    val tasks = selected.toSeq.map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    // shutdownNow on failure: a fatal task error (OOM) must kill the
    // queued work AND the non-daemon workers, so the JVM dies visibly
    // instead of grinding through the remaining queries on a poisoned
    // heap (or hanging on live pool threads)
    try { tasks.foreach(_.get()); pool.shutdown() }
    catch { case t: Throwable => pool.shutdownNow(); throw t }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle SQL may reference run-dependent paths (j01's corpus dir is
    // keyed by the SF basename) — substitute before dumping, so the
    // DuckDB compare always reads what THIS run wrote
    val sfBase = java.nio.file.Paths.get(sfDir).getFileName.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.queries.JsonlQueries.SfBaseToken, sfBase))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
