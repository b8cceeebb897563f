package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named declared queries to
  * `<outDir>/<name>_<suffix>.txt` — the per-round before/after plan
  * evidence under `plans/rN/` (PLANS.md is the curated family-level
  * document; these are the raw per-query artifacts a verdict checks
  * optimization claims against).
  *
  * Usage: `runMain graft.PlanDump <outDir> <suffix> <query>[,query...]`
  * e.g. `runMain graft.PlanDump plans/r14 after d32_cross_doc_repeats,p07_substring_funnel`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: PlanDump <outDir> <suffix> <query>[,<query>...]")
    val Array(outDir, suffix, list) = args
    val names = list.split(',').map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"not in SparkEntry.queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
