package graft

import org.apache.spark.sql.SparkSession

/** Lake-maintenance CLI: `runMain graft.LakeCompact <lakeDir>
  * [targetRowsPerFile] [--sort-by-pcr]` — compacts the element lake's
  * small files (see graft.etl.LakeMaintenance) and prints the
  * before/after file counts.
  */
object LakeCompact {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LakeCompact <lakeDir> [targetRowsPerFile] [--sort-by-pcr]")
    val lakeDir = args(0)
    val target = args.lift(1).filterNot(_.startsWith("--")).map(_.toLong).getOrElse(1000000L)
    val sortByPcr = args.contains("--sort-by-pcr")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = graft.etl.LakeMaintenance.compactElements(spark, lakeDir, target, sortByPcr)
    println(s"compacted: files ${r.filesBefore} -> ${r.filesAfter}, rows ${r.rows}")
    spark.stop()
  }
}
