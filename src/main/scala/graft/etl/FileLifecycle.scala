package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File lifecycle routing (SURVEY A22): success -> archive dir, failure ->
  * error dir with timestamp-suffixed rename on collision
  * (`main_ingest.py:101-139`). Hadoop FileSystem so the same code works on
  * local FS, HDFS, or object stores.
  */
object FileLifecycle {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Move to archive; overwrites an existing archived copy (the reference
    * warns and overwrites, `main_ingest.py:106-112`). Returns target path.
    */
  def archive(spark: SparkSession, file: String, archiveDir: String): String = {
    val src = new Path(file)
    val f = fs(spark, src)
    val dir = new Path(archiveDir)
    if (!f.exists(dir)) f.mkdirs(dir)
    val dst = new Path(dir, src.getName)
    if (f.exists(dst)) f.delete(dst, false)
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"archive move failed: $src -> $dst")
    dst.toString
  }

  /** Move to the error quarantine; on name collision append a timestamp
    * suffix (`main_ingest.py:123-134`).
    */
  def quarantine(spark: SparkSession, file: String, errorDir: String,
      nowMillis: Long = System.currentTimeMillis()): String = {
    val src = new Path(file)
    val f = fs(spark, src)
    val dir = new Path(errorDir)
    if (!f.exists(dir)) f.mkdirs(dir)
    var dst = new Path(dir, src.getName)
    if (f.exists(dst)) {
      val name = src.getName
      val (base, ext) = name.lastIndexOf('.') match {
        case -1 => (name, "")
        case i  => (name.substring(0, i), name.substring(i))
      }
      dst = new Path(dir, s"${base}_$nowMillis$ext")
    }
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"quarantine move failed: $src -> $dst")
    dst.toString
  }
}
