package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem helper shared by the streaming-state compactions
  * ([[GraphStreams.compact]], [[PipelineStreams.compact]],
  * [[SearchStreams.compact]]): recursive delete through the Hadoop
  * FileSystem API so the same code works on local paths in tests and
  * on HDFS/object-store state dirs at scale.
  */
private[streaming] object StreamStateDirs {

  /** Recursively delete `dir` if it exists (a no-op otherwise — a
    * compaction replay after a mid-delete crash re-deletes freely).
    */
  def delete(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }
}
