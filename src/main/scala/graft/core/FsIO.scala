package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file IO through the Hadoop FileSystem API, so index sidecars
  * (data.json, arguments.json, centroids.json) land on the SAME filesystem
  * as the parquet data — java.nio would silently write `s3a://...` paths to
  * local disk and split the index across two filesystems.
  */
object FsIO {
  private def fs(p: Path): FileSystem =
    p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)

  def write(pathStr: String, content: String): Unit = {
    val p = new Path(pathStr)
    val out = fs(p).create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def read(pathStr: String): String = {
    val p = new Path(pathStr)
    val in = fs(p).open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  def exists(pathStr: String): Boolean = {
    val p = new Path(pathStr)
    fs(p).exists(p)
  }

  def mkdirs(pathStr: String): Unit = {
    val p = new Path(pathStr)
    fs(p).mkdirs(p)
  }
}
