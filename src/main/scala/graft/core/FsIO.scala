package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file IO through the Hadoop FileSystem API, so index sidecars
  * (data.json, arguments.json, centroids.json) land on the SAME filesystem
  * as the parquet data — java.nio would silently write `s3a://...` paths to
  * local disk and split the index across two filesystems.
  */
object FsIO {
  /** The RAW filesystem: LocalFileSystem's checksum wrapper keeps a
    * `.name.crc` sibling per file, which breaks rename-over-commit (the
    * data file renames, the stale crc stays, the next read throws
    * ChecksumException — hit by the r19 contention bench). Sidecars are
    * tiny JSON whose integrity the JSON parse itself checks; the raw fs
    * gives posix atomic-replace rename semantics. */
  private def fs(p: Path): FileSystem =
    p.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRawFileSystem
      case other => other
    }

  /** Write-whole-file, ATOMICALLY visible: stage to a hidden temp
    * sibling, fsync-close, rename over the target with OVERWRITE.
    * Sidecars written here are COMMIT POINTS read concurrently by other
    * writers (the claim protocol's `readGens`), serving reads, and the
    * doctor — the old in-place `create(overwrite = true)` TRUNCATES
    * first, so a racing read observed an empty/partial sidecar (found
    * by the r19 multi-writer contention bench: 4 appenders, one died on
    * "no recorded 'family'"), and a crash mid-write corrupted the
    * sidecar durably. Rename-with-OVERWRITE is atomic on posix and
    * HDFS; a crashed staging file is a dot-hidden sibling parquet
    * readers skip and the doctor reports loudly. */
  def write(pathStr: String, content: String): Unit = {
    val p = new Path(pathStr)
    val f = fs(p)
    val tmp = new Path(Option(p.getParent).getOrElse(new Path(".")),
      s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    // scrub a stale checksum sibling left by a PRE-r19 checksummed write
    // of the same sidecar BEFORE the rename lands (verdict r19 nit #1):
    // deleting it after opened a window where a checksummed reader saw
    // the NEW data file under the OLD crc and threw ChecksumException;
    // deleted first, a checksummed reader sees either (old data, old crc)
    // or (any data, no crc — LocalFileSystem reads uncheck-summed), never
    // a mismatched pair
    val crc = new Path(Option(p.getParent).getOrElse(new Path(".")),
      s".${p.getName}.crc")
    if (f.exists(crc)) f.delete(crc, false)
    // posix/raw-local rename replaces the target atomically and returns
    // true; stores whose FileSystem.rename refuses an existing target
    // (HDFS) fall back to FileContext's explicit atomic OVERWRITE rename
    val renamed = try f.rename(tmp, p) catch { case _: java.io.IOException => false }
    if (!renamed)
      org.apache.hadoop.fs.FileContext.getFileContext(p.toUri,
          SparkSession.active.sparkContext.hadoopConfiguration)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
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
