package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Store-layout probes routed through the Hadoop FileSystem API, so the
  * trigger policies that gate compaction and first-batch behavior
  * (epoch counts, store-exists checks) see HDFS/S3/object-store paths
  * exactly as they see local disk. `java.io.File` would silently report
  * a remote layout as absent — epochCount 0 forever means the LSM
  * compaction trigger never fires in exactly the deployment (a
  * long-running cluster pipeline) it exists for. */
object Fs {

  private def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsFor(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fsFor(p).exists(p)
  }

  /** Names of the immediate children of `path`; empty if absent. One
    * listing RPC — the callers count partition directories, never
    * recurse. */
  def childNames(path: String): Seq[String] = {
    val p = new Path(path)
    val f = fsFor(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
  }

  def delete(path: String): Unit = {
    val p = new Path(path)
    fsFor(p).delete(p, true)
    ()
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    fsFor(p).mkdirs(p)
    ()
  }

  def rename(src: String, dst: String): Unit = {
    val s = new Path(src)
    require(fsFor(s).rename(s, new Path(dst)), s"rename $src -> $dst failed")
  }

  /** Create an empty file (atomic on local FS, HDFS and object stores —
    * the file either exists or it doesn't; used as a publication
    * marker). */
  def touch(path: String): Unit = {
    val p = new Path(path)
    fsFor(p).create(p, true).close()
  }

  /** The fully-qualified form of `path` under its FileSystem (scheme +
    * authority resolved) — the comparison key for same-layout guards.
    * `java.io.File.getCanonicalPath` is meaningless for an `s3a://` or
    * `hdfs://` URI; this works for every scheme. */
  def qualified(path: String): String = {
    val p = new Path(path)
    fsFor(p).makeQualified(p).toString
  }
}
