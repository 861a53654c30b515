package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem resolution that honors the path's own scheme.
  *
  * `FileSystem.get(conf)` resolves the *default* filesystem
  * (`fs.defaultFS`), so a store base or sidecar on any other scheme —
  * `s3a://bucket/...` when the default is HDFS, an `hdfs://` path when the
  * default is `file://`, or an explicit `file:` URI on a cluster — would
  * silently be read from / written to the wrong filesystem. On the large
  * deployments this engine targets, store paths are routinely NOT on the
  * driver's default FS, so every metadata/sidecar I/O site must resolve
  * the filesystem FROM the path it is about to touch.
  */
object HadoopFs {
  /** The FileSystem instance that owns `path` (scheme-aware). */
  def forPath(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def forPath(conf: org.apache.hadoop.conf.Configuration, path: String): FileSystem =
    new Path(path).getFileSystem(conf)
}
