package graft.core

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.FileSystem

/** Filesystem-scheme resolution: store/sidecar I/O must resolve the
  * filesystem from the path it touches, not from `fs.defaultFS`. On a real
  * deployment the store base is routinely on a non-default filesystem
  * (s3a/hdfs vs file) — resolving the default silently reads/writes the
  * wrong one.
  */
class HadoopFsSpec extends SparkSpec {

  test("forPath resolves the path's scheme even when the default FS is unusable") {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    // Point the default FS at a scheme with no registered implementation:
    // any code path that resolves the DEFAULT filesystem now fails loudly,
    // so passing this assertion proves resolution came from the path.
    conf.set("fs.defaultFS", "graftbogus://nowhere/")
    intercept[Exception] { FileSystem.get(conf) }
    val fs = HadoopFs.forPath(conf, "file:/tmp")
    assert(fs.getScheme == "file")
  }

  test("sidecar save/load round-trips through an explicit file: URI") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fs-spec")
    val path = s"file:${dir.toAbsolutePath}/centroids.tsv"
    val cents = Seq(0 -> Seq(1.0f, 2.0f), 1 -> Seq(3.5f, -4.25f))
    graft.functions.Similarity.saveCentroids(spark, path, cents)
    val loaded = graft.functions.Similarity.loadCentroids(spark, path)
    assert(loaded == cents)
  }

  test("notification-store declaration lands on the path's filesystem") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fs-decl")
    val base = s"file:${dir.toAbsolutePath}/notif"
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("fs.defaultFS", "graftbogus://nowhere/")
    // would throw before scheme-aware resolution: create() used to call
    // FileSystem.get(conf) on the (unusable) default FS
    graft.storage.NotificationStore.create(
      base,
      Seq(graft.model.AttributeDef("severity", graft.core.MinervaType.MInteger)),
      conf)
    assert(new java.io.File(s"${dir.toAbsolutePath}/notif/_attributes.json").exists())
  }
}
