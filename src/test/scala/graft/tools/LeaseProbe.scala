package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-cost of the PartStore writer lease: N small store() calls to
  * one part, wall time per call — the lease adds 4 local-FS metadata
  * ops per store; this prints what that actually costs. */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = "target/tmp/lease_probe"
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 86400L))
    val b = Seq((1L, 1000L, 1.0, 1L)).toDF("entity_id", "timestamp", "power", "modified")
    ps.store("p", b) // warm
    val t0 = System.nanoTime()
    for (i <- 2 to n)
      ps.store("p", b.withColumn("modified", lit(i.toLong)))
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"stores: ${n - 1}, total ${dt}%.2f s, per-store ${dt / (n - 1) * 1000}%.1f ms")
    spark.stop()
  }
}
