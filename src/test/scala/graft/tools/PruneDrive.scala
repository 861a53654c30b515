package graft.tools
import graft.storage.{PartStore, PartStoreConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence drive: ingest sf0.1 events into the partitioned PartStore
  * layout, then show a time-range query pruning partitions at scan. */
object PruneDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = graft.Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select(col("user_id").as("entity_id"),
        expr("ts div 1000000000").as("timestamp"),
        col("value")).withColumn("modified", lit(1L))
    val base = "target/tmp/prune_store"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new PartStore(spark, PartStoreConfig(base, 86400))
    val t0 = System.nanoTime()
    val n = ps.store("events_15m", events)
    println(f"INGESTED_PARTITIONS=$n in ${(System.nanoTime()-t0)/1e9}%.1fs")
    // time-range query: one day out of 30
    val part = ps.readPart("events_15m").get
    val day = part.filter(col("pindex") === 19740) // 2024-01-13
    val plan = day.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.find(_.trim.startsWith("PartitionFilters")).map(_.trim.take(200))
    println("PARTITION_FILTERS=" + pf.getOrElse("NONE"))
    val scanned = day.queryExecution.executedPlan.collectLeaves().head.metrics
    println("DAY_ROWS=" + day.count())
    println("FILES_READ=" + scanned.get("numFiles").map(_.value))
    val full = part.count()
    println("FULL_ROWS=" + full)
    spark.stop()
    println("PRUNE_DRIVE_OK")
  }
}
