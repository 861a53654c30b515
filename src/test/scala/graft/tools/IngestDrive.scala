package graft.tools

import graft.core.MinervaType._
import graft.model.InstanceModel
import graft.operators._
import graft.sources.{CsvSourceConfig, CsvTrendSource}
import graft.storage.{PartStore, PartStoreConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end drive of the reference's `minerva load-data` lifecycle
  * (SURVEY §3.1) through graft's public API:
  * CSV → deduce schema → normalize → resolve entities → store into a
  * partitioned part → time-aggregate → trigger notifications. */
object IngestDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // instance definition (tiny_instance shape)
    val store = InstanceModel.parseTrendStore(
      """title: Raw node counters
        |data_source: hub
        |entity_type: node
        |granularity: 15m
        |partition_size: 1d
        |parts:
        |  - name: hub_node_main_15m
        |    trends:
        |      - name: power_kwh
        |        data_type: numeric
        |""".stripMargin)
    println("MODEL=" + store.parts.head.name + "/" + store.granularity.name)

    // CSV fixture → normalized package
    val csv =
      """node,timestamp,power_kwh
        |hillside14,2020-08-25T14:00:00Z,55.8
        |hillside15,2020-08-25T14:05:00Z,50.1
        |hillside14,2020-08-25T14:20:00Z,56.2
        |hillside14,2020-08-26T09:00:00Z,1.5
        |""".stripMargin
    val p = java.nio.file.Paths.get("target/tmp/ingest_drive.csv")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, csv)
    val cfg = CsvSourceConfig("node", Some("timestamp"))
    val schema = CsvTrendSource.deduceSchema(spark, p.toString, cfg)
    println("DEDUCED=" + schema.map { case (c, t) => s"$c:${t.name}" }.mkString(","))
    val pkg = CsvTrendSource.read(spark, p.toString, cfg,
      Seq("node" -> MText, "timestamp" -> MTimestamp, "power_kwh" -> MNumeric))

    // entity resolution (empty dim → all allocated)
    import spark.implicits._
    val dim = Seq.empty[(String, Long)].toDF("name", "id")
    val resolved = EntityResolution.resolveHash(
      pkg.select(col("entity").as("name")), dim, "node")
    val withIds = pkg.join(resolved, pkg("entity") === resolved("name"))
      .select(col("id").as("entity_id"), col("timestamp"),
        col("power_kwh").cast("double").as("power_kwh"))
      .withColumn("modified", lit(1L))
    println("RESOLVED=" + resolved.count())

    // store into partitioned part (partition size 1d)
    val base = "target/tmp/ingest_drive_store"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new PartStore(spark, PartStoreConfig(base, 86400))
    val nParts = ps.store(store.parts.head.name, withIds)
    println("STORED_PARTITIONS=" + nParts)

    // rollup 15m → 1h with metadata-driven agg (default sum)
    val part = ps.readPart(store.parts.head.name).get
    val hourly = TimeAggregation.rollup(part, "entity_id", "timestamp", 3600,
      Seq(TimeAggregation.samples,
        TrendAgg("power_kwh", store.parts.head.trends.head.timeAggregation, "power_kwh").exact(2)))
    println("HOURLY=" + hourly.sort("entity_id", "timestamp").collect().mkString(";"))

    // trigger on the rollup
    val notifs = TriggerOps.createNotifications(
      hourly.select(col("entity_id"), col("timestamp"), col("power_kwh")),
      TriggerRule("node/1h/highpower", Map("max_power" -> 100.0),
        "power_kwh > max_power", "500",
        concat(lit("power="), col("power_kwh"))))
    println("NOTIFS=" + notifs.count())
    spark.stop()
    println("INGEST_DRIVE_OK")
  }
}
