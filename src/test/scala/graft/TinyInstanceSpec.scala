package graft

import graft.core.MinervaType._
import graft.model.InstanceModel
import graft.operators._
import graft.sources.{CsvSourceConfig, CsvTrendSource}
import graft.storage.{NotificationStore, PartStore, PartStoreConfig}
import org.apache.spark.sql.functions._

/** Tier-3 smoke test mirroring the reference's `tiny_instance` end-to-end
  * flow (SURVEY §5.3: initialize --load-sample-data → materialize →
  * trigger): a full instance defined in YAML, sample CSV ingested, 15m→1h
  * materialization via the aggregation compiler + runner, trigger firing
  * into a notification store.
  */
class TinyInstanceSpec extends SparkSpec {
  import spark.implicits._

  test("tiny instance end-to-end: ingest → materialize → trigger → notifications") {
    val base = "target/tmp/tiny_instance"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)

    // --- instance definitions (tiny_instance shapes) ---
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
    val trigger = InstanceModel.parseTrigger(
      """name: node/1h/highpowerusage
        |kpi_data:
        |  - name: power_kwh
        |    data_type: numeric
        |thresholds:
        |  - name: max_power
        |    data_type: numeric
        |    value: 100.0
        |condition: power_kwh > max_power
        |weight: 'CASE WHEN power_kwh > 110 THEN 500 ELSE 300 END'
        |""".stripMargin)

    // --- sample data (sample.csv shape) ---
    val csv =
      """node,timestamp,power_kwh
        |hillside14,2020-08-25T14:00:00Z,55.8
        |hillside14,2020-08-25T14:20:00Z,56.2
        |hillside15,2020-08-25T14:05:00Z,50.1
        |hillside15,2020-08-25T15:10:00Z,20.0
        |""".stripMargin
    val csvPath = s"$base/sample.csv"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csvPath), csv)

    // --- ingest (§3.1) ---
    val cfg = CsvSourceConfig("node", Some("timestamp"))
    val pkg = CsvTrendSource.read(spark, csvPath, cfg,
      Seq("node" -> MText, "timestamp" -> MTimestamp, "power_kwh" -> MNumeric))
    val dim = Seq.empty[(String, Long)].toDF("name", "id")
    val ids = EntityResolution.resolveHash(pkg.select(col("entity").as("name")), dim, "node")
    val batch = pkg.join(ids, pkg("entity") === ids("name"))
      .select(col("id").as("entity_id"), col("timestamp"),
        col("power_kwh").cast("double").as("power_kwh"))
      .withColumn("modified", lit(1000L))
    val parts = new PartStore(spark, PartStoreConfig(s"$base/parts", 86400))
    parts.store(store.parts.head.name, batch)
    parts.markModified(store.parts.head.name, batch, nowSec = 1000L)

    // --- materialize 15m → 1h via compiler + runner (§3.2) ---
    val src = parts.readPart(store.parts.head.name).get
    val fp = Materialization.fingerprint(
      Materialization.modifiedState(
        src.withColumn("chunk", (col("timestamp") - pmod(col("timestamp"), lit(3600L)))),
        Seq("chunk", "entity_id"), "modified"),
      "chunk", "entity_id", "last_modified")
    val runner = new MaterializationRunner(spark, parts, s"$base/state")
    val compute = AggregationCompiler.timeAggregation(store.parts.head, 3600L)
    val done = runner.run(
      MaterializationSpec("hub_node_main_1h",
        chunk => compute(src.filter(
          col("timestamp") >= chunk && col("timestamp") < chunk + 3600))
          .withColumn("modified", lit(2000L)),
        stabilityDelaySec = 0, retentionSec = Long.MaxValue / 4),
      fp, nowSec = java.time.Instant.parse("2020-09-01T00:00:00Z").getEpochSecond)
    assert(done.size == 2) // two distinct hours in the sample

    val hourly = parts.readPart("hub_node_main_1h").get
    // hillside14: 55.8+56.2 = 112.0 in hour 14
    val h14 = hourly.filter(col("power_kwh") > 100).collect()
    assert(h14.length == 1 && h14.head.getAs[java.math.BigDecimal]("power_kwh")
      .doubleValue() == 112.0)

    // --- trigger (§3.3) into notification store ---
    val kpi = hourly.select(col("entity_id"), col("timestamp"), col("power_kwh"))
    val notifs = TriggerOps.createNotifications(kpi, TriggerRule(
      trigger.name,
      trigger.thresholds.map(t => t.name -> t.value).toMap,
      trigger.condition, trigger.weight,
      format_string("%s exceeded", col("entity_id"))))
    val ns = new NotificationStore(spark, s"$base/notifications")
    ns.store(notifs, nowSec = 3000L)
    ns.store(notifs, nowSec = 4000L) // duplicate delivery — PK dedup on read
    val read = ns.read().get.collect()
    assert(read.length == 1)
    assert(read.head.getAs[Long]("weight") == 500L) // 112 > 110
    assert(read.head.getAs[Long]("created") == 4000L) // last wins
  }

  test("aggregation YAML compiles to a runnable 15m→1h→1d chain") {
    val src = InstanceModel.parseTrendStore(
      """title: Raw node counters
        |data_source: hub
        |entity_type: node
        |granularity: 15m
        |partition_size: 1d
        |parts:
        |  - name: hub_node_main_15m
        |    trends:
        |      - name: drops
        |        data_type: smallint
        |      - name: ccr
        |        data_type: double precision
        |        time_aggregation: avg
        |        entity_aggregation: avg
        |""".stripMargin)
    val def1h = InstanceModel.parseAggregation(
      """time_aggregation:
        |  source: hub_node_main_15m
        |  name: hub_node_main_1h
        |  granularity: 1h
        |  mapping_function: trend.mapping_15m->1h
        |  parts:
        |    - name: hub_node_main_1h
        |      source: hub_node_main_15m
        |""".stripMargin).timeAggregation.get
    val c1 = AggregationCompiler.compileTimeAggregation(src, def1h)

    // target STORE definition (define_aggregate_trend_store semantics)
    assert(c1.targetStore.granularity.name == "1h")
    assert(c1.targetStore.partitionSize.name == "4d") // PARTITION_SIZE_MAPPING
    assert(c1.targetStore.dataSource == "hub" && c1.targetStore.entityType == "node")
    val tgtPart = c1.targetStore.parts.head
    assert(tgtPart.trends.head.name == "samples") // injected
    assert(tgtPart.trends.find(_.name == "drops").get.dataType.name == "bigint") // sum widening
    assert(tgtPart.trends.find(_.name == "ccr").get.dataType.name == "double precision")

    // materialization metadata (define_part_time_aggregation defaults)
    val m = c1.units.head.materialization
    assert(m.processingDelay == "30m" && m.stabilityDelay == "5m"
      && m.reprocessingPeriod == "3 days"
      && m.sources.head.mappingFunction == "trend.mapping_15m->1h")

    // run the chain: 15m rows → 1h → 1d
    val df15 = Seq(
      (1L, 900L, 5, 0.5), (1L, 1800L, 7, 0.7),   // both in hour ending 3600
      (1L, 4500L, 2, 0.2),                        // hour ending 7200
      (2L, 900L, 1, 0.1)
    ).toDF("entity_id", "timestamp", "drops", "ccr")
    val hourly = c1.units.head.compute(df15)
    val h = hourly.sort("entity_id", "timestamp").collect()
    assert(h(0).getAs[Long]("samples") == 2 && h(0).getAs[Long]("drops") == 12L)
    assert(h(0).getAs[Double]("ccr") == 0.6)

    val def1d = InstanceModel.parseAggregation(
      """time_aggregation:
        |  source: hub_node_main_1h
        |  name: hub_node_main_1d
        |  granularity: 1d
        |  mapping_function: trend.mapping_1h->1d
        |  parts:
        |    - name: hub_node_main_1d
        |      source: hub_node_main_1h
        |""".stripMargin).timeAggregation.get
    val c2 = AggregationCompiler.compileTimeAggregation(c1.targetStore, def1d)
    assert(c2.targetStore.partitionSize.name == "3month")
    val daily = c2.units.head.compute(hourly).sort("entity_id", "timestamp").collect()
    // entity 1: samples 2+1, drops 12+2; one day window ending 86400
    assert(daily.length == 2)
    assert(daily(0).getAs[Long]("timestamp") == 86400L)
    assert(daily(0).getAs[Long]("samples") == 3L)
    assert(daily(0).getAs[java.math.BigDecimal]("drops").longValueExact == 14L)

    // custom timestamp-mapping function (I4): registered by name
    TimestampMappings.register("mapping_shift_1h",
      ts => (ts + lit(3600L)).cast("long"))
    val shifted = AggregationCompiler.timeAggregationMapped(
      c1.targetStore.parts.head, TimestampMappings.resolve("mapping_shift_1h"))(df15)
    assert(shifted.sort("entity_id", "timestamp").head.getAs[Long]("timestamp") == 4500L)
  }
}
