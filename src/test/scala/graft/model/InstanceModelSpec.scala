package graft.model

import graft.core.{MinervaType, SecondsGranularity, DaysGranularity}
import org.scalatest.funsuite.AnyFunSuite

/** YAML shapes mirror examples/tiny_instance (trend store, materialization,
  * trigger); field names must load verbatim. */
class InstanceModelSpec extends AnyFunSuite {

  test("trend store yaml parses with aggregation defaults") {
    val ts = InstanceModel.parseTrendStore(
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
        |      - name: samples
        |        data_type: smallint
        |        time_aggregation: SUM
        |    generated_trends:
        |      - name: power_mwh
        |        data_type: numeric
        |        expression: power_kwh * 1000
        |""".stripMargin)
    assert(ts.dataSource == "hub" && ts.entityType == "node")
    assert(ts.granularity == SecondsGranularity(900))
    assert(ts.partitionSize == DaysGranularity(1))
    val part = ts.parts.head
    assert(part.trends.head.dataType == MinervaType.MNumeric)
    assert(part.trends.head.timeAggregation == "sum") // default
    assert(part.trends(1).timeAggregation == "sum")   // normalized case
    assert(part.generatedTrends.head.expression == "power_kwh * 1000")
  }

  test("renderTrendStore round-trips through parseTrendStore") {
    val ts = InstanceModel.parseTrendStore(
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
        |        time_aggregation: avg
        |        entity_aggregation: avg
        |    generated_trends:
        |      - name: power_mwh
        |        data_type: numeric
        |        expression: power_kwh * 1000
        |""".stripMargin)
    val back = InstanceModel.parseTrendStore(InstanceModel.renderTrendStore(ts))
    assert(back == ts)
  }

  test("renderMaterialization round-trips through parseMaterialization") {
    val m = Materialization("hub_node_main_1h", enabled = true,
      "30m", "5m", "3 days",
      Seq(MaterializationSource("hub_node_main_15m", "trend.mapping_15m->1h")),
      view = None)
    val back = InstanceModel.parseMaterialization(
      InstanceModel.renderMaterialization(m))
    assert(back == m)
  }

  test("compiled aggregation renders loadable instance files") {
    val src = InstanceModel.parseTrendStore(
      """title: hub_node_main_15m
        |data_source: hub
        |entity_type: node
        |granularity: 15m
        |partition_size: 1d
        |parts:
        |  - name: hub_node_main_15m
        |    trends:
        |      - name: drops
        |        data_type: smallint
        |""".stripMargin)
    val defn = InstanceModel.parseAggregation(
      """time_aggregation:
        |  source: hub_node_main_15m
        |  name: hub_node_main_1h
        |  granularity: 1h
        |  mapping_function: trend.mapping_15m->1h
        |  parts:
        |    - name: hub_node_main_1h
        |      source: hub_node_main_15m
        |""".stripMargin).timeAggregation.get
    val compiled = graft.operators.AggregationCompiler.compileTimeAggregation(src, defn)
    // the rendered YAMLs parse back into the same definitions the runner uses
    val storeBack = InstanceModel.parseTrendStore(
      InstanceModel.renderTrendStore(compiled.targetStore))
    assert(storeBack == compiled.targetStore)
    val matBack = InstanceModel.parseMaterialization(
      InstanceModel.renderMaterialization(compiled.units.head.materialization))
    assert(matBack == compiled.units.head.materialization)
    assert(storeBack.parts.head.trends.map(_.name) == Seq("samples", "drops"))
  }

  test("CLI aggregation-compile handles an entity_aggregation definition") {
    // q50-shaped definition: the CLI must write a loadable target store +
    // materialization YAML, exactly like the time path (reference
    // commands/aggregation.py:120-139)
    val dir = java.nio.file.Files.createTempDirectory("graft_eacompile")
    val trendDir = java.nio.file.Files.createDirectories(dir.resolve("trend"))
    java.nio.file.Files.writeString(trendDir.resolve("hub_user_main_1h.yaml"),
      """title: Hourly user counters
        |data_source: hub
        |entity_type: user
        |granularity: 1h
        |partition_size: 4d
        |parts:
        |  - name: hub_user_main_1h
        |    trends:
        |      - name: value_i
        |        data_type: bigint
        |""".stripMargin)
    val aggFile = dir.resolve("agg.yaml")
    java.nio.file.Files.writeString(aggFile,
      """entity_aggregation:
        |  source: hub_user_main_1h
        |  name: hub_group_main_1h
        |  entity_type: group
        |  relation: user->group
        |  aggregation_type: VIEW_MATERIALIZATION
        |  parts:
        |    - name: hub_group_main_1h
        |      source: hub_user_main_1h
        |""".stripMargin)
    graft.cli.Main.main(Array("aggregation-compile",
      dir.toString, aggFile.toString))
    // the written YAML loads back as part of the instance
    val inst = InstanceModel.loadInstance(dir.toString)
    val tgt = inst.trendStores.find(_.title == "hub_group_main_1h").get
    assert(tgt.entityType == "group")
    assert(tgt.parts.head.name == "hub_group_main_1h")
    assert(tgt.parts.head.trends.map(_.name) == Seq("samples", "value_i"))
    val mat = inst.materializations
      .find(_.targetTrendStorePart == "hub_group_main_1h").get
    assert(mat.sources.map(_.trendStorePart) == Seq("hub_user_main_1h"))
  }

  test("entity part-name translation keeps underscore entity types whole") {
    import graft.model.{AggregationGeneration => AG}
    // prefix lands after the WHOLE target entity type (generating.py:21),
    // even when that type itself contains underscores
    assert(AG.translateEntityPartName("net_router_main_15m", "v_site", "sum_")
      == "net_v_site_sum_main_15m")
    assert(AG.translateEntityPartName("net_router_main_15m", "v-region")
      == "net_v-region_main_15m")
  }

  test("YAML-only entity compilation fails with intent if the relation is forced") {
    import graft.operators.AggregationCompiler
    val src = TrendStore("Raw hub", "hub", "user",
      graft.core.Granularity.parse("1h"), graft.core.Granularity.parse("4d"),
      Seq(TrendStorePart("hub_user_main_1h",
        Seq(Trend("value_i", graft.core.MinervaType.MBigInt)))))
    val ea = EntityAggregationDef(
      name = "hub_group_main_1h", source = "Raw hub", relation = "user->group",
      entityType = "group",
      parts = Seq(AggregationPartDef("hub_group_main_1h", "hub_user_main_1h")),
      aggregationType = "VIEW_MATERIALIZATION")
    val compiled = AggregationCompiler.compileEntityAggregation(
      src, ea, AggregationCompiler.noRelation(ea.name))
    // compilation itself never forces the relation...
    assert(compiled.units.length == 1)
    // ...but a path that does gets the dedicated error, not a bare sys.error
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val ex = intercept[AggregationCompiler.RelationNotProvided] {
      compiled.units.head.compute(
        Seq((1L, 100L, 5L)).toDF("entity_id", "timestamp", "value_i")).collect()
    }
    assert(ex.getMessage.contains("hub_group_main_1h"))
    assert(ex.getMessage.contains("YAML-only"))
  }

  test("aggregation-generate on a failing ladder leaves the instance unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_genfail")
    val trendDir = java.nio.file.Files.createDirectories(dir.resolve("trend"))
    // part name breaks the <ds>_<et>_<tail> convention: the entity
    // aggregation pass throws AFTER the time rungs compiled — nothing may
    // have been written by then
    java.nio.file.Files.writeString(trendDir.resolve("odd.yaml"),
      """title: Raw odd
        |data_source: net
        |entity_type: node
        |granularity: 15m
        |partition_size: 1d
        |parts:
        |  - name: oddname
        |    trends:
        |      - name: power
        |        data_type: integer
        |""".stripMargin)
    val relDir = java.nio.file.Files.createDirectories(dir.resolve("relation"))
    java.nio.file.Files.writeString(relDir.resolve("node->site.yaml"),
      """name: node->site
        |source_entity_type: node
        |target_entity_type: site
        |query: SELECT 1 AS source_id, 1 AS target_id
        |""".stripMargin)
    intercept[IllegalArgumentException] {
      graft.cli.Main.main(Array("aggregation-generate", dir.toString))
    }
    def entries(sub: String): Seq[String] = {
      val f = dir.resolve(sub).toFile
      if (!f.exists()) Seq.empty else f.list().toSeq
    }
    assert(entries("aggregation").isEmpty, entries("aggregation"))
    assert(entries("materialization").isEmpty, entries("materialization"))
    assert(entries("trend") == Seq("odd.yaml"), entries("trend"))
  }

  test("materialization yaml parses delays and sources") {
    val m = InstanceModel.parseMaterialization(
      """target_trend_store_part: hub-kpi_node_main_15m
        |enabled: true
        |processing_delay: 30m
        |stability_delay: 5m
        |reprocessing_period: 3 days
        |sources:
        |- trend_store_part: hub_node_main_15m
        |  mapping_function: trend.mapping_id
        |view: SELECT timestamp, entity_id, power_kwh * 1000 as power_mwh FROM hub_node_main_15m
        |""".stripMargin)
    assert(m.targetTrendStorePart == "hub-kpi_node_main_15m")
    assert(m.enabled && m.processingDelay == "30m")
    assert(m.sources.head.trendStorePart == "hub_node_main_15m")
    assert(m.view.exists(_.contains("power_mwh")))
  }

  test("trigger yaml parses thresholds and condition") {
    val t = InstanceModel.parseTrigger(
      """name: node/15m/highpowerusage
        |kpi_data:
        |  - name: power_kwh
        |    data_type: numeric
        |thresholds:
        |  - name: max_power
        |    data_type: numeric
        |    value: 0.05
        |condition: power_kwh > max_power
        |weight: 'CASE WHEN power_kwh > 1 THEN 500 ELSE 300 END'
        |notification: HighPowerUsage
        |""".stripMargin)
    assert(t.name == "node/15m/highpowerusage")
    assert(t.thresholds.head.name == "max_power")
    assert(t.condition == "power_kwh > max_power")
    assert(t.kpiData.head.dataType == MinervaType.MNumeric)
  }

  test("renderTrigger round-trips through parseTrigger") {
    val t = InstanceModel.parseTrigger(
      """name: node/15m/highpowerusage
        |kpi_data:
        |  - name: power_kwh
        |    data_type: numeric
        |thresholds:
        |  - name: max_power
        |    data_type: numeric
        |    value: 0.05
        |condition: power_kwh > max_power
        |weight: 'CASE WHEN power_kwh > 1 THEN 500 ELSE 300 END'
        |notification: "SELECT format('power %s', $1.power_kwh)"
        |data: "SELECT format('{}', $1.power_kwh)"
        |notification_store: alerts
        |granularity: 15m
        |trend_store_links:
        |  - part_name: net_node_main_15m
        |    mapping_function: mapping_id
        |""".stripMargin)
    val back = InstanceModel.parseTrigger(InstanceModel.renderTrigger(t))
    assert(back == t)
    // absent granularity is omitted, not rendered as the string "null"
    val bare = t.copy(granularity = None)
    val bareBack = InstanceModel.parseTrigger(InstanceModel.renderTrigger(bare))
    assert(bareBack.granularity.isEmpty)
  }
}
