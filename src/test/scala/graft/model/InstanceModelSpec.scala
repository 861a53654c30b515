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
}
