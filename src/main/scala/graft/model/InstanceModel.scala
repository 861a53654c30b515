package graft.model

import graft.core.{Granularity, MinervaType}
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** Instance definition model: the YAML shapes a Minerva instance is declared
  * in (reference: src/minerva/instance/__init__.py — Trend at 43-69 with
  * aggregation defaults SUM/SUM at 66-67, GeneratedTrend at 102-162,
  * TrendStorePart at 165-214, TrendStore at 217-287; examples under
  * examples/tiny_instance/). Field names match the reference YAML exactly so
  * existing instance definitions load verbatim.
  *
  * The SQL-bearing fields (generated-trend expressions, trigger conditions,
  * materialization views) carry *portable scalar SQL* which Spark evaluates
  * via `expr(...)`; validation happens at definition load
  * (`sparkSession.sessionState.sqlParser.parseExpression`-equivalent is
  * exercised by evaluating against an empty frame in tests).
  */
final case class Trend(
    name: String,
    dataType: MinervaType,
    description: String = "",
    timeAggregation: String = "sum",   // reference default SUM
    entityAggregation: String = "sum"
)

final case class GeneratedTrend(name: String, dataType: MinervaType, expression: String)

final case class TrendStorePart(
    name: String,
    trends: Seq[Trend],
    generatedTrends: Seq[GeneratedTrend] = Seq.empty
)

final case class TrendStore(
    title: String,
    dataSource: String,
    entityType: String,
    granularity: Granularity,
    partitionSize: Granularity,
    parts: Seq[TrendStorePart]
)

final case class MaterializationSource(trendStorePart: String, mappingFunction: String)

final case class Materialization(
    targetTrendStorePart: String,
    enabled: Boolean,
    processingDelay: String,
    stabilityDelay: String,
    reprocessingPeriod: String,
    sources: Seq[MaterializationSource],
    view: Option[String]
)

final case class Threshold(name: String, dataType: MinervaType, value: Any)

final case class Trigger(
    name: String,
    kpiData: Seq[Trend],
    thresholds: Seq[Threshold],
    condition: String,
    weight: String,
    notification: String
)

/** One part of an aggregation definition: target part `name` aggregated
  * from source part `source` (aggregation_compilation.py:449-471). */
final case class AggregationPartDef(name: String, source: String)

/** A `time_aggregation` definition (reference aggregation YAML; compiled by
  * aggregation_compilation.py:562-599). `mappingFunction` names a
  * source→target timestamp mapping (the reference's
  * `trend.mapping_{src}->{tgt}` regprocedure, aggregation_generation.py:268;
  * resolved by [[graft.operators.TimestampMappings]]). */
final case class TimeAggregationDef(
    name: String,
    source: String,
    granularity: Granularity,
    mappingFunction: String,
    parts: Seq[AggregationPartDef],
    dataSource: Option[String] = None,
    entityType: Option[String] = None
)

/** An `entity_aggregation` definition (compiled by
  * aggregation_compilation.py:113-189): rolls a source store up a named
  * relation to a new entity type. */
final case class EntityAggregationDef(
    name: String,
    source: String,
    relation: String,
    entityType: String,
    parts: Seq[AggregationPartDef],
    aggregationType: String = "VIEW_MATERIALIZATION"
)

final case class AggregationDef(
    timeAggregation: Option[TimeAggregationDef],
    entityAggregation: Option[EntityAggregationDef]
)

/** A fully-loaded instance directory (the reference's `minerva initialize`
  * input layout: trend/, materialization/, trigger/, aggregation/
  * subdirectories of YAML files — src/minerva/commands/initialize.py:70-147). */
final case class Instance(
    trendStores: Seq[TrendStore],
    materializations: Seq[Materialization],
    triggers: Seq[Trigger],
    aggregations: Seq[AggregationDef] = Seq.empty
)

object InstanceModel {

  /** Load an instance definition directory. Unknown subdirectories are
    * ignored; files must be `.yaml`. */
  def loadInstance(root: String): Instance = {
    def files(sub: String): Seq[String] = {
      val d = java.nio.file.Paths.get(root, sub)
      if (!java.nio.file.Files.isDirectory(d)) Seq.empty
      else {
        val s = java.nio.file.Files.list(d)
        try s.iterator().asScala.toSeq
          .filter(_.toString.endsWith(".yaml")).sortBy(_.toString)
          .map(java.nio.file.Files.readString(_))
        finally s.close()
      }
    }
    Instance(
      trendStores = files("trend").map(parseTrendStore),
      materializations = files("materialization").map(parseMaterialization),
      triggers = files("trigger").map(parseTrigger),
      aggregations = files("aggregation").map(parseAggregation)
    )
  }
  private def yamlMap(text: String): Map[String, Any] = {
    val y = new Yaml()
    y.load[java.util.Map[String, Any]](text).asScala.toMap
  }
  private def seqOfMaps(v: Any): Seq[Map[String, Any]] = v match {
    case null => Seq.empty
    case l: java.util.List[_] =>
      l.asScala.toSeq.map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
    case _ => Seq.empty
  }
  private def str(m: Map[String, Any], k: String, dflt: String = ""): String =
    m.get(k).map(String.valueOf).getOrElse(dflt)
  private def mtype(m: Map[String, Any]): MinervaType =
    MinervaType.byName(str(m, "data_type", "text")).getOrElse(MinervaType.MText)

  private def trend(m: Map[String, Any]): Trend = Trend(
    name = str(m, "name"),
    dataType = mtype(m),
    description = str(m, "description"),
    timeAggregation = str(m, "time_aggregation", "sum").toLowerCase,
    entityAggregation = str(m, "entity_aggregation", "sum").toLowerCase
  )

  def parseTrendStore(yamlText: String): TrendStore = {
    val m = yamlMap(yamlText)
    TrendStore(
      title = str(m, "title"),
      dataSource = str(m, "data_source"),
      entityType = str(m, "entity_type"),
      granularity = Granularity.parse(str(m, "granularity")),
      partitionSize = Granularity.parse(str(m, "partition_size", "1d")),
      parts = seqOfMaps(m.getOrElse("parts", null))
        .map { p =>
          TrendStorePart(
            name = str(p, "name"),
            trends = seqOfMaps(p.getOrElse("trends", null)).map(trend),
            generatedTrends = seqOfMaps(p.getOrElse("generated_trends", null)).map { g =>
              GeneratedTrend(str(g, "name"), mtype(g), str(g, "expression"))
            }
          )
        }
    )
  }

  def parseMaterialization(yamlText: String): Materialization = {
    val m = yamlMap(yamlText)
    Materialization(
      targetTrendStorePart = str(m, "target_trend_store_part"),
      enabled = m.get("enabled").forall(_ == true),
      processingDelay = str(m, "processing_delay", "30m"),
      stabilityDelay = str(m, "stability_delay", "5m"),
      reprocessingPeriod = str(m, "reprocessing_period", "3 days"),
      sources = seqOfMaps(m.getOrElse("sources", null)).map { s =>
        MaterializationSource(str(s, "trend_store_part"), str(s, "mapping_function"))
      },
      view = m.get("view").map(String.valueOf)
    )
  }

  /** Parse an aggregation definition file: `time_aggregation` and/or
    * `entity_aggregation` keys (commands/aggregation.py:123-140). */
  def parseAggregation(yamlText: String): AggregationDef = {
    val m = yamlMap(yamlText)
    def partDefs(d: Map[String, Any]): Seq[AggregationPartDef] =
      seqOfMaps(d.getOrElse("parts", null)).map(p =>
        AggregationPartDef(str(p, "name"), str(p, "source")))
    val ta = m.get("time_aggregation")
      .map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
      .map { d =>
        TimeAggregationDef(
          name = str(d, "name"),
          source = str(d, "source"),
          granularity = Granularity.parse(str(d, "granularity")),
          mappingFunction = str(d, "mapping_function", "mapping_id"),
          parts = partDefs(d),
          dataSource = d.get("data_source").map(String.valueOf),
          entityType = d.get("entity_type").map(String.valueOf))
      }
    val ea = m.get("entity_aggregation")
      .map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
      .map { d =>
        EntityAggregationDef(
          name = str(d, "name"),
          source = str(d, "source"),
          relation = str(d, "relation"),
          entityType = str(d, "entity_type"),
          parts = partDefs(d),
          aggregationType = str(d, "aggregation_type", "VIEW_MATERIALIZATION"))
      }
    AggregationDef(ta, ea)
  }

  // ---- YAML rendering (the compile side of `minerva aggregation compile`:
  // the reference writes the compiled target store + materializations back
  // into the instance directory as YAML files) ----

  private def jmap(kvs: (String, Any)*): java.util.Map[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    kvs.foreach { case (k, v) => m.put(k, v) }
    m
  }
  private def jlist(xs: Seq[Any]): java.util.List[Any] = {
    val l = new java.util.ArrayList[Any]()
    xs.foreach(l.add)
    l
  }
  private def dumpYaml(root: Any): String = {
    val opts = new org.yaml.snakeyaml.DumperOptions
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new Yaml(opts).dump(root)
  }

  /** Render a trend store as reference-shaped YAML (parseTrendStore is the
    * inverse — round-trip asserted in specs). */
  def renderTrendStore(ts: TrendStore): String =
    dumpYaml(jmap(
      "title" -> ts.title,
      "data_source" -> ts.dataSource,
      "entity_type" -> ts.entityType,
      "granularity" -> ts.granularity.name,
      "partition_size" -> ts.partitionSize.name,
      "parts" -> jlist(ts.parts.map { p =>
        val base = Seq(
          "name" -> p.name,
          "trends" -> jlist(p.trends.map { t =>
            jmap("name" -> t.name, "data_type" -> t.dataType.name,
              "description" -> t.description,
              "time_aggregation" -> t.timeAggregation,
              "entity_aggregation" -> t.entityAggregation)
          }))
        val gen =
          if (p.generatedTrends.isEmpty) Seq.empty
          else Seq("generated_trends" -> jlist(p.generatedTrends.map { g =>
            jmap("name" -> g.name, "data_type" -> g.dataType.name,
              "expression" -> g.expression)
          }))
        jmap((base ++ gen): _*)
      })))

  /** Render a materialization definition as reference-shaped YAML. */
  def renderMaterialization(m: Materialization): String =
    dumpYaml(jmap(
      "target_trend_store_part" -> m.targetTrendStorePart,
      "enabled" -> m.enabled,
      "processing_delay" -> m.processingDelay,
      "stability_delay" -> m.stabilityDelay,
      "reprocessing_period" -> m.reprocessingPeriod,
      "sources" -> jlist(m.sources.map(s =>
        jmap("trend_store_part" -> s.trendStorePart,
          "mapping_function" -> s.mappingFunction)))))

  def parseTrigger(yamlText: String): Trigger = {
    val m = yamlMap(yamlText)
    Trigger(
      name = str(m, "name"),
      kpiData = seqOfMaps(m.getOrElse("kpi_data", null)).map(trend),
      thresholds = seqOfMaps(m.getOrElse("thresholds", null)).map { t =>
        Threshold(str(t, "name"), mtype(t), t.getOrElse("value", null))
      },
      condition = str(m, "condition"),
      weight = str(m, "weight"),
      notification = str(m, "notification")
    )
  }
}
