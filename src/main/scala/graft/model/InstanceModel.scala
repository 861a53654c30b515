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

/** A trigger's binding to a trend-store part (reference trigger YAML
  * `trend_store_links`: part_name + mapping_function). */
final case class TriggerStoreLink(partName: String, mappingFunction: String)

/** @param data             JSON payload expression (reference trigger YAML
  *                         `data`; empty → `{}`)
  * @param notificationStore name of the notification store the rule writes
  *                         to (reference `notification_store`)
  * @param granularity      KPI granularity the rule evaluates at
  * @param trendStoreLinks  parts feeding the rule's KPI rows */
final case class Trigger(
    name: String,
    kpiData: Seq[Trend],
    thresholds: Seq[Threshold],
    condition: String,
    weight: String,
    notification: String,
    data: String = "",
    notificationStore: String = "",
    granularity: Option[String] = None,
    trendStoreLinks: Seq[TriggerStoreLink] = Seq.empty
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

/** A typed attribute column declaration (reference Attribute,
  * instance/__init__.py:295-330 — shared by attribute stores and
  * notification stores). */
final case class AttributeDef(
    name: String,
    dataType: MinervaType,
    unit: String = "",
    description: String = ""
)

/** An attribute-store definition (instance/__init__.py:333-372):
  * `attribute/<ds>_<et>.yaml`. */
final case class AttributeStoreDef(
    title: Option[String],
    dataSource: String,
    entityType: String,
    attributes: Seq[AttributeDef]
)

/** A notification-store definition (instance/__init__.py:375-418,
  * YAML files under `notification/`): a per-data-source notification table whose
  * attribute columns are YAML-typed (DDL side: storage/notification/
  * tables.py:58-115). [[graft.storage.NotificationStore]] enforces these
  * types on store. `name` is the definition file's stem — triggers
  * reference a store by this name first, data_source as fallback. */
final case class NotificationStoreDef(
    title: Option[String],
    dataSource: String,
    entityType: String,
    attributes: Seq[AttributeDef],
    name: String = ""
)

/** An entity relation definition (instance/__init__.py:421-453, YAML files
  * under `relation/`): a named (source_id, target_id) edge set materialized
  * from `query`. The reference query is PostgreSQL run as
  * `TRUNCATE; INSERT INTO relation.<name> …`; graft's contract is portable
  * SQL over registered `entity_<type>` views (dashes → underscores), run by
  * [[graft.operators.RelationOps.materialize]]. */
final case class RelationDef(
    name: String,
    sourceEntityType: String,
    targetEntityType: String,
    query: String
)

/** A virtual-entity definition (`virtual-entity/<name>.sql`,
  * commands/initialize.py:180-199 + virtual_entity.py:30-57): a view over
  * static names whose rows are inserted into the entity directory on
  * materialize (`ON CONFLICT DO NOTHING` = insert-missing). `name` is the
  * file stem = entity type; `viewSelect` is the SELECT body extracted from
  * the `CREATE VIEW … AS <select>` statement (the portable core — the
  * surrounding DDL is PostgreSQL catalog plumbing with no Spark analogue). */
final case class VirtualEntityDef(
    name: String,
    sql: String,
    viewSelect: Option[String]
)

/** A fully-loaded instance directory (the reference's `minerva initialize`
  * input layout: trend/, attribute/, notification/, virtual-entity/,
  * relation/, materialization/, trigger/, aggregation/ subdirectories —
  * src/minerva/commands/initialize.py:70-147). */
final case class Instance(
    trendStores: Seq[TrendStore],
    materializations: Seq[Materialization],
    triggers: Seq[Trigger],
    aggregations: Seq[AggregationDef] = Seq.empty,
    attributeStores: Seq[AttributeStoreDef] = Seq.empty,
    notificationStores: Seq[NotificationStoreDef] = Seq.empty,
    relations: Seq[RelationDef] = Seq.empty,
    virtualEntities: Seq[VirtualEntityDef] = Seq.empty
)

object InstanceModel {

  /** Load an instance definition directory. Unknown subdirectories are
    * ignored; definition files are `.yaml` except virtual entities
    * (`.sql` files under `virtual-entity/`, named by file stem). */
  def loadInstance(root: String): Instance = {
    def list(sub: String, ext: String): Seq[java.nio.file.Path] = {
      val d = java.nio.file.Paths.get(root, sub)
      if (!java.nio.file.Files.isDirectory(d)) Seq.empty
      else {
        val s = java.nio.file.Files.list(d)
        try s.iterator().asScala.toSeq
          .filter(_.toString.endsWith(ext)).sortBy(_.toString)
        finally s.close()
      }
    }
    def files(sub: String): Seq[String] =
      list(sub, ".yaml").map(java.nio.file.Files.readString(_))
    Instance(
      trendStores = files("trend").map(parseTrendStore),
      materializations = files("materialization").map(parseMaterialization),
      triggers = files("trigger").map(parseTrigger),
      aggregations = files("aggregation").map(parseAggregation),
      attributeStores = files("attribute").map(parseAttributeStore),
      notificationStores = list("notification", ".yaml").map { p =>
        val stem = p.getFileName.toString.stripSuffix(".yaml")
        parseNotificationStore(java.nio.file.Files.readString(p))
          .copy(name = stem)
      },
      relations = files("relation").map(parseRelation),
      virtualEntities = list("virtual-entity", ".sql").map { p =>
        val stem = p.getFileName.toString.stripSuffix(".sql")
        parseVirtualEntity(stem, java.nio.file.Files.readString(p))
      }
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
  /** PostgreSQL spellings seen in reference instance YAML that aren't in
    * the core lattice (e.g. tiny_instance/notification/
    * trigger-notification.yaml uses `json` and `timestamp with time zone`). */
  private val typeAliases: Map[String, MinervaType] = Map(
    "timestamp with time zone" -> MinervaType.MTimestamp,
    "timestamptz" -> MinervaType.MTimestamp,
    "json" -> MinervaType.MText,
    "jsonb" -> MinervaType.MText
  )
  private def mtype(m: Map[String, Any]): MinervaType = {
    val n = str(m, "data_type", "text")
    typeAliases.get(n)
      .orElse(MinervaType.byName(n))
      .getOrElse(MinervaType.MText)
  }

  private def trend(m: Map[String, Any]): Trend = Trend(
    name = str(m, "name"),
    dataType = mtype(m),
    description = str(m, "description"),
    timeAggregation = str(m, "time_aggregation", "sum").toLowerCase,
    entityAggregation = str(m, "entity_aggregation", "sum").toLowerCase
  )

  def parseTrendStore(yamlText: String): TrendStore =
    trendStoreFromMap(yamlMap(yamlText))

  private def trendStoreFromMap(m: Map[String, Any]): TrendStore = {
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

  def parseMaterialization(yamlText: String): Materialization =
    materializationFromMap(yamlMap(yamlText))

  private def materializationFromMap(m: Map[String, Any]): Materialization = {
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
          // explicit YAML nulls behave like absence, not the string "null"
          dataSource = d.get("data_source").filter(_ != null).map(String.valueOf),
          entityType = d.get("entity_type").filter(_ != null).map(String.valueOf))
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

  /** Parse `aggregation/aggregation_hints.yaml`
    * (instance/__init__.py:548-562): relation name → "TYPE" or
    * "TYPE+prefix"; TYPE normalizes to the upper-case aggregation-type
    * names parseAggregation already accepts. */
  def parseAggregationHints(yamlText: String): Map[String, (String, String)] = {
    val m = new Yaml().load[java.util.Map[String, String]](yamlText)
    if (m == null) Map.empty
    else m.asScala.toMap.map { case (rel, v) =>
      val parts = String.valueOf(v).split("\\+", 2)
      rel -> (parts(0).trim.toUpperCase,
        if (parts.length > 1) parts(1).trim else "")
    }
  }

  /** Load the instance's aggregation hints, if the file exists. */
  def loadAggregationHints(instanceDir: String): Map[String, (String, String)] = {
    val p = java.nio.file.Paths.get(instanceDir, "aggregation",
      "aggregation_hints.yaml")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else parseAggregationHints(java.nio.file.Files.readString(p))
  }

  /** Render an aggregation definition as reference-shaped YAML
    * (aggregation_generation.py:200-292 writes the same keys;
    * parseAggregation is the inverse). */
  def renderAggregation(defn: AggregationDef): String = {
    val body = defn.timeAggregation.map { ta =>
      // absent optionals are OMITTED, not rendered as YAML null — a
      // `data_source: null` would reload as the literal string "null"
      "time_aggregation" -> jmap((Seq(
        "source" -> (ta.source: Any),
        "name" -> ta.name) ++
        ta.dataSource.map("data_source" -> (_: Any)).toSeq ++
        ta.entityType.map("entity_type" -> (_: Any)).toSeq ++ Seq(
        "granularity" -> ta.granularity.name,
        "mapping_function" -> ta.mappingFunction,
        "parts" -> jlist(ta.parts.map(p =>
          jmap("name" -> p.name, "source" -> p.source))))): _*)
    }.orElse(defn.entityAggregation.map { ea =>
      "entity_aggregation" -> jmap(
        "source" -> ea.source,
        "name" -> ea.name,
        "entity_type" -> ea.entityType,
        "relation" -> ea.relation,
        "aggregation_type" -> ea.aggregationType,
        "parts" -> jlist(ea.parts.map(p =>
          jmap("name" -> p.name, "source" -> p.source))))
    }).getOrElse(throw new IllegalArgumentException("empty aggregation def"))
    dumpYaml(jmap(body))
  }

  /** One native sample dataset (sample-data/definition.yaml `native`
    * entries, commands/load_sample_data.py:61-86 + the parser_config the
    * harvest plugin receives). */
  final case class SampleDataSet(
      name: String,
      dataSource: String,
      granularity: Granularity,
      entityType: String,
      identifier: String,
      timestamp: String,
      delimiter: String,
      columns: Seq[(String, MinervaType)],
      kind: String = "trend" // definition `type:` — trend | attribute
  )

  /** Parse sample-data/definition.yaml (a list of `- native: {…}` /
    * `- command: {…}` entries); only native CSV sets are returned —
    * `command` sets shell out to generator modules in the reference and
    * have no portable analogue. */
  def loadSampleDataDefs(root: String): Seq[SampleDataSet] = {
    val p = java.nio.file.Paths.get(root, "sample-data", "definition.yaml")
    if (!java.nio.file.Files.isRegularFile(p)) Seq.empty
    else {
      val y = new Yaml()
      val docs = y.load[java.util.List[java.util.Map[String, Any]]](
        java.nio.file.Files.readString(p))
      if (docs == null) Seq.empty
      else docs.asScala.toSeq.flatMap { entry =>
        entry.asScala.toMap.get("native").map { cfgAny =>
          val cfg = cfgAny.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
          val pc = cfg.get("parser_config")
            .map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
            .getOrElse(Map.empty[String, Any])
          SampleDataSet(
            name = str(cfg, "name"),
            dataSource = str(cfg, "data_source"),
            granularity = Granularity.parse(
              str(pc, "granularity", str(cfg, "granularity", "15m"))),
            entityType = str(pc, "entity_type", "node"),
            identifier = str(pc, "identifier"),
            timestamp = str(pc, "timestamp"),
            delimiter = str(pc, "delimiter", ","),
            columns = seqOfMaps(pc.getOrElse("columns", null))
              .map(c => str(c, "name") -> mtype(c)),
            kind = str(cfg, "type", "trend")
          )
        }
      }
    }
  }

  private def attributeDefs(m: Map[String, Any]): Seq[AttributeDef] =
    seqOfMaps(m.getOrElse("attributes", null)).map { a =>
      AttributeDef(str(a, "name"), mtype(a), str(a, "unit"), str(a, "description"))
    }

  /** Parse an attribute-store definition (instance/__init__.py:346-356). */
  def parseAttributeStore(yamlText: String): AttributeStoreDef = {
    val m = yamlMap(yamlText)
    AttributeStoreDef(
      title = m.get("title").map(String.valueOf),
      dataSource = str(m, "data_source"),
      entityType = str(m, "entity_type"),
      attributes = attributeDefs(m)
    )
  }

  /** Parse a notification-store definition (instance/__init__.py:393-402). */
  def parseNotificationStore(yamlText: String): NotificationStoreDef = {
    val m = yamlMap(yamlText)
    NotificationStoreDef(
      title = m.get("title").map(String.valueOf),
      dataSource = str(m, "data_source"),
      entityType = str(m, "entity_type"),
      attributes = attributeDefs(m)
    )
  }

  /** Parse a `structure dump` document back into definitions — the apply
    * side of the dump (reference `structure load`,
    * commands/structure.py:24-32; the reference body is a stub, so the
    * contract is graft's own dump format). The dump is JSON, which
    * snakeyaml parses natively (YAML ⊇ JSON) — same loader as the
    * definition files. EVERY kind round-trips with full fidelity: the dump
    * carries typed store columns (with aggregation metadata and generated
    * trends) plus complete relation / virtual-entity / materialization /
    * trigger definitions. Older name-only dumps still load (non-map list
    * entries are skipped, yielding the empty definitions they carried). */
  def parseStructure(text: String): Instance = {
    val m = yamlMap(text)
    // lenient list-of-maps: legacy dumps carried some kinds as bare name
    // strings — skip those instead of failing the whole load
    def maps(key: String): Seq[Map[String, Any]] = m.getOrElse(key, null) match {
      case l: java.util.List[_] => l.asScala.toSeq.collect {
        case e: java.util.Map[_, _] =>
          e.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
      }
      case _ => Seq.empty
    }
    Instance(
      trendStores =
        seqOfMaps(m.getOrElse("trend_stores", null)).map(trendStoreFromMap),
      materializations = maps("materializations").map(materializationFromMap),
      triggers = maps("triggers").map(triggerFromMap),
      relations = maps("relations").map { rm =>
        RelationDef(
          name = str(rm, "name"),
          sourceEntityType = str(rm, "source_entity_type"),
          targetEntityType = str(rm, "target_entity_type"),
          query = str(rm, "query"))
      },
      virtualEntities = maps("virtual_entities").map(vm =>
        parseVirtualEntity(str(vm, "name"), str(vm, "sql"))),
      attributeStores =
        seqOfMaps(m.getOrElse("attribute_stores", null)).map { am =>
          AttributeStoreDef(
            title = am.get("title").map(String.valueOf),
            dataSource = str(am, "data_source"),
            entityType = str(am, "entity_type"),
            attributes = attributeDefs(am))
        },
      notificationStores =
        seqOfMaps(m.getOrElse("notification_stores", null)).map { nm =>
          NotificationStoreDef(
            title = nm.get("title").map(String.valueOf),
            dataSource = str(nm, "data_source"),
            entityType = str(nm, "entity_type"),
            attributes = attributeDefs(nm),
            name = str(nm, "name"))
        }
    )
  }

  /** Parse a relation definition (instance/__init__.py:435-442). */
  def parseRelation(yamlText: String): RelationDef = {
    val m = yamlMap(yamlText)
    RelationDef(
      name = str(m, "name"),
      sourceEntityType = str(m, "source_entity_type"),
      targetEntityType = str(m, "target_entity_type"),
      query = str(m, "query")
    )
  }

  private val ViewBody =
    """(?is).*?CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+\S+\s+AS\s+(.*)""".r

  /** Split SQL text on statement-terminating semicolons OUTSIDE string
    * literals (a `';'` inside a literal — e.g. a VALUES row — must not
    * truncate the statement). A doubled `''` escape toggles the quote state
    * twice, which nets out correctly. Dollar-quoting is not handled —
    * virtual-entity files carry view DDL, not function bodies. */
  private def splitSqlStatements(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    sql.foreach {
      case '\'' => inQuote = !inQuote; cur.append('\'')
      case ';' if !inQuote => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** Parse a virtual-entity `.sql` file: extract the SELECT body of the
    * first `CREATE [OR REPLACE] VIEW … AS <select>;` statement (the
    * portable core); the remaining statements (create_entity_type /
    * INSERT … ON CONFLICT) are the reference's PostgreSQL catalog plumbing,
    * re-expressed by [[graft.operators.InstanceInit.materializeVirtualEntities]]. */
  def parseVirtualEntity(name: String, sqlText: String): VirtualEntityDef = {
    val body = splitSqlStatements(sqlText).collectFirst {
      case ViewBody(select) => select.trim
    }
    VirtualEntityDef(name, sqlText, body)
  }

  def parseTrigger(yamlText: String): Trigger = triggerFromMap(yamlMap(yamlText))

  private def triggerFromMap(m: Map[String, Any]): Trigger = {
    Trigger(
      name = str(m, "name"),
      kpiData = seqOfMaps(m.getOrElse("kpi_data", null)).map(trend),
      thresholds = seqOfMaps(m.getOrElse("thresholds", null)).map { t =>
        Threshold(str(t, "name"), mtype(t), t.getOrElse("value", null))
      },
      condition = str(m, "condition"),
      weight = str(m, "weight"),
      notification = str(m, "notification"),
      data = str(m, "data"),
      notificationStore = str(m, "notification_store"),
      // explicit YAML/JSON nulls behave like absence (String.valueOf(null)
      // would otherwise smuggle the string "null" in as a granularity)
      granularity = m.get("granularity").filter(_ != null).map(String.valueOf),
      trendStoreLinks = seqOfMaps(m.getOrElse("trend_store_links", null)).map(l =>
        TriggerStoreLink(str(l, "part_name"), str(l, "mapping_function", "mapping_id")))
    )
  }

  /** Render a trigger as reference-shaped YAML ([[parseTrigger]] is the
    * inverse — round-trip asserted in specs). The CLI's `trigger update-*`
    * commands use this to patch one aspect of an installed trigger in
    * place (reference commands/trigger.py:124-253 update-weight /
    * update-kpi-function / update-data-function). */
  def renderTrigger(t: Trigger): String =
    dumpYaml(jmap((Seq[(String, Any)](
      "name" -> t.name,
      "kpi_data" -> jlist(t.kpiData.map(k =>
        jmap("name" -> k.name, "data_type" -> k.dataType.name,
          "description" -> k.description,
          "time_aggregation" -> k.timeAggregation,
          "entity_aggregation" -> k.entityAggregation))),
      "thresholds" -> jlist(t.thresholds.map(th =>
        jmap("name" -> th.name, "data_type" -> th.dataType.name,
          "value" -> th.value))),
      "condition" -> t.condition,
      "weight" -> t.weight,
      "notification" -> t.notification,
      "data" -> t.data,
      "notification_store" -> t.notificationStore) ++
      // absent granularity is OMITTED (a YAML null would reload as "null")
      t.granularity.map("granularity" -> (_: Any)).toSeq ++ Seq(
      "trend_store_links" -> jlist(t.trendStoreLinks.map(l =>
        jmap("part_name" -> l.partName,
          "mapping_function" -> l.mappingFunction))))): _*))
}
