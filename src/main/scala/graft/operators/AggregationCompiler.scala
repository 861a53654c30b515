package graft.operators

import graft.core.{Granularity, MinervaType, SecondsGranularity}
import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** I4: source→target timestamp mapping functions
  * (reference: materialization.py link_sources mapping_function regprocedure;
  * names generated as `trend.mapping_{src}->{tgt}`,
  * aggregation_generation.py:268). A mapping takes the SOURCE row timestamp
  * (epoch seconds) and yields the TARGET timestamp its value contributes to.
  *
  * Built-ins: `mapping_id` (identity — same-granularity re-materialization)
  * and the standard `mapping_{src}->{tgt}` window-end mapping (matching
  * TimeAggregation.rollup's end-labeling). Anything else — offset mappings,
  * shifted-day accounting windows — registers by name. */
object TimestampMappings {
  type Mapping = Column => Column

  private val custom =
    scala.collection.concurrent.TrieMap.empty[String, Mapping]

  def register(name: String, fn: Mapping): Unit = custom.put(name, fn)

  private val StandardPat = """mapping_.+->(.+)""".r

  /** Window-end mapping onto a seconds-based target granularity: the
    * target label t maps to is the END of the window CONTAINING it under
    * the reference's (start, end] convention — a ceiling that leaves
    * already-aligned timestamps FIXED. Source trend timestamps are
    * end-labels on the source grid, so e.g. the hourly label 24:00 belongs
    * to the day ending 24:00, NOT the next day (a plain truncate+step
    * would misattribute the last source window of every target window). */
  def windowEnd(granSec: Long): Mapping =
    ts => (ts + pmod(lit(granSec) - pmod(ts, lit(granSec)), lit(granSec))).cast("long")

  /** Window-end mapping onto calendar months (UTC session): end of the
    * enclosing n-month window; month-start-aligned timestamps (end-labels
    * of the previous month) stay fixed, same (start, end] convention. */
  def monthEnd(months: Int): Mapping = ts => {
    val tr = date_trunc("month", timestamp_seconds(ts))
    when(unix_timestamp(tr) === ts, ts)
      .otherwise(unix_timestamp(add_months(tr, months)))
      .cast("long")
  }

  /** Window-end mapping onto Monday-aligned weeks (epoch Monday offset:
    * 1970-01-05 = 345600s); Monday-aligned end-labels stay fixed. */
  def weekEnd(weeks: Int): Mapping = ts => {
    val span = lit(weeks * 604800L)
    val shifted = ts - lit(345600L)
    (shifted + pmod(span - pmod(shifted, span), span) + lit(345600L)).cast("long")
  }

  /** Resolve a mapping-function name (with or without the reference's
    * `trend.` schema prefix). */
  def resolve(name: String): Mapping = {
    val bare = name.stripPrefix("trend.")
    custom.get(bare)
      .orElse(if (bare == "mapping_id") Some(identity[Column] _) else None)
      .orElse(StandardPat.findFirstMatchIn(bare).map { m =>
        Granularity.parse(m.group(1)) match {
          case SecondsGranularity(s)        => windowEnd(s)
          case graft.core.DaysGranularity(n)   => windowEnd(n * 86400L)
          case graft.core.WeeksGranularity(n)  => weekEnd(n)
          case graft.core.MonthsGranularity(n) => monthEnd(n)
        }
      })
      .getOrElse(throw new IllegalArgumentException(
        s"unknown timestamp mapping function: $name"))
  }
}

/** The aggregation compiler: turns instance-model trend metadata into
  * executable rollups — graft's analogue of `minerva aggregation compile`
  * (reference: src/minerva/instance/aggregation_compilation.py — time
  * aggregation query generation at 684-745, entity aggregation at 113-189 /
  * 332-365, samples injection 498-509, result-type widening maps 396-414).
  *
  * Where the reference emits SQL text + plpgsql functions into PostgreSQL,
  * graft emits `DataFrame => DataFrame` transformations whose aggregate
  * expressions come from the per-trend `time_aggregation` /
  * `entity_aggregation` names (arbitrary SQL aggregate names via `expr`,
  * staying in codegen). Result-type widening (D4): sums of
  * smallint/integer→bigint, bigint→decimal, real→real, double→double —
  * expressed as explicit casts so rollup outputs have stable schemas.
  */
object AggregationCompiler {

  /** D4 widening: the result type of an aggregate over a trend. */
  def widenedType(t: Trend): String = {
    import graft.core.MinervaType._
    (t.timeAggregation, t.dataType) match {
      case ("sum", MSmallInt | MInteger) => "bigint"
      case ("sum", MBigInt) => "decimal(38,0)"
      case ("sum", MReal) => "float"
      case ("sum", MDouble) => "double"
      case ("sum", MNumeric) => "decimal(38,18)"
      case ("avg", MSmallInt | MInteger | MBigInt) => "decimal(38,18)"
      case ("avg", MReal | MDouble) => "double"
      case _ => t.dataType.sparkType.simpleString
    }
  }

  private def aggColumns(trends: Seq[Trend], fnOf: Trend => String): Seq[Column] = {
    val hasSamples = trends.exists(_.name == "samples")
    val samples =
      if (hasSamples) Seq.empty
      else Seq(TimeAggregation.samples) // D3 injection
    samples ++ trends.map { t =>
      val fn = fnOf(t)
      expr(s"$fn(`${t.name}`)").cast(widenedType(t.copy(timeAggregation = fn))).as(t.name)
    }
  }

  /** Compile the time-aggregation rollup for a part: source granularity →
    * `targetGranSec` tumbling windows, per-trend `time_aggregation`. */
  def timeAggregation(part: TrendStorePart, targetGranSec: Long)
      : DataFrame => DataFrame = { df =>
    val present = part.trends.filter(t => df.columns.contains(t.name))
    TimeAggregation.rollup(
      df, "entity_id", "timestamp", targetGranSec,
      aggColumns(present, _.timeAggregation))
  }

  /** Compile the entity-aggregation rollup for a part over a relation
    * (source_id → target_id), per-trend `entity_aggregation`. */
  def entityAggregation(part: TrendStorePart, relation: DataFrame)
      : DataFrame => DataFrame = { df =>
    val present = part.trends.filter(t => df.columns.contains(t.name))
    EntityAggregation.aggregate(
      df, relation, "entity_id", "timestamp",
      aggColumns(present, _.entityAggregation))
  }

  // ---- End-to-end compile of an aggregation YAML definition ----
  // (reference: commands/aggregation.py:82-139 `compile_aggregation`,
  //  aggregation_compilation.py:562-599 compile_time_aggregation →
  //  define_aggregate_trend_store at 426-478, define_aggregate_part at
  //  481-508, define_part_time_aggregation at 646-681)

  /** aggregate_data_type (aggregation_compilation.py:396-414,513-520):
    * result type of an aggregate over a source data type. */
  def aggregateDataType(t: MinervaType, method: String): MinervaType = {
    import MinervaType._
    method.toLowerCase match {
      case "sum" => t match {
        case MSmallInt | MInteger => MBigInt
        case MBigInt => MNumeric
        case other => other
      }
      case "avg" => t match {
        case MSmallInt | MInteger | MBigInt | MNumeric => MNumeric
        case MReal | MDouble => MDouble
        case other => other
      }
      case _ => t
    }
  }

  /** define_aggregate_trend (aggregation_compilation.py:523-533). */
  def defineAggregateTrend(t: Trend): Trend =
    t.copy(dataType = aggregateDataType(t.dataType, t.timeAggregation),
      description = "")

  /** define_aggregate_part (aggregation_compilation.py:481-508): widened
    * trends + samples injection, generated trends carried over. */
  def defineAggregatePart(src: TrendStorePart, targetName: String): TrendStorePart = {
    val trends = src.trends.map(defineAggregateTrend)
    val withSamples =
      if (trends.exists(_.name == "samples")) trends
      else Trend("samples", MinervaType.MInteger, "Number of source records",
        "sum", "sum") +: trends
    TrendStorePart(targetName, withSamples, src.generatedTrends)
  }

  /** PARTITION_SIZE_MAPPING (aggregation_compilation.py:416-423). */
  def partitionSizeFor(g: Granularity): Granularity = g.name match {
    case "15m" => Granularity.parse("1d")
    case "30m" => Granularity.parse("2d")
    case "1h" => Granularity.parse("4d")
    case "1d" => Granularity.parse("3month")
    case "1w" => Granularity.parse("1y")
    case "1month" => Granularity.parse("5y")
    case other => throw new IllegalArgumentException(
      // the reference's PARTITION_SIZE_MAPPING raises KeyError here — a
      // silent default would compile a wrong partition size
      s"no partition size mapping for granularity '$other'")
  }

  /** One executable materialization produced by a compile: metadata
    * (delays, source links) plus the `DataFrame => DataFrame` computation. */
  final case class CompiledUnit(
      sourcePart: String,
      targetPart: String,
      materialization: Materialization,
      compute: DataFrame => DataFrame)

  final case class CompiledAggregation(
      targetStore: TrendStore,
      units: Seq[CompiledUnit])

  /** Group-by (entity, mapped timestamp) with per-trend aggregates — the
    * generalized rollup driven by a timestamp-mapping function (the plain
    * granularity rollup is the `mapping_{src}->{tgt}` special case). */
  def timeAggregationMapped(
      part: TrendStorePart, mapping: TimestampMappings.Mapping)
      : DataFrame => DataFrame = { df =>
    val present = part.trends.filter(t =>
      df.columns.contains(t.name) && t.name != "samples")
    val hasSamples = df.columns.contains("samples")
    val samplesAgg =
      if (hasSamples) sum(col("samples")).cast("long").as("samples")
      else TimeAggregation.samples
    df.groupBy(col("entity_id"), mapping(col("timestamp")).as("timestamp"))
      .agg(samplesAgg,
        present.map { t =>
          // `part` is the TARGET definition (defineAggregatePart output), so
          // t.dataType already IS the widened result type — cast to it.
          expr(s"${t.timeAggregation}(`${t.name}`)")
            .cast(t.dataType.sparkType.simpleString).as(t.name)
        }: _*)
  }

  /** compile_time_aggregation: target store definition + one executable
    * materialization per aggregation part. The returned units carry the
    * reference's default scheduling metadata (processing_delay 30m,
    * stability_delay 5m, reprocessing 3 days —
    * define_part_time_aggregation:646-681). */
  def compileTimeAggregation(
      src: TrendStore, defn: TimeAggregationDef): CompiledAggregation = {
    val srcByName = src.parts.map(p => p.name -> p).toMap
    val mapping = TimestampMappings.resolve(defn.mappingFunction)
    val units = defn.parts.map { pd =>
      val srcPart = srcByName.getOrElse(pd.source,
        throw new IllegalArgumentException(
          s"no source part '${pd.source}' in trend store '${src.title}'"))
      CompiledUnit(
        sourcePart = pd.source,
        targetPart = pd.name,
        materialization = Materialization(
          targetTrendStorePart = pd.name,
          enabled = true,
          processingDelay = "30m",
          stabilityDelay = "5m",
          reprocessingPeriod = "3 days",
          sources = Seq(MaterializationSource(pd.source, defn.mappingFunction)),
          view = None),
        compute = timeAggregationMapped(
          defineAggregatePart(srcPart, pd.name), mapping))
    }
    val targetParts = defn.parts.map(pd =>
      defineAggregatePart(srcByName(pd.source), pd.name))
    CompiledAggregation(
      TrendStore(
        title = defn.name,
        dataSource = defn.dataSource.getOrElse(src.dataSource),
        entityType = defn.entityType.getOrElse(src.entityType),
        granularity = defn.granularity,
        partitionSize = partitionSizeFor(defn.granularity),
        parts = targetParts),
      units)
  }

  /** Raised when a compiled unit's `compute` forces a relation that a
    * YAML-only caller declared absent — the failure says what it means
    * instead of surfacing an arbitrary sys.error. */
  final class RelationNotProvided(name: String) extends IllegalStateException(
    s"entity aggregation '$name' requires its relation frame at " +
      "materialization time; this compilation was YAML-only (no relation " +
      "was provided)")

  /** Sentinel relation for YAML-only compilation: passed by-name, so it
    * only throws if a future code path actually forces the relation. */
  def noRelation(name: String): DataFrame = throw new RelationNotProvided(name)

  /** compile_entity_aggregation (aggregation_compilation.py:113-189,
    * VIEW_MATERIALIZATION shape): same target-store definition, compute
    * rolls up the named relation instead of the time axis. `relation` is
    * by-name: it is only forced when a compiled unit's `compute` runs, so
    * YAML-only compilation (the CLI's aggregation-compile) needs no data —
    * such callers pass [[noRelation]]. */
  def compileEntityAggregation(
      src: TrendStore, defn: EntityAggregationDef, relation: => DataFrame)
      : CompiledAggregation = {
    val srcByName = src.parts.map(p => p.name -> p).toMap
    val units = defn.parts.map { pd =>
      val srcPart = srcByName.getOrElse(pd.source,
        throw new IllegalArgumentException(
          s"no source part '${pd.source}' in trend store '${src.title}'"))
      val tgtPart = defineAggregatePart(srcPart, pd.name)
      CompiledUnit(
        sourcePart = pd.source,
        targetPart = pd.name,
        materialization = Materialization(
          targetTrendStorePart = pd.name,
          enabled = true,
          processingDelay = "30m",
          stabilityDelay = "5m",
          reprocessingPeriod = "3 days",
          sources = Seq(MaterializationSource(pd.source, "mapping_id")),
          view = None),
        compute = { df =>
          val present = tgtPart.trends.filter(t =>
            df.columns.contains(t.name) && t.name != "samples")
          val samplesAgg =
            if (df.columns.contains("samples"))
              sum(col("samples")).cast("long").as("samples")
            else TimeAggregation.samples
          EntityAggregation.aggregate(df, relation, "entity_id", "timestamp",
            samplesAgg +: present.map { t =>
              expr(s"${t.entityAggregation}(`${t.name}`)")
                .cast(t.dataType.sparkType.simpleString).as(t.name)
            })
        })
    }
    CompiledAggregation(
      TrendStore(
        title = defn.name,
        dataSource = src.dataSource,
        entityType = defn.entityType,
        granularity = src.granularity,
        partitionSize = src.partitionSize,
        parts = defn.parts.map(pd => defineAggregatePart(srcByName(pd.source), pd.name))),
      units)
  }
}
