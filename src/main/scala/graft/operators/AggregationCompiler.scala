package graft.operators

import graft.model.{Trend, TrendStorePart}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
