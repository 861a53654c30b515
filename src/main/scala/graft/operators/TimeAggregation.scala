package graft.operators

import graft.core.Granularity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-trend aggregation spec: the aggregation function is *data*, carried in
  * the trend's schema metadata (reference:
  * src/minerva/instance/__init__.py:43-69 — `time_aggregation` /
  * `entity_aggregation`, both defaulting to SUM;
  * src/minerva/instance/aggregation_compilation.py:699-704 interpolates the
  * function name into generated SQL). We resolve the name to a Catalyst
  * aggregate expression — arbitrary SQL aggregate names work via `expr`,
  * which keeps the hot path in whole-stage codegen (no UDAFs).
  */
final case class TrendAgg(column: String, fn: String, as: String) {
  /** Decimal-exact variant: cast the input to a decimal before aggregating
    * and the result back to double. Reproduces PostgreSQL `numeric`
    * aggregate exactness (and makes results bit-stable across engines —
    * double summation is order-dependent under parallelism). */
  def exact(scale: Int = 2): Column =
    expr(s"$fn(CAST(`$column` AS DECIMAL(30,$scale)))").cast("double").as(as)
  def col: Column = expr(s"$fn(`$column`)").as(as)
}

/** Time aggregation (rollup along the time axis) — the reference's core
  * operator (src/minerva/instance/aggregation_compilation.py:684-745; the
  * generated query at 726-737 is
  * `SELECT entity_id, $2 AS timestamp, count(*) AS samples, agg_i(c_i)…
  *  FROM part WHERE $1 < timestamp AND timestamp <= $2 GROUP BY entity_id`).
  *
  * The reference materializes one target timestamp per call; Spark-first we
  * compute *all* windows in one shuffle: group by (entity, window-truncated
  * timestamp). Catalyst turns this into partial (map-side) + final
  * hash aggregation, so at 100 TB the shuffle carries only
  * |entities|×|windows| pre-aggregated rows, not raw samples. Filters on the
  * window column push down to parquet partition pruning when parts are
  * written partitioned by partition-index (Granularity.timestampToIndex).
  *
  * Window end-labeling: the reference labels a rollup row with the *end* of
  * the window (`$2`, the target-granularity timestamp); `labelEnd=true`
  * reproduces that (truncate + one step).
  */
object TimeAggregation {
  /** @param tsSecCol  epoch-seconds column (BIGINT)
    * @param gran      target granularity (seconds-based: epoch-grid)
    * @param aggs      per-trend aggregate columns (from TrendAgg)
    * @param labelEnd  label rows with window end (reference semantics)
    */
  def rollup(
      df: DataFrame,
      entityCol: String,
      tsSecCol: String,
      gran: Long,
      aggs: Seq[Column],
      labelEnd: Boolean = true
  ): DataFrame = {
    val winStart = (col(tsSecCol) - pmod(col(tsSecCol), lit(gran))).cast("long")
    val label = if (labelEnd) winStart + lit(gran) else winStart
    // samples injection (aggregation_compilation.py:716-718): callers add
    // count(*) via `samples` below; rollups of rollups sum it.
    df.groupBy(col(entityCol).as("entity_id"), label.as("timestamp"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** `count(*) AS samples` — injected when the part has no samples trend
    * (aggregation_compilation.py:498-509,716-718). */
  def samples: Column = count(lit(1)).as("samples")
}
