package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming equivalents of the reference's micro-batch
  * incremental loop (SURVEY §2 I1-I6).
  *
  * The reference polls: process modified log → materialize stale chunks →
  * sleep (src/minerva/commands/live_monitor.py:40-45), with lateness
  * handled by reprocessing windows for `reprocessing_period`
  * (materialization.py:12-20). In Structured Streaming the same contract
  * is: event-time tumbling window aggregation + watermark = allowed
  * lateness; `update` output mode re-emits a window when late rows arrive —
  * exactly "reprocess the chunk whose fingerprint changed".
  *
  * Scale: stateful aggregation state is keyed by (entity, window); the
  * state store partitions by the same hash shuffle as the batch rollup, so
  * the streaming path inherits the batch partitioning story. Watermark
  * bounds state size: windows older than the watermark are evicted —
  * the streaming analogue of `reprocessing_period`.
  */
object StreamingRollup {

  /** Streaming time aggregation: tumbling `granSeconds` windows per entity,
    * tolerating `latenessSeconds` of out-of-order data.
    *
    * @param stream streaming DataFrame with an event-time timestamp column
    */
  def rollup(
      stream: DataFrame,
      entityCol: String,
      tsCol: String,
      granSeconds: Long,
      latenessSeconds: Long,
      aggs: Seq[Column]
  ): DataFrame = {
    val agged = stream
      .withWatermark(tsCol, s"$latenessSeconds seconds")
      .groupBy(
        col(entityCol).as("entity_id"),
        window(col(tsCol), s"$granSeconds seconds"))
      .agg(aggs.head, aggs.tail: _*)
    val aggCols = agged.columns.filterNot(c => c == "entity_id" || c == "window")
    agged.select(
      col("entity_id") +:
        // reference labels rollups with the window END (SURVEY D1)
        unix_timestamp(col("window.end")).as("timestamp") +:
        aggCols.map(col): _*)
  }

  /** Streaming trigger/notification path (I6): threshold rules applied to
    * the stream, appending notification rows — the streaming analogue of
    * `trigger.create_notifications`. Stateless (pure filter+project), so it
    * runs in append mode with no state store. */
  def notifications(
      stream: DataFrame,
      rule: graft.operators.TriggerRule,
      entityCol: String,
      tsCol: String
  ): DataFrame = {
    val withThresholds = rule.thresholds.foldLeft(stream) { case (df, (k, v)) =>
      df.withColumn(k, lit(v))
    }
    withThresholds
      .filter(expr(rule.condition))
      .select(
        col(entityCol).as("entity_id"),
        col(tsCol).as("timestamp"),
        lit(rule.name).as("rule"),
        expr(rule.weight).cast("long").as("weight"),
        rule.details.as("details"))
  }
}
