package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trigger / notification evaluation (reference:
  * src/minerva/trigger/trigger.py:158-236,304-376 and the example rule
  * examples/tiny_instance/trigger/node-15m-highpowerusage.yaml):
  * KPI rows ⋈ thresholds → filter `condition` → project weight expression +
  * rendered notification message → append to a notification store.
  *
  * Thresholds are a single row of named literals — a literal crossJoin that
  * Catalyst constant-folds into the filter, so the whole rule evaluates
  * scan-side with predicate pushdown; no shuffle at all. Condition, weight
  * and templates are user SQL fragments evaluated via `expr` (validated at
  * rule-definition time by the SQL parser), exactly mirroring the
  * reference's "SQL fragments as rule data" design.
  */
/** @param data JSON payload expression (reference trigger.py:74 `data`,
  *             default `'{}'::json`; rendered per notification row —
  *             typically `to_json(struct(kpi columns))`). */
final case class TriggerRule(
    name: String,
    thresholds: Map[String, Any],
    condition: String,
    weight: String,
    details: Column,
    data: Option[Column] = None
)

object TriggerOps {
  /** Evaluate a rule against KPI rows; returns notification rows
    * (entity_id, timestamp, rule, weight, details, data[, extras…]). KPI
    * must expose entity_id + timestamp. `extras` are additional aliased
    * attribute columns over the KPI row — the reference's typed
    * notification-store attributes beyond the fixed six
    * (notificationstore.py:17-22 stores whatever attribute columns the
    * store declares). */
  def createNotifications(
      kpi: DataFrame, rule: TriggerRule,
      extras: Seq[Column] = Seq.empty): DataFrame = {
    val withThresholds = rule.thresholds.foldLeft(kpi) { case (df, (k, v)) =>
      df.withColumn(k, lit(v))
    }
    withThresholds
      .filter(expr(rule.condition))
      .select(Seq(
        col("entity_id"),
        col("timestamp"),
        lit(rule.name).as("rule"),
        expr(rule.weight).cast("long").as("weight"),
        rule.details.as("details"),
        rule.data.getOrElse(lit("{}")).as("data")
      ) ++ extras: _*)
  }
}
