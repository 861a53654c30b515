package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: rules-as-data compiled into the
  * minimum number of passes — the generalized form of the reference's
  * row-level quarantine checks (loading/csv/parser.py's per-field
  * validation) lifted to table-level contracts.
  *
  * Pass structure (the 100 TB story):
  *  - ALL row predicates evaluate in ONE map-side-combined aggregate —
  *    adding a rule adds a projection to the same scan, never a pass.
  *    The wide one-row result unpivots (map-side, no shuffle) into the
  *    (rule, violations, checked) report.
  *  - each uniqueness rule is one hash aggregate on its own key (the
  *    shuffle is irreducible — it IS the distinctness check).
  *  - each referential rule is one left-anti join against the parent's
  *    distinct keys (Catalyst broadcasts small parents; null children
  *    are excluded, matching SQL FK semantics where NULL references
  *    nothing and violates nothing).
  */
object DataQuality {

  /** Audit `df`. `rowRules` are (name, violation-predicate) pairs — the
    * predicate is true for VIOLATING rows. `uniqueKeys` are (name, key
    * columns); violations = surplus rows beyond one per key, checked =
    * distinct keys. `fks` are (name, child column, parent frame, parent
    * column); violations = non-null child rows without a parent.
    * Returns one (rule, violations, checked) row per rule. */
  def audit(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Seq.empty,
      fks: Seq[(String, String, DataFrame, String)] = Seq.empty): DataFrame = {
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty || fks.nonEmpty,
      "audit needs at least one rule")
    val parts = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      val aggCols = count(lit(1)).as("__checked") +:
        rowRules.map { case (n, pred) =>
          sum(when(pred, 1L).otherwise(0L)).as(n)
        }
      parts += df.agg(aggCols.head, aggCols.tail: _*)
        .unpivot(Array(col("__checked")),
          rowRules.map(r => col(r._1)).toArray, "rule", "violations")
        .select(col("rule"), col("violations"), col("__checked").as("checked"))
    }
    uniqueKeys.foreach { case (n, cols) =>
      parts += df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"),
          count(lit(1)).as("checked"))
        .select(lit(n).as("rule"), col("violations"), col("checked"))
    }
    fks.foreach { case (n, childCol, parent, parentCol) =>
      val child = df.filter(col(childCol).isNotNull)
      parts += child
        .join(parent.select(col(parentCol).as(childCol)).distinct(),
          Seq(childCol), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .crossJoin(child.agg(count(lit(1)).as("checked")))
        .select(lit(n).as("rule"), col("violations"), col("checked"))
    }
    parts.result().reduce(_.unionByName(_))
  }
}
