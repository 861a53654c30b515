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
          // coalesce: sum over zero rows is NULL; report 0 violations on
          // an empty table, consistent with the uniqueKeys path
          coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(n)
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

  /** Column profile (ANALYZE TABLE-style statistics collection): per
    * column — non-null count, null count, exact NDV, min/max (numeric
    * columns as DOUBLE in `min_num`/`max_num`; string columns as
    * binary-collation VARCHAR in `min_str`/`max_str`). ONE aggregate
    * pass over the table; the distinct counts ride Spark's Expand (one
    * scan, rows × |cols| inside the aggregate — the exact-NDV price).
    * At 100 TB swap the exact NDV for the KMV estimator
    * (TextAnalysis.kmv*) to drop Expand; the rest of the profile is a
    * plain map-side aggregate. The restack to one row per column
    * happens on the 1-row aggregate result — free. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    require(cols.nonEmpty, "profile needs at least one column")
    def isNum(c: String) = df.schema(c).dataType.isInstanceOf[NumericType]
    def isStr(c: String) = df.schema(c).dataType == StringType
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nul_$c"),
        countDistinct(col(c)).as(s"__ndv_$c")) ++
        (if (isNum(c))
          Seq(min(col(c)).cast("double").as(s"__mn_$c"),
            max(col(c)).cast("double").as(s"__mx_$c"))
        else if (isStr(c))
          Seq(min(col(c)).as(s"__mns_$c"), max(col(c)).as(s"__mxs_$c"))
        else Seq.empty)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      row.select(lit(c).as("column"),
        col(s"__n_$c").as("n_values"),
        coalesce(col(s"__nul_$c"), lit(0L)).as("n_nulls"),
        col(s"__ndv_$c").as("ndv"),
        (if (isNum(c)) col(s"__mn_$c") else lit(null).cast("double")).as("min_num"),
        (if (isNum(c)) col(s"__mx_$c") else lit(null).cast("double")).as("max_num"),
        (if (isStr(c)) col(s"__mns_$c") else lit(null).cast("string")).as("min_str"),
        (if (isStr(c)) col(s"__mxs_$c") else lit(null).cast("string")).as("max_str"))
    }.reduce(_.unionByName(_))
  }
}
