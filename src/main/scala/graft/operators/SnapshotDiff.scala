package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every key of two table versions as added /
  * removed / changed / unchanged, with the exact set of changed columns
  * — the batch generalization of the attribute store's lag-compare (E2:
  * only rows whose values differ get new history) to whole-snapshot
  * reconciliation (what an ETL regression check or a CDC backfill
  * audits).
  *
  * One full outer join on the key — the single irreducible shuffle —
  * then pure projections: per-column null-safe comparisons fold into an
  * array of changed column names in the same codegen stage. At 100 TB
  * both sides shuffle once on the key; if snapshots are stored
  * bucketed/z-ordered by key the exchange drops entirely.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `keyCols`. Compared columns are the
    * non-key columns present in BOTH frames. Output: key columns +
    * `change` ('added' | 'removed' | 'changed' | 'unchanged') +
    * `changed_cols` (sorted array, empty unless 'changed').
    * `includeUnchanged=false` drops the (typically dominant) unchanged
    * class at the source. */
  def diff(
      oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    val compareCols =
      (oldDf.columns.toSet intersect newDf.columns.toSet)
        .diff(keyCols.toSet).toSeq.sorted
    val o = oldDf.select((keyCols ++ compareCols).map(c =>
      col(c).as(s"__o_$c")) :+ lit(1).as("__o_present"): _*)
    val n = newDf.select((keyCols ++ compareCols).map(c =>
      col(c).as(s"__n_$c")) :+ lit(1).as("__n_present"): _*)
    val joinCond = keyCols.map(k => o(s"__o_$k") <=> n(s"__n_$k"))
      .reduce(_ && _)
    val joined = o.join(n, joinCond, "full_outer")
    // presence probes are lit(1) markers added per side before the join:
    // key columns can't serve (the <=> join matches NULL keys, so a
    // NULL-key row present on both sides would read as absent) and data
    // columns can't either (a legitimately-null value misclassifies)
    val inOld = col("__o_present").isNotNull
    val inNew = col("__n_present").isNotNull
    val changedArr =
      if (compareCols.isEmpty) array().cast("array<string>")
      else array_compact(array(compareCols.map(c =>
        when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*))
    val out = joined
      .withColumn("change",
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .when(size(changedArr) > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("changed_cols",
        when(col("change") === "changed", changedArr)
          .otherwise(array().cast("array<string>")))
      .select(keyCols.map(k =>
        coalesce(col(s"__n_$k"), col(s"__o_$k")).as(k)) ++
        Seq(col("change"), col("changed_cols")): _*)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }
}
