package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upsert / MERGE semantics for trend parts.
  *
  * The reference's write path (src/minerva/storage/trend/trendstorepart.py):
  * COPY fast path (203-238), on conflict fall back to
  * `INSERT … ON CONFLICT (entity_id, timestamp) DO UPDATE SET
  *  col = excluded.col, modified = greatest(old.modified, new)` (240-296,
  * 418-437) — update excludes entity_id/timestamp/created (420-426), i.e.
  * `created` is preserved on conflict.
  *
  * Spark-first this is one MERGE: full-outer on the key, batch wins per
  * value column (nulls don't clobber), `modified = greatest`, `created`
  * preserved. Without a transactional table format in this environment the
  * physical write is partition-overwrite of the affected time partitions
  * (dynamic partition overwrite keeps untouched partitions intact at 100 TB:
  * only partitions containing batch keys are rewritten — the same blast
  * radius as the reference's range partitions).
  */
object Upsert {
  /** Logical MERGE of `batch` into `target` over `keys`.
    * Value columns: batch value wins when non-null; `modified` becomes
    * greatest(target.modified, batch.modified); `created` keeps the target's
    * value for existing keys. */
  def merge(
      target: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      modifiedCol: String = "modified",
      createdCol: Option[String] = None
  ): DataFrame = {
    val t = target.alias("t")
    val b = batch.alias("b")
    val special = keys.toSet ++ Set(modifiedCol) ++ createdCol
    val valueCols =
      (target.columns ++ batch.columns).distinct.filterNot(special)
    val joined = t.join(b, keys, "full_outer")
    val proj: Seq[Column] =
      keys.map(k => col(k)) ++
        Seq(
          greatest(col(s"t.$modifiedCol"), col(s"b.$modifiedCol")).as(modifiedCol)
        ) ++
        createdCol.map(c => coalesce(col(s"t.$c"), col(s"b.$c")).as(c)).toSeq ++
        valueCols.map { c =>
          val tc = if (target.columns.contains(c)) col(s"t.$c") else lit(null)
          val bc = if (batch.columns.contains(c)) col(s"b.$c") else lit(null)
          coalesce(bc, tc).as(c)
        }
    joined.select(proj: _*)
  }
}
