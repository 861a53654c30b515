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
  * value column it CARRIES — including NULLs, exactly like the reference's
  * `col = excluded.col` (a counter reset to NULL can be cleared); a column
  * the batch does NOT carry is untouched (the reference never lists it in
  * the UPDATE SET). `modified = greatest`, `created` preserved. Without a
  * transactional table format in this environment the physical write is
  * partition-overwrite of the affected time partitions (dynamic partition
  * overwrite keeps untouched partitions intact at 100 TB: only partitions
  * containing batch keys are rewritten — the same blast radius as the
  * reference's range partitions).
  */
object Upsert {
  /** Logical MERGE of `batch` into `target` over `keys`.
    * Value columns carried by the batch take the batch's value for matched
    * keys (NULL included — trendstorepart.py:418-437 `col = excluded.col`);
    * target-only columns pass through; `modified` becomes
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
    // marker survives the full-outer join: non-null ⇔ the key is in batch
    val b = batch.withColumn("__in_batch", lit(true)).alias("b")
    val special = keys.toSet ++ Set(modifiedCol, "__in_batch") ++ createdCol
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
          if (!batch.columns.contains(c)) tc.as(c)
          else when(col("b.__in_batch").isNotNull, col(s"b.$c")).otherwise(tc).as(c)
        }
    joined.select(proj: _*)
  }
}
