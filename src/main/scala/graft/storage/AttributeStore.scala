package graft.storage

import graft.operators.AttributeOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Attribute store: slowly-changing attributes per (data_source, entity_type)
  * (reference: src/minerva/storage/attribute/attributestore.py — staging →
  * history transfer at 271-316, compaction 261-269, curr-ptr
  * src/minerva/commands/attribute_store.py:523-579).
  *
  * graft shape: `stage` = the incoming batch DataFrame (no physical staging
  * table needed — the reference stages only to get data into the DB);
  * `transferStaged` appends to the history parquet with a `modified` stamp;
  * `compacted`/`current` are derived views. History is append-only and
  * partitioned by nothing here (attribute history is small relative to
  * trends); at larger scale partition by entity-id bucket.
  */
class AttributeStore(spark: SparkSession, basePath: String) {

  private def historyPath = s"$basePath/history"

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  def history: Option[DataFrame] =
    if (!fs.exists(new org.apache.hadoop.fs.Path(historyPath))) None
    else SchemaSidecar.read(fs, historyPath) match {
      case Some(sc) => Some(spark.read.schema(sc).parquet(historyPath))
      case None =>
        Some(spark.read.option("mergeSchema", "true").parquet(historyPath))
    }

  /** Append a staged batch (entity_id, timestamp, attrs…) to history. The
    * schema sidecar is union-merged (shared numeric columns widened — the
    * sidecar stays a superset, narrower files upcast on read) and written
    * BEFORE the append. A pre-sidecar history seeds the union from the
    * actual file schema, so earlier columns are never hidden. A genuinely
    * un-widenable type conflict REFUSES the batch — appending it would
    * poison every subsequent footer-merge read with incompatible types. */
  def transferStaged(batch: DataFrame, nowSec: Long): Unit = {
    val stamped = batch.withColumn("modified", lit(nowSec))
    val saved = SchemaSidecar.read(fs, historyPath)
      .orElse(history.map(_.schema)) // pre-sidecar files → mergeSchema read
    SchemaSidecar.merged(saved, stamped.schema) match {
      case Some(sc) => SchemaSidecar.write(fs, historyPath, sc)
      case None => throw new IllegalArgumentException(
        s"attribute batch schema ${stamped.schema.simpleString} conflicts " +
          s"with stored history ${saved.get.simpleString} — cast the batch " +
          "to the stored types before transfer")
    }
    stamped.write.mode(SaveMode.Append).option("mergeSchema", "true").parquet(historyPath)
  }

  /** Run-length-compacted history (D10). */
  def compacted(valueCols: Seq[String]): Option[DataFrame] =
    history.map(h => AttributeOps.compact(h, "entity_id", Seq("timestamp", "modified"), valueCols))

  /** Latest attribute row per entity (curr-ptr, D9/E1). */
  def current: Option[DataFrame] =
    history.map(h => AttributeOps.currentPtr(h, "entity_id", Seq("timestamp", "modified")))

  /** SCD-2 view with validity ranges. */
  def scd2(valueCols: Seq[String]): Option[DataFrame] =
    history.map(h => AttributeOps.scd2(h, "entity_id", "timestamp", Seq("modified"), valueCols))

  /** Materialize the curr-ptr view as a physical snapshot (the reference's
    * attribute_store curr-ptr materialization, commands/attribute_store.py:
    * 523-579). Reads history, writes `<base>/current`; returns the row
    * count. Safe to overwrite directly: `current` derives from the history
    * dir, not from the snapshot being replaced. */
  def materializeCurrent(): Long = current match {
    case None => 0L
    case Some(cur) =>
      cur.write.mode(SaveMode.Overwrite).parquet(s"$basePath/current")
      spark.read.parquet(s"$basePath/current").count()
  }

  /** The materialized current snapshot, if one has been written. */
  def currentSnapshot: Option[DataFrame] =
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$basePath/current"))) None
    else Some(spark.read.parquet(s"$basePath/current"))
}
