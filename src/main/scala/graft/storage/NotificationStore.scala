package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Notification store: append-only event/notification table per data source
  * (reference: src/minerva/storage/notification/notificationstore.py:17-22 —
  * `(entity_id, timestamp, attrs…)` with PK (entity_id, timestamp); DDL
  * tables.py:58-115 adds indexes on timestamp and modified).
  *
  * graft shape: parquet append with a `created` stamp; the PK contract is
  * enforced on read via last-wins dedup (appends are cheap and conflict-free
  * across writers — the reference's single-row INSERT path becomes a batch
  * append; at scale, partition by day of `timestamp`).
  */
class NotificationStore(spark: SparkSession, basePath: String) {

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  def store(batch: DataFrame, nowSec: Long): Unit =
    batch.withColumn("created", lit(nowSec))
      .write.mode(SaveMode.Append).option("mergeSchema", "true").parquet(basePath)

  /** All notifications; PK (entity_id, timestamp, rule) deduped last-wins
    * by created stamp. */
  def read(): Option[DataFrame] =
    if (!fs.exists(new org.apache.hadoop.fs.Path(basePath))) None
    else {
      val raw = spark.read.option("mergeSchema", "true").parquet(basePath)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("entity_id", "timestamp", "rule")
        .orderBy(col("created").desc)
      Some(raw.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
    }
}
