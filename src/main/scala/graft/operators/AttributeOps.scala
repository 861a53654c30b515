package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing attribute operations (reference:
  * src/minerva/storage/attribute/attributestore.py — history/staging/curr
  * tables at 38-66; compaction at 261-269; curr-ptr materialization
  * src/minerva/commands/attribute_store.py:523-579).
  *
  * All three are single-shuffle window computations partitioned by
  * entity_id — at 100 TB the entity-id hash partitioning spreads windows
  * evenly (entity count >> executor count; per-entity history is small), no
  * global sort anywhere.
  */
object AttributeOps {

  /** Latest attribute row per entity ("curr-ptr", attribute_store.py:554-579).
    * `tieBreak` must make the ordering total (e.g. a unique id) for
    * deterministic results. */
  def currentPtr(history: DataFrame, entityCol: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col(_).desc): _*)
    history
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Compaction (attributestore.py:261-269 → attribute_directory.compact):
    * drop history rows whose attribute values equal the previous row's —
    * run-length compression of SCD-2 history. Value comparison is done on a
    * struct of the attribute columns so nulls compare as values
    * (null-safe `<=>`). */
  def compact(history: DataFrame, entityCol: String, orderCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
    val v = struct(valueCols.map(col): _*)
    history
      .withColumn("__prev", lag(v, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> v))
      .drop("__prev")
  }

  /** SCD-2 history view: validity ranges per entity — each (compacted) row
    * is valid from its timestamp until the next row's (null = open). */
  def scd2(history: DataFrame, entityCol: String, tsCol: String, tieBreak: Seq[String], valueCols: Seq[String]): DataFrame = {
    val compacted = compact(history, entityCol, tsCol +: tieBreak, valueCols)
    val w = Window.partitionBy(col(entityCol)).orderBy((tsCol +: tieBreak).map(col): _*)
    compacted
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }
}
