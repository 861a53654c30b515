package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed global ranking without a single-partition window. */
object Ranks {

  /** Global dense rank of a frame of DISTINCT key rows: range-repartition
    * + in-partition sort puts the keys in total order across partitions,
    * and zipWithIndex stamps the global position (partition offsets come
    * from actual partition sizes, so the result is independent of where
    * the sampled range boundaries land). This is the scalable form of
    * `dense_rank() OVER (ORDER BY keys)` on distinct keys — O(n log n)
    * shuffle, never one partition sorting everything. Appends `__r`
    * (1-based). */
  def globalDenseRank(
      distinctKeys: DataFrame, keyCols: Seq[String]): DataFrame = {
    val sp = distinctKeys.sparkSession
    val np = sp.sessionState.conf.numShufflePartitions
    val sorted = distinctKeys
      .repartitionByRange(np, keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
    val schema = sorted.schema.add("__r", org.apache.spark.sql.types.LongType)
    val rdd = sorted.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L)) }
    sp.createDataFrame(rdd, schema)
  }
}
