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
  /** Rank WITHIN each group without a per-group window (a group is a
    * corpus-sized partition — exactly what one task must never sort):
    * one [[globalDenseRank]] over (groupCols ++ orderCols) minus a
    * broadcast per-group offset of strictly-earlier groups' row counts.
    * Requires |groups| to be bounded (sources, buckets — the offsets
    * frame is |groups|² join work at worst); rows must be DISTINCT on
    * (groupCols ++ orderCols). Appends `__gr` (1-based within group). */
  def rankWithinGroup(
      df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val r = globalDenseRank(df, groupCols ++ orderCols)
    val cnts = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("__n"))
    val gcmp = (a: String, b: String) => groupCols.map(g =>
      (col(s"$a.$g"), col(s"$b.$g")))
    val earlier = (x: Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)]) =>
      // lexicographic strictly-less over the group key
      x.zipWithIndex.map { case ((ca, cb), i) =>
        x.take(i).map { case (pa, pb) => pb === pa }
          .foldLeft(cb < ca)(_ && _)
      }.reduce(_ || _)
    val offs = cnts.as("a")
      .join(cnts.as("b"), earlier(gcmp("a", "b")), "left")
      .groupBy(groupCols.map(g => col(s"a.$g").as(g)): _*)
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__off"))
    r.join(broadcast(offs), groupCols)
      .withColumn("__gr", col("__r") - col("__off"))
      .drop("__r", "__off")
  }

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
