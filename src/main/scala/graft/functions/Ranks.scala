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

  /** [[globalDenseRank]] attached DIRECTLY to a (possibly non-distinct)
    * frame — `dense_rank() OVER (ORDER BY keys)` on every input row,
    * without the caller's usual `distinct → rank → join-back` round trip
    * (that shape costs two extra shuffles of the full frame; this is one
    * range exchange plus zipWithIndex-style offset passes). Equal keys
    * land in one range partition, so the global dense rank is the
    * partition's distinct-run offset plus the local run index — exact,
    * and independent of where the sampled range boundaries fall, same as
    * [[globalDenseRank]]. The second pass re-reads the exchange's shuffle
    * files, not the upstream lineage. Skew note: all copies of one key
    * hash to one partition — identical to what the join-back of the
    * distinct form does, so this is never worse than the round trip.
    * Appends `__r` (1-based), dense over distinct keys, total count =
    * the returned frame's max `__r`. */
  def globalDenseRankAttach(
      df: DataFrame, keyCols: Seq[String]): (DataFrame, Long) = {
    val sp = df.sparkSession
    val np = sp.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(np, keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
    val keyIdx = keyCols.map(sorted.schema.fieldIndex).toIndexedSeq
    val base = sorted.rdd
    // pass 1 — distinct-key runs per partition (the zipWithIndex count
    // job, counting runs instead of rows); bounded collect: one pair per
    // shuffle partition
    val counts = base.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var prev: IndexedSeq[Any] = null
      it.foreach { row =>
        val k = keyIdx.map(row.get)
        if (prev == null || k != prev) { n += 1L; prev = k }
      }
      Iterator.single((pid, n))
    }.collect().toMap
    val nParts = base.getNumPartitions
    val offsets = Array.ofDim[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) {
      offsets(p) = acc; acc += counts.getOrElse(p, 0L); p += 1
    }
    val schema = sorted.schema.add("__r", org.apache.spark.sql.types.LongType)
    val rdd = base.mapPartitionsWithIndex { (pid, it) =>
      var r = offsets(pid)
      var prev: IndexedSeq[Any] = null
      it.map { row =>
        val k = keyIdx.map(row.get)
        if (prev == null || k != prev) { r += 1L; prev = k }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r)
      }
    }
    (sp.createDataFrame(rdd, schema), acc)
  }
}
