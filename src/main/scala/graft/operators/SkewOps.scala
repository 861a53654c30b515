package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB paths.
  *
  * The hot spots at scale are (a) entity aggregation where one parent
  * entity owns millions of children, and (b) LSH buckets with degenerate
  * keys. AQE's skew-join handling covers joins; for *aggregations* with
  * pathological key skew, the classic fix is two-stage salted aggregation:
  * partial-aggregate on (key, salt), then final-aggregate on key. Shuffle
  * row count for the hot key drops from |rows| to |salts|.
  *
  * Use when a single group's row count approaches a partition's memory;
  * otherwise Spark's map-side partial aggregation already collapses
  * per-partition duplicates and salting only adds a shuffle stage.
  */
object SkewOps {

  /** Two-stage aggregation with `salts`-way salting.
    *
    * @param partials per-trend partial aggregates over (keys, salt), e.g.
    *                 `sum(x) as x_sum, count(1) as x_cnt`
    * @param finals   per-trend final merges over keys, e.g.
    *                 `sum(x_sum) as x_sum` — must be algebraic
    *                 (sum/min/max/count re-aggregate; avg = sum/cnt)
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partials: Seq[Column],
      finals: Seq[Column]
  ): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Keep only rows whose key-group size is ≤ maxSize — the scale-safe
    * bucket cap. A `count(*) over (partition by key)` window would
    * hash-partition EVERY row of the hottest key onto a single task —
    * exactly the degenerate bucket (empty docs, boilerplate) the cap exists
    * to kill — and survive only via spill. Here the sizes come from a
    * `groupBy(key).count()` (map-side partial aggregation collapses the hot
    * key per input partition, so the shuffle carries ≤ |partitions| rows per
    * key), and the one-row-per-key size table is joined back on the same key
    * the caller's self-join shuffles on, so the join streams rows through
    * without per-key buffering. */
  def keepSmallKeys(df: DataFrame, keys: Seq[String], maxSize: Int): DataFrame = {
    val small = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxSize)
      .select(keys.map(col): _*)
    df.join(small, keys)
  }

  /** Cap pathological LSH/ANN buckets: drop buckets larger than `maxSize`
    * (a degenerate bucket produces |bucket|² candidate pairs and no useful
    * signal — standard practice is to skip it and log the count). Returns
    * (kept, droppedBucketStats). */
  def capBuckets(
      buckets: DataFrame, bucketCol: String, maxSize: Int
  ): (DataFrame, DataFrame) = {
    val sizes = buckets.groupBy(col(bucketCol)).agg(count(lit(1)).as("n"))
    val oversized = sizes.filter(col("n") > maxSize)
    val kept = buckets.join(broadcast(oversized.select(bucketCol)),
      Seq(bucketCol), "left_anti")
    (kept, oversized)
  }
}
