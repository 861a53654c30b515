package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate quantiles through a log-linear histogram sketch —
  * HdrHistogram's public bucketization scheme (Gil Tene's HdrHistogram;
  * same octave/sub-bucket layout as DDSketch's fixed-gamma variant but in
  * pure integer arithmetic, so it is bit-identical on every engine and
  * every partitioning).
  *
  * Why this shape at 100 TB: exact per-group quantiles
  * (`TextAnalysis.groupQuantiles`) sort whole groups; Spark's
  * `approx_percentile` (KLL/GK-style) is merge-order dependent, so two
  * runs over different partitionings can disagree. This sketch is a pure
  * per-value bucket map + count — ONE map-side-combined aggregate,
  * layout-invariant by construction, mergeable by addition, with a hard
  * relative-error bound 2^-p per estimate (the true quantile value is
  * CONTAINED in the returned [lo, hi] bucket range — spec-asserted, not
  * statistical).
  *
  * Bucket of a nonnegative long v (m = 2^p sub-buckets per octave):
  * shift = max(floor(log2 v) - p, 0); bucket = shift*m + (v >> shift).
  * Values below 2m get exact unit buckets; above, bucket width 2^shift
  * on values ≥ 2^(p+shift) bounds relative error by 2^-p. floor(log2 v)
  * is `length(bin(v)) - 1` — integer-exact in Spark and DuckDB alike.
  */
object HdrQuantiles {

  /** The mergeable sketch: one row per (group, bucket) with its count —
    * at most ~64·2^p rows per group regardless of data size. Negative
    * values clamp to bucket 0 (callers pre-shift domains that can go
    * negative). One aggregate pass, map-side combined. */
  def sketch(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 5): DataFrame = {
    val m = 1 << p
    df.select(groupCols.map(col) :+
        greatest(col(valueCol).cast("long"), lit(0L)).as("__v"): _*)
      .withColumn("__exp", (length(bin(col("__v"))) - 1).cast("int"))
      .withColumn("__shift", greatest(col("__exp") - p, lit(0)))
      .withColumn("bucket",
        col("__shift").cast("long") * m + expr("shiftright(__v, __shift)"))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches by bucket addition — the property that makes the
    * sketch incremental: yesterday's persisted sketch + today's batch
    * sketch = the corpus sketch, no re-scan. */
  def merge(groupCols: Seq[String], sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Per-group quantile estimates from the sketch: for each q the
    * smallest bucket whose cumulative count reaches ceil(q·n), returned
    * as the bucket's exact integer [lo, hi] value range (which contains
    * the true rank-ceil(q·n) value). The cumulative window partitions by
    * group over SKETCH rows — bounded by sketch cardinality (~64·2^p),
    * never by data size. */
  def quantiles(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[(String, Double)], p: Int = 5): DataFrame =
    quantilesFromSketch(sketch(df, groupCols, valueCol, p), groupCols, qs, p)

  /** Quantile extraction from an existing sketch frame (group…, bucket,
    * cnt) — the entry point for PERSISTED sketches: a store that
    * accumulates bucket counts answers quantiles without ever rescanning
    * the corpus. */
  def quantilesFromSketch(
      sk: DataFrame, groupCols: Seq[String],
      qs: Seq[(String, Double)], p: Int = 5): DataFrame = {
    require(qs.nonEmpty, "quantiles needs at least one target")
    val m = 1 << p
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cum = sk
      .withColumn("__cum", sum("cnt").over(byGroup.orderBy("bucket")))
      .withColumn("__total", sum("cnt").over(byGroup))
    val picked = cum.groupBy(groupCols.map(col): _*)
      .agg(max("__total").cast("long").as("n"),
        qs.map { case (name, q) =>
          min(when(col("__cum") >= ceil(lit(q) * col("__total")),
            col("bucket"))).as(s"__b_$name")
        }: _*)
    val withBounds = qs.foldLeft(picked) { case (d, (name, _)) =>
      d.withColumn(s"__s_$name",
          expr(s"greatest(__b_$name div $m - 1, 0)"))
        .withColumn(s"${name}_lo",
          expr(s"shiftleft(__b_$name - __s_$name * $m, cast(__s_$name AS INT))"))
        .withColumn(s"${name}_hi",
          expr(s"${name}_lo + shiftleft(CAST(1 AS BIGINT), cast(__s_$name AS INT)) - 1"))
    }
    withBounds.select(groupCols.map(col) ++ (col("n") +:
      qs.flatMap { case (name, _) =>
        Seq(col(s"${name}_lo"), col(s"${name}_hi")) }): _*)
  }
}
