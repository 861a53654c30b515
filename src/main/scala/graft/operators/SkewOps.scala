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
    * `groupBy(key).count()` and the one-row-per-key size table is joined
    * back on the key, so rows stream through without per-key buffering.
    *
    * Shuffle sharing: both the size aggregate and the join hash-partition
    * on the same keys, so `df` is repartitioned on the keys ONCE and both
    * consumers derive from that child — the physical plan carries a single
    * `Exchange` for `df` plus a `ReusedExchange` (asserted by
    * `CompilerSkewSpec`), restoring the exchange the window formulation got
    * for free. The output stays hash-partitioned on the raw key columns, so
    * a caller's follow-up self-join on the same keys reuses it too.
    *
    * NULL keys: rows with a NULL in any key column are dropped (a NULL
    * shingle/bucket is a degenerate group, not a real cap candidate). This
    * is explicit — the filter below — not an accident of inner-join
    * semantics. */
  def keepSmallKeys(df: DataFrame, keys: Seq[String], maxSize: Int): DataFrame = {
    val parted = df
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .repartition(keys.map(col): _*)
    // Exchange-reuse anchor. The size branch legitimately needs only the
    // key columns, so ColumnPruning would push a keys-only projection below
    // this branch's repartition, the two exchange subtrees would diverge,
    // and df would be shuffled (and its upstream computed) TWICE. The
    // anchor defeats that: `first(hash(<non-key cols>))` is carried through
    // the aggregate and genuinely referenced by the filter inside
    // `least(maxSize, greatest(maxSize, anchor))` — an expression that
    // always evaluates to maxSize but that no optimizer rule can fold
    // (folding it needs the algebraic identity least(c, greatest(c, x)) = c,
    // which Catalyst does not implement). With every column referenced, both
    // branches keep the IDENTICAL exchange subtree and AQE reuses the one
    // shuffle (asserted by CompilerSkewSpec).
    // hash() rejects MapType inputs, so anchor maps by their size instead
    // of their value — the anchor only needs to REFERENCE the column, its
    // value is never observed
    val nonKey = df.columns.filterNot(keys.contains)
    val hashable = df.schema.fields.filter(f => nonKey.contains(f.name)).map {
      f => f.dataType match {
        case _: org.apache.spark.sql.types.MapType => size(col(f.name))
        case _ => col(f.name)
      }
    }
    val (anchorAgg, capExpr) =
      if (nonKey.isEmpty) (count(lit(1)).as("__a"), lit(maxSize))
      else (first(hash(hashable.toIndexedSeq: _*)).as("__a"),
        least(lit(maxSize), greatest(lit(maxSize), col("__a"))))
    val small = parted.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), anchorAgg)
      .filter(col("__n") <= capExpr)
      .select(keys.map(col): _*)
    parted.join(small, keys)
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
