package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-in surface lacks: as-of join
  * (latest-at-or-before feature attachment) and range joins (point-in-
  * interval, interval-overlap) without the cartesian blow-up a naive
  * `a.join(b, cond)` inequality join compiles to (BroadcastNestedLoopJoin,
  * O(|a|·|b|) comparisons).
  *
  * The reference's surface has no temporal joins (its trend storage is
  * keyed by exact granularity-aligned timestamps — `trend/storage.py`'s
  * whole model), but any pipeline that attaches slowly-changing state or
  * windowed context to event streams needs them; they are first-class here
  * alongside the SURVEY §2 inventory.
  *
  * Scale designs:
  *  - [[asofJoin]] is ONE shuffle per side into the same hash partitioning
  *    on the key, plus a per-key sort — no candidate pairs ever
  *    materialize, unlike the "join on key + ts range then keep max"
  *    formulation whose intermediate is |left|·(right rows in range).
  *    Per-key work is inherently serial (the running "latest seen" scan);
  *    a hot key serializes within its partition exactly like any
  *    per-entity ordered scan (sessionize, SCD-2). At 100 TB both sides
  *    stream through the sort — nothing is collected or broadcast.
  *  - [[pointInIntervalJoin]] / [[intervalOverlapJoin]] discretize time
  *    into `bucketWidth`-second grid cells: intervals replicate to the
  *    cells they span (factor ≈ 1 + span/bucketWidth — pick bucketWidth
  *    near the median span to keep it ~2×), points land in exactly one
  *    cell, and the join is a plain equi-join on (cell) or (cell, key)
  *    that Catalyst shuffles hash-partitioned. Candidates are bounded by
  *    Σ|cell_a|·|cell_b| over co-resident cells, never |a|·|b|; a
  *    pathological cell (every interval crossing one hour) is visible as
  *    one hot cell and cappable with [[SkewOps.keepSmallKeys]] upstream.
  */
object TemporalOps {

  /** As-of join: for each `left` row, attach the `right` row with the
    * greatest `rightTs` ≤ `leftTs` (direction "backward", the default) or
    * the smallest `rightTs` ≥ `leftTs` ("forward") within the same
    * `keyCols` group, optionally no further than `tolerance` seconds
    * away; unmatched left rows keep NULL payload. Right payload = every right column not in
    * `keyCols`/`rightTs`, which must be disjoint from left's column names.
    * The matched right timestamp is returned as `asof_ts`.
    *
    * Implementation: union both sides tagged (right=0, left=1) and run one
    * running-frame `last(_, ignoreNulls)` window ordered by
    * (ts, side) — at equal timestamps the right row sorts first, so a
    * feature published exactly at the event time IS visible (standard
    * backward-inclusive as-of, DuckDB `ASOF JOIN ... ON l.ts >= r.ts`
    * semantics, which is also what the oracle runs).
    *
    * Determinism: callers must ensure `right` has at most one row per
    * (keyCols, rightTs) — with duplicates the window's tie order, hence
    * the attached payload, is partition-layout-dependent.
    *
    * NULL keys follow SQL equality (the DuckDB ASOF `ON l.k = r.k`
    * semantics the oracle runs): a NULL never equals a NULL, so
    * NULL-key right rows are dropped and NULL-key left rows always get
    * NULL payload — NOT the "NULLs group together" behavior a raw
    * window partitionBy would give.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got '$direction'")
    val fwd = direction == "forward"
    val payload = right.columns.filterNot(c => keyCols.contains(c) || c == rightTs)
    val clash = payload.toSet intersect left.columns.toSet
    require(clash.isEmpty, s"asofJoin: right payload columns collide with left: $clash")
    val reserved = Seq("asof_ts", "__ts", "__side", "__match")
    val resClash = reserved.filter(r => left.columns.contains(r) || payload.contains(r))
    require(resClash.isEmpty,
      s"asofJoin: reserved output/internal column names in use: $resClash " +
        "(rename before joining — common when chaining two as-of joins)")
    val leftOnly = left.columns.filterNot(keyCols.contains)
    // SQL NULL-equality: NULL-key right rows can never match anything.
    // NULL-TIMESTAMP right rows can't either (DuckDB ASOF `l.ts >= r.ts`
    // is never true for NULL r.ts) — without this filter a null-ts row
    // sorts first (asc nulls-first), its non-null __match struct is
    // carried by last(ignoreNulls), and with tolerance=None every left
    // row before the first real right row would get its payload with
    // asof_ts=NULL.
    val rightClean = right.filter(
      (keyCols.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))

    // The matched right row travels as ONE struct so its fields stay
    // ATOMIC: per-column last(ignoreNulls) would paper over a genuine
    // NULL in the matched row with a stale value from an OLDER right row,
    // silently mixing columns of different rows (and diverging from the
    // native exec and DuckDB ASOF, which both return the whole row).
    val matchType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("asof_ts",
        org.apache.spark.sql.types.LongType) +:
        payload.map(p => right.schema(p).copy(nullable = true)))
    val lTagged = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).cast("long").as("__ts"), lit(1).as("__side")) ++
        leftOnly.map(col) :+
        lit(null).cast(matchType).as("__match"): _*)
    val rTagged = rightClean.select(
      keyCols.map(col) ++
        Seq(col(rightTs).cast("long").as("__ts"), lit(0).as("__side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTs).cast("long").as("asof_ts") +: payload.map(col): _*)
          .as("__match"): _*)

    // forward = earliest at-or-after: identical running scan over the
    // REVERSED timestamp order (right rows still sort before left at
    // equal ts, so an exactly-simultaneous feature stays visible)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(if (fwd) col("__ts").desc else col("__ts").asc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__match"), ignoreNulls = true).over(w))

    val matchedTs = col("__match.asof_ts")
    val gap = if (fwd) matchedTs - col("__ts") else col("__ts") - matchedTs
    val inTol = tolerance match {
      case Some(t) => col("__match").isNotNull && gap <= t
      case None    => col("__match").isNotNull
    }
    carried.filter(col("__side") === 1)
      .withColumn("__match", when(inTol, col("__match")))
      .select(
        keyCols.map(col) ++ leftOnly.map(col) ++
          (col("__match.asof_ts").as("asof_ts") +:
            payload.map(p => col(s"__match.$p").as(p))): _*)
  }

  /** As-of join through the NATIVE physical operator
    * ([[graft.plans.AsofJoinExec]]): identical semantics to
    * [[asofJoin]] in both directions — same output columns, same
    * equality-inclusive match, same tolerance masking — but executed as
    * a single streaming merge per partition with O(1) state instead of
    * the union + running-window composition (no null-padded union
    * materialization, no window state per carried column). The composed
    * form is the executable specification; `AsofJoinExecSpec`
    * differential-tests the two.
    *
    * Both ts columns must be LongType (epoch seconds/nanos — every graft
    * time column is); refuses loudly otherwise rather than silently
    * casting a column the caller also reads from the output. */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.types.LongType
    require(direction == "backward" || direction == "forward",
      s"asofJoinNative: direction must be backward|forward, got '$direction'")
    val payload = right.columns.filterNot(c => keyCols.contains(c) || c == rightTs)
    val clash = payload.toSet intersect left.columns.toSet
    require(clash.isEmpty, s"asofJoinNative: right payload columns collide with left: $clash")
    require(!left.columns.contains("asof_ts") && !payload.contains("asof_ts"),
      "asofJoinNative: 'asof_ts' is the matched-timestamp output column — " +
        "rename the existing one before joining (common when chaining as-ofs)")
    require(left.schema(leftTs).dataType == LongType &&
        right.schema(rightTs).dataType == LongType,
      s"asofJoinNative: ts columns must be LongType epoch values, got " +
        s"${left.schema(leftTs).dataType.simpleString}/${right.schema(rightTs).dataType.simpleString}")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.AsofJoinFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.AsofJoinFilterPushdown
    // SQL NULL-equality (match the composed form and DuckDB ASOF): a
    // NULL-key right row can never match; the merge's RowOrdering would
    // otherwise treat NULL == NULL and group them. NULL-ts right rows
    // likewise never satisfy l.ts >= r.ts — filtered here so the exec's
    // merge loop only ever sees real timestamps (symmetric with the
    // composed form's rightClean).
    val rightClean = right.filter(
      (keyCols.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
    GraftBridge.ofRows(spark, graft.plans.AsofJoin(
      GraftBridge.analyzed(left), GraftBridge.analyzed(rightClean),
      keyCols, leftTs, rightTs, tolerance, forward = direction == "forward"))
  }

  /** Exact non-negative integral floor division of a LONG column: the
    * remainder is subtracted first and the division runs in DECIMAL, so
    * the quotient is exact at ANY magnitude — a double division would
    * mis-bucket values whose remainder-free numerator exceeds 2^53 and
    * isn't a multiple of the double ulp (e.g. epoch-NANOS timestamps
    * with an hour-in-nanos bucket). */
  private def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))).cast("decimal(38,0)") / lit(d).cast("decimal(38,0)"))
      .cast("long")

  /** Grid cells an [lo, hi) interval covers, as a column of LONGs.
    * Floor semantics need non-negative inputs (epoch values are);
    * `sequence` is inclusive so the hi-side cell uses hi-1 (half-open
    * intervals never touch the cell starting exactly at hi). */
  private def cells(lo: Column, hi: Column, bucketWidth: Long): Column =
    sequence(floorDiv(lo, bucketWidth), floorDiv(hi - 1, bucketWidth))

  /** Point-in-interval join: rows of `points` paired with every `intervals`
    * row whose half-open [loCol, hiCol) contains ptCol. Output = point
    * columns ++ interval columns (names must be disjoint). Empty or
    * inverted intervals (hi ≤ lo) match nothing.
    *
    * Each point maps to exactly one grid cell, so no post-join dedup is
    * needed: a (point, interval) pair can only meet in the point's cell.
    */
  def pointInIntervalJoin(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "pointInIntervalJoin: bucketWidth must be positive")
    val p = points.withColumn("__cell", floorDiv(col(ptCol), bucketWidth))
    val iv = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__cell", explode(cells(col(loCol), col(hiCol), bucketWidth)))
    p.join(iv, "__cell")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__cell")
  }

  /** Interval-overlap join: pairs (a, b) whose half-open intervals
    * intersect (aLo < bHi ∧ bLo < aHi). Both sides replicate to their grid
    * cells; a pair spanning several shared cells would match once per
    * cell, so each pair is emitted only from the cell containing the
    * overlap's start (`greatest(aLo, bLo)`) — an exact-once rule that
    * needs no distinct/shuffle afterwards. */
  def intervalOverlapJoin(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "intervalOverlapJoin: bucketWidth must be positive")
    val ea = a.filter(col(aHi) > col(aLo))
      .withColumn("__cell", explode(cells(col(aLo), col(aHi), bucketWidth)))
    val eb = b.filter(col(bHi) > col(bLo))
      .withColumn("__cell", explode(cells(col(bLo), col(bHi), bucketWidth)))
    val ovStart = greatest(col(aLo), col(bLo))
    ea.join(eb, "__cell")
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__cell") === floorDiv(ovStart, bucketWidth))
      .drop("__cell")
  }

  /** Per-key rolling statistics over an ordered sequence: for each row,
    * aggregates over the trailing `window` rows (inclusive — ROWS
    * `window-1` PRECEDING .. CURRENT). `valueCol` must be integral
    * (LONG) so the running sums are exact and engine-portable; callers
    * with double measures scale to fixed-point first (`floor(v*100)` —
    * IEEE multiply-then-floor is bit-identical everywhere).
    *
    * One shuffle on `keyCols` + per-key sort; the frame is bounded, so
    * Spark's sliding-frame evaluation keeps O(window) state per key —
    * no growing buffers at 100 TB. `orderCols` must be a total order
    * within each key or the row-based frame is layout-dependent. */
  def rollingStats(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, window: Int): DataFrame = {
    require(window > 0, "rollingStats: window must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    df.withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
      .withColumn("roll_min", min(col(valueCol)).over(w))
      .withColumn("roll_max", max(col(valueCol)).over(w))
  }

  /** Dyadic EWMA: exponential smoothing with α = 1/2 truncated at `depth`
    * lags, kept ENTIRELY in integers — the weight of lag k is the
    * power-of-two 2^(depth−1−k), so `ewma_scaled` is the exact smoothed
    * value in units of 1/2^depth and never touches a float (classic
    * float EWMA is a sequential recurrence whose rounding depends on
    * history length; the truncated dyadic form is a pure windowed sum,
    * bit-identical anywhere, with truncation error ≤ 2^-depth of the
    * value scale). Warm-up rows (< depth predecessors) carry the partial
    * mass of the lags that exist — missing lags contribute zero, not a
    * renormalization.
    *
    * Scale: one keyed window per entity (frame bounded by `depth` rows);
    * no shuffle beyond the per-key partitioning every per-entity
    * operator already pays. */
  def dyadicEwma(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 32, "dyadicEwma: depth in [1, 32]")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val terms = (0 until depth).map { k =>
      coalesce(lag(col(valueCol), k).over(w), lit(0L)) *
        lit(1L << (depth - 1 - k))
    }
    df.withColumn("ewma_scaled", terms.reduce(_ + _))
  }

  /** One-sided CUSUM change detection (Page 1954, public) in pure
    * integers: the classic sequential recurrence
    * S_t = max(0, S_{t−1} + (x_t − target − slack)) has the closed form
    * S_t = C_t − min(0, min_{j≤t} C_j) over the prefix sums
    * C_t = Σ (x_i − target − slack) — so the inherently sequential
    * statistic becomes TWO keyed-window prefix scans (cumulative sum +
    * running min), engine-portable and layout-invariant; `alarm` fires
    * where S_t > threshold. All columns must be integral (the minerva
    * trigger convention: detect on cents, not floats).
    *
    * Scale: both windows partition by the entity key — bounded by one
    * entity's history, the same class as every per-entity ordered scan
    * in this file. */
  def cusum(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, targetCol: String, slack: Long,
      threshold: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__y", col(valueCol) - col(targetCol) - slack)
      .withColumn("__c", sum(col("__y")).over(run))
      .withColumn("cusum",
        col("__c") - least(lit(0L), min(col("__c")).over(run)))
      .withColumn("alarm", (col("cusum") > threshold).cast("boolean"))
      .drop("__y", "__c")
  }
}
