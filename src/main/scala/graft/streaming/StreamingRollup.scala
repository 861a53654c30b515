package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open session being tracked per entity (streaming sessionization state). */
final case class SessionState(start: Long, end: Long, n: Long)

/** A closed session emitted by [[StreamingRollup.sessionize]]. */
final case class ClosedSession(
    entity_id: Long, session_start: Long, session_end: Long, n_events: Long)

/** A completed stage sequence emitted by [[StreamingRollup.funnelDetect]]. */
final case class FunnelHit(entity_id: Long, times: Seq[Long])

final case class CusumAlarm(entity_id: Long, ord: Long, cusum: Long)

/** A left row with its latest-at-or-before right match attached (None
  * when no match survives), emitted by [[StreamingRollup.streamAsofJoin]]. */
final case class AsofAttached(
    entity_id: Long, l_ord: Long, l_ts: Long,
    asof_ts: Option[Long], r_val: Option[Long])

/** Structured Streaming equivalents of the reference's micro-batch
  * incremental loop (SURVEY §2 I1-I6).
  *
  * The reference polls: process modified log → materialize stale chunks →
  * sleep (src/minerva/commands/live_monitor.py:40-45), with lateness
  * handled by reprocessing windows for `reprocessing_period`
  * (materialization.py:12-20). In Structured Streaming the same contract
  * is: event-time tumbling window aggregation + watermark = allowed
  * lateness; `update` output mode re-emits a window when late rows arrive —
  * exactly "reprocess the chunk whose fingerprint changed".
  *
  * Scale: stateful aggregation state is keyed by (entity, window); the
  * state store partitions by the same hash shuffle as the batch rollup, so
  * the streaming path inherits the batch partitioning story. Watermark
  * bounds state size: windows older than the watermark are evicted —
  * the streaming analogue of `reprocessing_period`.
  */
object StreamingRollup {

  /** Streaming STATE seam (r19): run `body` — a block that starts,
    * drains and stops streaming queries — under an optional override of
    * the state-store partition count and provider.
    *
    * Why a seam: a stateful operator commits one state-store delta per
    * state partition per micro-batch, and the partition count is frozen
    * at first start from `spark.sql.shuffle.partitions` — which this
    * codebase (and the bench contract) sets to the CORE count. Those are
    * different resources: state partitions should be sized to state
    * volume and commit overhead, cores to compute. On the sf0.1 bench
    * the mismatch is measurable — the streaming gates run 2–4× FASTER
    * on 8 cores than 32 purely because fewer near-empty state stores
    * commit per micro-batch; at 100 TB the same knob sizes partitions to
    * the real key-space instead. Defaults are UNCHANGED (no env ⇒ no-op)
    * so the driver's bench stays comparable across rounds; production
    * values belong in deployment config:
    *   - SPARK_GRAFT_STREAM_STATE_PARTITIONS: shuffle/state partition
    *     count for the streaming block (e.g. 8 locally; at scale, sized
    *     so per-partition state stays in the store's sweet spot)
    *   - SPARK_GRAFT_STREAM_STATE_PROVIDER: "rocksdb" selects Spark's
    *     RocksDBStateStoreProvider (the standard large-state provider);
    *     any other value is taken as a provider class name
    *
    * The conf stays overridden for the WHOLE block — the stream thread
    * clones the session conf when the first micro-batch plans, which
    * happens after `.start()` returns — and is restored afterwards. */
  def withStateSeam[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val parts = sys.env.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    val provider = sys.env.get("SPARK_GRAFT_STREAM_STATE_PROVIDER").map {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case other => other
    }
    if (parts.isEmpty && provider.isEmpty) body
    else {
      val conf = spark.conf
      val partsKey = "spark.sql.shuffle.partitions"
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevParts = conf.get(partsKey)
      val prevProv = conf.getOption(provKey)
      parts.foreach(conf.set(partsKey, _))
      provider.foreach(conf.set(provKey, _))
      try body
      finally {
        conf.set(partsKey, prevParts)
        prevProv match {
          case Some(p) => conf.set(provKey, p)
          case None    => conf.unset(provKey)
        }
      }
    }
  }

  /** Streaming time aggregation: tumbling `granSeconds` windows per entity,
    * tolerating `latenessSeconds` of out-of-order data.
    *
    * @param stream streaming DataFrame with an event-time timestamp column
    */
  def rollup(
      stream: DataFrame,
      entityCol: String,
      tsCol: String,
      granSeconds: Long,
      latenessSeconds: Long,
      aggs: Seq[Column]
  ): DataFrame = {
    val agged = stream
      .withWatermark(tsCol, s"$latenessSeconds seconds")
      .groupBy(
        col(entityCol).as("entity_id"),
        window(col(tsCol), s"$granSeconds seconds"))
      .agg(aggs.head, aggs.tail: _*)
    val aggCols = agged.columns.filterNot(c => c == "entity_id" || c == "window")
    agged.select(
      col("entity_id") +:
        // reference labels rollups with the window END (SURVEY D1)
        unix_timestamp(col("window.end")).as("timestamp") +:
        aggCols.toIndexedSeq.map(col): _*)
  }

  /** Streaming sessionization with custom state (`flatMapGroupsWithState`,
    * the SURVEY's custom-state path): per-entity gap-based sessions, the
    * streaming analogue of the batch q45 window composition.
    *
    * State = the one open session per entity; a session closes (and is
    * emitted) when a later event arrives past the gap, or when event time
    * passes session_end + gap (event-time timeout keyed to the watermark —
    * state for silent entities is evicted, bounding the store at
    * |active entities|, never |events|).
    *
    * @param stream streaming frame with an entity column and an event-time
    *               TIMESTAMP column (watermark applied here)
    */
  def sessionize(
      stream: DataFrame,
      entityCol: String,
      tsCol: String,
      gapSeconds: Long,
      latenessSeconds: Long
  ): Dataset[ClosedSession] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream
      .select(col(entityCol).cast("long").as("__entity"),
        col(tsCol).cast("timestamp").as("__ts"))
      // watermark AFTER the cast — a cast re-derives the column and would
      // drop the watermark tag if applied first
      .withWatermark("__ts", s"$latenessSeconds seconds")
      .as[(Long, java.sql.Timestamp)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(entity, s.start, s.end, s.n))
          } else {
            val secs = rows.map(_._2.getTime / 1000).toSeq.sorted
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            secs.foreach { t =>
              open = open match {
                // within gap of the open session's INTERVAL (either side —
                // a late event can extend the start downward, not just the
                // end upward)
                case Some(s) if t >= s.start - gapSeconds && t <= s.end + gapSeconds =>
                  Some(SessionState(math.min(s.start, t), math.max(s.end, t), s.n + 1))
                case Some(s) if t > s.end + gapSeconds =>
                  closed += ClosedSession(entity, s.start, s.end, s.n)
                  Some(SessionState(t, t, 1))
                case Some(s) => // older than start - gap: its own session
                  closed += ClosedSession(entity, t, t, 1)
                  Some(s)
                case None =>
                  Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end + gapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming funnel detection (CEP-lite over custom state): per
    * entity, track the earliest in-order completion of `stages` — the
    * first stage-0 event, then the first stage-1 event at-or-after it,
    * and so on — and emit ONE [[FunnelHit]] with the stage timestamps
    * when the last stage completes. The streaming face of the batch
    * funnel (q156's chained min-after-min): processing events in event-
    * time order (ties break by stage index, so a same-second view is
    * visible to its click) makes "first event of stage i at-or-after
    * stage i−1" exactly the batch chain.
    *
    * State = ≤|stages| longs per entity, retained until completion —
    * bound it in production with an upstream watermark filter or a
    * periodic state sweep; the gate feeds a bounded slice. */
  def funnelDetect(
      stream: DataFrame, entityCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): Dataset[FunnelHit] = {
    require(stages.nonEmpty, "funnelDetect: empty stage list")
    val spark = stream.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val nStages = stages.length
    val typed = stream.select(col(entityCol).cast("long"),
        col(tsCol).cast("long"), col(typeCol).cast("string"))
      .as[(Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], FunnelHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity, rows, state: GroupState[Seq[Long]]) =>
          var times = state.getOption.getOrElse(Seq.empty)
          if (times.length >= nStages) Iterator.empty // already emitted
          else {
            val evs = rows.toSeq
              .flatMap { case (_, t, ty) => stageIdx.get(ty).map(i => (t, i)) }
              .sortBy { case (t, i) => (t, i) }
            val out = Seq.newBuilder[FunnelHit]
            evs.foreach { case (t, i) =>
              if (times.length < nStages && i == times.length &&
                  (times.isEmpty || t >= times.last)) {
                times = times :+ t
                if (times.length == nStages) out += FunnelHit(entity, times)
              }
            }
            // no state row for entities that never reached stage 0 —
            // the store stays bounded by funnel PARTICIPANTS
            if (times.nonEmpty) state.update(times)
            out.result().iterator
          }
      }
  }

  /** Streaming one-sided CUSUM change detection — the live-monitor face
    * of the batch closed form (TemporalOps.cusum): per entity the state
    * is exactly TWO longs (running sum, running min of the sum), so
    * S = cum − min(0, minCum) replays the sequential recurrence without
    * retaining history; an alarm row emits whenever S crosses
    * `threshold`. The input must already carry the deviation column
    * (value − target − slack, integral) — calibration (e.g. per-entity
    * medians from a reference window) joins in upstream as a
    * stream-static join, keeping this operator pure monitoring.
    * Rows are ordered by `ordCol` within each micro-batch; batches must
    * arrive in time order (the q193 funnel contract — event-time
    * ordering across batches is the replay harness's/watermark's job).
    * State is O(1) per entity, never ∝ history. */
  def cusumDetect(
      stream: DataFrame, entityCol: String, ordCol: String, yCol: String,
      threshold: Long): Dataset[CusumAlarm] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream.select(col(entityCol).cast("long"),
        col(ordCol).cast("long"), col(yCol).cast("long"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity, rows, state: GroupState[(Long, Long)]) =>
          var (cum, minCum) = state.getOption.getOrElse((0L, 0L))
          val out = Seq.newBuilder[CusumAlarm]
          rows.toSeq.sortBy(_._2).foreach { case (_, ord, y) =>
            cum += y
            if (cum < minCum) minCum = cum
            val s = cum - math.min(0L, minCum)
            if (s > threshold) out += CusumAlarm(entity, ord, s)
          }
          state.update((cum, minCum))
          out.result().iterator
      }
  }

  /** Stream-stream interval join: rows of `right` matched to `left`
    * rows with the same key whose event time falls in
    * [leftTs, leftTs + windowSeconds] — the impression⋈click /
    * trigger⋈outcome attribution join, as a genuine two-sided stateful
    * streaming join (NOT a static broadcast): both sides buffer in the
    * state store and the time-range condition + watermarks bound state
    * — a left row evicts once the watermark passes leftTs +
    * windowSeconds (no future right row can reach it), a right row once
    * it passes rightTs (Spark derives both bounds from the condition).
    * Inner-join rows emit on arrival of the matching side, so no
    * flush/sentinel is needed for completeness at quiesce.
    *
    * Column names must be disjoint; both ts columns must cast to
    * TIMESTAMP. Returns left columns ++ right columns. */
  def streamIntervalJoin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      windowSeconds: Long, latenessSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "streamIntervalJoin: windowSeconds must be positive")
    val clash = left.columns.toSet intersect right.columns.toSet
    require(clash.isEmpty, s"streamIntervalJoin: column names collide: $clash")
    val l = left.withColumn(leftTs, col(leftTs).cast("timestamp"))
      .withWatermark(leftTs, s"$latenessSeconds seconds")
    val r = right.withColumn(rightTs, col(rightTs).cast("timestamp"))
      .withWatermark(rightTs, s"$latenessSeconds seconds")
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $windowSeconds seconds"))
  }

  /** Streaming as-of join: each left row attaches the LATEST right row
    * with the same key whose event time is at-or-before the left's —
    * feature attachment on a live stream (price-at-trade, last-closed-
    * hour stats at event time), the latest-at-or-before shape
    * [[streamIntervalJoin]]'s range condition cannot express (a range
    * join emits ALL matches in the window; as-of emits exactly the
    * newest). Batch equivalent: `TemporalOps.asofJoinNative` — the q237
    * gate and `StreamingRollupSpec` hold the two to the same rows over a
    * replayed slice.
    *
    * Why not a stream-stream join + per-left max aggregate: Spark would
    * buffer every in-horizon right per key AND delay emission to window
    * finalization. Here state is O(1) PER KEY — exactly the newest
    * right (ts, value) — the same two-long trick as the native batch
    * exec's merge and [[cusumDetect]]'s closed form, and left rows emit
    * in their own micro-batch. The contract that buys O(1) state is the
    * established q193/q230 one: micro-batches arrive in event-time
    * order (any order WITHIN a batch — rows are processed in (ts, side)
    * order, rights before lefts at equal ts, so an exactly-simultaneous
    * feature is visible, matching the batch operator's equality-
    * inclusive match). Right rows must be unique per (key, ts) — the
    * same determinism precondition the batch oracle needs.
    * `tolerance` masks matches older than the given gap (the match is
    * still ONLY the latest right — an older in-tolerance right never
    * substitutes, exactly like the batch form).
    *
    * CO-DELIVERY caveat: with two physically separate sources Spark may
    * pull one logical round's sides in SEPARATE micro-batches (left
    * batch first → its rows emit before the same round's rights are
    * seen). The contract therefore requires the two sides of a time
    * window to arrive in the SAME micro-batch — in practice one tagged
    * source (a single bus carrying both row kinds), which is what
    * [[streamAsofJoinTagged]] takes and the q237 replay drives. This
    * two-frame convenience wrapper is for aligned sources only. */
  def streamAsofJoin(
      left: DataFrame, leftKey: String, leftTs: String, leftOrd: String,
      right: DataFrame, rightKey: String, rightTs: String, rightVal: String,
      tolerance: Option[Long] = None): Dataset[AsofAttached] = {
    val spark = left.sparkSession
    import spark.implicits._
    // tagged union: (key, ts, side, payload) — side 0 = right so it
    // sorts before a left row at the same ts
    val l = left.select(col(leftKey).cast("long"), col(leftTs).cast("long"),
        lit(1L), col(leftOrd).cast("long"))
      .as[(Long, Long, Long, Long)]
    val r = right.select(col(rightKey).cast("long"), col(rightTs).cast("long"),
        lit(0L), col(rightVal).cast("long"))
      .as[(Long, Long, Long, Long)]
    streamAsofJoinTagged(l.union(r), tolerance)
  }

  /** [[streamAsofJoin]] on a pre-tagged single stream of
    * (key, ts, side, payload) rows — side 0 = right (payload = value),
    * side 1 = left (payload = the left row's id). One source means one
    * micro-batch per logical round, which is what makes the in-batch
    * (ts, side) sort a total order over each round's rows. */
  def streamAsofJoinTagged(
      tagged: Dataset[(Long, Long, Long, Long)],
      tolerance: Option[Long] = None): Dataset[AsofAttached] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), AsofAttached](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[(Long, Long)]) =>
          var latest = state.getOption // newest right (ts, val) so far
          val out = Seq.newBuilder[AsofAttached]
          rows.toSeq.sortBy(t => (t._2, t._3)).foreach {
            case (_, ts, 0L, v) =>
              if (latest.forall(_._1 <= ts)) latest = Some((ts, v))
            case (_, ts, _, ordId) =>
              // rts <= ts is implied by ordered delivery + in-batch sort;
              // kept as a guard so a contract violation (a future right
              // already in state) degrades to an honest null, never a
              // leaked future feature
              val m = latest.filter { case (rts, _) =>
                rts <= ts && tolerance.forall(t => ts - rts <= t) }
              out += AsofAttached(key, ordId, ts, m.map(_._1), m.map(_._2))
          }
          latest.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming ingest into a trend part (the streaming analogue of the
    * reference's continuous harvest loop — plugin parse → store →
    * mark-modified per file, processor.py): each micro-batch runs the SAME
    * staged-swap keyed MERGE as a batch load. Delivery is micro-batch
    * at-least-once; because the merge upserts on (entity_id, timestamp), a
    * replayed micro-batch converges to the same stored rows —
    * effectively-once storage without a transactional sink. The modified
    * log gets one entry per (batch timestamp), driving downstream
    * staleness exactly like batch loads.
    *
    * `checkpointLocation` makes the query recoverable (resume from the
    * last committed micro-batch after a crash/restart); without it the
    * query restarts from scratch, which the keyed merge tolerates
    * (replays converge) but pays a full source re-read for.
    *
    * Returns the started query; callers own its lifecycle. */
  def trendSink(
      stream: DataFrame,
      ps: graft.storage.PartStore,
      part: String,
      nowSec: () => Long = () => System.currentTimeMillis() / 1000,
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val now = nowSec()
          // the micro-batch is consumed by two actions (store reads it for
          // the merge; markModified projects its timestamps)
          val cached = batch.persist()
          ps.store(part, cached)
          ps.markModified(part, cached, now)
          cached.unpersist()
          ()
        }
      }
      .start()

  /** Streaming incremental ANN index maintenance: the q99 appendable
    * IVF-PQ loop driven by a stream. Each micro-batch of (id, vector) rows
    * loads the PERSISTED centroid/codebook sidecars (per batch, so a
    * sidecar refresh is picked up at the next micro-batch without a
    * restart), computes its own bucket and PQ code-array columns, and
    * upserts through the staged-swap merge — existing rows are never
    * re-indexed, and a replayed micro-batch converges to the same stored
    * rows MODULO the `modified` column: the default `nowSec` is wall
    * clock, so a replay stamps a different `modified` (greatest-wins
    * upsert keeps results identical; pass a deterministic `nowSec` for
    * bit-identical replays). Retrieval over the growing index is
    * `Similarity.ivfPqTopKStored` (compressed) or `ivfTopKStored`
    * (bucket-only) at any point between batches. The index part is
    * ID-RANGE partitioned (`Similarity.writeIndexBatch`), so each
    * micro-batch merge touches only the partitions holding its ids.
    *
    * Returns the started query; callers own its lifecycle. A production
    * stream should pass `checkpointLocation` — without it the query
    * cannot resume from its last committed micro-batch after a crash
    * (replays still converge, but the source is re-read from scratch). */
  def indexSink(
      stream: DataFrame,
      ps: graft.storage.PartStore,
      part: String,
      centroidsPath: String,
      codebooksPath: String,
      idCol: String,
      vecCol: String,
      nowSec: () => Long = () => System.currentTimeMillis() / 1000,
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          graft.functions.Similarity.writeIndexBatch(ps, part, batch.toDF(),
            idCol, vecCol,
            graft.functions.Similarity.loadCentroids(spark, centroidsPath),
            graft.functions.Similarity.loadPqCodebooks(spark, codebooksPath),
            modified = nowSec())
        }
      }
      .start()

  /** Streaming HdrHistogram sketch sink: each micro-batch's bucket
    * sketch merges into the persisted (group…, bucket) store by bucket
    * ADDITION — the streaming face of q216's incremental sketch, closing
    * the batch/incremental/streaming triangle for approximate quantiles.
    * Because the sketch is layout-invariant and merge is commutative
    * addition, the store after any prefix of micro-batches equals the
    * batch sketch of that prefix's rows — stream vs batch never
    * diverges by a single count. Per-batch cost ∝ the BATCH's sketch
    * (≤ 64·2^p rows per group), never corpus. NOTE: replaying a
    * micro-batch double-counts (addition is not idempotent) — recovery
    * deployments checkpoint and rely on exactly-once foreachBatch
    * delivery, or key batches by epoch in `modified`. */
  def sketchSink(
      stream: DataFrame,
      ps: graft.storage.PartStore,
      part: String,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = 5,
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    // Addition-merge is NOT idempotent, so running without a checkpoint
    // double-counts every micro-batch replayed after a restart. Tests
    // drive ephemeral MemoryStreams without one; anything durable must
    // not — make the unsafe default loud instead of silent.
    if (checkpointLocation.isEmpty)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn("sketchSink started WITHOUT checkpointLocation: bucket " +
          "addition is not idempotent, so a post-restart micro-batch " +
          "replay will double-count. Pass a checkpoint for any stream " +
          "that can restart.")
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import graft.functions.HdrQuantiles
          val skCols = groupCols.map(col) ++ Seq(col("bucket"), col("cnt"))
          val sk = HdrQuantiles.sketch(batch.toDF(), groupCols, valueCol, p)
          val merged = ps.readPart(part) match {
            case None => sk
            case Some(ex) =>
              HdrQuantiles.merge(groupCols, ex.select(skCols: _*), sk)
          }
          ps.store(part, merged
            .withColumn("timestamp", col("bucket"))
            .withColumn("modified", lit(batchId))
            // sketch-sized pin: store() executes its input twice; without
            // it the micro-batch re-aggregates per store action
            .localCheckpoint())
          ()
        }
      }
      .start()
  }

  /** Streaming count-min sink: each micro-batch's d×w grid merges into
    * the persisted (r, bucket) store by cell addition — the streaming
    * face of q244's incremental CMS, closing the
    * batch/incremental/streaming triangle for heavy hitters exactly as
    * [[sketchSink]] does for quantiles. Addition is associative and
    * commutative, so the store after any prefix of micro-batches equals
    * the batch grid of that prefix's rows. Per-batch cost ∝ the batch's
    * key vocabulary; the store never exceeds d·w rows. Same
    * non-idempotence caveat as sketchSink: recoverable streams must
    * checkpoint. */
  def cmsSink(
      stream: DataFrame,
      ps: graft.storage.PartStore,
      part: String,
      keyCol: String,
      d: Int = 4,
      w: Int = 512,
      salt: String = "cms",
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    if (checkpointLocation.isEmpty)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn("cmsSink started WITHOUT checkpointLocation: cell " +
          "addition is not idempotent, so a post-restart micro-batch " +
          "replay will double-count. Pass a checkpoint for any stream " +
          "that can restart.")
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.CountMin.incrementalAppend(
            ps, part, batch.toDF(), keyCol, None, d, w, salt, modified = batchId)
          ()
        }
      }
      .start()
  }

  /** Streaming vocabulary sink: each micro-batch's distinct key types
    * anti-join the persisted type store and only UNSEEN ones append
    * ([[graft.functions.TextAnalysis.vocabGrowthAppend]]) — the
    * streaming face of q251. Unlike the addition-merge sinks this one
    * is IDEMPOTENT on replay (a replayed micro-batch inserts nothing),
    * so it is safe without a checkpoint; `modified` records the
    * inserting micro-batch id, making the store its own first-seen
    * log (which the q260 gate reads back as per-batch growth). */
  def vocabSink(
      stream: DataFrame,
      ps: graft.storage.PartStore,
      part: String,
      keyCol: String,
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.TextAnalysis.vocabGrowthAppend(
            ps, part, batch.toDF(), keyCol, epoch = batchId)
          ()
        }
      }
      .start()

  /** Streaming face of the gram-novelty registry
    * ([[graft.functions.TextAnalysis.gramNoveltyAppend]]): each
    * micro-batch registers its new grams (insert-missing, so replayed
    * micro-batches are idempotent) — the batch/incremental/streaming
    * triangle the other stores carry. The per-batch score frame the
    * append returns is discarded here (a production pipeline would
    * write it to its own sink); the registry is the shared state.
    * Recoverable streams must pass `checkpointLocation`. */
  def noveltySink(
      stream: DataFrame,
      ps: graft.storage.PartStore,
      part: String,
      idCol: String,
      textCol: String,
      n: Int,
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.TextAnalysis.gramNoveltyAppend(
            ps, part, batch.toDF(), idCol, textCol, n, modified = batchId)
          ()
        }
      }
      .start()

  /** Streaming incremental dedup with PERSISTED state: each micro-batch
    * runs [[graft.functions.Dedup.exactIncremental]] against the shared
    * digest PartStore — the streaming face of q142, complementing
    * [[dedupExact]]'s bounded-horizon watermark dedup with UNBOUNDED
    * retention (duplicates are caught however far apart they arrive,
    * because the state lives in storage, not the state store). Batch
    * backfills and the stream share one write contract, exactly like
    * [[indexSink]] and `writeIndexBatch`: a batch job calling
    * exactIncremental on the same store is indistinguishable from the
    * stream having processed that data. Recoverable streams must pass
    * `checkpointLocation`; replayed micro-batches are idempotent (the
    * anti-join admits no already-stored digest). */
  def dedupSink(
      stream: DataFrame,
      ps: graft.storage.PartStore,
      part: String,
      idCol: String,
      textCol: String,
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          graft.functions.Dedup.exactIncremental(
            ps, part, batch.toDF(), idCol, textCol).count()
          ()
        }
      }
      .start()

  /** Streaming quota-admission sink — the streaming face of q317's
    * quota rebalancer: per-source admission caps enforced ACROSS
    * micro-batches through a persisted admitted-count state. Each batch
    * ranks its rows within source by the deterministic (md5(id), id)
    * admission order (rank via `Ranks.rankWithinGroup` — sources are a
    * bounded group set, no per-group corpus sort), admits rank ≤
    * quota − already-admitted, upserts the admitted rows into
    * `keptStore` (id-keyed, so row replays are idempotent) and
    * replace-publishes the |sources|-row count state. The admission set
    * is a pure function of (state, batch) — deterministic order, so the
    * SCHEDULE is engine-replayable (the q175/q325 per-probe convention,
    * admission flavor). Row replays are idempotent (id-keyed upsert);
    * the count state follows the addition-merge sinks' caveat (cmsSink,
    * charLmSink): a re-fired micro-batch recounts — production relies
    * on exactly-once foreachBatch via checkpointing. */
  def quotaSink(
      stream: DataFrame,
      keptStore: graft.storage.PartStore,
      countStore: graft.storage.PartStore,
      idCol: String,
      srcCol: String,
      quotas: Map[String, Long],
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    require(keptStore.config.keyCols == Seq("entity_id"),
      s"quotaSink: kept store keys (entity_id), got ${keptStore.config.keyCols}")
    require(countStore.config.keyCols == Seq("source"),
      s"quotaSink: count store keys (source), got ${countStore.config.keyCols}")
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch0: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch0.isEmpty) {
          val batch = batch0.toDF()
          val counts = countStore.readPart("counts")
            .map(_.select(col("source"), col("admitted")))
            .getOrElse {
              val s = batch.sparkSession
              import org.apache.spark.sql.types._
              s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                StructType(Seq(StructField("source", StringType),
                  StructField("admitted", LongType))))
            }
          val qmap = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
            when(col("source") === s, lit(q)).otherwise(acc)
          }
          val ranked = graft.functions.Ranks.rankWithinGroup(
            batch.select(col(srcCol).as("source"),
              md5(concat(lit("qh:"), col(idCol).cast("string"))).as("__h"),
              col(idCol).cast("long").as("entity_id")),
            Seq("source"), Seq("__h", "entity_id"))
          val admitted = ranked
            .join(broadcast(counts.withColumnRenamed("admitted", "__a")),
              Seq("source"), "left")
            .filter(col("__gr") + coalesce(col("__a"), lit(0L)) <= qmap)
            .select(col("entity_id"), col("source"))
            .localCheckpoint() // one admission set feeds both stores
          keptStore.store("kept", admitted
            .withColumn("timestamp", pmod(col("entity_id"), lit(1024L)))
            .withColumn("modified", lit(batchId + 1)))
          val newCounts = counts
            .unionByName(admitted.groupBy("source")
              .agg(count(lit(1)).as("admitted")))
            .groupBy("source").agg(sum("admitted").as("admitted"))
          countStore.replacePart("counts", newCounts
            .withColumn("timestamp", lit(0L))
            .withColumn("modified", lit(batchId + 1)))
          ()
        }
      }
      .start()
  }

  /** Streaming char-LM counts sink — the streaming face of the q135
    * trigram model (triangle: one-shot charLmScore / incremental
    * charLmCountsAppend / this): each micro-batch's trigram counts merge
    * into the persisted model by ADDITION, so the store after the stream
    * equals the one-shot corpus counts and scoring against it is
    * bit-identical to fresh. Like the other addition-merge sinks
    * (cmsSink), a REPLAYED micro-batch double-counts — production
    * deployments checkpoint and rely on exactly-once foreachBatch. */
  def charLmSink(
      stream: DataFrame,
      ps: graft.storage.PartStore,
      part: String,
      idCol: String,
      textCol: String,
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.TextAnalysis.charLmCountsAppend(
            ps, part, batch.toDF(), idCol, textCol, modified = batchId + 1)
          ()
        }
      }
      .start()

  /** Streaming decontamination sink — the streaming face of the q63
    * exact-digest decontaminate, completing that family's triangle
    * (batch q63 / incremental q302 / streaming here): training docs
    * stream in, the EVAL-set digest store is fixed state, and every
    * micro-batch lands its docs in `outPart` stamped with the
    * contamination verdict. The eval probe prunes to the digest
    * partitions the batch touches (the exactIncremental read shape);
    * writes upsert on doc id, so replayed micro-batches are idempotent.
    * Filtering is the reader's one predicate (`contaminated = 0`) —
    * keeping flagged rows preserves the audit trail the reference's
    * decontamination reports need. */
  def decontamSink(
      stream: DataFrame,
      evalStore: graft.storage.PartStore,
      evalPart: String,
      outStore: graft.storage.PartStore,
      outPart: String,
      idCol: String,
      textCol: String,
      checkpointLocation: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointLocation.foldLeft(stream.writeStream)(_.option("checkpointLocation", _))
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val b = batch.toDF()
            .select(col(idCol).cast("long").as("entity_id"),
              graft.functions.Dedup.digest(col(textCol)).as("digest"))
            .withColumn("timestamp",
              conv(substring(col("digest"), 1, 15), 16, 10).cast("long"))
            .localCheckpoint()
          val psize = evalStore.config.partitionSizeSeconds
          val pidx = b.select(((col("timestamp") -
              pmod(col("timestamp"), lit(psize))) / psize)
            .cast("long").as("p")).distinct()
          val evalDigests = evalStore.readPart(evalPart) match {
            case Some(ex) => ex.join(broadcast(pidx),
                ex("pindex") === col("p")).select("digest").distinct()
            case None => b.limit(0).select("digest")
          }
          outStore.store(outPart, b
            .join(evalDigests.withColumn("__hit", lit(1)), Seq("digest"), "left")
            .select(col("entity_id"), col("entity_id").as("timestamp"),
              col("digest"),
              when(col("__hit").isNotNull, 1L).otherwise(0L).as("contaminated"),
              lit(batchId + 1).as("modified")))
          ()
        }
      }
      .start()

  /** Streaming exact dedup: drop re-arrivals of the same normalized-text
    * digest within the watermark horizon — the streaming face of the batch
    * `Dedup.exact` (q25), for ingest feeds that replay or mirror documents.
    *
    * Semantics: the FIRST arrival of a digest passes through; duplicates
    * arriving within `latenessSeconds` of the watermark are dropped.
    * `dropDuplicatesWithinWatermark` evicts digest state once the watermark
    * passes its horizon, so the state store is bounded by the horizon's
    * digest cardinality — never by stream history (a plain
    * `dropDuplicates` would grow without bound on an unbounded corpus
    * stream). Duplicates farther apart than the horizon re-emit, which the
    * batch dedup sweeping the stored corpus reconciles — the standard
    * streaming-dedup-then-batch-compact split at 100 TB. */
  def dedupExact(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      latenessSeconds: Long
  ): DataFrame =
    stream
      .withColumn("digest", graft.functions.Dedup.digest(col(textCol)))
      .withWatermark(tsCol, s"$latenessSeconds seconds")
      .dropDuplicatesWithinWatermark("digest")

  /** Streaming trigger/notification path (I6): threshold rules applied to
    * the stream, appending notification rows — the streaming analogue of
    * `trigger.create_notifications`. Stateless (pure filter+project), so it
    * runs in append mode with no state store. */
  def notifications(
      stream: DataFrame,
      rule: graft.operators.TriggerRule,
      entityCol: String,
      tsCol: String
  ): DataFrame = {
    val withThresholds = rule.thresholds.foldLeft(stream) { case (df, (k, v)) =>
      df.withColumn(k, lit(v))
    }
    withThresholds
      .filter(expr(rule.condition))
      .select(
        col(entityCol).as("entity_id"),
        col(tsCol).as("timestamp"),
        lit(rule.name).as("rule"),
        expr(rule.weight).cast("long").as("weight"),
        rule.details.as("details"))
  }
}
