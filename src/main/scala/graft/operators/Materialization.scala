package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialization machinery: modified log, fingerprints,
  * staleness selection, retention (reference SURVEY §2 I1-I4, I7, B6, D7).
  *
  * The reference keeps a `(part, timestamp) -> max(modified)` log folded by
  * `process_modified_log` (trend_store.py:908-966) and a per-(target,
  * timestamp) fingerprint — `max(modified)` + a JSON map of per-source
  * last-modified (aggregation_compilation.py:773-785). A target chunk is
  * stale when `source_fingerprint != processed_fingerprint OR processed IS
  * NULL` (trend_store.py:1034-1096).
  *
  * Scale: the state tables are tiny (|parts| × |retained windows|); the
  * expensive part is only the recompute itself, which runs per stale window
  * with partition pruning on the window's time range. Fingerprint strings
  * use *ordered* aggregation (`sort_array`) — unordered string_agg is
  * nondeterministic under parallel aggregation and would produce false
  * staleness (SURVEY §7 hard part 3).
  */
object Materialization {

  /** Fold a raw modified log into per-key max-modified state (I1). */
  def modifiedState(log: DataFrame, keyCols: Seq[String], modifiedCol: String): DataFrame =
    log.groupBy(keyCols.map(col): _*).agg(max(col(modifiedCol)).as("last_modified"))

  /** Fingerprint per group: (max modified, canonical ordered "name:last"
    * string) — deterministic equivalent of the reference's jsonb fingerprint
    * (D7; string_agg order pinned via sort_array). */
  def fingerprint(state: DataFrame, groupCol: String, nameCol: String, lastCol: String): DataFrame =
    state.groupBy(col(groupCol)).agg(
      max(col(lastCol)).as("max_modified"),
      concat_ws(",", sort_array(collect_list(concat_ws(":", col(nameCol), col(lastCol)))))
        .as("fingerprint")
    )

  /** Stale-chunk selection (B6/I2): source fingerprint differs from the
    * processed one, or never processed. Both inputs keyed by `keyCol` with a
    * `fingerprint` column. */
  def staleChunks(source: DataFrame, processed: DataFrame, keyCol: String): DataFrame = {
    val p = processed.withColumnRenamed("fingerprint", "processed_fingerprint")
    source.join(p.select(col(keyCol), col("processed_fingerprint")), Seq(keyCol), "left")
      .filter(col("processed_fingerprint").isNull ||
        col("processed_fingerprint") =!= col("fingerprint"))
      .drop("processed_fingerprint")
  }

  /** Stability predicate (I3, materialization.py:102-125): only chunks whose
    * sources settled — `max_modified + stabilityDelay <= now` — and within
    * the reprocessing window `now - retention < ts`. */
  def stableChunks(chunks: DataFrame, tsCol: String, maxModifiedCol: String,
                   nowSec: Long, stabilityDelaySec: Long, retentionSec: Long): DataFrame =
    chunks.filter(
      col(tsCol) < nowSec &&
        (col(maxModifiedCol) + stabilityDelaySec) <= nowSec &&
        col(tsCol) > (nowSec - retentionSec))

  /** Retention expiry (I7, trend_store.py:793-845): at 100 TB this predicate
    * lands on the partition column, so expiry = dropping whole partitions. */
  def retain(df: DataFrame, tsCol: String, cutoffSec: Long): DataFrame =
    df.filter(col(tsCol) >= cutoffSec)
}
