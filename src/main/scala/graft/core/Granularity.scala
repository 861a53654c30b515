package graft.core

import java.time._

/** Time granularity: the reference's fundamental rollup step
  * (src/minerva/storage/trend/granularity.py:13-79 — truncate at 54-76,
  * parser at 97-152). Seconds-based granularities truncate on the epoch
  * grid; day/week/month are calendar-aware in the instance timezone
  * (DST contract per src/minerva/storage/trend/helpers.py:49-137).
  *
  * Spark mapping: `truncExprSql` renders the truncation as a Catalyst
  * expression string so the hot path stays inside whole-stage codegen —
  * granularity math is never a UDF.
  */
sealed trait Granularity extends Serializable {
  def truncate(t: Instant, zone: ZoneId): Instant
  def next(t: Instant, zone: ZoneId): Instant
  def prev(t: Instant, zone: ZoneId): Instant
  /** Granularity-aligned timestamps in (from, to]. */
  def range(from: Instant, to: Instant, zone: ZoneId): Seq[Instant] = {
    val b = Seq.newBuilder[Instant]
    var cur = next(truncate(from, zone), zone)
    while (!cur.isAfter(to)) { b += cur; cur = next(cur, zone) }
    b.result()
  }
  /** SQL expression (Spark + DuckDB compatible subset where possible)
    * truncating column `c` to this granularity. */
  def truncExprSql(c: String): String
  def name: String
}

/** Fixed-duration granularity (15m/30m/1h/… up to 1d — epoch-grid). */
final case class SecondsGranularity(seconds: Long) extends Granularity {
  require(seconds > 0)
  def truncate(t: Instant, zone: ZoneId): Instant =
    Instant.ofEpochSecond(Math.floorDiv(t.getEpochSecond, seconds) * seconds)
  def next(t: Instant, zone: ZoneId): Instant = t.plusSeconds(seconds)
  def prev(t: Instant, zone: ZoneId): Instant = t.minusSeconds(seconds)
  def truncExprSql(c: String): String =
    s"CAST(to_timestamp(floor(CAST($c AS DOUBLE) / $seconds) * $seconds) AS TIMESTAMP)"
  def name: String =
    if (seconds % 86400 == 0) s"${seconds / 86400}d"
    else if (seconds % 3600 == 0) s"${seconds / 3600}h"
    else if (seconds % 60 == 0) s"${seconds / 60}m"
    else s"${seconds}s"
}

/** Calendar day(s): truncates to local midnight (DST-aware). */
final case class DaysGranularity(days: Int) extends Granularity {
  require(days > 0)
  def truncate(t: Instant, zone: ZoneId): Instant =
    t.atZone(zone).toLocalDate.atStartOfDay(zone).toInstant
  def next(t: Instant, zone: ZoneId): Instant =
    t.atZone(zone).plusDays(days).toInstant
  def prev(t: Instant, zone: ZoneId): Instant =
    t.atZone(zone).minusDays(days).toInstant
  def truncExprSql(c: String): String = s"date_trunc('day', $c)"
  def name: String = s"${days}d"
}

/** Calendar week(s): truncates to Monday 00:00 local. */
final case class WeeksGranularity(weeks: Int) extends Granularity {
  require(weeks > 0)
  def truncate(t: Instant, zone: ZoneId): Instant = {
    val d = t.atZone(zone).toLocalDate
    d.minusDays(d.getDayOfWeek.getValue - 1L).atStartOfDay(zone).toInstant
  }
  def next(t: Instant, zone: ZoneId): Instant =
    t.atZone(zone).plusWeeks(weeks).toInstant
  def prev(t: Instant, zone: ZoneId): Instant =
    t.atZone(zone).minusWeeks(weeks).toInstant
  def truncExprSql(c: String): String = s"date_trunc('week', $c)"
  def name: String = s"${weeks}w"
}

/** Calendar month(s): first-of-month 00:00 local (granularity.py:54-76).
  * Spark's `window()` rejects month intervals; `date_trunc('month', …)`
  * grouping expresses the same tumbling semantics (SURVEY §7). */
final case class MonthsGranularity(months: Int) extends Granularity {
  require(months > 0)
  def truncate(t: Instant, zone: ZoneId): Instant =
    t.atZone(zone).toLocalDate.withDayOfMonth(1).atStartOfDay(zone).toInstant
  def next(t: Instant, zone: ZoneId): Instant =
    t.atZone(zone).plusMonths(months).toInstant
  def prev(t: Instant, zone: ZoneId): Instant =
    t.atZone(zone).minusMonths(months).toInstant
  def truncExprSql(c: String): String = s"date_trunc('month', $c)"
  def name: String = s"${months}month"
}

object Granularity {
  /** Parses the reference's granularity spellings
    * (granularity.py:97-152,200-207): bare seconds ("900"), short units
    * ("15m", "1h", "1d", "1w", "1month"), verbose units ("1 day",
    * "2 hours", "900 seconds"). */
  private val Pat = """^\s*(\d+)\s*(y(?:ear(?:s)?)?|month(?:s)?|mon|w(?:eek(?:s)?)?|d(?:ay(?:s)?)?|h(?:our(?:s)?)?|m(?:in(?:ute(?:s)?)?)?|s(?:ec(?:ond(?:s)?)?)?|)\s*$""".r

  def parse(s: String): Granularity = s match {
    case Pat(n, unit) =>
      val v = n.toLong
      unit match {
        case "" => SecondsGranularity(v)
        case u if u.startsWith("y") => MonthsGranularity(v.toInt * 12)
        case u if u.startsWith("mon") => MonthsGranularity(v.toInt)
        case u if u.startsWith("w") => WeeksGranularity(v.toInt)
        case u if u.startsWith("d") => DaysGranularity(v.toInt)
        case u if u.startsWith("h") => SecondsGranularity(v * 3600)
        case u if u.startsWith("s") => SecondsGranularity(v)
        case u if u.startsWith("m") => SecondsGranularity(v * 60)
      }
    case _ => throw new IllegalArgumentException(s"unparseable granularity: $s")
  }

  /** Partition index for a timestamp: range-partitioning key
    * (src/minerva/commands/partition.py:13,66-74). At scale this is the
    * parquet/Delta partition column — file-source pruning turns time
    * predicates into partition pruning for free. */
  def timestampToIndex(partitionSizeSeconds: Long, t: Instant): Long =
    Math.floorDiv(t.getEpochSecond, partitionSizeSeconds)
}
