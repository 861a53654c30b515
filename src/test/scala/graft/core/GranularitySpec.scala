package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.time._

/** Mirrors reference tests/storage/trend/test_granularity.py and
  * test_timestamps.py (truncate/inc/range + DST behavior). */
class GranularitySpec extends AnyFunSuite {
  private val utc = ZoneId.of("UTC")
  private val ams = ZoneId.of("Europe/Amsterdam")
  private def i(s: String): Instant = Instant.parse(s)

  test("parse spellings") {
    assert(Granularity.parse("900") == SecondsGranularity(900))
    assert(Granularity.parse("15m") == SecondsGranularity(900))
    assert(Granularity.parse("1h") == SecondsGranularity(3600))
    assert(Granularity.parse("1 hour") == SecondsGranularity(3600))
    assert(Granularity.parse("1d") == DaysGranularity(1))
    assert(Granularity.parse("2 days") == DaysGranularity(2))
    assert(Granularity.parse("1w") == WeeksGranularity(1))
    assert(Granularity.parse("1month") == MonthsGranularity(1))
    assert(Granularity.parse("1 month") == MonthsGranularity(1))
  }
  test("15m truncation on epoch grid") {
    val g = Granularity.parse("15m")
    assert(g.truncate(i("2024-01-05T10:44:59Z"), utc) == i("2024-01-05T10:30:00Z"))
    assert(g.truncate(i("2024-01-05T10:45:00Z"), utc) == i("2024-01-05T10:45:00Z"))
  }
  test("day truncation is local-midnight (DST-aware)") {
    val g = DaysGranularity(1)
    // Amsterdam is UTC+1 in winter: local midnight = 23:00Z previous day.
    assert(g.truncate(i("2024-01-05T10:00:00Z"), ams) == i("2024-01-04T23:00:00Z"))
    // Summer (UTC+2): local midnight = 22:00Z previous day.
    assert(g.truncate(i("2024-07-05T10:00:00Z"), ams) == i("2024-07-04T22:00:00Z"))
  }
  test("DST transition day has 23 hours but day-next still lands on midnight") {
    val g = DaysGranularity(1)
    // 2024-03-31 is the spring-forward day in Europe/Amsterdam.
    val start = g.truncate(i("2024-03-31T10:00:00Z"), ams)
    assert(start == i("2024-03-30T23:00:00Z"))
    val nxt = g.next(start, ams)
    assert(nxt == i("2024-03-31T22:00:00Z")) // 23h later, still local midnight
  }
  test("week truncation lands on Monday") {
    val g = WeeksGranularity(1)
    // 2024-01-05 is a Friday; week starts Mon 2024-01-01.
    assert(g.truncate(i("2024-01-05T10:00:00Z"), utc) == i("2024-01-01T00:00:00Z"))
  }
  test("month truncation and increment") {
    val g = MonthsGranularity(1)
    assert(g.truncate(i("2024-02-15T10:00:00Z"), utc) == i("2024-02-01T00:00:00Z"))
    assert(g.next(i("2024-01-31T00:00:00Z"), utc) == i("2024-02-29T00:00:00Z"))
  }
  test("range is exclusive-start inclusive-end on the grid") {
    val g = SecondsGranularity(3600)
    val r = g.range(i("2024-01-01T00:00:00Z"), i("2024-01-01T03:00:00Z"), utc)
    assert(r == Seq(i("2024-01-01T01:00:00Z"), i("2024-01-01T02:00:00Z"), i("2024-01-01T03:00:00Z")))
  }
  test("partition index") {
    assert(Granularity.timestampToIndex(86400, i("1970-01-02T00:00:00Z")) == 1)
    assert(Granularity.timestampToIndex(86400, i("1970-01-01T23:59:59Z")) == 0)
  }
}
