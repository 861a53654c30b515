package graft.core

import org.scalatest.funsuite.AnyFunSuite
import MinervaType._

/** Mirrors reference tests/storage/test_datatype.py (range edges, null
  * tokens, deduction lattice ordering). */
class MinervaTypeSpec extends AnyFunSuite {
  test("smallint range edges") {
    assert(MSmallInt.accepts("-32768"))
    assert(MSmallInt.accepts("32767"))
    assert(!MSmallInt.accepts("32768"))
    assert(!MSmallInt.accepts("-32769"))
  }
  test("integer/bigint range edges") {
    assert(MInteger.accepts("2147483647"))
    assert(!MInteger.accepts("2147483648"))
    assert(MBigInt.accepts("9223372036854775807"))
    assert(!MBigInt.accepts("9223372036854775808"))
  }
  test("null tokens deduce to bottom and parse to None") {
    assert(deduceValue("") == MSmallInt)
    assert(deduceValue("\\N") == MSmallInt)
    assert(parse(MInteger, "").isEmpty)
    assert(parse(MText, "\\N").isEmpty)
  }
  test("first matching type wins per value") {
    assert(deduceValue("42") == MSmallInt)
    assert(deduceValue("40000") == MInteger)
    assert(deduceValue("3000000000") == MBigInt)
    assert(deduceValue("1.5") == MReal)
    assert(deduceValue("2020-01-01 10:00:00") == MTimestampNtz)
    assert(deduceValue("hello") == MText)
  }
  test("widening lattice order") {
    val order = Seq(MSmallInt, MInteger, MBigInt, MReal, MDouble, MNumeric, MTimestampNtz, MText)
    assert(TypeOrder == order)
    for (i <- order.indices; j <- order.indices)
      assert(MinervaType.max(order(i), order(j)) == order(math.max(i, j)))
  }
  test("deduction folds over rows") {
    assert(deduce(Seq("1", "2", "3")) == MSmallInt)
    assert(deduce(Seq("1", "40000", "3")) == MInteger)
    assert(deduce(Seq("1", "1.5")) == MReal)
    assert(deduce(Seq("1", "x")) == MText)
    assert(deduce(Seq("", "\\N")) == MSmallInt)
  }
  test("boolean token sets") {
    for (t <- Seq("true", "t", "1", "on", "yes", "TRUE"))
      assert(parse(MBoolean, t).contains(true))
    for (f <- Seq("false", "f", "0", "off", "no"))
      assert(parse(MBoolean, f).contains(false))
  }
  test("array types parse COPY and bracket forms") {
    val ia = MArray(MInteger)
    assert(ia.accepts("{1,2,3}") && ia.accepts("[1,2,3]"))
    assert(!ia.accepts("1,2,3"))
    assert(parse(ia, "{1,2,3}").contains(Seq(1, 2, 3)))
    assert(parse(ia, "{}").contains(Seq.empty))
    assert(parse(ia, "{1,\\N,3}").contains(Seq(1, null, 3)))
    assert(parse(MArray(MText), "[a, b]").contains(Seq("a", "b")))
    assert(ia.sparkType == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType))
  }

  test("timestamp accepts the two known formats") {
    assert(MTimestamp.accepts("2020-08-25 14:00:00"))
    assert(MTimestamp.accepts("2020-08-25T14:00:00"))
    assert(!MTimestamp.accepts("25-08-2020"))
    assert(MTimestampNtz.accepts("2020-08-25 14:00:00"))
    assert(MTimestampNtz.accepts("2020-08-25T14:00:00"))
    assert(!MTimestampNtz.accepts("25-08-2020"))
  }

  test("naive timestamp and timestamptz are distinct lattice types") {
    import org.apache.spark.sql.types._
    // names resolve per the reference's two types (datatype.py:137-275)
    assert(MinervaType.byName("timestamp").contains(MTimestampNtz))
    assert(MinervaType.byName("timestamp with time zone").contains(MTimestamp))
    assert(MTimestampNtz.sparkType == TimestampNTZType)
    assert(MTimestamp.sparkType == TimestampType)
    // deduction only ever produces the naive form — TYPE_ORDER has no tz
    assert(TypeOrder.contains(MTimestampNtz) && !TypeOrder.contains(MTimestamp))
    assert(deduce(Seq("42", "2020-01-01 10:00:00")) == MTimestampNtz)
    // both widen to text, and both out-widen numerics (same rung)
    assert(MinervaType.max(MTimestampNtz, MText) == MText)
    assert(MinervaType.max(MNumeric, MTimestampNtz) == MTimestampNtz)
    // naive parse keeps the wall clock verbatim; tz parse pins UTC —
    // neither consults the JVM default zone
    assert(parse(MTimestampNtz, "2020-08-25T14:00:00")
      .contains(java.time.LocalDateTime.of(2020, 8, 25, 14, 0, 0)))
    assert(parse(MTimestamp, "2020-08-25T14:00:00")
      .contains(java.time.Instant.parse("2020-08-25T14:00:00Z")))
  }
}
