package graft.core

import org.apache.spark.sql.types._

/** Minerva scalar type system: the ordered widening lattice used for schema
  * deduction and load-time type widening.
  *
  * Mirrors the semantics of the reference implementation
  * (src/minerva/storage/datatype.py:872-975 — TYPE_ORDER lattice at 908-917,
  * max_data_type at 925-938, deduce_data_types fold at 960-975, first-match
  * per value at 950-957). Re-expressed as a pure-Scala total order; Spark
  * schema inference is NOT reused because the reference pins its own
  * semantics (e.g. "" parses as null for numeric types, `\N` is the null
  * token, exactly two timestamp formats).
  *
  * Scale note: deduction runs over a driver-side sample (or a distributed
  * fold via `deduceDataTypesDistributed`); the per-value classifier is a
  * cheap rank function, so the distributed path is a single `max` aggregate
  * per column — one shuffle-free partial-agg pass at any data size.
  */
sealed abstract class MinervaType(
    val name: String,
    val rank: Int,
    val sparkType: DataType
) extends Serializable {
  /** Whether the (non-null) string value parses as this type. */
  def accepts(value: String): Boolean
}

object MinervaType {
  /** COPY-convention null token plus empty string (datatype.py:991-1002,
    * 314-315: "" deduces/parses to null for numeric types). */
  val NullTokens: Set[String] = Set("", "\\N")

  private def parsesAs[T](f: String => T): String => Boolean =
    s => try { f(s); true } catch { case _: Exception => false }

  case object MSmallInt extends MinervaType("smallint", 0, ShortType) {
    def accepts(v: String): Boolean =
      try { v.toShort; true } catch { case _: Exception => false }
  }
  case object MInteger extends MinervaType("integer", 1, IntegerType) {
    def accepts(v: String): Boolean =
      try { v.toInt; true } catch { case _: Exception => false }
  }
  case object MBigInt extends MinervaType("bigint", 2, LongType) {
    def accepts(v: String): Boolean =
      try { v.toLong; true } catch { case _: Exception => false }
  }
  case object MReal extends MinervaType("real", 3, FloatType) {
    private val p = parsesAs(_.toFloat)
    def accepts(v: String): Boolean = p(v) && !v.exists(c => c == 'x' || c == 'X')
  }
  case object MDouble extends MinervaType("double precision", 4, DoubleType) {
    private val p = parsesAs(_.toDouble)
    def accepts(v: String): Boolean = p(v) && !v.exists(c => c == 'x' || c == 'X')
  }
  case object MNumeric extends MinervaType("numeric", 5, DecimalType(38, 18)) {
    def accepts(v: String): Boolean =
      try { BigDecimal(v); true } catch { case _: Exception => false }
  }
  /** The reference's NAIVE `timestamp` (datatype.py:207-275): the parsed
    * wall-clock value is kept verbatim with no timezone attached, so a
    * file loaded under any session timezone stores identical values.
    * Spark mapping: TimestampNTZType (SURVEY §1.2). This is the type in
    * the deduction lattice — TYPE_ORDER carries only the naive form
    * (datatype.py:908-917). */
  case object MTimestampNtz extends MinervaType("timestamp", 6, TimestampNTZType) {
    // The reference recognizes exactly two formats (datatype.py:207-275).
    private val formats = Seq(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    )
    def accepts(v: String): Boolean = formats.exists { f =>
      try { java.time.LocalDateTime.parse(v, f); true }
      catch { case _: Exception => false }
    }
  }
  /** `timestamp with time zone` (datatype.py:137-204): the parsed value is
    * LOCALIZED in the configured timezone (reference default UTC) — an
    * absolute instant. Spark mapping: TimestampType. Declared-only (trend
    * configs, notification stores); deduction never produces it, exactly
    * like the reference's TYPE_ORDER. Shares the naive type's lattice
    * rank so a declared tz column widens like a timestamp in migration
    * ladders. */
  case object MTimestamp
      extends MinervaType("timestamp with time zone", 6, TimestampType) {
    def accepts(v: String): Boolean = MTimestampNtz.accepts(v)
  }
  case object MText extends MinervaType("text", 7, StringType) {
    def accepts(v: String): Boolean = true
  }
  case object MBoolean extends MinervaType("boolean", -1, BooleanType) {
    val trueTokens = Set("true", "t", "1", "on", "yes")
    val falseTokens = Set("false", "f", "0", "off", "no")
    def accepts(v: String): Boolean = {
      val lv = v.toLowerCase
      trueTokens.contains(lv) || falseTokens.contains(lv)
    }
  }

  /** TYPE_ORDER (datatype.py:908-917). boolean sits outside the widening
    * order in the reference as well. */
  val TypeOrder: Seq[MinervaType] =
    Seq(MSmallInt, MInteger, MBigInt, MReal, MDouble, MNumeric, MTimestampNtz, MText)

  def byName(n: String): Option[MinervaType] =
    (MBoolean +: MTimestamp +: TypeOrder).find(_.name == n)

  /** Widest of two types (max_data_type, datatype.py:925-938). */
  def max(a: MinervaType, b: MinervaType): MinervaType =
    if (a.rank >= b.rank) a else b

  /** First matching type for a single value (datatype.py:950-957). Null
    * tokens deduce to the bottom of the lattice (they fit any type). */
  def deduceValue(v: String): MinervaType =
    if (NullTokens.contains(v)) MSmallInt
    else TypeOrder.find(_.accepts(v)).getOrElse(MText)

  /** Row-wise reduction over a column's values (datatype.py:960-975). */
  def deduce(values: IterableOnce[String]): MinervaType =
    values.iterator.foldLeft(MSmallInt: MinervaType)((acc, v) =>
      max(acc, deduceValue(v)))

  /** Array types: `T[]` for every scalar T (datatype.py:781-862; COPY
    * `{...}` form at 1005-1016, bracketed `[...]` form for config values).
    * Spark mapping: `ArrayType(T.sparkType)`. */
  final case class MArray(elem: MinervaType)
      extends MinervaType(s"${elem.name}[]", -2, ArrayType(elem.sparkType)) {
    def accepts(v: String): Boolean = splitArray(v).isDefined
    /** Parses "{a,b,c}" or "[a,b,c]" into elements (no nested arrays —
      * the reference has none). */
    def parseArray(v: String): Option[Seq[Any]] =
      splitArray(v).map(_.map(e => parse(elem, e.trim).orNull))
  }

  private def splitArray(v: String): Option[Seq[String]] = {
    val t = v.trim
    val inner =
      if (t.startsWith("{") && t.endsWith("}")) Some(t.substring(1, t.length - 1))
      else if (t.startsWith("[") && t.endsWith("]")) Some(t.substring(1, t.length - 1))
      else None
    inner.map(s => if (s.isEmpty) Seq.empty else s.split(",").toSeq)
  }

  /** Parse a value of the given type; None for null tokens.
    * Range checks mirror the reference (e.g. smallint −2^15..2^15−1,
    * datatype.py:278-367). */
  def parse(t: MinervaType, v: String): Option[Any] =
    if (NullTokens.contains(v)) None
    else Some(t match {
      case MSmallInt  => v.toShort
      case MInteger   => v.toInt
      case MBigInt    => v.toLong
      case MReal      => v.toFloat
      case MDouble    => v.toDouble
      case MNumeric   => BigDecimal(v)
      case MText      => v
      case MBoolean   =>
        if (MBoolean.trueTokens.contains(v.toLowerCase)) true
        else if (MBoolean.falseTokens.contains(v.toLowerCase)) false
        else throw new IllegalArgumentException(s"not a boolean: $v")
      case MTimestampNtz =>
        // external type for TimestampNTZType — the wall-clock value
        // verbatim, never shifted through any timezone
        java.time.LocalDateTime.parse(v.replace("T", " "),
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      case MTimestamp =>
        // localize in the reference's default parser timezone (UTC,
        // datatype.py:139-141) — an absolute instant, independent of the
        // JVM default zone
        java.time.LocalDateTime.parse(v.replace("T", " "),
            java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
          .atOffset(java.time.ZoneOffset.UTC).toInstant
      case a: MArray =>
        a.parseArray(v).getOrElse(
          throw new IllegalArgumentException(s"not an array: $v"))
    })
}
