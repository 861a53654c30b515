package graft.storage

import graft.SparkSpec
import graft.core.MinervaType
import graft.model.{AttributeDef, InstanceModel}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed-notification conformance (round-2 item 7 / round-3 ADVICE):
  * the YAML-declared attribute types act like the reference notification
  * table's column types under PostgreSQL assignment-cast semantics
  * (storage/notification/tables.py:58-115). */
class NotificationStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store(attrs: AttributeDef*): NotificationStore =
    new NotificationStore(spark, "target/tmp/notifspec_unused", attrs)

  test("cross-family mismatch (text→integer) is rejected at plan time") {
    val s = store(AttributeDef("rule_id", MinervaType.MInteger))
    val batch = Seq(("x", "42")).toDF("rule", "rule_id")
    val e = intercept[IllegalArgumentException](s.conform(batch))
    assert(e.getMessage.contains("rule_id") && e.getMessage.contains("integer"))
  }

  test("missing declared column arrives as a typed NULL") {
    val s = store(AttributeDef("details", MinervaType.MText),
      AttributeDef("weight", MinervaType.MInteger))
    val out = s.conform(Seq(("r", 1L)).toDF("rule", "entity_id"))
    assert(out.schema("details").dataType == StringType)
    assert(out.schema("weight").dataType == IntegerType)
    val row = out.head
    assert(row.isNullAt(row.fieldIndex("details")) &&
      row.isNullAt(row.fieldIndex("weight")))
  }

  test("widening numeric and anything→text casts pass through") {
    val s = store(AttributeDef("weight", MinervaType.MBigInt),
      AttributeDef("details", MinervaType.MText))
    val out = s.conform(Seq((7, 123)).toDF("weight", "details"))
    assert(out.schema("weight").dataType == LongType)
    assert(out.schema("details").dataType == StringType)
    val r = out.head
    assert(r.getAs[Long]("weight") == 7L && r.getAs[String]("details") == "123")
  }

  test("narrowing fractional→integral ROUNDS (PG assignment), not truncates") {
    val s = store(AttributeDef("score", MinervaType.MInteger))
    val out = s.conform(Seq(3.6, 2.4, -1.5).toDF("score"))
    assert(out.schema("score").dataType == IntegerType)
    assert(out.sort("score").collect().map(_.getInt(0)).toSeq == Seq(-2, 2, 4))
    // PG family split on exact ties: float8 → int is rint (half to even)...
    val ties = s.conform(Seq(2.5, 3.5).toDF("score"))
    assert(ties.sort("score").collect().map(_.getInt(0)).toSeq == Seq(2, 4))
    // ...numeric → int rounds half away from zero
    val dec = s.conform(Seq(BigDecimal("2.5"), BigDecimal("3.5")).toDF("score"))
    assert(dec.sort("score").collect().map(_.getInt(0)).toSeq == Seq(3, 4))
  }

  test("narrowing out-of-range RAISES instead of silently wrapping") {
    val s = store(AttributeDef("small", MinervaType.MSmallInt))
    val ok = s.conform(Seq(12000L).toDF("small"))
    assert(ok.head.getAs[Short]("small") == 12000.toShort)
    val bad = s.conform(Seq(1234567L).toDF("small"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("out of range") ||
      Option(e.getCause).exists(_.getMessage.contains("out of range")))
    // NULLs stay NULL — only real values can be out of range
    val nulls = s.conform(Seq[Option[Long]](None).toDF("small"))
    assert(nulls.head.isNullAt(0))
  }

  test("json / timestamptz aliases honored from YAML declarations") {
    val def_ = InstanceModel.parseNotificationStore(
      """data_source: ds
        |entity_type: notification
        |attributes:
        |  - name: data
        |    data_type: json
        |  - name: created
        |    data_type: timestamp with time zone
        |  - name: extra
        |    data_type: jsonb
        |""".stripMargin)
    val types = def_.attributes.map(a => a.name -> a.dataType).toMap
    assert(types("data") == MinervaType.MText)
    assert(types("extra") == MinervaType.MText)
    assert(types("created") == MinervaType.MTimestamp)
  }

  test("declaration round-trips attribute names needing JSON escaping") {
    val base = "target/tmp/notifspec_escape"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val attrs = Seq(AttributeDef("""quoted"name""", MinervaType.MInteger),
      AttributeDef("""back\slash""", MinervaType.MText))
    NotificationStore.create(base, attrs,
      spark.sparkContext.hadoopConfiguration)
    // an unescaped render would produce invalid JSON here and every later
    // writer opening the store would fail to parse the declaration
    val read = NotificationStore.readDeclaration(fs, base)
    assert(read == attrs)
  }
}
