package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Declarative DQ audit: rule classes, null semantics, plan shape. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Option(10L), Option(5.0), "a"),
    (2L, Option(20L), Option(-1.0), "b"),   // range violation
    (2L, Option(20L), Option(2.0), "a"),    // duplicate id
    (3L, None, Option(3.0), "zz"),          // null ref (not an FK violation)
    (4L, Option(99L), None, "a"))           // no parent 99; null value
    .toDF("id", "ref", "value", "tag")

  private lazy val parent = Seq(10L, 20L).toDF("pid")

  private def report = DataQuality.audit(df,
    rowRules = Seq(
      "value_nonneg" -> (col("value") < 0.0),
      "tag_known" -> !col("tag").isin("a", "b")),
    uniqueKeys = Seq("id_unique" -> Seq("id")),
    fks = Seq(("ref_in_parent", "ref", parent, "pid")))
    .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("row rules: violation predicates count rows; NULL predicate counts as clean") {
    assert(report("value_nonneg") == (1L, 5L)) // the NULL value row is clean
    assert(report("tag_known") == (1L, 5L))
  }

  test("uniqueness: violations = surplus rows beyond one per key") {
    assert(report("id_unique") == (1L, 4L)) // 5 rows, 4 distinct ids
  }

  test("referential: null children are excluded, orphans counted") {
    assert(report("ref_in_parent") == (1L, 4L)) // ref=99 orphan; null ref skipped
  }

  test("profile: per-column counts/NDV/min-max with numeric vs string routing") {
    val p = DataQuality.profile(df, Seq("id", "value", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap
    val idRow = p("id")
    assert(idRow.getLong(1) == 5L && idRow.getLong(2) == 0L && idRow.getLong(3) == 4L)
    assert(idRow.getDouble(4) == 1.0 && idRow.getDouble(5) == 4.0)
    assert(idRow.isNullAt(6) && idRow.isNullAt(7)) // numeric: no string min/max
    val vRow = p("value")
    assert(vRow.getLong(1) == 4L && vRow.getLong(2) == 1L) // one null value
    assert(vRow.getDouble(4) == -1.0 && vRow.getDouble(5) == 5.0)
    val tRow = p("tag")
    assert(tRow.getString(6) == "a" && tRow.getString(7) == "zz")
    assert(tRow.isNullAt(4) && tRow.isNullAt(5)) // string: no numeric min/max
  }

  test("all row rules share one aggregate pass (one scan, no join, no window)") {
    val plan = DataQuality.audit(df,
      rowRules = Seq(
        "r1" -> (col("value") < 0.0), "r2" -> col("tag").isNull,
        "r3" -> (col("id") < 0L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(!plan.contains("Join"))
    // exactly one scan of the source regardless of rule count
    assert(plan.linesIterator.count(_.contains("Scan")) <= 1, plan)
  }

  test("empty table: row rules report 0 violations / 0 checked, never NULL") {
    val empty = df.limit(0)
    val rows = DataQuality.audit(empty,
      rowRules = Seq("neg" -> (col("value") < 0.0)),
      uniqueKeys = Seq("uk" -> Seq("id"))).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), r.toString)
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L, r.toString)
    }
  }
}
