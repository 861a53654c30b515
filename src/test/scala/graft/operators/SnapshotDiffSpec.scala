package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot diff: classification, null-safe compares, column scoping. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldDf = Seq(
    (1L, Option("a"), Option(10L)),
    (2L, Option("b"), Option(20L)),
    (3L, Option("c"), None),
    (4L, None, Option(40L)))
    .toDF("k", "s", "v")

  private lazy val newDf = Seq(
    (1L, Option("a"), Option(10L)),  // unchanged
    (2L, Option("B"), Option(20L)),  // s changed
    (3L, Option("c"), Option(30L)),  // v: null -> 30
    (5L, Option("e"), Option(50L)))  // added; 4 removed
    .toDF("k", "s", "v")

  test("added/removed/changed classified; null transitions are changes") {
    val d = SnapshotDiff.diff(oldDf, newDf, Seq("k"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getSeq[String](2))).toMap
    assert(d.size == 4) // row 1 (unchanged) dropped by default
    assert(d(2L) == ("changed", Seq("s")))
    assert(d(3L) == ("changed", Seq("v"))) // NULL -> 30 is a change
    assert(d(4L) == ("removed", Seq.empty))
    assert(d(5L) == ("added", Seq.empty))
  }

  test("includeUnchanged keeps the identical rows; multi-column changes list all, sorted") {
    val n2 = newDf.withColumn("v",
      when(col("k") === 2L, lit(99L)).otherwise(col("v")))
    val d = SnapshotDiff.diff(oldDf, n2, Seq("k"), includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d(1L) == "unchanged")
    val changed = SnapshotDiff.diff(oldDf, n2, Seq("k"))
      .filter(col("k") === 2L).head.getSeq[String](2)
    assert(changed == Seq("s", "v")) // sorted column names
  }

  test("columns only in one snapshot are ignored, not treated as changes") {
    val withExtra = newDf.withColumn("extra", lit(1L))
    val d = SnapshotDiff.diff(oldDf, withExtra, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!d.contains(1L)) // still unchanged: 'extra' not compared
  }

  test("NULL key components classify by presence, not by key nullness") {
    // the <=> join matches NULL keys across sides; presence must come
    // from per-side markers or a NULL-key row reads as 'added'
    val o = Seq((Option.empty[Long], Option("x")), (Some(9L), Option("y")))
      .toDF("k", "s")
    val nSame = Seq((Option.empty[Long], Option("x")), (Some(9L), Option("y")))
      .toDF("k", "s")
    assert(SnapshotDiff.diff(o, nSame, Seq("k")).count() == 0)
    val nChanged = Seq((Option.empty[Long], Option("X")), (Some(9L), Option("y")))
      .toDF("k", "s")
    val d = SnapshotDiff.diff(o, nChanged, Seq("k"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toMap
    assert(d(None) == "changed")
    val nGone = Seq((Some(9L), Option("y"))).toDF("k", "s")
    val d2 = SnapshotDiff.diff(o, nGone, Seq("k"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toMap
    assert(d2(None) == "removed")
  }
}
