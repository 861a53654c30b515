package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- asofJoin ----

  private def leftDf = Seq(
    (1L, 100L, "a"), (1L, 205L, "b"), (1L, 999L, "c"),
    (2L, 50L, "d"), (3L, 10L, "e")
  ).toDF("k", "t", "tag")

  private def rightDf = Seq(
    (1L, 100L, 10L), (1L, 200L, 20L), (2L, 60L, 30L)
  ).toDF("k", "rt", "feat")

  test("asofJoin attaches latest at-or-before per key") {
    val out = TemporalOps.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
      .orderBy("k", "t")
      .select("k", "t", "tag", "asof_ts", "feat")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      (1L, 100L, "a", Some(100L), Some(10L)), // equal ts IS visible
      (1L, 205L, "b", Some(200L), Some(20L)),
      (1L, 999L, "c", Some(200L), Some(20L)),
      (2L, 50L, "d", None, None),             // right row is in the future
      (3L, 10L, "e", None, None)))            // key absent on right
  }

  test("asofJoin tolerance masks stale matches") {
    val out = TemporalOps.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        tolerance = Some(100L))
      .orderBy("k", "t").select("t", "asof_ts").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    // t=999 matched rt=200 but 799 > 100 → masked
    assert(out.find(_._1 == 999L).get._2 === None)
    assert(out.find(_._1 == 205L).get._2 === Some(200L))
  }

  test("asofJoin forward direction attaches earliest at-or-after") {
    val out = TemporalOps.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        direction = "forward")
      .orderBy("k", "t").select("k", "t", "asof_ts", "feat").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      (1L, 100L, Some(100L), Some(10L)), // equal ts visible forward too
      (1L, 205L, None, None),            // nothing later on key 1
      (1L, 999L, None, None),
      (2L, 50L, Some(60L), Some(30L)),   // future row now matches
      (3L, 10L, None, None)))
    // forward tolerance: gap measured the other way
    val tol = TemporalOps.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        tolerance = Some(5L), direction = "forward")
      .orderBy("k", "t").select("t", "asof_ts").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    assert(tol.find(_._1 == 50L).get._2 === None) // gap 10 > 5
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        direction = "sideways")
    }
  }

  test("asofJoin: a matched row's NULL payload stays NULL (atomic row carry)") {
    // right at ts=10 has x=5; at ts=20 x is GENUINELY null. A left row at
    // ts=25 matches the ts=20 row and must see x=null — per-column
    // ignoreNulls carry would smear the stale 5 forward.
    val l = Seq((1L, 25L)).toDF("k", "t")
    val r = Seq((1L, 10L, Some(5L)), (1L, 20L, None)).toDF("k", "rt", "x")
    val out = TemporalOps.asofJoin(l, r, Seq("k"), "t", "rt")
      .select("asof_ts", "x").head()
    assert(out.getLong(0) === 20L && out.isNullAt(1))
    // reserved-name guard: chaining without renaming refuses loudly
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(l.withColumn("asof_ts", lit(1L)), r, Seq("k"), "t", "rt")
    }
  }

  test("asofJoin NULL keys follow SQL equality: never match, never group") {
    val l = Seq((Option(1L), 100L, "a"), (Option.empty[Long], 100L, "b"))
      .toDF("k", "t", "tag")
    val r = Seq((Option(1L), 50L, 7L), (Option.empty[Long], 40L, 9L))
      .toDF("k", "rt", "feat")
    val out = TemporalOps.asofJoin(l, r, Seq("k"), "t", "rt")
      .select("tag", "asof_ts", "feat").collect()
      .map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2)))).toSet
    // NULL-key left row must NOT pick up the NULL-key right row
    assert(out === Set(("a", Some(50L), Some(7L)), ("b", None, None)))
    val native = TemporalOps.asofJoinNative(l, r, Seq("k"), "t", "rt")
      .select("tag", "asof_ts", "feat").collect()
      .map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(native === out)
  }

  test("asofJoin NULL-timestamp right rows never match (both paths)") {
    // A null-ts right row sorts FIRST under asc nulls-first; without the
    // rightClean ts filter its payload would smear onto every left row
    // before the first real right row (asof_ts=NULL, tolerance=None
    // passes the isNotNull struct check). DuckDB ASOF l.t >= r.t is
    // never true for NULL r.t — these rows must be invisible.
    val l = Seq((1L, 5L, "early"), (1L, 100L, "late")).toDF("k", "t", "tag")
    val r = Seq((1L, Option.empty[Long], 99L), (1L, Option(50L), 7L))
      .toDF("k", "rt", "feat")
    val composed = TemporalOps.asofJoin(l, r, Seq("k"), "t", "rt")
      .select("tag", "asof_ts", "feat").collect()
      .map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(composed === Set(
      ("early", None, None),            // nothing at-or-before 5
      ("late", Some(50L), Some(7L))))   // real row matches; 99 never leaks
    val native = TemporalOps.asofJoinNative(l, r, Seq("k"), "t", "rt")
      .select("tag", "asof_ts", "feat").collect()
      .map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(native === composed)
  }

  test("asofJoin rejects colliding payload names") {
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(leftDf, rightDf.withColumnRenamed("feat", "tag"),
        Seq("k"), "t", "rt")
    }
  }

  test("asofJoin result is partition-layout invariant") {
    val a = TemporalOps.asofJoin(leftDf.repartition(7), rightDf.repartition(3),
      Seq("k"), "t", "rt").orderBy("k", "t").collect()
    val b = TemporalOps.asofJoin(leftDf.coalesce(1), rightDf.coalesce(1),
      Seq("k"), "t", "rt").orderBy("k", "t").collect()
    assert(a.toSeq === b.toSeq)
  }

  // ---- range joins ----

  test("pointInIntervalJoin matches half-open [lo, hi)") {
    val pts = Seq((1L, "p1"), (10L, "p2"), (99L, "p3"), (100L, "p4"))
      .toDF("pt", "pid")
    val ivs = Seq((0L, 100L, "A"), (10L, 11L, "B"), (50L, 50L, "empty"),
      (60L, 40L, "inverted")).toDF("lo", "hi", "iv")
    val got = TemporalOps.pointInIntervalJoin(pts, "pt", ivs, "lo", "hi", 16L)
      .select("pid", "iv").as[(String, String)].collect().toSet
    assert(got === Set(("p1", "A"), ("p2", "A"), ("p2", "B"), ("p3", "A")))
    // p4 at pt=100 excluded: hi is exclusive; empty/inverted match nothing
  }

  test("intervalOverlapJoin emits each overlapping pair exactly once") {
    // spans crossing MANY shared buckets must still emit once
    val a = Seq((0L, 1000L, "a1"), (500L, 600L, "a2"), (2000L, 2001L, "a3"))
      .toDF("alo", "ahi", "aid")
    val b = Seq((900L, 1500L, "b1"), (0L, 10000L, "b2"), (1000L, 1100L, "b3"))
      .toDF("blo", "bhi", "bid")
    val got = TemporalOps.intervalOverlapJoin(a, "alo", "ahi", b, "blo", "bhi", 64L)
      .groupBy("aid", "bid").count().as[(String, String, Long)].collect()
    assert(got.forall(_._3 == 1L), s"duplicate pair emissions: ${got.mkString(",")}")
    assert(got.map(r => (r._1, r._2)).toSet === Set(
      ("a1", "b1"), ("a1", "b2"), ("a2", "b2"), ("a3", "b2")))
    // a1 [0,1000) does NOT overlap b3 [1000,1100): half-open adjacency
  }

  test("range join candidate generation stays an equi-join (no nested-loop)") {
    val a = Seq((0L, 100L, "x")).toDF("alo", "ahi", "aid")
    val b = Seq((50L, 150L, "y")).toDF("blo", "bhi", "bid")
    val plan = TemporalOps.intervalOverlapJoin(a, "alo", "ahi", b, "blo", "bhi", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join compiled to a product:\n$plan")
  }

  // ---- rollingStats ----

  test("rollingStats computes trailing-window aggregates") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L), (1L, 4L, 5L),
      (2L, 1L, 7L)).toDF("k", "ord", "v")
    val out = TemporalOps.rollingStats(df, Seq("k"), Seq("ord"), "v", window = 3)
      .orderBy("k", "ord")
      .select("k", "ord", "roll_n", "roll_sum", "roll_min", "roll_max")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 10L, 10L, 10L),
      (1L, 2L, 2L, 30L, 10L, 20L),
      (1L, 3L, 3L, 60L, 10L, 30L),
      (1L, 4L, 3L, 55L, 5L, 30L),
      (2L, 1L, 1L, 7L, 7L, 7L)))
  }

  test("dyadicEwma: power-of-two lag weights, warm-up partial mass, per-key isolation") {
    val df = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 400L),
      (2L, 1L, 50L)).toDF("k", "ord", "v")
    val out = TemporalOps.dyadicEwma(df, Seq("k"), Seq("ord"), "v", depth = 3)
      .orderBy("k", "ord").select("k", "ord", "ewma_scaled")
      .as[(Long, Long, Long)].collect()
    // depth 3 → weights 4,2,1 (units of 1/8); warm-up rows carry only
    // the lags that exist
    assert(out.toSeq === Seq(
      (1L, 1L, 400L),            // 100*4
      (1L, 2L, 200L * 4 + 100L * 2), // 1000
      (1L, 3L, 400L * 4 + 200L * 2 + 100L), // 2100
      (2L, 1L, 200L)))           // other key: its own history only
  }

  test("cusum closed form equals the sequential max-recurrence") {
    // x = 15, 0, 20, 2, 30; target 10, slack 2 → y = 3, -12, 8, -10, 18
    // sequential S: 3, 0, 8, 0, 18; threshold 10 alarms only the last
    val df = Seq((1L, 1L, 15L), (1L, 2L, 0L), (1L, 3L, 20L),
      (1L, 4L, 2L), (1L, 5L, 30L))
      .toDF("k", "ord", "v").withColumn("target", lit(10L))
    val out = TemporalOps.cusum(df, Seq("k"), Seq("ord"), "v", "target",
        slack = 2L, threshold = 10L)
      .orderBy("ord").select("ord", "cusum", "alarm")
      .as[(Long, Long, Boolean)].collect()
    assert(out.toSeq === Seq((1L, 3L, false), (2L, 0L, false),
      (3L, 8L, false), (4L, 0L, false), (5L, 18L, true)))
  }
}
