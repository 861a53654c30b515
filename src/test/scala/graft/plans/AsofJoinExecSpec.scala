package graft.plans

import graft.SparkSpec
import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

class AsofJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    (1L, 100L, "a"), (1L, 205L, "b"), (1L, 999L, "c"),
    (2L, 50L, "d"), (3L, 10L, "e")
  ).toDF("k", "t", "tag")

  private def rightDf = Seq(
    (1L, 100L, 10L), (1L, 200L, 20L), (2L, 60L, 30L)
  ).toDF("k", "rt", "feat")

  test("native exec matches the hand-computed backward semantics") {
    val out = TemporalOps.asofJoinNative(leftDf, rightDf, Seq("k"), "t", "rt")
      .orderBy("k", "t")
      .select("k", "t", "tag", "asof_ts", "feat")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4))))
    assert(out.toSeq === Seq(
      (1L, 100L, "a", Some(100L), Some(10L)),
      (1L, 205L, "b", Some(200L), Some(20L)),
      (1L, 999L, "c", Some(200L), Some(20L)),
      (2L, 50L, "d", None, None),
      (3L, 10L, "e", None, None)))
  }

  test("differential: native == composed on generated data, with and without tolerance") {
    // deterministic pseudo-random (hash-derived) ts streams, multiple keys,
    // duplicate left timestamps, keys missing on either side
    val left = spark.range(0, 2000).select(
      (col("id") % 23).as("k"),
      (pmod(col("id") * 2654435761L, lit(100000L))).as("t"),
      col("id").as("lid"))
    val right = spark.range(0, 500).select(
      (col("id") % 29).as("k"),
      (pmod(col("id") * 1099511628211L, lit(100000L))).as("rt"),
      // every 5th matched row carries a GENUINE NULL payload — the case
      // that distinguishes atomic row carry from per-column
      // last(ignoreNulls) smearing (the review-caught divergence)
      when(col("id") % 5 =!= 0, col("id") * 7).as("payload"))
      // determinism contract: at most one right row per (k, rt)
      .groupBy("k", "rt").agg(max("payload").as("payload"))
    for (tol <- Seq(None, Some(5000L))) {
      val composed = TemporalOps.asofJoin(left, right, Seq("k"), "t", "rt", tol)
        .select("k", "lid", "t", "asof_ts", "payload")
        .orderBy("k", "lid").collect().toSeq
      val native = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "rt", tol)
        .select("k", "lid", "t", "asof_ts", "payload")
        .orderBy("k", "lid").collect().toSeq
      assert(native === composed, s"divergence at tolerance=$tol")
    }
  }

  test("native exec plans one exchange+sort per side and survives repartitioned input") {
    val df = TemporalOps.asofJoinNative(leftDf.repartition(7), rightDf.repartition(3),
      Seq("k"), "t", "rt")
    df.collect() // finalize the AQE plan before reading it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native node missing:\n$plan")
    assert(!plan.contains("Window"), "native path must not fall back to the window form")
    val a = df.orderBy("k", "t").collect().toSeq
    val b = TemporalOps.asofJoinNative(leftDf.coalesce(1), rightDf.coalesce(1),
      Seq("k"), "t", "rt").orderBy("k", "t").collect().toSeq
    assert(a === b)
  }

  test("left-only filter conjuncts push below the native as-of join") {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val df = TemporalOps.asofJoinNative(leftDf, rightDf, Seq("k"), "t", "rt")
      .filter(col("t") > 60L && col("feat") === 20L) // t: left-only, feat: payload
    val opt = df.queryExecution.optimizedPlan
    val aj = opt.collectFirst { case a: AsofJoin => a }.get
    val leftSet = AttributeSet(aj.left.output)
    val inLeft = aj.left.collect { case f: Filter => f }.toSet
    val above = opt.collect { case f: Filter => f }.filterNot(inLeft)
    // no left-only predicate may remain above the join (the rule pushed
    // it; over a LocalRelation it may even collapse into the relation)
    assert(above.forall(f => !f.references.subsetOf(leftSet)),
      s"left-only filter stranded above AsofJoin:\n$opt")
    // and the results still match the composed form under the same filter
    val composed = TemporalOps.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
      .filter(col("t") > 60L && col("feat") === 20L)
      .select("k", "t", "tag", "asof_ts", "feat").orderBy("k", "t").collect().toSeq
    val native = df.select("k", "t", "tag", "asof_ts", "feat")
      .orderBy("k", "t").collect().toSeq
    assert(native === composed)
  }

  test("multi-key as-of: composed and native agree; keys scope matches") {
    val l = Seq((1L, 7L, 100L, "a"), (1L, 8L, 100L, "b"), (2L, 7L, 100L, "c"))
      .toDF("k1", "k2", "t", "tag")
    val r = Seq((1L, 7L, 50L, 11L), (1L, 8L, 60L, 22L), (2L, 9L, 40L, 33L))
      .toDF("k1", "k2", "rt", "feat")
    val composed = TemporalOps.asofJoin(l, r, Seq("k1", "k2"), "t", "rt")
      .select("k1", "k2", "tag", "asof_ts", "feat")
      .orderBy("k1", "k2").collect().toSeq
    val native = TemporalOps.asofJoinNative(l, r, Seq("k1", "k2"), "t", "rt")
      .select("k1", "k2", "tag", "asof_ts", "feat")
      .orderBy("k1", "k2").collect().toSeq
    assert(native === composed)
    val m = native.map(x => (x.getString(2), Option(x.get(4)))).toMap
    assert(m === Map("a" -> Some(11L), "b" -> Some(22L), "c" -> None))
    // (2,7) must NOT match (2,9)'s row: both key columns scope the join
  }

  test("empty sides: empty right yields all-null payload; empty left yields nothing") {
    val none = Seq.empty[(Long, Long, Long)].toDF("k", "rt", "feat")
    val a = TemporalOps.asofJoinNative(leftDf, none, Seq("k"), "t", "rt")
    assert(a.count() === 5L && a.filter(col("asof_ts").isNotNull).count() === 0L)
    val noneL = Seq.empty[(Long, Long, String)].toDF("k", "t", "tag")
    assert(TemporalOps.asofJoinNative(noneL, rightDf, Seq("k"), "t", "rt").count() === 0L)
  }

  test("native exec refuses non-long ts and payload collisions") {
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoinNative(leftDf.withColumn("t", col("t").cast("int")),
        rightDf, Seq("k"), "t", "rt")
    }
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoinNative(leftDf, rightDf.withColumnRenamed("feat", "tag"),
        Seq("k"), "t", "rt")
    }
  }

  test("native forward matches the hand-computed at-or-after semantics") {
    val out = TemporalOps.asofJoinNative(leftDf, rightDf, Seq("k"), "t", "rt",
        direction = "forward")
      .orderBy("k", "t").select("k", "t", "asof_ts", "feat").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3))))
    assert(out.toSeq === Seq(
      (1L, 100L, Some(100L), Some(10L)), // equal ts visible forward too
      (1L, 205L, None, None),
      (1L, 999L, None, None),
      (2L, 50L, Some(60L), Some(30L)),
      (3L, 10L, None, None)))
    // forward tolerance: gap measured the other way
    val tol = TemporalOps.asofJoinNative(leftDf, rightDf, Seq("k"), "t", "rt",
        tolerance = Some(5L), direction = "forward")
      .orderBy("k", "t").select("t", "asof_ts").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    assert(tol.find(_._1 == 50L).get._2 === None) // gap 10 > 5
    assert(tol.find(_._1 == 100L).get._2 === Some(100L))
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoinNative(leftDf, rightDf, Seq("k"), "t", "rt",
        direction = "sideways")
    }
  }

  test("differential: native forward == composed forward on generated data") {
    val left = spark.range(0, 2000).select(
      (col("id") % 23).as("k"),
      (pmod(col("id") * 2654435761L, lit(100000L))).as("t"),
      col("id").as("lid"))
    val right = spark.range(0, 500).select(
      (col("id") % 29).as("k"),
      (pmod(col("id") * 1099511628211L, lit(100000L))).as("rt"),
      when(col("id") % 5 =!= 0, col("id") * 7).as("payload"))
      .groupBy("k", "rt").agg(max("payload").as("payload"))
    for (tol <- Seq(None, Some(5000L))) {
      val composed = TemporalOps.asofJoin(left, right, Seq("k"), "t", "rt", tol,
          direction = "forward")
        .select("k", "lid", "t", "asof_ts", "payload")
        .orderBy("k", "lid").collect().toSeq
      val native = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "rt", tol,
          direction = "forward")
        .select("k", "lid", "t", "asof_ts", "payload")
        .orderBy("k", "lid").collect().toSeq
      assert(native === composed, s"forward divergence at tolerance=$tol")
    }
  }

  test("null timestamps: left nulls never match, right nulls never retained") {
    val l = Seq((1L, Some(100L), "x"), (1L, None, "y")).toDF("k", "t", "tag")
    val r = Seq((1L, Some(50L), 5L), (1L, None, 99L)).toDF("k", "rt", "feat")
    val out = TemporalOps.asofJoinNative(l, r, Seq("k"), "t", "rt")
      .select("tag", "asof_ts", "feat").collect()
      .map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(out === Set(("x", Some(50L), Some(5L)), ("y", None, None)))
    // forward: null right ts sorts LAST in the desc scan — still never
    // retained; null left ts still emits null payload
    val fwd = TemporalOps.asofJoinNative(l, r, Seq("k"), "t", "rt",
        direction = "forward")
      .select("tag", "asof_ts", "feat").collect()
      .map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(fwd === Set(("x", None, None), ("y", None, None)))
  }
}
