package graft

import org.apache.spark.sql.functions._

/** SQL-surface registration of the custom Catalyst expressions. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("fvec_dot and fvec_topk are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val d = spark.sql(
      "SELECT fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head.getDouble(0)
    assert(d == 11.0)

    Seq((1L, 1L, 0.9), (1L, 2L, 0.7), (1L, 3L, 0.8), (2L, 9L, 0.1))
      .toDF("q", "id", "score").createOrReplaceTempView("cands")
    val rows = spark.sql(
      "SELECT q, fvec_topk(id, score, 2) AS top FROM cands GROUP BY q")
      .orderBy("q").collect()
    val top1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(top1.map(_.getLong(1)) == Seq(1L, 3L)) // best two by score
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(9L))

    // kmv_mink: sorted distinct minima, bounded at k
    Seq(5L, 3L, 9L, 3L, 1L, 7L).toDF("v").createOrReplaceTempView("vals")
    val minima = spark.sql("SELECT kmv_mink(v, 3) AS m FROM vals")
      .head.getSeq[Long](0)
    assert(minima == Seq(1L, 3L, 5L)) // duplicate 3 occupies one slot
    // narrower input types coerce at analysis (no mid-execution cast crash)
    val coerced = spark.sql(
      "SELECT kmv_mink(CAST(v AS INT), 2) FROM vals").head.getSeq[Long](0)
    assert(coerced == Seq(1L, 3L))
    assert(spark.sql("SELECT fvec_topk(CAST(1 AS INT), CAST(0.5 AS FLOAT), 1)")
      .head.getSeq[org.apache.spark.sql.Row](0).head.getLong(1) == 1L)

    GraftExtensions.register(spark) // idempotent
    // the extensions class itself injects the same builders
    val ext = new GraftExtensions
    assert(GraftExtensions.functions.length == 3 && ext != null)
  }

  test("extension point injects the as-of strategy and pushdown rule") {
    // a session configured with spark.sql.extensions=graft.GraftExtensions
    // gets the native as-of planner WITHOUT asofJoinNative's experimental
    // self-registration — asserted through the builders rather than a
    // second SparkContext
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.GraftBridge.plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.AsofJoinStrategy), strategies.toString)
    val rules = org.apache.spark.sql.GraftBridge.optimizerRules(ext, spark)
    assert(rules.contains(graft.plans.AsofJoinFilterPushdown), rules.toString)
  }

  test("fvec_topk rejects a non-literal k at analysis") {
    GraftExtensions.register(spark)
    Seq((1L, 0.5)).toDF("id", "score").createOrReplaceTempView("cands2")
    val e = intercept[Exception](
      spark.sql("SELECT fvec_topk(id, score, CAST(id AS INT)) FROM cands2")
        .collect())
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.contains("fvec_topk"))
  }
}
