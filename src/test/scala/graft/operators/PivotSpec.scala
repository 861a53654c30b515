package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pivot/unpivot/cube surface: the wide↔long trend-table transforms and
  * the grouping-sets report. Driver oracles (q240–q242) check values vs
  * DuckDB; here we pin the algebraic properties. */
class PivotSpec extends SparkSpec {
  import spark.implicits._

  private val long = Seq(
    (1L, 0L, "view", 2L), (1L, 0L, "click", 1L),
    (1L, 3600L, "view", 5L), (2L, 0L, "purchase", 7L))
    .toDF("entity_id", "hr", "metric", "cnt")

  test("unpivot(pivot(x)) == x — the wide trend layout is lossless") {
    val wide = long.groupBy("entity_id", "hr")
      .pivot("metric", Seq("view", "click", "purchase"))
      .agg(sum(col("cnt")))
    val back = wide.unpivot(
        Array(col("entity_id"), col("hr")),
        Array(col("view"), col("click"), col("purchase")),
        "metric", "cnt")
      .filter(col("cnt").isNotNull)
    assert(back.orderBy("entity_id", "hr", "metric").collect().toSeq ==
      long.orderBy("entity_id", "hr", "metric").collect().toSeq)
    // absent (entity, hr, metric) cells surface as NULL, not 0
    val cell = wide.filter(col("entity_id") === 2L && col("hr") === 0L)
      .select("view").head
    assert(cell.isNullAt(0))
  }

  test("cube strata are consistent: every rollup level sums to the grand total") {
    val df = Seq(("A", "X", 1L), ("A", "Y", 2L), ("B", "X", 4L))
      .toDF("a", "b", "v")
    val cube = df.cube(col("a"), col("b"))
      .agg(sum(col("v")).as("s"),
        grouping(col("a")).as("g_a"), grouping(col("b")).as("g_b"))
      .collect()
    def stratum(ga: Int, gb: Int) =
      cube.filter(r => r.getAs[Byte]("g_a") == ga && r.getAs[Byte]("g_b") == gb)
    assert(stratum(1, 1).map(_.getAs[Long]("s")).sum == 7L) // grand total
    assert(stratum(0, 1).map(_.getAs[Long]("s")).sum == 7L) // by a
    assert(stratum(1, 0).map(_.getAs[Long]("s")).sum == 7L) // by b
    assert(stratum(0, 0).length == 3)                       // leaf cells
    // grouping() disambiguates grouped-away NULL from a data NULL
    val dataNull = Seq((null.asInstanceOf[String], 9L)).toDF("a", "v")
      .cube(col("a")).agg(sum(col("v")).as("s"), grouping(col("a")).as("g_a"))
      .collect()
    assert(dataNull.count(r => r.isNullAt(0) && r.getAs[Byte]("g_a") == 0) == 1)
    assert(dataNull.count(r => r.isNullAt(0) && r.getAs[Byte]("g_a") == 1) == 1)
  }
}
