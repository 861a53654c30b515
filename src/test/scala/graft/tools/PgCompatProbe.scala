package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.PgSqlCompat

object PgCompatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. verbatim virtual-entity view body (reference v-site.sql)
    val viewBody =
      """SELECT name
        |FROM (VALUES ('1001'), ('1002'), ('1003')) AS s(name)""".stripMargin
    println("VIEW: " + spark.sql(PgSqlCompat.rewriteQuery(viewBody))
      .collect().map(_.getString(0)).mkString(","))

    // 2. verbatim relation query (reference node->v-site.yaml)
    Seq((1L, "hillside14"), (2L, "north-r1")).toDF("id", "name")
      .createOrReplaceTempView("entity_node")
    Seq((10L, "north")).toDF("id", "name")
      .createOrReplaceTempView("entity_v_site")
    val rel =
      """SELECT
        |  n.id AS source_id,
        |  vs.id AS target_id
        |FROM entity."node" n
        |JOIN entity."v-site" vs ON vs.name = substring(n.name from '([a-z]+)-.*')
        |GROUP BY n.id, vs.id""".stripMargin
    println("REWRITTEN: " + PgSqlCompat.rewriteQuery(rel))
    println("REL: " + spark.sql(PgSqlCompat.rewriteQuery(rel)).collect().toSeq)

    // 3. verbatim trigger fragments (reference node-15m-highpowerusage.yaml)
    val weight =
      """SELECT
        |    CASE
        |        WHEN $1.power_kwh > 1 THEN 500
        |        WHEN $1.power_kwh > 2 THEN 800
        |        ELSE 300
        |    END""".stripMargin
    val notif =
      """SELECT array_to_string(
        |    ARRAY[
        |        'HighPowerUsage',
        |        format('%s > %s', $1.power_kwh, $1.max_power)
        |    ],
        |    E'\n'
        |)""".stripMargin
    val data =
      """format('{"power_kwh": %s, "max_power": %s}', $1.power_kwh, $1.max_power)::json""".stripMargin
    val kpi = Seq((1L, 1000L, BigDecimal("55.8"))).toDF("entity_id", "timestamp", "power_kwh")
      .withColumn("max_power", lit(0.05))
    val out = kpi.select(
      expr(PgSqlCompat.rewriteScalar(weight)).as("w"),
      expr(PgSqlCompat.rewriteScalar(notif)).as("n"),
      expr(PgSqlCompat.rewriteScalar(data)).as("d")).head
    println(s"WEIGHT: ${out.get(0)}")
    println(s"NOTIF: ${out.getString(1).replace("\n", "\\n")}")
    println(s"DATA: ${out.getString(2)}")

    // 4. materialization view SQL with bare `timestamp` projection
    Seq((1L, 1000L, 2.5)).toDF("entity_id", "timestamp", "power_kwh")
      .createOrReplaceTempView("trend_hub_node_main_15m")
    val view =
      """SELECT
        |    timestamp,
        |    entity_id,
        |    power_kwh * 1000 as power_mwh
        |  FROM trend."hub_node_main_15m"""".stripMargin
    println("MAT: " + spark.sql(PgSqlCompat.rewriteQuery(view)).collect().toSeq)
    spark.stop()
  }
}
