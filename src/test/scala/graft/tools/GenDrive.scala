package graft.tools
import graft.model.InstanceModel
import graft.operators.{GeneratedTrends, RelationOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object GenDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val store = InstanceModel.parseTrendStore(
      """title: t
        |data_source: hub
        |entity_type: node
        |granularity: 15m
        |partition_size: 1d
        |parts:
        |  - name: p
        |    trends:
        |      - name: power_kwh
        |        data_type: numeric
        |    generated_trends:
        |      - name: power_mwh
        |        data_type: numeric
        |        expression: power_kwh * 1000
        |""".stripMargin)
    val df = Seq((1L, 100L, 0.5), (2L, 100L, 1.5)).toDF("entity_id", "timestamp", "power_kwh")
    val out = GeneratedTrends(df, store.parts.head).orderBy("entity_id").collect()
    println("GEN=" + out.map(r => r.getAs[java.math.BigDecimal]("power_mwh")).mkString(","))
    // bad expression probe
    try {
      GeneratedTrends(df, store.parts.head.copy(generatedTrends =
        store.parts.head.generatedTrends.map(_.copy(expression = "no_such_col * 2")))).collect()
      println("BADEXPR=NONE")
    } catch { case e: Exception => println("BADEXPR=" + e.getMessage.linesIterator.next().take(80)) }
    // OneToOne violations on a many edge set
    val rel = Seq((1L, 10L), (1L, 11L), (2L, 12L), (3L, 12L)).toDF("source_id", "target_id")
    val v = RelationOps.violations(rel, RelationOps.OneToOne).orderBy("violated_key").collect()
    println("VIOL=" + v.map(r => r.getLong(0) + "x" + r.getLong(1)).mkString(","))
    spark.stop()
  }
}
