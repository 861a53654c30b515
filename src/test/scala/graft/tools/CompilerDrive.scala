package graft.tools
import graft.model.InstanceModel
import graft.operators.AggregationCompiler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives the aggregation compiler on real fixture data: YAML model →
  * compiled 1h rollup → compiled entity rollup. */
object CompilerDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = InstanceModel.parseTrendStore(
      """title: events
        |data_source: hub
        |entity_type: user
        |granularity: 15m
        |partition_size: 1d
        |parts:
        |  - name: user_events
        |    trends:
        |      - name: value
        |        data_type: double precision
        |        time_aggregation: sum
        |        entity_aggregation: max
        |""".stripMargin)
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").as("entity_id"),
        expr("ts div 1000000000").as("timestamp"), col("value"))
    val hourly = AggregationCompiler.timeAggregation(store.parts.head, 3600L)(events)
    println("HOURLY_ROWS=" + hourly.count() + " COLS=" + hourly.columns.mkString(","))
    val rel = events.select(col("entity_id").as("source_id")).distinct()
      .withColumn("target_id", pmod(col("source_id"), lit(7L)))
    val up = AggregationCompiler.entityAggregation(store.parts.head, rel)(hourly
      .withColumnRenamed("samples", "samples_in").drop("samples_in"))
    println("ENTITY_ROWS=" + up.count())
    println("SAMPLE=" + up.orderBy("entity_id", "timestamp").limit(2).collect().mkString(";"))
    spark.stop()
    println("COMPILER_DRIVE_OK")
  }
}
// (probe main kept separate to leave the happy-path drive untouched)
object CompilerProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val store = InstanceModel.parseTrendStore(
      """title: t
        |data_source: d
        |entity_type: e
        |granularity: 15m
        |partition_size: 1d
        |parts:
        |  - name: p
        |    trends:
        |      - name: present_trend
        |        data_type: integer
        |      - name: missing_trend
        |        data_type: integer
        |""".stripMargin)
    val df = Seq((1L, 100L, 5)).toDF("entity_id", "timestamp", "present_trend")
    val out = AggregationCompiler.timeAggregation(store.parts.head, 3600L)(df)
    println("PROBE_COLS=" + out.columns.mkString(","))
    println("PROBE_ROW=" + out.collect().mkString)
    spark.stop()
  }
}
