package graft.streaming

import graft.SparkSpec
import graft.operators.TriggerRule
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming path (SURVEY I1-I6): windowed rollup with watermark
  * (allowed lateness = the reference's reprocessing window) and the
  * streaming trigger/notification path. */
class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming rollup aggregates tumbling windows and absorbs late rows") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
    val rolled = StreamingRollup.rollup(
      stream, "user_id", "ts", granSeconds = 3600, latenessSeconds = 7200,
      Seq(count(lit(1)).as("samples"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value")))
    val q = rolled.writeStream.format("memory").queryName("rollup_sink")
      .outputMode("update").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((1L, t("2024-01-01 10:05:00"), 1.0), (1L, t("2024-01-01 10:50:00"), 2.0))
    q.processAllAvailable()
    mem.addData((1L, t("2024-01-01 10:20:00"), 4.0)) // late, within watermark
    q.processAllAvailable()
    val rows = spark.table("rollup_sink")
      .groupBy("entity_id", "timestamp") // update mode re-emits; take latest
      .agg(max("samples").as("samples"), max("sum_value").as("sum_value"))
      .collect()
    q.stop()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("timestamp") % 3600 == 0) // window-end label on the grid
    assert(r.getAs[Long]("samples") == 3L)
    assert(r.getAs[Double]("sum_value") == 7.0)
  }

  test("streaming notifications fire on threshold breach") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF().toDF("user_id", "sec", "value")
    val notif = StreamingRollup.notifications(
      stream,
      TriggerRule("hv", Map("max_value" -> 40.0), "value > max_value",
        "CASE WHEN value > 48 THEN 10 ELSE 1 END",
        concat(lit("v="), col("value"))),
      "user_id", "sec")
    val q = notif.writeStream.format("memory").queryName("notif_sink")
      .outputMode("append").start()
    mem.addData((1L, 100L, 50.0), (2L, 100L, 10.0), (3L, 101L, 41.0))
    q.processAllAvailable()
    val rows = spark.table("notif_sink").sort("entity_id").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("weight") == 10L)
    assert(rows(1).getAs[Long]("weight") == 1L)
  }
}
