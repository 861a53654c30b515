package graft.tools

import graft.core._
import java.time._
import org.apache.spark.sql.SparkSession

/** Manual end-to-end drive for the core module: exercises the public API and
  * executes generated SQL expressions in a real Spark session on testdata. */
object CoreDrive {
  def main(args: Array[String]): Unit = {
    val g15 = Granularity.parse("15m")
    println("PARSE15=" + g15)
    println("TRUNC15=" + g15.truncate(Instant.parse("2024-01-05T10:44:59Z"), ZoneId.of("UTC")))
    val gd = Granularity.parse("1d")
    println("DSTDAY=" + gd.next(gd.truncate(Instant.parse("2024-03-31T10:00:00Z"), ZoneId.of("Europe/Amsterdam")), ZoneId.of("Europe/Amsterdam")))
    try { Granularity.parse("fortnight"); println("BADGRAN=NO-ERROR") }
    catch { case e: IllegalArgumentException => println("BADGRAN=" + e.getMessage) }
    println("DEDUCE=" + MinervaType.deduce(Seq("1", "40000", "", "\\N", "1.5")))
    println("DEDUCE_TS=" + MinervaType.deduce(Seq("2020-08-25T14:00:00", "2020-08-25 15:00:00")))
    println("PARSE_NULL=" + MinervaType.parse(MinervaType.MInteger, "\\N"))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Testdata parquet carries TIMESTAMP(NANOS) — settable at runtime?
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    println("SCHEMA=" + ev.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(","))
    ev.createOrReplaceTempView("events")
    val sqlExpr = g15.truncExprSql("ts div 1000000000")
    println("SQLEXPR=" + sqlExpr)
    spark.sql(s"SELECT $sqlExpr AS w, count(*) AS n FROM events GROUP BY 1 ORDER BY 1 LIMIT 3")
      .collect().foreach(r => println("ROW=" + r))
    val mexpr = MonthsGranularity(1).truncExprSql("timestamp_seconds(ts div 1000000000)")
    println("MROWS=" + spark.sql(s"SELECT $mexpr AS m, count(*) n FROM events GROUP BY 1 ORDER BY 1").collect().mkString(";"))
    spark.stop()
    println("DRIVE_OK")
  }
}
