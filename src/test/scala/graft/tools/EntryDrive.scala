package graft.tools
import org.apache.spark.sql.SparkSession

/** Drives the driver's smoke path: SparkEntry.entry on a session WITHOUT the
  * nanos conf pre-set (the driver passes its own session). */
object EntryDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(3)
    spark.stop()
  }
}
