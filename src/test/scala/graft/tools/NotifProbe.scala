package graft.tools
import graft.storage.NotificationStore
import org.apache.spark.sql.SparkSession

object NotifProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("EMPTY_READ=" + new NotificationStore(spark, "target/tmp/nonexistent_ns").read())
    spark.stop()
  }
}
