package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.SkewOps

object SkewPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .appName("probe").getOrCreate()
    import spark.implicits._
    val hot = (1L to 50L).map(id => (id, 0, "deadbeef"))
    val ok = Seq((100L, 1, "cafe"), (101L, 1, "cafe"), (102L, 1, "cafe"))
    val buckets = (hot ++ ok).toDF("doc_id", "band", "key")
    val capped = SkewOps.keepSmallKeys(buckets, Seq("band", "key"), 10)
    capped.collect()
    println("=== FINAL EXECUTED PLAN ===")
    println(capped.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
