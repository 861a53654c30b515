package graft.tools
import graft.functions.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TopkEdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(4)
    // k (10) exceeds available neighbors (3 per query)
    val out = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 10)
    val counts = out.groupBy("query_id").count().select("count").distinct().collect()
    println("PER_QUERY=" + counts.map(_.getLong(0)).toSeq.sorted.mkString(","))
    val ranks = out.filter(col("query_id") === out.select(min("query_id")).head.getLong(0))
      .orderBy("rank").select("rank").collect().map(_.getInt(0)).toSeq
    println("RANKS=" + ranks.mkString(","))
    spark.stop()
  }
}
