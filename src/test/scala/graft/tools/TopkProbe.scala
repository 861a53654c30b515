package graft.tools
import graft.functions.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TopkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // distinct frames → asymmetric path
    val queries = e.filter(col("vec_id") < 10)
    val asym = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", 3)
    println("ASYM_ROWS=" + asym.count())
    // self path equals asym path restricted to the same queries
    val self = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
      .filter(col("query_id") < 10)
    val diff = self.exceptAll(asym).count() + asym.exceptAll(self).count()
    println("SELF_VS_ASYM_DIFF=" + diff)
    spark.stop()
  }
}
