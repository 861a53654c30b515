package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times q35's two halves separately at a real SF: the N²/2 dot-product
  * join alone, then the full query with the bounded top-k aggregate on top. */
object TopkCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val full = graft.SparkEntry.queries("q35_ann_topk")
    time("warmup full")(full(spark, dir).collect())
    time("full q35")(full(spark, dir).collect())

    // pairs-only: same join + dot, count instead of top-k
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    println("rows=" + emb.count())
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      graft.functions.Similarity.norm(col("embedding")).as("qn"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      graft.functions.Similarity.norm(col("embedding")).as("cn"))
    val scored = q.join(broadcast(c), col("query_id") < col("neighbor_id"))
      .select((graft.functions.Similarity.dot(col("qv"), col("cv")) /
        (col("qn") * col("cn"))).as("cos"))
    time("warmup pairs")(scored.agg(sum("cos")).collect())
    time("pairs+dot only")(scored.agg(sum("cos")).collect())
    spark.stop()
  }
}
