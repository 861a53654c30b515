package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.expressions.VectorExpressions.fdot

object ExprDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // 1. codegen check: WholeStageCodegen span should cover the projection with fvec_dot
    val df = e.select(fdot(col("embedding"), col("embedding")).as("d2"))
    val plan = df.queryExecution.executedPlan.toString
    println("WSCG=" + plan.contains("WholeStageCodegen"))
    println("PLAN1=" + plan.linesIterator.take(3).mkString(" | "))
    // 2. value equivalence vs HOF reference on real data
    val both = e.select(
      fdot(col("embedding"), col("embedding")).as("fast"),
      Similarity.dotHof(col("embedding"), col("embedding")).as("ref"))
    val bad = both.filter(col("fast") =!= col("ref")).count()
    println("MISMATCH_VS_HOF=" + bad)
    // 3. wrong input type probe
    try {
      e.select(fdot(col("vec_id"), col("embedding"))).collect()
      println("TYPEERR=NONE")
    } catch { case ex: Exception => println("TYPEERR=" + ex.getMessage.linesIterator.next()) }
    // 4. null array probe
    val withNull = e.select(when(col("vec_id") === 0, col("embedding")).as("v"))
    val n = withNull.select(fdot(col("v"), col("v")).as("d")).filter(col("d").isNull).count()
    println("NULLS_PROPAGATE=" + (n > 0))
    spark.stop()
  }
}
