package graft.tools
import org.apache.spark.sql.SparkSession

/** Round-6 plan audit: shapes of q83-q86 at sf0.01. */
object R6PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q83_ivf_topk", "q84_domain_cap", "q85_source_quantiles", "q86_cluster_rep")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def count(s: String) = plan.sliding(s.length).count(_ == s)
      println(s"=== $q: exchanges=${count("Exchange")} bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} bnlj=${count("BroadcastNestedLoopJoin")} window=${count("Window")} wsc=${count("WholeStageCodegen")}")
    }
    spark.stop()
  }
}
