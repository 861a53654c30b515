package graft.tools
import org.apache.spark.sql.SparkSession

/** Executes q27/q28 at a real SF and verifies the keepSmallKeys exchange
  * reuse holds in the full pipelines (AQE final plans). */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Seq("q27_lsh_candidates", "q28_jaccard_pairs", "q36_bucketed_neighbors").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val fresh = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
      println(s"REUSE $q: reused=$reused fresh=$fresh")
    }
    spark.stop()
  }
}
