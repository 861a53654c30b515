package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints physical-plan evidence for the plan-quality checklist:
  * pushdown reaching parquet, column pruning, broadcast joins, WSCG spans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q01_time_agg", "q02_entity_agg", "q11_predicates",
      "q12_generated_trend", "q05_current_ptr", "q35_ann_topk", "q27_lsh_candidates")
    interesting.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema")).map(_.trim.take(200))
      println(s"=== $q")
      println("  broadcasts=" + plan.linesIterator.count(_.contains("BroadcastHashJoin")))
      println("  sortmerge=" + plan.linesIterator.count(_.contains("SortMergeJoin")))
      println("  exchanges=" + plan.linesIterator.count(_.contains("Exchange")))
      pushed.foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
