package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 plan audit: per new query, counts of the plan shapes that
  * matter at 100 TB — BroadcastNestedLoopJoin (cartesian smell),
  * size-unbounded Window (no partition key), SortMergeJoin vs
  * BroadcastHashJoin, Exchange count. Run:
  * `sbt "Test/runMain graft.tools.R12PlanAudit [sfDir]"` */
object R12PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(q => (160 to 240).exists(n => q.startsWith(s"q${n}_")))
    println(f"${"query"}%-28s smj bhj bnlj exch win unkeyedWin")
    for (q <- qs) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        df.count() // finalize AQE
        val plan = df.queryExecution.executedPlan.toString
        def c(s: String) = plan.linesIterator.count(_.contains(s))
        // a Window line with an empty partition spec sorts globally
        val unkeyed = plan.linesIterator.count(l =>
          l.contains("Window [") && l.matches(""".*Window \[.*\], \[\].*"""))
        println(f"$q%-28s ${c("SortMergeJoin")}%3d ${c("BroadcastHashJoin")}%3d " +
          f"${c("BroadcastNestedLoopJoin")}%4d ${c("Exchange")}%4d " +
          f"${c("Window")}%3d $unkeyed%9d")
      } catch {
        case e: Throwable =>
          println(f"$q%-28s ERROR ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    spark.stop()
  }
}
