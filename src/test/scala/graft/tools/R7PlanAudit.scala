package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 plan audit: physical shapes of the round's new gate queries at
  * sf0.01 (the judge-style check; findings recorded in PLANS.md).
  *
  * Run: sbt -batch "Test/runMain graft.tools.R7PlanAudit"
  */
object R7PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    Seq("q88_temperature_sample", "q89_pq_codes64", "q90_adc_topk64",
        "q91_curation_pipeline")
      .foreach { q =>
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(plan).length
        println(s"== $q ==")
        println(s"  hashExchanges=${n("Exchange hashpartitioning")} " +
          s"rangeExchanges=${n("Exchange rangepartitioning")} " +
          s"broadcastJoins=${n("BroadcastHashJoin")} " +
          s"crossBroadcast=${n("BroadcastNestedLoopJoin")} " +
          s"sortMerge=${n("SortMergeJoin")} " +
          s"windows=${n("Window ")}")
      }
    spark.stop()
  }
}
