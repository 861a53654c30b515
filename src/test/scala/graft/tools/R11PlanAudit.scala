package graft.tools
import org.apache.spark.sql.SparkSession

/** Round-11 plan audit over the new operator gates (q122–q130): counts
  * join strategies / exchanges / windows in the executed plan and times
  * one collect at the given SF. Flags any nested-loop or cartesian —
  * the failure mode the temporal grid-bucketing exists to avoid. */
object R11PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q122_asof_join", "q123_range_join", "q124_rolling_stats",
      "q125_chunking", "q126_pagerank", "q127_mp3_decode", "q128_bmp_decode",
      "q129_bm25_search", "q130_nn_descent", "q131_passage_search",
      "q132_triangles", "q133_graph_search", "q134_hard_negatives",
      "q135_perplexity_filter", "q136_classifier_filter", "q137_matryoshka_topk",
      "q138_asof_native", "q139_flac_decode", "q140_tiff_decode",
      "q141_curation_capstone", "q142_incremental_dedup", "q143_token_budget",
      "q144_sketch_overlap", "q145_asof_forward", "q146_point_in_interval",
      "q147_containment", "q148_blocklist", "q149_tpch_q1", "q150_tpch_q3",
      "q151_tpch_q5", "q152_tpch_q6", "q153_tpch_q18", "q154_tpch_q10")
    for (name <- qs) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = p.sliding(s.length).count(_ == s)
      println(f"$name%-22s rows=$n%-7d ${secs}%5.2fs  BHJ=${c("BroadcastHashJoin")} " +
        s"SMJ=${c("SortMergeJoin")} SHJ=${c("ShuffledHashJoin")} " +
        s"BNLJ=${c("BroadcastNestedLoopJoin")} Cart=${c("CartesianProduct")} " +
        s"Win=${c("Window ")} Exch=${c("Exchange")}")
    }
    spark.stop()
  }
}
