package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val out = new StringBuilder
    Seq("q01_time_agg", "q02_entity_agg", "q11_predicates", "q35_ann_topk",
      "q51_ann_gaussian", "q49_yaml_agg_chain", "q27_lsh_candidates", "q54_dn_hierarchy").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      out.append(s"===== $q =====\n")
      out.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      out.append("\n")
    }
    Files.writeString(Paths.get("target/plans.txt"), out.toString)
    println("PLANS_WRITTEN")
    spark.stop()
  }
}
