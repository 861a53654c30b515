package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val ps = Similarity.sqParams(e, "embedding", 64)
    val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
    val scodes = Similarity.sqEncode(e, "vec_id", "embedding", ps)
    val bcodes = Similarity.bqEncode(e, "vec_id", "embedding", 64)
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = p.sliding(s.length).count(_ == s)
      println(s"$name: BHJ=${c("BroadcastHashJoin")} BNLJ=${c("BroadcastNestedLoopJoin")} " +
        s"SMJ=${c("SortMergeJoin")} Window=${c("Window ")} Exch=${c("Exchange")}")
    }
    audit("sqTopK", Similarity.sqTopK(q, scodes, e, "vec_id", "embedding", ps, 5, 50))
    audit("ivfSqTopK", Similarity.ivfSqTopK(q, scodes, e, "vec_id", "embedding", cents, ps, 5, 2, 50))
    audit("bqTopK", Similarity.bqTopK(q, bcodes, e, "vec_id", "embedding", 64, 5, 50))
    audit("ivfBqTopK", Similarity.ivfBqTopK(q, bcodes, e, "vec_id", "embedding", cents, 64, 5, 2, 50))
    audit("rangeSearch", Similarity.rangeSearch(q, e, "vec_id", "embedding", 0.25))
    audit("rangeSearchIvf", Similarity.rangeSearchIvf(q, e, "vec_id", "embedding", cents, 0.25, 2))
    spark.stop()
  }
}
