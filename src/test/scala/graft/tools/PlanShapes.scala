package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Whole-inventory plan-shape audit: one TSV row per gate with operator
  * counts from the executed plan of the RETURNED frame — Exchanges, join
  * strategies, Windows, scans with pushed filters. Store-backed gates run
  * their construction actions, so a full pass costs ≈ one sf0.01 sweep.
  * `sbt "Test/runMain graft.tools.PlanShapes <sfDir> <outTsv> [q1,q2,...]"` */
object PlanShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("target/plan_shapes.tsv")
    val only = args.lift(2).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder(
      "query\texchanges\tbhj\tsmj\tshj\tbnlj\twindows\tscans\tpushed\tsorts\n")
    for ((n, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
        if only.forall(_.contains(n))) {
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        def c(s: String) = p.sliding(s.length).count(_ == s)
        sb.append(Seq(n, c("Exchange"), c("BroadcastHashJoin"),
          c("SortMergeJoin"), c("ShuffledHashJoin"),
          c("BroadcastNestedLoopJoin"), c("Window"),
          c("FileScan parquet") + c("Scan parquet"),
          c("PushedFilters: ["), c("Sort ")).mkString("\t"))
        sb.append("\n")
        println(s"SHAPE_OK $n")
      } catch {
        case e: Throwable =>
          sb.append(s"$n\tERR ${String.valueOf(e.getMessage).take(60)}\n")
          println(s"SHAPE_ERR $n")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
