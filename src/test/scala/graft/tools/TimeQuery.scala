package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing with the Bench session shape (local[32],
  * 32 shuffle partitions, min of two warm repetitions after a cold run):
  * `sbt "Test/runMain graft.tools.TimeQuery <sfDir> <q1,q2,...>"` —
  * the focused loop for checking one gate's cost without paying the
  * full-inventory bench. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq.empty)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = math.min(once(), once())
      println(f"$n%-28s cold $cold%7.2f s  warm $warm%7.2f s")
    }
    spark.stop()
  }
}
