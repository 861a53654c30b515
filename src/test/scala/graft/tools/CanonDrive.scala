package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc drive for the canonicalization tiers (verify-recipe step 3):
  * folds a mixed ASCII/Unicode sample through BOTH variants in a real
  * session and prints the fold classes, plus runs the two tiers over the
  * documents fixture to show the (identical, on an ASCII corpus) dup
  * counts. `sbt "Test/runMain graft.tools.CanonDrive [sfDir]"`. */
object CanonDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.Dedup
    val sample = Seq("Héllo, wörld!", "héllo   wörld", "Hello, world!",
      "hello world", "naïve — café").toDF("text")
    sample.select(col("text"), Dedup.canonicalize(col("text")).as("ascii"),
        Dedup.canonicalizeUnicode(col("text")).as("unicode"))
      .show(false)
    val d = graft.Tables.load(spark, sfDir, "documents")
    def dups(c: org.apache.spark.sql.Column): Long =
      d.groupBy(md5(c).as("dg")).count().filter(col("count") > 1).count()
    println(s"ascii-tier dup digests:   ${dups(Dedup.canonicalize(col("text")))}")
    println(s"unicode-tier dup digests: ${dups(Dedup.canonicalizeUnicode(col("text")))}")
    spark.stop()
  }
}
