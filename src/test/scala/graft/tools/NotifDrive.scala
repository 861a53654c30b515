package graft.tools
import graft.functions.{Dedup, TextAnalysis}
import graft.storage.NotificationStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object NotifDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = "target/tmp/notif_drive"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    val ns = new NotificationStore(spark, base)
    val n1 = Seq((1L, 100L, "r1", 5L, "d1"), (2L, 100L, "r1", 3L, "d2"))
      .toDF("entity_id", "timestamp", "rule", "weight", "details")
    ns.store(n1, 1000L)
    ns.store(n1.withColumn("details", lit("updated")), 2000L) // redelivery
    val got = ns.read().get.orderBy("entity_id").collect()
    println("NOTIF_ROWS=" + got.length + " DETAILS=" + got.map(_.getAs[String]("details")).mkString(","))
    // xx minhash on real fixture docs: candidate pairs vs md5 path overlap
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val sh = Dedup.shingles(TextAnalysis.tokens(docs, "doc_id", "text"), "doc_id", 3)
    val t0 = System.nanoTime()
    val xx = Dedup.lshCandidates(Dedup.lshBuckets(
      Dedup.minhashSignatureXx(sh, "doc_id", 8), "doc_id", 4, 2), "doc_id").count()
    val t1 = System.nanoTime()
    val md = Dedup.lshCandidates(Dedup.lshBuckets(
      Dedup.minhashSignature(sh, "doc_id", 8), "doc_id", 4, 2), "doc_id").count()
    val t2 = System.nanoTime()
    println(f"XX_PAIRS=$xx (${(t1-t0)/1e9}%.2fs)  MD5_PAIRS=$md (${(t2-t1)/1e9}%.2fs)")
    spark.stop()
    println("NOTIF_DRIVE_OK")
  }
}
