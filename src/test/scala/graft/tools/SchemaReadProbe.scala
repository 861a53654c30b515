package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

object SchemaReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = "target/tmp/schemaprobe"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    Seq((1, 10)).toDF("id", "v").write.parquet(s"$base/pindex=0")
    // declared schema WIDER than the file (long vs int), plus an extra col
    val declared = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("extra", DoubleType)))
    try {
      val rows = spark.read.schema(declared).parquet(base).collect()
      println("WIDEN-READ OK: " + rows.mkString(","))
    } catch { case e: Throwable => println("WIDEN-READ FAIL: " + e.getMessage.take(300)) }
    // and a narrowing read (long file, int schema) should fail loudly
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    Seq((1L, 10L)).toDF("id", "v").write.parquet(s"$base/pindex=0")
    val narrow = StructType(Seq(StructField("id", IntegerType), StructField("v", IntegerType)))
    try {
      val rows = spark.read.schema(narrow).parquet(base).collect()
      println("NARROW-READ UNEXPECTED OK: " + rows.mkString(","))
    } catch { case e: Throwable => println("NARROW-READ FAILS (good): " + e.getMessage.take(120)) }
    spark.stop()
  }
}
