package graft.tools
import graft.model.InstanceModel
import graft.storage.{PartStore, PartStoreConfig}
import org.apache.spark.sql.SparkSession

object ProbeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // Probe 1: store the SAME batch twice — idempotent? (retry semantics)
    val base = "target/tmp/probe_store"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new PartStore(spark, PartStoreConfig(base, 86400))
    val b = Seq((1L, 1000L, 5.0, 7L), (2L, 1000L, 6.0, 7L)).toDF("entity_id", "timestamp", "power", "modified")
    ps.store("p", b); ps.store("p", b)
    val back = ps.readPart("p").get
    println("IDEMPOTENT_ROWS=" + back.count() + " POWER_SUM=" + back.agg(org.apache.spark.sql.functions.sum("power")).head.get(0))
    // Probe 2: malformed YAML
    try { InstanceModel.parseTrendStore("title: [unclosed") ; println("YAMLERR=NONE") }
    catch { case e: Exception => println("YAMLERR=" + e.getClass.getSimpleName) }
    // Probe 3: YAML missing granularity
    try { InstanceModel.parseTrendStore("title: x\ndata_source: y") ; println("NOGRAN=NONE") }
    catch { case e: Exception => println("NOGRAN=" + e.getMessage.take(60)) }
    spark.stop()
  }
}
