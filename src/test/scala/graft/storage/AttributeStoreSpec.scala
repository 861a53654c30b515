package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Attribute-history sidecar evolution: superset seeding from pre-sidecar
  * files, numeric widening on append, refusal of un-widenable batches. */
class AttributeStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): (AttributeStore, String) = {
    val base = s"target/tmp/attrstore_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    (new AttributeStore(spark, base), base)
  }

  test("pre-sidecar history seeds the union — earlier columns stay visible") {
    val (as, base) = fresh("seed")
    as.transferStaged(Seq((1L, 100L, "acme", 48))
      .toDF("entity_id", "timestamp", "vendor", "ports"), 1L)
    // simulate a pre-sidecar store: remove the sidecar
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/history/_schema.json"), false)
    // a later batch WITHOUT 'ports' must not hide it
    as.transferStaged(Seq((2L, 200L, "zenith"))
      .toDF("entity_id", "timestamp", "vendor"), 2L)
    val h = as.history.get
    assert(h.columns.contains("ports"))
    assert(h.filter(col("ports").isNotNull).count() == 1)
  }

  test("numeric widening on append: sidecar takes the wider type, old files upcast") {
    val (as, _) = fresh("widen")
    as.transferStaged(Seq((1L, 100L, 48)).toDF("entity_id", "timestamp", "ports"), 1L)
    as.transferStaged(Seq((2L, 200L, 3000000000L)).toDF("entity_id", "timestamp", "ports"), 2L)
    val h = as.history.get
    assert(h.schema("ports").dataType == org.apache.spark.sql.types.LongType)
    assert(h.select(sum("ports")).head.getLong(0) == 3000000048L)
  }

  test("un-widenable conflict refuses the batch instead of poisoning reads") {
    val (as, _) = fresh("conflict")
    as.transferStaged(Seq((1L, 100L, 48)).toDF("entity_id", "timestamp", "ports"), 1L)
    val bad = Seq((2L, 200L, "forty-eight")).toDF("entity_id", "timestamp", "ports")
    val e = intercept[IllegalArgumentException](as.transferStaged(bad, 2L))
    assert(e.getMessage.contains("conflicts"))
    // store still fully readable
    assert(as.history.get.count() == 1)
  }
}
