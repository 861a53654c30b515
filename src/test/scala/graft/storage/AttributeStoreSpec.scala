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
  test("history is bucketed by entity hash; forEntity prunes to one bucket dir") {
    val (as, base) = fresh("bucketed")
    as.transferStaged((1L to 40L).map(i => (i, 100L, s"v$i"))
      .toDF("entity_id", "timestamp", "vendor"), 1L)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/history"))
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.startsWith("abucket="))
    assert(dirs.length > 1, s"expected bucket dirs, got ${dirs.mkString(",")}")
    val one = as.forEntity(7L).get
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("abucket"),
      s"bucket predicate not pushed to partition pruning:\n$plan")
    assert(one.collect().map(_.getAs[String]("vendor")).toSeq == Seq("v7"))
    assert(!one.columns.contains("abucket"))
  }

  test("pre-bucketing flat history keeps the flat layout on append") {
    val (as, base) = fresh("legacyflat")
    // simulate an old store: parquet files at the history root
    Seq((1L, 100L, "old")).toDF("entity_id", "timestamp", "vendor")
      .withColumn("modified", org.apache.spark.sql.functions.lit(0L))
      .write.parquet(s"$base/history")
    as.transferStaged(Seq((2L, 200L, "new"))
      .toDF("entity_id", "timestamp", "vendor"), 1L)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/history"))
      .map(_.getPath.getName)
    assert(!names.exists(_.startsWith("abucket=")), names.mkString(","))
    assert(as.history.get.count() == 2)
    assert(as.forEntity(2L).get.count() == 1) // no bucket column, id filter only
  }

  test("derived views do not expose the layout bucket column") {
    val (as, _) = fresh("views")
    as.transferStaged(Seq((1L, 100L, "a"), (1L, 200L, "b"))
      .toDF("entity_id", "timestamp", "vendor"), 1L)
    assert(!as.current.get.columns.contains("abucket"))
    assert(!as.compacted(Seq("vendor")).get.columns.contains("abucket"))
    assert(as.current.get.select("vendor").head.getString(0) == "b")
  }

  test("bucket count is persisted: reopening with a different value still finds entities") {
    val (as16, base) = fresh("bucketcount")
    as16.transferStaged((1L to 20L).map(i => (i, 100L, s"v$i"))
      .toDF("entity_id", "timestamp", "vendor"), 1L)
    // ops code misconfigures the layout constant; the stored value wins
    val as1024 = new AttributeStore(spark, base, buckets = 1024)
    assert((1L to 20L).forall(id => as1024.forEntity(id).get.count() == 1))
    // and appends keep hashing with the ORIGINAL count
    as1024.transferStaged(Seq((21L, 100L, "v21"))
      .toDF("entity_id", "timestamp", "vendor"), 2L)
    assert(as16.forEntity(21L).get.count() == 1)
  }

  test("integral+floating conflict is refused, not 'widened' lossily") {
    val (as, _) = fresh("intfloat")
    as.transferStaged(Seq((1L, 100L, 3000000000L))
      .toDF("entity_id", "timestamp", "ports"), 1L)
    val bad = Seq((2L, 200L, 1.5f)).toDF("entity_id", "timestamp", "ports")
    val e = intercept[IllegalArgumentException](as.transferStaged(bad, 2L))
    assert(e.getMessage.contains("conflicts"))
    assert(as.history.get.count() == 1) // store untouched and readable
  }

  test("int-typed entity_id batch lands in the bucket forEntity probes") {
    val (as, _) = fresh("inttype")
    // xxhash64 is type-sensitive: an IntegerType batch hashed at its native
    // type would write to a bucket the LongType read-side filter never
    // probes — the lookup would silently return zero rows
    as.transferStaged((1 to 40).map(i => (i, 100L, s"v$i"))
      .toDF("entity_id", "timestamp", "vendor"), 1L)
    assert((1L to 40L).forall(id => as.forEntity(id).get.count() == 1))
  }

  test("incremental refresh on a zero-row snapshot falls back to full derive") {
    val (as, base) = fresh("emptysnap")
    as.transferStaged(Seq((1L, 100L, "a"))
      .toDF("entity_id", "timestamp", "vendor"), 1L)
    // materialize an EMPTY snapshot (e.g. a filter-everything pipeline ran)
    as.current.get.limit(0).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$base/current")
    assert(as.materializeCurrentIncremental() == 1L) // no NPE/getLong throw
    assert(as.currentSnapshot.get.count() == 1)
  }

  test("incremental curr-ptr refresh folds only fresh rows into the snapshot") {
    val (as, _) = fresh("incr")
    as.transferStaged(Seq((1L, 100L, "a"), (2L, 100L, "x"))
      .toDF("entity_id", "timestamp", "vendor"), 1L)
    assert(as.materializeCurrent() == 2L)
    // later batch updates entity 1, adds entity 3 AND a new column
    as.transferStaged(Seq((1L, 200L, "b", 9), (3L, 100L, "z", 7))
      .toDF("entity_id", "timestamp", "vendor", "ports"), 2L)
    assert(as.materializeCurrentIncremental() == 3L)
    val cur = as.currentSnapshot.get.orderBy("entity_id").collect()
    assert(cur.map(_.getAs[String]("vendor")).toSeq == Seq("b", "x", "z"))
    // pre-column entity carries a NULL for the new column, like a re-derive
    assert(cur(1).isNullAt(cur(1).fieldIndex("ports")))
    // matches the from-scratch derivation exactly
    val full = as.current.get.orderBy("entity_id")
      .select("entity_id", "timestamp", "vendor", "ports").collect()
    val incr = as.currentSnapshot.get.orderBy("entity_id")
      .select("entity_id", "timestamp", "vendor", "ports").collect()
    assert(full.map(_.toSeq).toSeq == incr.map(_.toSeq).toSeq)
  }

}
