package graft.storage

import graft.SparkSpec
import graft.core.MinervaType._
import graft.model.{Trend, TrendStorePart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-migration coverage (reference trend-store add-trends /
  * remove-trends / alter-trends / change, commands/trend_store.py:99-260):
  * metadata-only adds/removes/in-ladder widens, cast rewrites for
  * cross-ladder changes, narrowing refused without force. */
class TrendMigrationSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(name: String): (PartStore, String) = {
    val base = s"target/tmp/migration_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    (new PartStore(spark, PartStoreConfig(base, partitionSizeSeconds = 86400)), base)
  }

  private def seed(ps: PartStore): Unit = {
    val batch = Seq(
      (1L, 1000L, 10, 100L, 100L),
      (2L, 1000L, 20, 100L, 100L),
      (1L, 90000L, 30, 100L, 100L)
    ).toDF("entity_id", "timestamp", "power", "modified", "created")
    ps.store("p", batch)
  }

  private def partDef(trends: Trend*): TrendStorePart = TrendStorePart("p", trends)

  /** (path, length, mtime) of every data file — for asserting a migration
    * did NOT rewrite data. */
  private def dataFiles(base: String): Seq[(String, Long, Long)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$base/p"), true)
    val buf = Seq.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        buf += ((f.getPath.toString, f.getLen, f.getModificationTime))
    }
    buf.result().sortBy(_._1)
  }

  test("add-trends: new column is metadata-only and reads as typed NULLs") {
    val (ps, base) = freshStore("add")
    seed(ps)
    val before = dataFiles(base)
    val added = TrendMigration.addTrends(ps,
      partDef(Trend("power", MInteger), Trend("temp", MDouble)))
    assert(added == Seq("temp"))
    assert(dataFiles(base) == before) // no data rewrite
    val back = ps.readPart("p").get
    assert(back.schema("temp").dataType == DoubleType)
    assert(back.filter(col("temp").isNotNull).count() == 0)
    // idempotent
    assert(TrendMigration.addTrends(ps,
      partDef(Trend("power", MInteger), Trend("temp", MDouble))).isEmpty)
    // a later load into the added column merges normally
    val b2 = Seq((1L, 1000L, 11, 1.5, 200L, 100L))
      .toDF("entity_id", "timestamp", "power", "temp", "modified", "created")
    ps.store("p", b2)
    val r = ps.readPart("p").get.filter(col("entity_id") === 1 && col("timestamp") === 1000)
      .select("power", "temp").head
    assert(r.getInt(0) == 11 && r.getDouble(1) == 1.5)
  }

  test("alter-trends: in-ladder widening is metadata-only, footers upcast on read") {
    val (ps, base) = freshStore("widen")
    seed(ps)
    val before = dataFiles(base)
    val changed = TrendMigration.alterTrends(ps,
      partDef(Trend("power", MBigInt)), force = false)
    assert(changed == Seq("power"))
    assert(dataFiles(base) == before) // sidecar-only
    val back = ps.readPart("p").get
    assert(back.schema("power").dataType == LongType)
    assert(back.agg(sum("power")).head.getLong(0) == 60L)
  }

  test("alter-trends: cross-ladder widening rewrites with cast") {
    val (ps, base) = freshStore("cross")
    seed(ps)
    val before = dataFiles(base)
    val changed = TrendMigration.alterTrends(ps,
      partDef(Trend("power", MDouble)), force = false)
    assert(changed == Seq("power"))
    assert(dataFiles(base) != before) // genuine rewrite
    val back = ps.readPart("p").get
    assert(back.schema("power").dataType == DoubleType)
    assert(back.agg(sum("power")).head.getDouble(0) == 60.0)
    assert(back.select("pindex").distinct().count() == 2) // partitions intact
  }

  test("alter-trends: narrowing refused without --force, applied with it") {
    val (ps, _) = freshStore("narrow")
    seed(ps)
    intercept[TrendMigration.NonUpwardChange] {
      TrendMigration.alterTrends(ps, partDef(Trend("power", MSmallInt)), force = false)
    }
    // still intact
    assert(ps.readPart("p").get.schema("power").dataType == IntegerType)
    val changed = TrendMigration.alterTrends(ps,
      partDef(Trend("power", MSmallInt)), force = true)
    assert(changed == Seq("power"))
    val back = ps.readPart("p").get
    assert(back.schema("power").dataType == ShortType)
    assert(back.agg(sum("power")).head.getLong(0) == 60L)
  }

  test("remove-trends: metadata-only drop; --purge rewrites the bytes away") {
    val (ps, base) = freshStore("remove")
    seed(ps)
    val before = dataFiles(base)
    val removed = TrendMigration.removeTrends(ps, partDef())
    assert(removed == Seq("power"))
    assert(dataFiles(base) == before) // no rewrite
    assert(!ps.readPart("p").get.columns.contains("power"))
    // bytes still present in footers (raw read without the sidecar)
    val raw = spark.read.parquet(s"$base/p")
    assert(raw.columns.contains("power"))
    // purge: physically dropped
    val purged = TrendMigration.removeTrends(ps, partDef(), purge = true)
    assert(purged.isEmpty) // already gone from the sidecar
    // re-seed a column then purge-remove it
    TrendMigration.addTrends(ps, partDef(Trend("extra", MInteger)))
    val b = Seq((1L, 1000L, 5, 300L, 100L))
      .toDF("entity_id", "timestamp", "extra", "modified", "created")
    ps.store("p", b)
    TrendMigration.removeTrends(ps, partDef(), purge = true)
    assert(!spark.read.parquet(s"$base/p").columns.contains("extra"))
  }

  test("z-ordered store: identical data, bounded per-file stats on the second dim") {
    val (ps, base) = freshStore("zorder")
    val (psPlain, _) = freshStore("zorder_plain")
    val batch = (0 until 4096).map { i =>
      (i.toLong, 1000L + (i % 7),
        (i % 64).toLong * 16, ((i * 37) % 64).toLong * 16, 1L)
    }.toDF("entity_id", "timestamp", "a_m", "b_m", "modified")
    psPlain.store("p", batch)
    ps.store("p", batch, zorderBy = Seq("a_m", "b_m"))
    // layout must not change the data
    val cols = Seq("entity_id", "timestamp", "a_m", "b_m")
    assert(ps.readPart("p").get.orderBy("entity_id").select(cols.map(col): _*)
      .collect().toSeq ==
      psPlain.readPart("p").get.orderBy("entity_id").select(cols.map(col): _*)
        .collect().toSeq)
    // every file covers a bounded Morton rectangle: with 4 write tasks the
    // top 2 zkey bits are fixed per file, so b_m (the SECOND dimension — a
    // plain sort can't serve it) is confined to half its range per file
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$base/p"), true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath.toString
      }
      buf.result()
    }
    assert(files.length > 1, s"expected multiple files, got $files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(
        org.apache.spark.sql.functions.min("b_m"),
        org.apache.spark.sql.functions.max("b_m")).head
      (r.getLong(0), r.getLong(1))
    }
    assert(ranges.exists(_._1 >= 512), s"no high-b_m file: $ranges")
    assert(ranges.exists(_._2 < 512), s"no low-b_m file: $ranges")
  }

  test("rewrite crash window: live part restored from the .part_old aside") {
    val (ps, base) = freshStore("rewritecrash")
    seed(ps)
    val before = ps.readPart("p").get.orderBy("entity_id", "timestamp")
      .collect().toSeq
    // simulate a crash between rewritePart's two renames: live dir moved
    // aside, a (stale) staged rewrite tree left behind
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$base/p"),
      new org.apache.hadoop.fs.Path(s"$base/.p_old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/p__rewrite/pindex=0"))
    // any later read recovers the pre-rewrite state and sweeps the staging
    val after = ps.readPart("p").get.orderBy("entity_id", "timestamp")
      .collect().toSeq
    assert(after == before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/.p_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/p__rewrite")))
  }

  test("change: add + remove + retype in one reconciliation pass") {
    val (ps, _) = freshStore("change")
    seed(ps)
    val r = TrendMigration.changePart(ps,
      partDef(Trend("power", MBigInt), Trend("score", MDouble)), force = false)
    assert(r.added == Seq("score") && r.removed.isEmpty && r.changed == Seq("power"))
    assert(!r.rewrote) // widen was in-ladder, add is metadata-only
    val back = ps.readPart("p").get
    assert(back.schema("power").dataType == LongType)
    assert(back.schema("score").dataType == DoubleType)
    assert(back.count() == 3)
  }

  test("change on an unstored part creates the declared sidecar (get_or_create)") {
    val (ps, _) = freshStore("create")
    val r = TrendMigration.changePart(ps,
      partDef(Trend("power", MInteger)), force = false)
    assert(r.added == Seq("power"))
    val sc = ps.sidecarSchema("p").get
    assert(sc.fieldNames.toSeq ==
      Seq("entity_id", "timestamp", "modified", "created", "power", "pindex"))
    // a first load lands against the created sidecar
    seed(ps)
    assert(ps.readPart("p").get.count() == 3)
  }
}
