package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's trend-store round-trip integration tests
  * (integration_tests/storage/trend/test_store.py: COPY path, update/upsert
  * semantics, missing-column evolution, modified maintenance). */
class PartStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(name: String): PartStore = {
    val base = s"target/tmp/partstore_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    new PartStore(spark, PartStoreConfig(base, partitionSizeSeconds = 86400))
  }

  test("store then read round-trips") {
    val ps = freshStore("roundtrip")
    val batch = Seq(
      (1L, 1000L, 10.0, 100L, 100L),
      (2L, 1000L, 20.0, 100L, 100L),
      (1L, 90000L, 30.0, 100L, 100L) // second day partition
    ).toDF("entity_id", "timestamp", "power", "modified", "created")
    assert(ps.store("p1", batch) == 2) // two pindex partitions
    val back = ps.readPart("p1").get
    assert(back.count() == 3)
    assert(back.select("pindex").distinct().count() == 2)
  }

  test("merge store() swaps exactly the batch's partitions and reports " +
      "their count (swap set = staged directory listing)") {
    val base = "target/tmp/partstore_swapset"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new PartStore(spark, PartStoreConfig(base, 86400))
    val b0 = Seq(
      (1L, 1000L, 10.0, 100L, 100L),
      (2L, 90000L, 20.0, 100L, 100L)
    ).toDF("entity_id", "timestamp", "power", "modified", "created")
    assert(ps.store("p", b0) == 2) // first append: both day partitions
    val day1File = fsys.listStatus(
      new org.apache.hadoop.fs.Path(s"$base/p/pindex=1")).map(_.getPath.getName)
        .filterNot(_.startsWith("_")).toSeq
    // second batch touches only day 0: return 1, day-1 files untouched
    val b1 = Seq((1L, 2000L, 11.0, 200L, 200L))
      .toDF("entity_id", "timestamp", "power", "modified", "created")
    assert(ps.store("p", b1) == 1)
    val day1After = fsys.listStatus(
      new org.apache.hadoop.fs.Path(s"$base/p/pindex=1")).map(_.getPath.getName)
        .filterNot(_.startsWith("_")).toSeq
    assert(day1After == day1File) // untouched partition not rewritten
    assert(ps.readPart("p").get.count() == 3)
  }

  test("store(batchIndicesHint): exact hint and proper superset both land " +
      "the same state as the collect path; an under-approximation refuses") {
    def mk(tag: String): PartStore = {
      val base = s"target/tmp/partstore_hint_$tag"
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      new PartStore(spark, PartStoreConfig(base, 86400))
    }
    val b0 = Seq(
      (1L, 1000L, 10.0, 100L),
      (2L, 90000L, 20.0, 100L),
      (3L, 180000L, 30.0, 100L) // days 0, 1, 2
    ).toDF("entity_id", "timestamp", "power", "modified")
    // merge batch touches day 0 only (upsert of entity 1) + a new row
    val b1 = Seq(
      (1L, 2000L, 11.0, 200L),
      (9L, 3000L, 90.0, 200L)
    ).toDF("entity_id", "timestamp", "power", "modified")
    def state(ps: PartStore): Seq[(Long, Long, Double, Long)] =
      ps.readPart("p").get
        .select("entity_id", "timestamp", "power", "modified")
        .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val ctl = mk("ctl"); ctl.store("p", b0); ctl.store("p", b1)
    val exact = mk("exact"); exact.store("p", b0)
    assert(exact.store("p", b1, batchIndicesHint = Some(Seq(0L))) == 1)
    val sup = mk("sup"); sup.store("p", b0)
    // proper superset: day 1 carries base rows but no batch rows — it is
    // rewritten byte-equivalently and swapped; contents must not change
    assert(sup.store("p", b1, batchIndicesHint = Some(Seq(0L, 1L))) == 2)
    assert(state(exact) == state(ctl))
    assert(state(sup) == state(ctl))
    // under-approximation: batch touches day 0, hint claims day 1 only —
    // the staged-listing guard must refuse before any swap
    val bad = mk("bad"); bad.store("p", b0)
    val before = state(bad)
    val e = intercept[IllegalStateException] {
      bad.store("p", b1, batchIndicesHint = Some(Seq(1L)))
    }
    assert(e.getMessage.contains("under-approximates"))
    assert(state(bad) == before) // nothing swapped
  }

  test("upsert: carried NULLs clobber, absent columns untouched (col = excluded.col)") {
    val ps = freshStore("upsert")
    val t0 = Seq(
      (1L, 1000L, Some(10.0), Some(1.0), 100L, 50L),
      (2L, 1000L, Some(20.0), Some(2.0), 100L, 50L)
    ).toDF("entity_id", "timestamp", "power", "temp", "modified", "created")
    ps.store("p", t0)
    val batch = Seq(
      (1L, 1000L, Some(11.0), None: Option[Double], 90L, 999L), // older modified, null temp
      (3L, 1000L, Some(33.0), Some(3.0), 200L, 200L)            // new entity
    ).toDF("entity_id", "timestamp", "power", "temp", "modified", "created")
    ps.store("p", batch)
    val rows = ps.readPart("p").get
      .select("entity_id", "power", "temp", "modified", "created")
      .sort("entity_id").collect()
    assert(rows.length == 3)
    // entity 1: batch power wins; the batch CARRIES temp with NULL, so the
    // NULL clobbers (trendstorepart.py:418-437 `col = excluded.col` — a
    // counter reset to NULL can be cleared); modified = greatest(100,90);
    // created preserved 50
    assert(rows(0).getDouble(1) == 11.0 && rows(0).isNullAt(2))
    assert(rows(0).getLong(3) == 100L && rows(0).getLong(4) == 50L)
    // entity 2 untouched
    assert(rows(1).getDouble(1) == 20.0)
    // entity 3 inserted
    assert(rows(2).getDouble(1) == 33.0 && rows(2).getLong(4) == 200L)

    // a batch NOT carrying temp leaves it untouched (column absence —
    // not NULL — means "don't touch")
    ps.store("p", Seq((2L, 1000L, 44.0, 300L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    val r2 = ps.readPart("p").get.filter(col("entity_id") === 2)
      .select("power", "temp", "modified", "created").head
    assert(r2.getDouble(0) == 44.0 && r2.getDouble(1) == 2.0)
    assert(r2.getLong(2) == 300L && r2.getLong(3) == 50L)
  }

  test("schema evolution: new trend column appears, history gets nulls") {
    val ps = freshStore("evolve")
    ps.store("p", Seq((1L, 1000L, 10.0, 100L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    ps.store("p", Seq((2L, 1000L, 5.5, 200L))
      .toDF("entity_id", "timestamp", "freq", "modified"))
    val back = ps.readPart("p").get.sort("entity_id")
    assert(back.columns.toSet.contains("freq") && back.columns.toSet.contains("power"))
    val rows = back.select("power", "freq").collect()
    assert(rows(0).getDouble(0) == 10.0 && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getDouble(1) == 5.5)
  }

  test("untouched partitions are not rewritten") {
    val ps = freshStore("blast")
    ps.store("p", Seq((1L, 1000L, 1.0, 1L)).toDF("entity_id", "timestamp", "power", "modified"))
    ps.store("p", Seq((1L, 90000L, 2.0, 2L)).toDF("entity_id", "timestamp", "power", "modified"))
    // writing day-2 must leave day-1 rows intact
    val back = ps.readPart("p").get.sort("timestamp").select("power").collect()
    assert(back.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0))
  }

  test("type widening: narrower stored type widens when batch is wider") {
    val ps = freshStore("widen")
    // day-1 int column
    ps.store("p", Seq((1L, 1000L, 10, 100L))
      .toDF("entity_id", "timestamp", "cnt", "modified"))
    // day-2 batch arrives with long values -> whole part widens to long
    ps.store("p", Seq((1L, 90000L, 3000000000L, 200L))
      .toDF("entity_id", "timestamp", "cnt", "modified"))
    val back = ps.readPart("p").get
    assert(back.schema("cnt").dataType == org.apache.spark.sql.types.LongType)
    val rows = back.sort("timestamp").select("cnt").collect()
    assert(rows(0).getLong(0) == 10L && rows(1).getLong(0) == 3000000000L)
    // narrower batch against the widened store stays long
    ps.store("p", Seq((2L, 1000L, 7, 300L))
      .toDF("entity_id", "timestamp", "cnt", "modified"))
    assert(ps.readPart("p").get.schema("cnt").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("crash recovery restores an aside partition that lost its swap") {
    val ps = freshStore("recover")
    ps.store("p", Seq((1L, 1000L, 42.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    // simulate a crash between the two swap renames: live dir moved aside,
    // staged dir never swapped in
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val base = "target/tmp/partstore_recover/p"
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$base/pindex=0"),
      new org.apache.hadoop.fs.Path(s"$base/.pindex_old_0")))
    // read triggers recovery: the aside is the only copy → restored
    val back = ps.readPart("p").get.collect()
    assert(back.length == 1 && back.head.getAs[Double]("power") == 42.0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/.pindex_old_0")))
  }

  test("stale whole-part aside is dropped once the live part exists") {
    // a crash AFTER rewritePart's swap-in but BEFORE the aside delete
    // leaves `.{part}_old` next to a complete live part; recovery must
    // drop the stale aside — if the live part is later removed (manual
    // cleanup, retention), a surviving aside would silently resurrect
    // pre-rewrite data
    val ps = freshStore("stale_aside")
    ps.store("p", Seq((1L, 1000L, 42.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = "target/tmp/partstore_stale_aside"
    val aside = new org.apache.hadoop.fs.Path(s"$base/.p_old")
    fs.mkdirs(aside) // the stale pre-rewrite copy
    val back = ps.readPart("p").get.collect()
    assert(back.length == 1 && back.head.getAs[Double]("power") == 42.0)
    assert(!fs.exists(aside)) // stale aside dropped, not kept around
    // the part's later deletion must not resurrect anything
    assert(ps.deletePart("p"))
    assert(ps.readPart("p").isEmpty)
  }

  test("retention expiry drops whole partitions") {
    val ps = freshStore("expire")
    ps.store("p", Seq(
      (1L, 1000L, 1.0, 1L), (1L, 90000L, 2.0, 1L), (1L, 200000L, 3.0, 1L)
    ).toDF("entity_id", "timestamp", "power", "modified"))
    ps.expire("p", cutoffSec = 86400L)
    val back = ps.readPart("p").get
    assert(back.count() == 2)
    assert(back.agg(min("timestamp")).head.getLong(0) == 90000L)
  }

  test("expiry deletes expired partition dirs only — retained files untouched") {
    val ps = freshStore("expire_noRewrite")
    ps.store("p", Seq(
      (1L, 1000L, 1.0, 1L), (1L, 90000L, 2.0, 1L), (1L, 200000L, 3.0, 1L)
    ).toDF("entity_id", "timestamp", "power", "modified"))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val base = "target/tmp/partstore_expire_noRewrite/p"
    def fileStamps(pindex: Long): Seq[(String, Long, Long)] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/pindex=$pindex"))
        .map(st => (st.getPath.toString, st.getLen, st.getModificationTime)).toSeq.sorted
    val before1 = fileStamps(1)
    val before2 = fileStamps(2)
    ps.expire("p", cutoffSec = 86400L)
    // expired partition dir is gone; retained partitions are the SAME files
    // (same path, length, mtime) — expiry is a directory delete, not a
    // table rewrite
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/pindex=0")))
    assert(fileStamps(1) == before1 && fileStamps(2) == before2)
    assert(ps.readPart("p").get.count() == 2)
  }

  test("expiry recovers a lost swap before deciding what to drop") {
    val ps = freshStore("expire_crash")
    ps.store("p", Seq((1L, 1000L, 1.0, 1L), (1L, 90000L, 2.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    // simulate a crash that left the RETAINED day's live dir moved aside
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val base = "target/tmp/partstore_expire_crash/p"
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$base/pindex=1"),
      new org.apache.hadoop.fs.Path(s"$base/.pindex_old_1")))
    ps.expire("p", cutoffSec = 86400L)
    // day 0 expired; day 1 was restored from its aside, then retained
    val back = ps.readPart("p").get.collect()
    assert(back.length == 1 && back.head.getAs[Double]("power") == 2.0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/.pindex_old_1")))
  }

  test("readPartRange prunes partition directories via pindex filters") {
    val ps = freshStore("range")
    ps.store("p", Seq(
      (1L, 1000L, 1.0, 1L), (1L, 90000L, 2.0, 1L), (1L, 200000L, 3.0, 1L)
    ).toDF("entity_id", "timestamp", "power", "modified"))
    val day2 = ps.readPartRange("p", 86400L, 172800L).get
    assert(day2.select("power").collect().map(_.getDouble(0)).toSeq == Seq(2.0))
    // the time range must surface as a PartitionFilter on pindex — that is
    // what lets a 100 TB scan list one directory instead of the table
    val scanLine = day2.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("pindex"), s"no pindex partition filter: $scanLine")
  }

  test("schema sidecar: reads declare the stored schema without mergeSchema") {
    val ps = freshStore("sidecar")
    ps.store("p", Seq((1L, 1000L, 10.0, 100L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val sidecar = new org.apache.hadoop.fs.Path(
      "target/tmp/partstore_sidecar/p/_schema.json")
    assert(fs.exists(sidecar))
    // crash-window shape: a SUPERSET sidecar (extra column, widened type)
    // over narrower files still reads correctly — missing column → NULL,
    // int-width file upcast to declared long
    val wider = org.apache.spark.sql.types.StructType(
      ps.readPart("p").get.schema.fields.map {
        case f if f.name == "power" => f.copy(name = "power")
        case f => f
      } :+ org.apache.spark.sql.types.StructField("ghost",
        org.apache.spark.sql.types.DoubleType))
    val out = fs.create(sidecar, true)
    out.write(wider.json.getBytes("UTF-8")); out.close()
    val back = ps.readPart("p").get
    assert(back.columns.contains("ghost"))
    val r = back.select("power", "ghost").head
    assert(r.getDouble(0) == 10.0 && r.isNullAt(1))
    // no sidecar → mergeSchema fallback still reads
    fs.delete(sidecar, false)
    assert(ps.readPart("p").get.select("power").head.getDouble(0) == 10.0)
  }

  test("modified log accumulates per (part, timestamp)") {
    val ps = freshStore("mlog")
    val b = Seq((1L, 1000L, 1.0, 1L), (2L, 1000L, 2.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified")
    ps.store("p", b)
    ps.markModified("p", b, nowSec = 12345L)
    val log = spark.read.parquet("target/tmp/partstore_mlog/_modified_log")
    assert(log.count() == 1) // one distinct timestamp
    assert(log.head.getAs[Long]("modified") == 12345L)
  }

  test("process-modified-log folds the log to max(modified) per key") {
    val ps = freshStore("mlog_compact")
    val b = Seq((1L, 1000L, 1.0, 1L), (2L, 90000L, 2.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified")
    // marks: both timestamps at 10, then ts 1000 again at 20 — the raw
    // log carries 3 rows, the fold 2 with max(modified) per timestamp
    ps.markModified("p", b, nowSec = 10L)
    ps.markModified("p", b.filter(col("timestamp") === 1000L), nowSec = 20L)
    assert(ps.readModifiedLog().get.count() == 3)
    assert(ps.compactModifiedLog() == 2L)
    val folded = ps.readModifiedLog().get.collect()
      .map(r => r.getAs[Long]("timestamp") -> r.getAs[Long]("modified")).toMap
    assert(folded == Map(1000L -> 20L, 90000L -> 10L))
    // idempotent
    assert(ps.compactModifiedLog() == 2L)
    // crash between the two swap renames: live log gone, aside holds the
    // pre-compaction state — readModifiedLog restores it
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = "target/tmp/partstore_mlog_compact"
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$base/_modified_log"),
      new org.apache.hadoop.fs.Path(s"$base/._modified_log_old")))
    assert(ps.readModifiedLog().get.count() == 2)
  }

  test("compaction preserves a markModified interleaved between stage and swap") {
    val ps = freshStore("mlog_race")
    val b = Seq((1L, 1000L, 1.0, 1L), (2L, 90000L, 2.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified")
    ps.markModified("p", b, nowSec = 10L)
    // a concurrent load appends ts 180000 AFTER the fold staged but BEFORE
    // the live→aside swap — the lost-update window: without the fold-back,
    // the append rides into the aside and is deleted with it
    val late = Seq((3L, 180000L, 3.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified")
    ps.compactInterleaveHook = () => ps.markModified("p", late, nowSec = 30L)
    ps.compactModifiedLog()
    ps.compactInterleaveHook = () => ()
    val after = ps.readModifiedLog().get.collect()
      .map(r => r.getAs[Long]("timestamp") -> r.getAs[Long]("modified")).toMap
    assert(after == Map(1000L -> 10L, 90000L -> 10L, 180000L -> 30L))
    // a later compaction folds the preserved append in cleanly
    assert(ps.compactModifiedLog() == 3L)
  }

  // ---- writer lease: the reference's concurrent-store guarantee
  // (integration_tests/storage/trend/test_store_concurrent.py:60-123 —
  // racing writers of one part converge, never lose rows) ----

  test("two racing writer threads to one part converge — every row survives") {
    val base = "target/tmp/partstore_race2w"
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    // generous wait: the loser queues behind the holder instead of refusing
    val ps = new PartStore(spark, PartStoreConfig(base, 86400,
      writerLeaseWaitMs = 120000L))
    def batch(ids: Range, v: Double) = ids.map(i =>
      (i.toLong, 1000L, v, 100L, 100L))
      .toDF("entity_id", "timestamp", "power", "modified", "created")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = Seq(batch(1 to 50, 1.0), batch(51 to 100, 2.0)).map { b =>
      new Thread(() => {
        try { gate.await(); ps.store("p", b) }
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing stores must serialize, got $errs")
    val back = ps.readPart("p").get
    assert(back.count() == 100L, "a racing writer's rows were lost")
    assert(back.select("entity_id").distinct().count() == 100L)
    // no leftover lease after both writers released
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$base/.p__lease")))
  }

  test("a held lease past the wait is refused loudly, not lost silently") {
    val base = "target/tmp/partstore_leaseheld"
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new PartStore(spark, PartStoreConfig(base, 86400,
      writerLeaseWaitMs = 300L))
    val b = Seq((1L, 1000L, 1.0, 100L, 100L))
      .toDF("entity_id", "timestamp", "power", "modified", "created")
    ps.store("p", b) // establishes the part (and releases its lease)
    // another writer's live lease
    fsys.mkdirs(new org.apache.hadoop.fs.Path(base))
    val lease = new org.apache.hadoop.fs.Path(s"$base/.p__lease")
    val out = fsys.create(lease, false)
    out.write("other-writer".getBytes("UTF-8")); out.close()
    val e = intercept[graft.core.ConcurrentWriterException] { ps.store("p", b) }
    assert(e.getMessage.contains("must serialize"))
    // the foreign lease is untouched by the refused writer
    assert(fsys.exists(lease))
    fsys.delete(lease, false)
  }

  test("a SLOW but alive writer is never taken over at the TTL — the " +
      "heartbeat keeps the lease fresh while its store runs") {
    val base = "target/tmp/partstore_leasehb"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    // TTL far below the store's wall clock: pre-fence, any concurrent
    // writer arriving mid-store would see an "expired" lease and take
    // over — reopening the lost-update window with both writers ALIVE
    val ps = new PartStore(spark, PartStoreConfig(base, 86400,
      writerLeaseWaitMs = 200L, writerLeaseTtlMs = 300L))
    // 60 staged partition swaps keep writer A busy for seconds even on a
    // fast store path, so the takeover attempt below reliably races a
    // LIVE lease instead of cancelling (the store used to be slow enough
    // with 20 at its old two-executions-per-call cost)
    val big = (1 to 20000).map(i =>
        (i.toLong, (i % 60).toLong * 86400L, 1.0, 100L, 100L))
      .toDF("entity_id", "timestamp", "power", "modified", "created")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val a = new Thread(() => {
      try ps.store("p", big) catch { case t: Throwable => errs.add(t) }
    })
    a.start()
    val lease = new org.apache.hadoop.fs.Path(s"$base/.p__lease")
    // wait until A actually holds the lease, then well past the TTL
    var spins = 0
    while (!fsys.exists(lease) && spins < 100) { Thread.sleep(50); spins += 1 }
    Thread.sleep(600)
    // the 20-partition staged swap takes seconds; skip (not fail) in the
    // unlikely event A already finished — there is nothing left to race
    if (fsys.exists(lease)) {
      try {
        val e = intercept[graft.core.ConcurrentWriterException] {
          ps.store("p", big.limit(1))
        }
        assert(e.getMessage.contains("must serialize"))
      } catch {
        case _: org.scalatest.exceptions.TestFailedException
            if !fsys.exists(lease) && errs.isEmpty =>
          // A finished (and released) between the exists check and our
          // store — the second store legitimately succeeded; nothing to
          // race. (The extra row it wrote upserts the same key, so the
          // count below still holds.)
          a.join()
          cancel("writer finished before the takeover attempt — nothing to race")
      }
    } else cancel("writer finished before the TTL window — nothing to race")
    a.join()
    assert(errs.isEmpty, s"slow writer failed: $errs")
    assert(ps.readPart("p").get.count() == 20000L) // nothing lost
  }

  test("a stale lease (crashed writer) is taken over after the TTL") {
    val base = "target/tmp/partstore_leasestale"
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new PartStore(spark, PartStoreConfig(base, 86400,
      writerLeaseWaitMs = 30000L, writerLeaseTtlMs = 1000L))
    fsys.mkdirs(new org.apache.hadoop.fs.Path(base))
    val lease = new org.apache.hadoop.fs.Path(s"$base/.p__lease")
    val out = fsys.create(lease, false)
    out.write("crashed-writer".getBytes("UTF-8")); out.close()
    fsys.setTimes(lease, System.currentTimeMillis() - 60000L, -1L)
    val b = Seq((1L, 1000L, 1.0, 100L, 100L))
      .toDF("entity_id", "timestamp", "power", "modified", "created")
    ps.store("p", b) // takes over the stale lease instead of refusing
    assert(ps.readPart("p").get.count() == 1L)
    assert(!fsys.exists(lease)) // and released its own cleanly
  }

  private def dataFiles(base: String, part: String, pindex: Long) = {
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$base/$part/pindex=$pindex")
    fsys.listStatus(dir).toSeq.filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
  }

  test("compactPart bin-packs multi-file partitions and preserves contents") {
    val base = "target/tmp/partstore_compact"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new PartStore(spark, PartStoreConfig(base, 86400))
    // a z-ordered store range-partitions by (pindex, zkey): one pindex's
    // rows span many range tasks, so the partition dir lands MANY files —
    // exactly the layout compaction exists for
    val rows = (0 until 2000).map(i =>
      (i.toLong, (i % 2) * 86400L + 10L, (i * 37 % 1000).toLong, 100L))
    val df = rows.toDF("entity_id", "timestamp", "seq", "modified")
    ps.store("p", df, zorderBy = Seq("entity_id", "seq"))
    val before0 = dataFiles(base, "p", 0).length
    val before1 = dataFiles(base, "p", 1).length
    assert(before0 > 1, s"fixture must start fragmented, got $before0 files")
    val want = ps.readPart("p").get.orderBy("entity_id", "timestamp")
      .collect().map(_.toString).toSeq
    val compacted = ps.compactPart("p")
    assert(compacted == 2)
    // bin-packed: tiny partitions pack to exactly one file each
    assert(dataFiles(base, "p", 0).length == 1)
    assert(dataFiles(base, "p", 1).length == 1)
    // answer-invisible: identical rows, identical schema sidecar
    val after = ps.readPart("p").get.orderBy("entity_id", "timestamp")
      .collect().map(_.toString).toSeq
    assert(after == want)
    // idempotent: an already-compact store is a no-op listing
    assert(ps.compactPart("p") == 0)
    assert(dataFiles(base, "p", 0).length == 1)
    // upserts after compaction still merge correctly
    val up = Seq((0L, 10L, 999L, 200L)).toDF("entity_id", "timestamp", "seq", "modified")
    ps.store("p", up)
    val r = ps.readPart("p").get.filter(col("entity_id") === 0L && col("timestamp") === 10L)
      .select("seq").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(999L))
  }

  test("compactPart leaves a leftover __compact staging swept on next read") {
    val base = "target/tmp/partstore_compact_crash"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new PartStore(spark, PartStoreConfig(base, 86400))
    ps.store("p", Seq((1L, 10L, 100L)).toDF("entity_id", "timestamp", "modified"))
    // simulate a compaction crash that left its staging dir behind
    fsys.mkdirs(new org.apache.hadoop.fs.Path(s"$base/p__compact/pindex=0"))
    assert(ps.readPart("p").get.count() == 1L) // recoverAsides swept it
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$base/p__compact")))
  }
}
