package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Zone-map sidecar (`_zones.tsv`): plan-time partition-directory pruning
  * on columns that correlate with time without being the partition key.
  * The contract under test: pruning NEVER changes answers (conservative
  * supersets everywhere) and DOES skip directories when zones discriminate. */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(name: String): PartStore = {
    val base = s"target/tmp/zonemap_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    new PartStore(spark, PartStoreConfig(base, partitionSizeSeconds = 86400,
      keyCols = Seq("event_id"), zoneCols = Seq("event_id")))
  }

  /** 3 day-partitions; event_id monotone with time (1000 ids per day). */
  private def fixture = (0L until 3000L).map { i =>
    (i, i / 1000L * 86400L + (i % 1000L) * 10L, i * 3L, 1L)
  }.toDF("event_id", "timestamp", "cents", "modified")

  test("zone-pruned read skips non-intersecting partitions, answers match full scan") {
    val ps = freshStore("prune")
    ps.store("ev", fixture)
    // ids 1200..1800 live entirely in day 1
    val keep = ps.zonePindexes("ev", "event_id", 1200L, 1800L)
    assert(keep.isDefined, "sidecar must exist after store")
    assert(keep.get == Seq(1L), s"expected only day-1, got ${keep.get}")
    val pruned = ps.readPartZonePruned("ev", "event_id", 1200L, 1800L).get
      .select("event_id", "timestamp", "cents").orderBy("event_id").collect()
    val full = ps.readPart("ev").get
      .filter(col("event_id").between(1200L, 1800L))
      .select("event_id", "timestamp", "cents").orderBy("event_id").collect()
    assert(pruned.sameElements(full))
    assert(pruned.length == 601)
  }

  test("incremental stores widen zones; pruning stays a superset of the truth") {
    val ps = freshStore("widen")
    val f = fixture
    ps.store("ev", f.filter(pmod(col("event_id"), lit(2)) === 0))
    // after half the data, day-0 zone is [0, 2998]-parity-limited; a
    // second store widens it to the full range, never narrows
    ps.store("ev", f.filter(pmod(col("event_id"), lit(2)) === 1))
    val keep = ps.zonePindexes("ev", "event_id", 0L, 999L).get
    assert(keep == Seq(0L))
    val n = ps.readPartZonePruned("ev", "event_id", 0L, 999L).get.count()
    assert(n == 1000L)
    // an UPDATE that moves a row's zone column outside the old range
    // must widen that partition's zone (store computes zones from the
    // merged contents, so the new value is covered)
    val moved = Seq((5000L, 100L, 1L, 2L))
      .toDF("event_id", "timestamp", "cents", "modified")
    ps.store("ev", moved)
    assert(ps.zonePindexes("ev", "event_id", 5000L, 5000L).get == Seq(0L))
    assert(ps.readPartZonePruned("ev", "event_id", 5000L, 5000L).get.count() == 1L)
  }

  test("a partition without a zone entry is always read (conservative)") {
    val ps = freshStore("conservative")
    ps.store("ev", fixture)
    // hand-drop day-2's entry, simulating a sidecar from an older writer
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = "target/tmp/zonemap_conservative/ev"
    val z = ZoneSidecar.read(fsys, dir).get
    ZoneSidecar.write(fsys, dir, z - 2L)
    val keep = ps.zonePindexes("ev", "event_id", 2100L, 2200L).get
    assert(keep == Seq(2L), "entry-less partition must survive pruning")
    assert(ps.readPartZonePruned("ev", "event_id", 2100L, 2200L).get.count() == 101L)
  }

  test("expire drops zone entries with their partitions; rewrite recomputes exactly") {
    val ps = freshStore("lifecycle")
    ps.store("ev", fixture)
    ps.expire("ev", 86400L) // drops day 0
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = "target/tmp/zonemap_lifecycle/ev"
    assert(ZoneSidecar.read(fsys, dir).get.keySet == Set(1L, 2L))
    // a whole-part rewrite (here: drop ids >= 2500) recomputes zones
    // from the new contents — day-2's range SHRINKS, not just widens
    ps.rewritePart("ev", df => df.filter(col("event_id") < 2500L))
    val z = ZoneSidecar.read(fsys, dir).get
    assert(z(2L)("event_id") == (2000L, 2499L))
    assert(ps.zonePindexes("ev", "event_id", 2600L, 2700L).get.isEmpty)
  }
}
