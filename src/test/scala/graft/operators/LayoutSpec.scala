package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: key correctness vs a bit-twiddling reference, and the
  * locality property the key exists for — range-partitioned files cover
  * bounded rectangles of BOTH dimensions. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zorderKey matches the reference Morton interleave") {
    val pts = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorderKey(col("a"), col("b"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == morton(a, b, 4), s"($a,$b)")
    }
    // the 4-bit key is a bijection on the 16x16 grid
    assert(got.values.toSet.size == 256)
  }

  private def mortonN(xs: Seq[Long], bits: Int): Long =
    (for (i <- 0 until bits; j <- xs.indices)
      yield ((xs(j) >> i) & 1L) << (i * xs.length + j)).sum

  test("zorderKeyN matches the N-dim reference and reduces to zorderKey at n=2") {
    val pts = for (a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L)
      yield (a, b, c)
    val got = pts.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zorderKeyN(Seq(col("a"), col("b"), col("c")), 3).as("z3"),
        Layout.zorderKeyN(Seq(col("a"), col("b")), 3).as("z2"),
        Layout.zorderKey(col("a"), col("b"), 3).as("z2ref"))
      .collect()
    got.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == mortonN(Seq(a, b, c), 3), s"($a,$b,$c)")
      assert(r.getLong(4) == r.getLong(5), "n=2 must equal zorderKey")
    }
    // 3-bit × 3-dim key is a bijection on the 8x8x8 grid
    assert(got.map(_.getLong(3)).toSet.size == 512)
  }

  test("3-dim clustering bounds every partition's box in ALL THREE dims") {
    val grid = (for (a <- 0L until 16L; b <- 0L until 16L; c <- 0L until 16L)
      yield (a, b, c)).toDF("a", "b", "c")
    val clustered = Layout.clusterBy(grid, 8,
        Layout.zorderKeyN(Seq(col("a"), col("b"), col("c")), 4))
      .withColumn("part", spark_partition_id())
    val boxes = clustered.groupBy("part")
      .agg((max("a") - min("a")).as("da"), (max("b") - min("b")).as("db"),
        (max("c") - min("c")).as("dc"), count(lit(1)).as("n"))
      .collect()
    assert(boxes.map(_.getAs[Long]("n")).sum == 4096L)
    // A contiguous Morton range that crosses a cube midpoint spans that
    // dim fully, and repartitionByRange's sampled boundaries land a few
    // partitions on such crossings — so the octree property is that
    // WIDE spreads are the exception in EVERY dim (row-order layout has
    // db = dc = 15 in ALL 8 partitions; measured octree: ≤3 per dim)
    for (d <- Seq("da", "db", "dc"))
      assert(boxes.count(_.getAs[Long](d) >= 12) <= 4,
        s"dim $d unbounded in most partitions: ${boxes.mkString(", ")}")
  }

  test("z-order clustering bounds every partition's rectangle in BOTH dims") {
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    val clustered = Layout.clusterBy(grid, 16,
        Layout.zorderKey(col("a"), col("b"), 6))
      .withColumn("part", spark_partition_id())
    val boxes = clustered.groupBy("part")
      .agg((max("a") - min("a")).as("da"), (max("b") - min("b")).as("db"),
        count(lit(1)).as("n"))
      .collect()
    assert(boxes.map(_.getAs[Long]("n")).sum == 4096L)
    // 4096 points over 16 partitions = 256 points each; a Z-ordered range
    // covers a rectangle no wider than ~2 quadrant widths per dim (<= 32
    // of 64) — row-order partitioning would give da = 3 but db = 63
    boxes.foreach { r =>
      assert(r.getAs[Long]("da") <= 32 && r.getAs[Long]("db") <= 32,
        s"partition rectangle too wide: $r")
    }
  }

  test("rendezvousShard: growing n moves only winners of the NEW shard, " +
      "~1/(n+1) of rows; deterministic under repartition") {
    val d = spark.range(2000).toDF("id")
    val a = Layout.rendezvousShard(d, "id", 8).withColumnRenamed("shard", "s8")
    val b = Layout.rendezvousShard(a, "id", 9).withColumnRenamed("shard", "s9")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every shard index in range
    assert(b.forall { case (_, s8, s9) => s8 >= 0 && s8 < 8 && s9 >= 0 && s9 < 9 })
    // the consistency property: a moved row can only have been claimed
    // by the NEW shard (existing hashes are unchanged)
    val moved = b.filter { case (_, s8, s9) => s8 != s9 }
    assert(moved.forall(_._3 == 8L), moved.take(5).toSeq.toString)
    // E[moved] = 1/9 of 2000 = 222; binomial sd ~ 14 -> generous band
    assert(moved.length > 150 && moved.length < 300, moved.length.toString)
    // deterministic under physical layout
    val again = Layout.rendezvousShard(d.repartition(7), "id", 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b.forall { case (id, _, s9) => again(id) == s9 })
  }
}
