package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities: multi-dimensional clustering so parquet
  * row-group min/max statistics prune on SEVERAL columns at once.
  *
  * A table range-partitioned and sorted on one column prunes only that
  * column's predicates; interleaving the bits of two key columns into a
  * Morton (Z-order) key gives every file a bounded rectangle in (a, b)
  * space, so predicates on EITHER dimension skip most files — the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Pure integer
  * expression arithmetic (codegen'd, engine-portable, oracle-checkable).
  */
object Layout {

  /** Morton/Z-order key: interleave the low `bits` bits of two NON-NEGATIVE
    * integer columns (a in the even bit positions, b in the odd ones).
    * Callers bound the domain first (`pmod`, bucketing, or quantile rank) —
    * bits beyond `bits` are ignored, which folds distant values together
    * and destroys locality rather than erroring. */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      pmod(shiftright(a.cast("long"), i), lit(2L)) * lit(1L << (2 * i)) +
        pmod(shiftright(b.cast("long"), i), lit(2L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** N-dimensional Morton key: round-robin bit interleave of the low
    * `bits` bits of each NON-NEGATIVE integer column (col j's bit i
    * lands at position i·n + j). The 2-column form is [[zorderKey]]
    * with the same layout. n·bits must fit a signed long (≤ 62).
    * Same domain-bounding caveat as zorderKey; three or four dims is
    * the practical ceiling — each added dimension halves the per-dim
    * resolution a fixed key width can carry (n·bits ≤ 62), so rectangle
    * bounds per file loosen geometrically. */
  def zorderKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, s"zorderKeyN interleaves at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"n*bits must be in [2, 62], got ${n * bits}")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield pmod(shiftright(c.cast("long"), i), lit(2L)) *
        lit(1L << (i * n + j)))
      .reduce(_ + _)
  }

  /** Cluster a frame for writing: range-partition on the key (contiguous
    * key ranges per output file) and sort within partitions (row groups
    * inside a file stay contiguous too). With a Z-order key each output
    * file covers a bounded rectangle of the two dimensions. */
  /** Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    * 1998, public — the consistent-sharding alternative to `id % n`):
    * shard(id) = argmax over s ∈ [0, n) of md5("salt:id:s"). Growing the
    * fleet n → n+1 moves ONLY the rows whose new shard's hash wins —
    * E[moved] = 1/(n+1) — where mod-sharding reshuffles (n−1)/n of a
    * 100 TB corpus for the same change. Pure expression arithmetic
    * (md5 + array_max over n (hash, s) structs; ties break to the
    * LARGER s in both the struct max and any ORDER BY h DESC, s DESC
    * replay), codegen-friendly, oracle-checkable. n is a fleet size —
    * tens to thousands — so the n-way array per row is bounded. */
  def rendezvousShard(
      df: DataFrame, idCol: String, n: Int,
      salt: String = "hrw:"): DataFrame = {
    require(n >= 1 && n <= 65536, s"rendezvousShard: n in [1, 65536], got $n")
    val entries = (0 until n).map { s =>
      struct(
        conv(substring(md5(concat(lit(salt), col(idCol).cast("string"),
          lit(":"), lit(s.toString))), 1, 8), 16, 10).cast("long").as("h"),
        lit(s.toLong).as("s"))
    }
    df.withColumn("shard", array_max(array(entries: _*)).getField("s"))
  }

  def clusterBy(df: DataFrame, numPartitions: Int, key: Column): DataFrame =
    df.repartitionByRange(numPartitions, key).sortWithinPartitions(key)
}
