package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The three properties that make the HdrHistogram sketch trustworthy at
  * scale: (1) the returned [lo, hi] range CONTAINS the true rank value —
  * a hard guarantee, not statistical; (2) relative width ≤ 2^-p above the
  * exact region; (3) layout invariance — sketches of arbitrary splits
  * merge to exactly the full-corpus sketch, so partitioning and
  * incremental accumulation never change an estimate. */
class HdrQuantilesSpec extends SparkSpec {
  private lazy val si = spark.implicits
  import si._

  private val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)

  private def fixture = {
    // deterministic skewed longs across several octaves, two groups
    (0 until 2000).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v = ((i * 2654435761L) % 100003L) % (1L << (4 + i % 14))
      (g, v)
    }.toDF("g", "v")
  }

  test("true quantile value is contained in the returned bucket range") {
    val df = fixture
    val est = HdrQuantiles.quantiles(df, Seq("g"), "v", qs, p = 5)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    for (g <- Seq("a", "b")) {
      val vals = df.filter(col("g") === g).select("v")
        .collect().map(_.getLong(0)).sorted
      for ((name, q) <- qs) {
        val rank = math.ceil(q * vals.length).toInt
        val truth = vals(rank - 1)
        val lo = est(g).getAs[Long](s"${name}_lo")
        val hi = est(g).getAs[Long](s"${name}_hi")
        assert(lo <= truth && truth <= hi,
          s"$g/$name: true rank-$rank value $truth outside [$lo, $hi]")
        // relative width bound: exact below 2m, ≤ 2^-p above
        assert(lo < 64 || (hi - lo + 1).toDouble / lo <= 1.0 / 32 + 1e-9,
          s"$g/$name: bucket [$lo, $hi] wider than 2^-5 relative")
      }
    }
  }

  test("sketches of arbitrary splits merge to the full-corpus sketch") {
    val df = fixture
    val full = HdrQuantiles.sketch(df, Seq("g"), "v")
    val merged = HdrQuantiles.merge(Seq("g"),
      HdrQuantiles.sketch(df.filter(col("v") % 2 === 0), Seq("g"), "v"),
      HdrQuantiles.sketch(df.filter(col("v") % 2 === 1), Seq("g"), "v"))
    assert(merged.select("g", "bucket", "cnt").exceptAll(
      full.select("g", "bucket", "cnt")).isEmpty)
    assert(full.select("g", "bucket", "cnt").exceptAll(
      merged.select("g", "bucket", "cnt")).isEmpty)
  }

  test("zero and negative values clamp to bucket 0; small values are exact") {
    val df = Seq(("z", -5L), ("z", 0L), ("z", 1L), ("z", 63L)).toDF("g", "v")
    val sk = HdrQuantiles.sketch(df, Seq("g"), "v").collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap
    assert(sk(0L) == 2L) // -5 clamps onto the 0 bucket
    assert(sk(1L) == 1L && sk(63L) == 1L) // unit buckets below 2m
  }
}
