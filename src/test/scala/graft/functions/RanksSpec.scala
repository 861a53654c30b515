package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalDenseRankAttach equals distinct -> globalDenseRank -> " +
      "join-back on non-distinct keys; count = distinct keys") {
    // duplicate-heavy, multi-type keys, deliberately unsorted input
    val df = Seq(
      (10L, "b", 3L), (11L, "a", 1L), (12L, "b", 3L), (13L, "a", 2L),
      (14L, "c", 1L), (15L, "a", 1L), (16L, "b", 1L), (17L, "c", 1L))
      .toDF("id", "k1", "k2").repartition(3)
    val (got, n) = Ranks.globalDenseRankAttach(df, Seq("k1", "k2"))
    assert(n == 5L) // (a,1)(a,2)(b,1)(b,3)(c,1)
    val want = df
      .join(Ranks.globalDenseRank(
        df.select("k1", "k2").distinct(), Seq("k1", "k2")), Seq("k1", "k2"))
    assert(got.select("id", "__r").collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap ==
      want.select("id", "__r").collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap)
    // dense: ranks are 1..n with no gaps
    assert(got.select("__r").distinct().collect().map(_.getLong(0)).sorted
      .sameElements(1L to 5L))
  }

  test("globalDenseRankAttach is deterministic under repartition and " +
      "handles empty input") {
    val base = (1 to 500).map(i => (i.toLong, s"k${i % 37}"))
      .toDF("id", "k")
    val (a, na) = Ranks.globalDenseRankAttach(base, Seq("k"))
    val (b, nb) = Ranks.globalDenseRankAttach(base.repartition(7), Seq("k"))
    assert(na == 37L && nb == 37L)
    assert(a.orderBy("id").collect().toSeq == b.orderBy("id").collect().toSeq)
    val (e, ne) = Ranks.globalDenseRankAttach(
      base.filter(lit(false)), Seq("k"))
    assert(ne == 0L && e.count() == 0L)
  }
}
