package graft.functions

import graft.SparkSpec

/** Hand-computed HITS on a path-with-fan graph, plus the layout
  * invariance the integer normalization buys. */
class HitsSpec extends SparkSpec {
  private lazy val si = spark.implicits
  import si._

  test("two iterations match the hand-computed fixed-point scores") {
    // 1→3, 2→3, 3→4: 3 is the authority (fed by two hubs), 1/2 the hubs
    val edges = Seq[(Long, Long)]((1, 3), (2, 3), (3, 4)).toDF("src", "dst")
    val got = Graph.hits(edges, "src", "dst", iterations = 2)
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
    assert(got(1L) == (1000000L, 0L))
    assert(got(2L) == (1000000L, 0L))
    assert(got(3L) == (250000L, 1000000L))
    assert(got(4L) == (0L, 250000L))
  }

  test("scores are identical under a different input partitioning") {
    val edges = (0L until 400L).map(i => (i % 23, i % 41)).toDF("src", "dst")
    val a = Graph.hits(edges, "src", "dst", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Graph.hits(edges.repartition(7), "src", "dst", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }
}
