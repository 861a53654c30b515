package graft.functions

import graft.SparkSpec

/** Hand-computed k-core peeling: cascade order, isolated-survivor
  * removal (a node whose every neighbor peeled must peel next round,
  * not linger as phantom core), and convergence under the round cap. */
class KCoreSpec extends SparkSpec {
  private lazy val si = spark.implicits
  import si._

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8) =
    Graph.kCorePeel(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (if (r.isNullAt(1)) None else Some(r.getAs[Long]("peel_round"))))
      .toMap

  test("pendant chain peels outside-in; clique survives as the 2-core") {
    // 4-clique {1,2,3,4}, chain 4–5–6
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6))
    val got = peel(edges, k = 2)
    assert(got(6L) == Some(1L)) // degree 1
    assert(got(5L) == Some(2L)) // degree drops to 1 after 6 peels
    for (n <- 1L to 4L) assert(got(n).isEmpty, s"clique node $n must survive")
  }

  test("a hub whose every leaf peeled is removed, not phantom core") {
    // star: center 10, leaves 11..13 — center has degree 3 >= k initially
    val edges = Seq[(Long, Long)]((10, 11), (10, 12), (10, 13))
    val got = peel(edges, k = 2)
    assert(got(11L) == Some(1L) && got(12L) == Some(1L) && got(13L) == Some(1L))
    assert(got(10L) == Some(2L), "center must peel once isolated")
  }

  test("round cap stops peeling; survivors report NULL") {
    // chain 1–2–3–4–5: k=2 peels endpoints inward, needs 2 rounds for 2/4
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 5))
    val capped = peel(edges, k = 2, rounds = 1)
    assert(capped(1L) == Some(1L) && capped(5L) == Some(1L))
    assert(capped(2L).isEmpty && capped(3L).isEmpty && capped(4L).isEmpty)
    val full = peel(edges, k = 2)
    assert(full.values.forall(_.isDefined), "whole chain eventually peels")
  }

  test("parallel and reversed edges count once; self-loops ignored") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (3, 1))
    // triangle 1-2-3 → 2-core, every duplicate collapsed
    val got = peel(edges, k = 2)
    assert(got.size == 3 && got.values.forall(_.isEmpty))
  }
}
