package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("s", "d")

  test("pageRank matches hand-computed fixed-point iteration") {
    // N=3, r0 = 1e12/3 = 333333333333 each; teleport = (1e12/100)*15/3
    // node1 (outdeg 2) sends 166666666666 to 2 and 3; node2 sends all to 1;
    // node3 dangles (mass drains).
    val got = Graph.pageRank(edges, "s", "d", iterations = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 50000000000L + 333333333333L * 85 / 100),
      (2L, 50000000000L + 166666666666L * 85 / 100),
      (3L, 50000000000L + 166666666666L * 85 / 100)))
  }

  test("pageRank zero iterations is the uniform prior; ranks bounded") {
    val r0 = Graph.pageRank(edges, "s", "d", iterations = 0)
      .as[(Long, Long)].collect().toMap
    assert(r0.values.toSet === Set(1000000000000L / 3))
    val r5 = Graph.pageRank(edges, "s", "d", iterations = 5)
      .agg(sum(col("rank"))).as[Long].head()
    assert(r5 > 0L && r5 <= 1000000000000L) // mass only drains, never grows
  }

  test("pageRank dedups parallel edges and is layout-invariant") {
    val dup = edges.union(edges).union(edges)
    val a = Graph.pageRank(dup.repartition(13), "s", "d", iterations = 3)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(edges.coalesce(1), "s", "d", iterations = 3)
      .orderBy("node").collect().toSeq
    assert(a === b)
  }

  test("pageRank empty graph returns empty") {
    val e = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(Graph.pageRank(e, "s", "d", iterations = 2).count() === 0L)
  }

  test("pageRankPersonalized: mass stays near the seed set, decays with distance") {
    // chain 1 -> 2 -> 3 -> 4, seed {1}: at (near) stationarity rank decays
    // strictly along the chain (at FEW iterations the seed pulse is still
    // traveling and the far node transiently dominates — iterate past it);
    // the unreachable component {9 -> 8} must score 0
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 8L)).toDF("s", "d")
    val r = Graph.pageRankPersonalized(e, "s", "d", seeds = Seq(1L), iterations = 20)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > r(4L))
    assert(r(9L) === 0L && r(8L) === 0L)
    // uniform-seed PPR over ALL nodes == plain pageRank (same teleport math)
    val all = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val ppr = Graph.pageRankPersonalized(all, "s", "d", Seq(1L, 2L), 2)
      .orderBy("node").collect().toSeq
    val pr = Graph.pageRank(all, "s", "d", 2).orderBy("node").collect().toSeq
    assert(ppr === pr)
    intercept[IllegalArgumentException] {
      Graph.pageRankPersonalized(e, "s", "d", Seq.empty, 2)
    }
    // a seed absent from the graph would silently lose its teleport
    // share (mass is divided by |seeds| but only graph nodes receive
    // it) — must fail loudly, naming the missing ids
    val miss = intercept[IllegalArgumentException] {
      Graph.pageRankPersonalized(e, "s", "d", Seq(1L, 777L), 2)
    }
    assert(miss.getMessage.contains("777"))
  }

  test("triangleCounts: K4 gives 3 per node; stars and paths give none") {
    // K4 has C(4,3)=4 triangles, each node in exactly 3
    val k4 = (for (i <- 0L to 3L; j <- 0L to 3L if i != j) yield (i, j))
      .toDF("s", "d")
    val got = Graph.triangleCounts(k4, "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
    // star (hub 0): many wedges, zero closing edges
    val star = (1L to 6L).map(i => (0L, i)).toDF("s", "d")
    assert(Graph.triangleCounts(star, "s", "d").count() === 0L)
    // path 1-2-3-4
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    assert(Graph.triangleCounts(path, "s", "d").count() === 0L)
  }

  test("triangleCounts: duplicates/reverse/self-loops collapse; layout-invariant") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L)).toDF("s", "d")
    val a = Graph.triangleCounts(messy.repartition(7), "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    val b = Graph.triangleCounts(messy.coalesce(1), "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a === b)
  }
}
