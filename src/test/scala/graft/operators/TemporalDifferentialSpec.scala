package graft.operators

import graft.SparkSpec
import graft.functions.Graph
import org.apache.spark.sql.functions._

/** Differential armor for the composed-operator tier: each scalable
  * formulation is checked against a naive reference implementation on
  * deterministic pseudo-random data (hash-derived — no RNG state, every
  * run identical). The naive forms are exactly what the operators exist
  * to avoid at scale (cartesian filters, O(n³) loops, driver matrices),
  * which is what makes them trustworthy oracles at test size. */
class TemporalDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def h(i: Long, salt: Long): Long = {
    // splitmix64-style scramble — deterministic, well-spread
    var z = i * 0x9e3779b97f4a7c15L + salt
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4b96fL
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & 0x7fffffffffffffffL
  }

  test("intervalOverlapJoin == naive cartesian filter on random intervals") {
    for (salt <- Seq(1L, 2L, 3L)) {
      val a = (0 until 120).map { i =>
        val lo = h(i, salt) % 5000
        (i.toLong, lo, lo + 1 + h(i, salt + 7) % 800) // spans 1..800
      }.toDF("aid", "alo", "ahi")
      val b = (0 until 90).map { i =>
        val lo = h(i, salt + 13) % 5000
        (i.toLong, lo, lo + 1 + h(i, salt + 19) % 50) // short intervals
      }.toDF("bid", "blo", "bhi")
      val fast = TemporalOps.intervalOverlapJoin(a, "alo", "ahi", b, "blo", "bhi", 64L)
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      val naive = a.crossJoin(b)
        .filter(col("alo") < col("bhi") && col("blo") < col("ahi"))
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      assert(fast === naive, s"divergence at salt=$salt")
    }
  }

  test("pointInIntervalJoin == naive cartesian filter on random points") {
    for (salt <- Seq(4L, 5L)) {
      val pts = (0 until 300).map(i => (i.toLong, h(i, salt) % 5000)).toDF("pid", "pt")
      val ivs = (0 until 80).map { i =>
        val lo = h(i, salt + 31) % 5000
        (i.toLong, lo, lo + h(i, salt + 37) % 400) // includes EMPTY (span 0)
      }.toDF("iid", "lo", "hi")
      val fast = TemporalOps.pointInIntervalJoin(pts, "pt", ivs, "lo", "hi", 128L)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val naive = pts.crossJoin(ivs)
        .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(fast === naive, s"divergence at salt=$salt")
    }
  }

  test("triangleCounts == brute-force triple enumeration on random graphs") {
    for (salt <- Seq(6L, 7L)) {
      val edges = (0 until 220).map(i =>
        (h(i, salt) % 28, h(i, salt + 3) % 28)).toDF("s", "d")
      val fast = Graph.triangleCounts(edges, "s", "d")
        .as[(Long, Long)].collect().toMap
      // naive: canonical undirected set, count all closing triples
      val und = edges.select(least(col("s"), col("d")).as("a"),
          greatest(col("s"), col("d")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .as[(Long, Long)].collect().toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.distinct.sorted
      def adj(x: Long, y: Long) = und.contains((math.min(x, y), math.max(x, y)))
      val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
        (x, y, z) = (nodes(i), nodes(j), nodes(k))
        if adj(x, y) && adj(y, z) && adj(x, z)
      } { naive(x) += 1; naive(y) += 1; naive(z) += 1 }
      assert(fast === naive.toMap, s"divergence at salt=$salt")
    }
  }

  test("pageRank == driver-side reference iteration on random graphs") {
    val salt = 8L
    val edges = (0 until 150).map(i =>
      (h(i, salt) % 40, h(i, salt + 3) % 40)).toDF("s", "d")
    val fast = Graph.pageRank(edges, "s", "d", iterations = 4)
      .as[(Long, Long)].collect().toMap
    // reference: same integer fixed-point arithmetic, plain Scala maps
    // parallel-edge dedup only; self-loops stay (pageRank keeps them too)
    val e = (0 until 150).map(i => (h(i, salt) % 40, h(i, salt + 3) % 40)).distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val n = nodes.size
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val scale = 1000000000000L
    val teleport = scale / 100L * 15L / n
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 0 until 4) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- e) inflow(v) += rank(u) / out(u)
      rank = nodes.map(nd => nd -> (teleport + inflow(nd) * 85L / 100L)).toMap
    }
    assert(fast === rank, "pageRank diverged from the reference iteration")
  }
}
