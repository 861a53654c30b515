package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over edge DataFrames. Complements the
  * connected-component operators in [[Dedup]] (min-label fixpoint,
  * large-star/small-star): where components answer "which docs are the
  * same", centrality answers "which sources/hosts matter" — the standard
  * curation signal for weighting a web-scale corpus (PageRank; Page et al.
  * 1999, public).
  *
  * All rank arithmetic is FIXED-POINT (LONG, `scale` = 1e12 units of
  * probability mass) so every iteration is bit-identical under any
  * partition layout — the same determinism contract as the distributed
  * Lloyd trainer in [[Similarity]] — and exactly reproducible by the
  * integer-only DuckDB oracle. Float PageRank would hash-diverge on
  * summation order.
  */
object Graph {

  /** `iterations` rounds of damped PageRank over `edges` (srcCol, dstCol;
    * parallel edges count once — they are deduplicated). Nodes = union of
    * sources and destinations. Returns (node, rank) with rank in `scale`
    * fixed-point units.
    *
    * Semantics: rank'(v) = scale·(100−damp)/100/N + damp/100 · Σ_{u→v}
    * rank(u) div outdeg(u), all divisions integral — dangling-node mass
    * (and integer-division remainders) drain rather than redistribute,
    * the original Page et al. "dangling nodes removed" treatment; ranks
    * therefore sum to slightly under `scale` and comparisons are ordinal,
    * which is all corpus weighting needs.
    *
    * Scale: per iteration one equi-join ranks⋈edges on src (hash
    * partitioned both sides, reused across iterations since the
    * partitioning key never changes) + one aggregation on dst — the
    * standard message-passing shape, shuffle ∝ |edges|. The loop
    * localCheckpoints each iteration like the component fixpoints in
    * [[Dedup.connectedComponents]], so the plan does not grow with
    * `iterations`. Out-degrees are computed once. Skewed in-degree (a hub
    * everyone links to) is a hot reduce key — AQE skew handling applies;
    * out-degree skew is map-side only. */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0, "pageRank: iterations must be >= 0")
    require(dampPct >= 0 && dampPct <= 100, "pageRank: dampPct in [0,100]")
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0L) return nodes.withColumn("rank", lit(0L))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val teleport = scale / 100L * (100L - dampPct) / n

    var ranks = nodes.withColumn("rank", lit(scale / n)).localCheckpoint()
    for (_ <- 0 until iterations) {
      ranks = pageRankStep(ranks, nodes, e, outDeg, teleport, dampPct)
    }
    ranks
  }

  /** Personalized PageRank: identical fixed-point iteration but the
    * teleport mass flows ONLY to `seeds` (split equally, integer
    * division) — relevance propagation from a trusted set (seed-based
    * curation weighting, the PPR variant of Page et al. §6; public).
    * Non-seed nodes receive mass exclusively through links, so rank
    * decays with link distance from the seed set. Same determinism and
    * per-iteration shape as [[pageRank]]. */
  def pageRankPersonalized(
      edges: DataFrame, srcCol: String, dstCol: String, seeds: Seq[Long],
      iterations: Int, dampPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(seeds.nonEmpty, "pageRankPersonalized: empty seed set")
    require(iterations >= 0, "pageRankPersonalized: iterations must be >= 0")
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    // Teleport/init mass is divided by |seeds| but only reaches seeds
    // PRESENT in the edge-derived node set — a typo'd or filtered-out
    // seed would silently discard its share and skew every rank. Fail
    // loudly instead (|seeds| is driver-small, so this count is cheap).
    val missingSeeds = seeds.toSet --
      nodes.filter(col("node").isin(seeds: _*))
        .collect().map(_.getLong(0)).toSet
    require(missingSeeds.isEmpty,
      s"pageRankPersonalized: seeds absent from graph (their teleport " +
        s"share would be silently lost): ${missingSeeds.toSeq.sorted.mkString(", ")}")
    val seedShare = scale / 100L * (100L - dampPct) / seeds.length
    val isSeed = col("node").isin(seeds: _*)
    val teleportCol = when(isSeed, lit(seedShare)).otherwise(lit(0L))
    val initShare = scale / seeds.length
    var ranks = nodes
      .withColumn("rank", when(isSeed, lit(initShare)).otherwise(lit(0L)))
      .localCheckpoint()
    for (_ <- 0 until iterations) {
      val contrib = ranks.join(outDeg, ranks("node") === outDeg("src"))
        .select(col("src"), expr("rank div outdeg").as("c"))
        .join(e, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (teleportCol +
            expr(s"coalesce(inflow, 0L) * ${dampPct}L div 100L")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  private def pageRankStep(
      ranks: DataFrame, nodes: DataFrame, e: DataFrame, outDeg: DataFrame,
      teleport: Long, dampPct: Int): DataFrame = {
    val contrib = ranks.join(outDeg, ranks("node") === outDeg("src"))
      .select(col("src"), expr("rank div outdeg").as("c"))
      .join(e, "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("c")).as("inflow"))
    nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(teleport) +
          expr(s"coalesce(inflow, 0L) * ${dampPct}L div 100L")).as("rank"))
      .localCheckpoint()
  }

  /** Per-node triangle counts over the undirected simple graph induced by
    * `edges` (self-loops dropped, parallel/reverse duplicates collapsed).
    * Returns (node, n_triangles) for nodes in ≥ 1 triangle.
    *
    * Algorithm: degree-ordered node-iterator (Suri & Vassilvitskii, WWW
    * 2011, public — "the curse of the last reducer"). Each undirected
    * edge is oriented from the endpoint of lower (degree, id) to the
    * higher; wedges are built only from each node's ORIENTED out-edges,
    * so a hub of degree d that would contribute d²≈10¹² wedges raw
    * contributes only its out-degree², and Σ outdeg² = O(m^1.5) total —
    * the property that makes exact triangle counting feasible on
    * power-law graphs at 100 TB. Closing edges are probed with one
    * equi-join against the canonical edge set. All joins are
    * hash-partitioned equi-joins; counts are exact integers. */
  /** Semi-supervised label propagation (Zhu & Ghahramani 2002's hard
    * variant, public): seed nodes carry fixed ground-truth labels; each
    * synchronous round, every non-seed node adopts the most frequent
    * label among its currently-labeled neighbors (ties → smallest
    * label, via the struct-max on (count, −label) — deterministic at
    * any layout), recomputed from scratch per round so a node's label
    * can improve as information spreads. Unreached nodes stay absent.
    * The weak-supervision expansion step of a labeling pipeline: a few
    * human labels → graph-consistent labels for the neighborhood.
    *
    * Scale: per round one edge⋈labels equi-join + two grouped
    * aggregates — shuffle ∝ |edges|, bounded rounds, lineage cut per
    * round. Returns (node, label) for seeds ∪ reached nodes. */
  def labelPropagate(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedIdCol: String, seedLabelCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 0, "labelPropagate: iterations must be >= 0")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .filter(col("src") =!= col("dst"))
      .distinct()
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val seed = seeds.select(col(seedIdCol).cast("long").as("node"),
        col(seedLabelCol).cast("long").as("label"))
      .distinct().localCheckpoint()
    var labels = seed
    for (_ <- 0 until iterations) {
      val votes = und.join(labels, und("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
        .groupBy("node", "label").agg(count(lit(1)).as("cnt"))
      val best = votes.groupBy("node")
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("label"))
      labels = seed
        .unionByName(best.join(seed.select("node"), Seq("node"), "left_anti"))
        .localCheckpoint()
    }
    labels
  }

  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).cast("long").as("x"), col(dstCol).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val ranked = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // orient low-(degree, id) → high; (da, a) vs (db, b) is a total order
    val oriented = ranked.select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("w"), col("e1.v").as("p"), col("e2.v").as("q"))
    val tri = wedges.join(und,
        least(col("p"), col("q")) === col("a") &&
          greatest(col("p"), col("q")) === col("b"))
      .select("w", "p", "q")
    tri.select(explode(array(col("w"), col("p"), col("q"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** HITS hubs/authorities (Kleinberg 1999, public): `iterations` rounds
    * of the mutual-reinforcement iteration over the directed graph —
    * auth(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v} auth(v) — with
    * MAX-normalization after every half-step kept in pure integer
    * arithmetic: s ← s·scale div max(s). No float ever enters, so scores
    * are bit-identical under any partition layout (the [[pageRank]]
    * determinism contract; L2 normalization would hash-diverge on
    * summation order, and max-normalization preserves HITS's ordinal
    * structure, which is what curation weighting consumes).
    *
    * Overflow bound: raw sums reach indegree·scale and the normalize
    * multiply reaches rawmax·scale — callers keep nodecount·scale² below
    * 2^63 (the default scale 1e6 admits ~9e6-node graphs; drop scale for
    * bigger ones).
    *
    * Scale: per half-step one edges⋈scores equi-join + one grouped sum
    * (shuffle ∝ |edges|, map-side combined) + a 1-row max broadcast;
    * lineage cut per iteration. Returns (node, hub, auth) over all graph
    * nodes, zeros included. */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "hits: iterations must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()

    def normalize(scores: DataFrame): DataFrame =
      scores.crossJoin(broadcast(scores.agg(max(col("s")).as("m"))))
        .select(col("node"), expr(s"(s * ${scale}L) div m").as("s"))

    var hub = nodes.withColumn("s", lit(scale)).localCheckpoint()
    var auth = hub
    for (_ <- 0 until iterations) {
      auth = normalize(
        e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(col("s")).as("s")))
        .localCheckpoint()
      hub = normalize(
        e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
          .groupBy(col("src").as("node")).agg(sum(col("s")).as("s")))
        .localCheckpoint()
    }
    nodes
      .join(hub.withColumnRenamed("s", "hub"), Seq("node"), "left")
      .join(auth.withColumnRenamed("s", "auth"), Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  /** k-core peeling (Seidman 1983, public): up to `rounds` synchronous
    * rounds of "remove every node with degree < k" over the undirected
    * simple graph. Returns (node, peel_round) for every node of the
    * graph — peel_round = the round that removed it (1-based), or NULL
    * for survivors: after convergence those are exactly the k-core; the
    * dense subgraph filter used to separate link-farm/boilerplate hosts
    * from organically-linked ones in web-corpus curation.
    *
    * Determinism: synchronous peeling is order-free — round r removes
    * all nodes whose degree in the round-(r−1) subgraph is < k, so the
    * result is a pure function of the graph, any partitioning.
    *
    * Scale: each round is one degree aggregate (shuffle ∝ surviving
    * |edges|, map-side combined) + two anti-joins on the removed set
    * (broadcast-sized in practice — the set shrinks geometrically);
    * lineage cut per round via localCheckpoint, convergence detected by
    * an exact removed-count == 0 test so `rounds` is a cap, not a cost.
    * The peeled-subgraph sequence is monotone decreasing — total work ≤
    * rounds · |edges|, no quadratic blowup. */
  def kCorePeel(
      edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "kCorePeel: k must be >= 1")
    require(rounds >= 1, "kCorePeel: rounds must be >= 1")
    val e0 = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
    var adj = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    val nodes = adj.select(col("u").as("node")).distinct().localCheckpoint()
    val spark = edges.sparkSession
    var removed = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("peel_round",
          org.apache.spark.sql.types.LongType))))
    var alive = nodes
    var r = 1
    var converged = false
    while (r <= rounds && !converged) {
      // peel by complement: keep = degree ≥ k in the SURVIVING subgraph,
      // so a node whose every neighbor peeled (degree 0, absent from the
      // aggregate) is correctly removed too
      val keep = adj.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("u").as("node")).localCheckpoint()
      val rm = alive.join(keep, Seq("node"), "left_anti")
        .withColumn("peel_round", lit(r.toLong)).localCheckpoint()
      if (rm.isEmpty) converged = true
      else {
        removed = removed.unionByName(rm).localCheckpoint()
        alive = keep
        adj = adj
          .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
          .localCheckpoint()
      }
      r += 1
    }
    nodes.join(removed, Seq("node"), "left")
  }
}
