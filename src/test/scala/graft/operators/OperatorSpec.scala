package graft.operators

import graft.SparkSpec
import graft.functions.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Operator semantics mirrored from the reference's unit/integration tests
  * (package merge last-wins, compaction, entity resolution idempotence) plus
  * specs for the rows-only (non-oracle) operators. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("mergePackages: last CARRYING package wins per column (dict.update)") {
    val p1 = Seq((1L, 10L, Some(1.0), 1L), (2L, 10L, Some(2.0), 2L))
      .toDF("e", "ts", "a", "seq")
    val p2 = Seq((1L, 10L, Some(9.0), 3L), (2L, 10L, None: Option[Double], 4L))
      .toDF("e", "ts", "a", "seq")
    val p3 = Seq((1L, 10L, 7.0, 5L)).toDF("e", "ts", "b", "seq")
    val m = PackageOps.mergePackages(Seq(p1, p2, p3), Seq("e", "ts"), "seq")
      .sort("e").collect()
    assert(m(0).getAs[Double]("a") == 9.0) // later carrying package wins
    assert(m(0).getAs[Double]("b") == 7.0) // column union
    // p2 CARRIES column a with a null → the null clobbers, exactly like
    // the reference's dict.update() (datapackage.py:223-258)
    assert(m(1).isNullAt(m(1).fieldIndex("a")))
    assert(m(1).isNullAt(m(1).fieldIndex("b"))) // p3 never carried e=2
    // p3 does NOT carry a → e=1's a untouched by it despite higher seq
  }

  test("resolveHash is idempotent and collision-stable across retries") {
    val dim = Seq(("alpha", 1L), ("beta", 2L)).toDF("name", "id")
    val names = Seq("alpha", "gamma", "delta", "gamma").toDF("name")
    val r1 = EntityResolution.resolveHash(names, dim, "node").sort("name").collect()
    val r2 = EntityResolution.resolveHash(names, dim, "node").sort("name").collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq) // deterministic
    assert(r1.find(_.getString(0) == "alpha").get.getLong(1) == 1L) // existing kept
    assert(r1.length == 3) // distinct names
  }

  test("compact keeps only change points (null-safe)") {
    val h = Seq(
      (1L, 1L, Some("a")), (1L, 2L, Some("a")), (1L, 3L, None: Option[String]),
      (1L, 4L, None: Option[String]), (1L, 5L, Some("a"))
    ).toDF("e", "ts", "v")
    val c = AttributeOps.compact(h, "e", Seq("ts"), Seq("v")).sort("ts").collect()
    assert(c.map(_.getLong(1)).toSeq == Seq(1L, 3L, 5L)) // a, null, a
  }

  test("embedding near-dup: duplicate docs collapse to one keeper") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup
      (3L, "completely different text about spark catalyst optimizer plans"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today") // near
    ).toDF("doc_id", "text")
    val emb = TextAnalysis.hashEmbedding(docs, "doc_id", "text", 16)
    val keepers = Dedup.embeddingNearDups(emb, "doc_id", "embedding",
        nBits = 2, minCos = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers(1L) == 1L)
    assert(keepers(2L) == 1L) // identical embedding → same bucket, cos 1.0
    assert(keepers(3L) == 3L) // unrelated doc keeps itself
    assert(keepers(4L) == 1L) // near-dup folds to the smallest id
  }

  test("connectedKeepers collapses duplicate chains to one component keeper") {
    val all = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1~2~3~4 (no direct 1-4 edge) + isolated pair 5~6
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id1", "id2")
    val keepers = graft.functions.Dedup.connectedKeepers(all, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(keepers(_) == 1L)) // chain collapses
    assert(keepers(5L) == 5L && keepers(6L) == 5L)
  }

  test("connectedKeepersStar equals the min-label fixpoint; deep chains converge in O(log n)") {
    // a 64-deep chain: min-label needs 63 rounds (> its default bound of
    // 20); star contraction lands it comfortably inside maxIter = 10
    val n = 64
    val all = (1L to n.toLong).toDF("doc_id")
    val chain = (1L until n.toLong).map(i => (i, i + 1)).toDF("id1", "id2")
    val starLabels = graft.functions.Dedup.connectedKeepersStar(
        all, "doc_id", chain, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to n.toLong).forall(starLabels(_) == 1L))
    // random-ish multi-component graph: both algorithms, identical labels
    val rnd = new scala.util.Random(11)
    val ids = (1L to 40L)
    val pairs = Seq.fill(30)((rnd.nextInt(40) + 1L, rnd.nextInt(40) + 1L))
      .filter(p => p._1 != p._2).toDF("id1", "id2")
    val allR = ids.toDF("doc_id")
    val a = graft.functions.Dedup.connectedKeepers(allR, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = graft.functions.Dedup.connectedKeepersStar(allR, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // string ids: min is order-based, so lexicographic components work
    // (string ids always take the distributed star loop)
    val sAll = Seq("a", "b", "c", "z").toDF("doc_id")
    val sPairs = Seq(("a", "b"), ("b", "c")).toDF("id1", "id2")
    val s = graft.functions.Dedup.connectedKeepersStar(sAll, "doc_id", sPairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(s("a") == "a" && s("b") == "a" && s("c") == "a" && s("z") == "z")
    // driver-side union-find (small long-id edge sets) must agree with
    // the distributed star loop forced via driverMaxEdges = 0
    val dLab = graft.functions.Dedup.connectedKeepersStar(allR, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val distLab = graft.functions.Dedup.connectedKeepersStar(
        allR, "doc_id", pairs, driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dLab == distLab)
    // empty edge set: everyone keeps themselves, no loop rounds
    val eLab = graft.functions.Dedup.connectedKeepersStar(
        allR, "doc_id", pairs.limit(0))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(eLab == ids.map(i => (i, i)).toSet)
  }

  test("clusterRepresentatives picks the highest-quality copy, ties to smaller id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "keeper")
    val scores = Seq((1L, 100L), (2L, 400L), (3L, 400L), (5L, 10L), (6L, 9L))
      .toDF("doc_id", "n_chars")
    val reps = graft.functions.Dedup.clusterRepresentatives(
        labels, "doc_id", "keeper", scores, "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // cluster 1: docs 2 and 3 tie at 400 → smaller id 2 wins (not min-id 1)
    assert(Seq(1L, 2L, 3L).forall(reps(_) == 2L))
    // cluster 5: 5 outscores 6
    assert(reps(5L) == 5L && reps(6L) == 5L)
  }

  test("clusterRepresentatives works with STRING doc ids (no numeric cast)") {
    // connectedKeepers documents string ids as supported; the natural
    // composition feeds them straight into clusterRepresentatives
    val all = Seq("doc-a", "doc-b", "doc-c", "doc-z").toDF("doc_id")
    val pairs = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c")).toDF("id1", "id2")
    val labels = Dedup.connectedKeepers(all, "doc_id", pairs)
    val scores = Seq(("doc-a", 10L), ("doc-b", 40L), ("doc-c", 40L), ("doc-z", 1L))
      .toDF("doc_id", "n_chars")
    val reps = Dedup.clusterRepresentatives(labels, "doc_id", "keeper",
        scores, "n_chars")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(reps.values.forall(_ != null)) // string ids must not null out
    // doc-b and doc-c tie at 40 → lexicographically smaller id doc-b wins
    assert(Seq("doc-a", "doc-b", "doc-c").forall(reps(_) == "doc-b"))
    assert(reps("doc-z") == "doc-z") // singleton is its own representative
  }

  test("clusterRepresentatives: randomized argmax/min-id law, ties included") {
    // heavy tie density on purpose: scores drawn from {0..4} so most
    // components exercise the min-id tie-break the round-7 fix rewrote
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val label = (0 until n).map(i => i.toLong -> rnd.nextInt(8).toLong).toMap
      val score = (0 until n).map(i => i.toLong -> rnd.nextInt(5).toLong).toMap
      val labels = label.toSeq.toDF("doc_id", "keeper")
      val scores = score.toSeq.toDF("doc_id", "n_chars")
      val reps = Dedup.clusterRepresentatives(
          labels, "doc_id", "keeper", scores, "n_chars")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(reps.length == n)
      val expected = label.groupBy(_._2).map { case (c, members) =>
        val best = members.keys.map(score).max
        c -> members.keys.filter(score(_) == best).min
      }
      reps.foreach { case (id, c, rep) =>
        assert(c == label(id), s"seed $seed: doc $id component drifted")
        assert(rep == expected(c),
          s"seed $seed: component $c rep $rep != expected ${expected(c)}")
      }
    }
  }

  test("trigger weight/condition are arbitrary SQL fragments") {
    val kpi = Seq((1L, 10L, 55.0), (2L, 10L, 5.0)).toDF("entity_id", "timestamp", "power")
    val out = TriggerOps.createNotifications(kpi, TriggerRule(
      "r", Map("max_power" -> 50.0), "power > max_power",
      "CASE WHEN power > 54 THEN 9 ELSE 1 END",
      concat(lit("p="), col("power"))))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("weight") == 9L)
    assert(out.head.getAs[String]("details") == "p=55.0")
  }

  test("multimodal decode parses real headers; unknown bytes degrade honestly") {
    val df = Seq(
      (1L, Multimodal.synthPng(640, 480)),
      (2L, Multimodal.synthGif(320, 200)),
      (3L, "not an image".getBytes("UTF-8"))
    ).toDF("id", "blob")
    val d1 = Multimodal.decode(df, "id", "blob").collect().sortBy(_.id)
    val d2 = Multimodal.decode(df, "id", "blob").collect().sortBy(_.id)
    assert(d1.toSeq == d2.toSeq) // deterministic
    assert(d1(0).format == "png" && d1(0).width == 640 && d1(0).height == 480)
    assert(d1(1).format == "gif" && d1(1).width == 320 && d1(1).height == 200)
    assert(d1(2).format == "unknown" && d1(2).width == 0 && d1(2).height == 0)
    val thumbs = Multimodal.thumbnailPlan(
      Multimodal.decode(df, "id", "blob"), 64).collect()
    assert(thumbs.forall(r => r.getInt(1) <= 64 && r.getInt(2) <= 64))
  }

  test("minhash signature: identical shingle sets get identical signatures") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(
      Dedup.shingles(TextAnalysis.tokens(docs, "doc_id", "text"), "doc_id", 3),
      "doc_id", 8).sort("doc_id").collect()
    assert(sig(0).toSeq.tail == sig(1).toSeq.tail) // same text → same signature
    assert(sig(0).toSeq.tail != sig(2).toSeq.tail)
  }

  test("xxhash minhash variant: same text same signature, works with banding") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "p q r s t u"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatureXx(
      Dedup.shingles(TextAnalysis.tokens(docs, "doc_id", "text"), "doc_id", 3),
      "doc_id", 8).sort("doc_id").collect()
    assert(sig(0).toSeq.tail == sig(1).toSeq.tail)
    assert(sig(0).toSeq.tail != sig(2).toSeq.tail)
    val pairs = Dedup.lshCandidates(
      Dedup.lshBuckets(Dedup.minhashSignatureXx(
        Dedup.shingles(TextAnalysis.tokens(docs, "doc_id", "text"), "doc_id", 3),
        "doc_id", 8), "doc_id", 4, 2), "doc_id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("simhash of near-identical docs has small hamming distance") {
    val docs = Seq(
      (1L, "spark query engine with fast columnar scans and hash joins all day"),
      (2L, "spark query engine with fast columnar scans and hash joins all night"),
      (3L, "completely different words about cooking pasta with tomato sauce")
    ).toDF("doc_id", "text")
    val sh = Dedup.simhash(TextAnalysis.tokens(docs, "doc_id", "text"), "doc_id")
      .sort("doc_id").collect().map(_.getLong(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0), sh(1)) < ham(sh(0), sh(2)))
  }

  test("bucketed ANN candidates are a subset of exact all-pairs at the same threshold") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val l = e.select(col("vec_id").as("a"), col("embedding").as("v1"))
    val r = e.select(col("vec_id").as("b"), col("embedding").as("v2"))
    val exact = l.join(r, col("a") < col("b"))
      .withColumn("cos", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("cos") >= 0.3).select("a", "b")
    val bucketed = Similarity.bucketedNeighbors(e, "vec_id", "embedding", 8, 0.3)
      .select(col("id1").as("a"), col("id2").as("b"))
    assert(bucketed.count() > 0)
    assert(bucketed.join(exact, Seq("a", "b"), "left_anti").count() == 0)
  }
}
