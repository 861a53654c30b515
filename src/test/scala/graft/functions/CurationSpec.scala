package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-5 curation-operator specs: MinHash Jaccard estimation, duplicated
  * n-gram span coverage (exact-substr detection), DSIR importance weights,
  * deterministic hash splits, and product-quantization codes. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def toks(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.tokens(df, "doc_id", "text")

  test("canonicalKeepers: case/punct/whitespace variants fold to one " +
      "keeper; distinct content does not") {
    val d = Seq(
      (1L, "Hello, world!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "goodbye world"),
      (5L, "hello,world"))          // punct folds to a separator too
      .toDF("doc_id", "text")
    val fates = graft.functions.Dedup.canonicalKeepers(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(4))).toMap
    assert(Seq(1L, 2L, 3L, 5L).forall(fates(_)._1 == 1L))
    assert(fates(1L)._2 == "kept" &&
      Seq(2L, 3L, 5L).forall(fates(_)._2 == "dup"))
    assert(fates(4L) == (4L, "kept"))
    // exactly one shuffle: a single digest-partitioned Window, no join
    val plan = graft.functions.Dedup.canonicalKeepers(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"canonical dedup must be join-free:\n$plan")
  }

  test("minhashEstimate: identical docs estimate 1.0, disjoint docs 0.0") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(Dedup.shingles(toks(df), "doc_id", 3), "doc_id", 8)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id1", "id2")
    val out = Dedup.minhashEstimate(sig, pairs, "doc_id", 8)
      .orderBy("id1", "id2").collect()
    assert(out(0) == Row(1L, 2L, 8L, 1.0))   // identical shingle sets
    assert(out(1) == Row(1L, 3L, 0L, 0.0))   // disjoint shingle sets
  }

  test("chunkTokens: sliding windows cover every token, overlap = C−S") {
    val df = Seq((1L, "t0 t1 t2 t3 t4"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 3L, "t0 t1 t2"),
      (1L, 1L, 3L, "t2 t3 t4"), // t2 shared: overlap = 1
      (1L, 2L, 1L, "t4"),       // trailing partial chunk, never empty
      (2L, 0L, 1L, "a"),
      (3L, 0L, 1L, ""))) // split("") yields one empty token, like tokens()
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize = 2, stride = 3)
    }
  }

  test("duplicatedSpans: only positions covered by repeated n-grams count") {
    // docs 1 and 2 share an 8-token run; doc 3 is unique; doc 4 repeats a
    // run WITHIN itself (within-doc repetition also counts — Lee et al.
    // dedup any substring occurring more than once in the corpus)
    val shared = "a b c d e f g h"
    val df = Seq(
      (1L, s"x1 y1 $shared z1"),
      (2L, s"x2 $shared z2 w2"),
      (3L, "p q r s t u v w x y z"),
      (4L, s"$shared $shared")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(toks(df), "doc_id", n = 8, flagAt = 0.5)
      .orderBy("doc_id").collect()
    // docs 1/2: exactly the 8 shared positions are covered (8/11 > 0.5 →
    // flagged for drop)
    assert(out(0) == Row(1L, 11L, 8L, 8.0 / 11, true))
    assert(out(1) == Row(2L, 11L, 8L, 8.0 / 11, true))
    assert(out(2) == Row(3L, 11L, 0L, 0.0, false))
    // doc 4: the run "a..h" occurs at pos 0 and 8 (plus docs 1/2), and the
    // straddling windows (h a b c d e f g etc.) are unique — covered
    // positions are the union of the duplicated windows = all 16
    assert(out(3) == Row(4L, 16L, 16L, 1.0, true))
    // the salt is PHYSICAL only: any salt returns identical rows (the
    // default 16 ran above; 1 disables salting, 5 doesn't divide anything)
    for (s <- Seq(1, 5)) {
      val salted = Dedup.duplicatedSpans(toks(df), "doc_id", n = 8, salt = s)
        .orderBy("doc_id").collect()
      assert(salted.toSeq == out.toSeq, s"salt=$s diverged")
    }
  }

  test("removeDuplicatedSpans: covered tokens drop, order preserved") {
    val shared = "a b c d e f g h"
    val df = Seq(
      (1L, s"x1 y1 $shared z1"),
      (2L, s"x2 $shared z2 w2"),
      (3L, "p q r s t u v w x y z"),
      (4L, s"$shared $shared")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(toks(df), "doc_id", n = 8)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 11L, 3L, "x1 y1 z1"))
    assert(out(1) == Row(2L, 11L, 3L, "x2 z2 w2"))
    assert(out(2) == Row(3L, 11L, 11L, "p q r s t u v w x y z"))
    // fully-duplicated doc keeps its row, empty text
    assert(out(3) == Row(4L, 16L, 0L, ""))
  }

  test("simhashNearDups: banding is exact for the Hamming-3 ball") {
    // pigeonhole: <=3 differing bits across 4 nibble bands leave at least
    // one band intact, so the banded join must find EVERY pair at H<=3 —
    // compare against the brute-force ball
    val rnd = new scala.util.Random(11)
    val sigs = (0L until 60L).map(i => (i, rnd.nextInt(1 << 16).toLong))
    val sig = sigs.toDF("doc_id", "simhash")
    val got = Dedup.simhashNearDups(sig, "doc_id", maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (i, hi) <- sigs; (j, hj) <- sigs if i < j
      h = java.lang.Long.bitCount(hi ^ hj) if h <= 3
    } yield (i, j, h.toLong)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty) // the fixture actually exercises the ball
  }

  test("kmvDistinct: exact below k, sane estimate above, partition-invariant") {
    val small = (0 until 50).map(i => ("g", s"tok$i")) ++
      (0 until 50).map(i => ("g", s"tok$i")) // duplicates must not count
    val out1 = TextAnalysis.kmvDistinct(small.toDF("g", "v"), Seq("g"), "v", k = 128)
      .collect()
    assert(out1.head.getLong(1) == 50L)       // n_minima = distinct values
    assert(out1.head.getDouble(2) == 50.0)    // exact when below k
    val big = (0 until 20000).map(i => ("g", s"tok$i")).toDF("g", "v")
    val est = TextAnalysis.kmvDistinct(big, Seq("g"), "v", k = 256)
      .collect().head.getDouble(2)
    assert(est > 15000 && est < 25000, s"KMV estimate off: $est for 20000")
    // sketch is a pure function of the SET: any partitioning, same result
    val est2 = TextAnalysis.kmvDistinct(big.repartition(13), Seq("g"), "v", k = 256)
      .collect().head.getDouble(2)
    assert(est == est2)
  }

  test("tfIdf: counts exact, corpus-wide term scores 0, rare term outranks common") {
    val df = Seq(
      (1L, "apple apple rare"),
      (2L, "apple banana"),
      (3L, "apple banana")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // tf/df/N exact
    assert(out((1L, "apple")) == ((2L, 3L, 3L, 2.0 * math.log(1.0))))
    assert(out((1L, "rare"))._1 == 1L && out((1L, "rare"))._2 == 1L)
    // a term in EVERY doc carries zero discriminative weight
    assert(out((1L, "apple"))._4 == 0.0)
    // the rare term outranks the common one within doc 1 despite lower tf
    assert(out((1L, "rare"))._4 > out((1L, "apple"))._4)
    assert(out((2L, "banana"))._4 == 1.0 * math.log(3.0 / 2.0))
  }

  test("bm25: saturation bounded by k1+1, long docs penalized, rare terms outrank") {
    val df = Seq(
      (1L, "apple apple apple apple apple apple apple apple rare"),
      (2L, "apple banana"),
      (3L, "apple banana banana banana banana banana banana banana")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(6), r.getDouble(7))).toMap
    // tf saturates: even tf=8 stays under the k1+1 ceiling
    assert(out((1L, "apple"))._2 < 2.2)
    // monotone in tf at equal length: banana(7) > apple(1) within doc 3
    assert(out((3L, "banana"))._2 > out((3L, "apple"))._2)
    // length normalization: the same tf=1 scores higher in the SHORT doc
    assert(out((2L, "apple"))._2 > out((3L, "apple"))._2)
    // idf: 'apple' appears in every doc → its BM25 idf ln(0.5/3.5+1) is
    // small but positive; 'rare' (df=1) outranks it within doc 1 despite
    // 8× lower tf
    assert(out((1L, "rare"))._3 > out((1L, "apple"))._3)
    assert(out((1L, "apple"))._3 > 0.0)
  }

  test("bm25Search: hit count drives rank, rare query term outranks, topN bound") {
    val df = Seq(
      (1L, "hash join merge sort"),          // all 3 query terms
      (2L, "hash hash hash filter scan"),    // saturating tf on one term
      (3L, "sort filter scan group window"), // no hits
      (4L, "merge sort"),                    // 1 hit
      (5L, "join merge scan")                // 2 hits
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(df, "doc_id", "text",
        Seq("hash", "join", "merge"), topN = 3)
      .select("doc_id", "n_hit_toks", "score_scaled")
      .as[(Long, Long, Long)].collect()
    assert(out.length === 3)                    // topN bound, doc 3 excluded
    assert(out.map(_._1).toSet.contains(1L))    // 3-term doc survives the cut
    assert(!out.map(_._1).contains(3L))
    // doc 1 (3 distinct hits) outscores doc 4 (1 hit of a common term)
    val scores = TextAnalysis.bm25Search(df, "doc_id", "text",
        Seq("hash", "join", "merge"), topN = 5)
      .select("doc_id", "score_scaled").as[(Long, Long)].collect().toMap
    assert(scores(1L) > scores(4L))
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Search(df, "doc_id", "text", Seq.empty, 3)
    }
  }

  test("exactIncremental: first occurrence wins across batches, appends stay bounded") {
    val work = java.nio.file.Files.createTempDirectory("graft_incdedup_").toString
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 1L << 55, keyCols = Seq("digest")))
    val b1 = Seq((10L, "alpha"), (11L, "beta"), (12L, "alpha")).toDF("doc_id", "text")
    val b2 = Seq((1L, "alpha"), (2L, "gamma"), (3L, "gamma")).toDF("doc_id", "text")
    val r1 = Dedup.exactIncremental(ps, "d", b1, "doc_id", "text")
      .select("batch_copies", "keeper").as[(Long, Long)].collect().toSet
    assert(r1 === Set((2L, 10L), (1L, 11L))) // alpha keeper=10 (min in batch)
    val r2 = Dedup.exactIncremental(ps, "d", b2, "doc_id", "text")
      .select("batch_copies", "keeper").as[(Long, Long)].collect().toSet
    // alpha already seen: keeper stays 10 even though batch-2 has id 1
    assert(r2 === Set((1L, 10L), (2L, 2L)))
    // idempotent replay: same batch again changes nothing
    val r3 = Dedup.exactIncremental(ps, "d", b2, "doc_id", "text")
      .select("batch_copies", "keeper").as[(Long, Long)].collect().toSet
    assert(r3 === r2)
    assert(ps.readPart("d").get.select("digest").distinct().count() === 3L)
    intercept[IllegalArgumentException] {
      Dedup.exactIncremental(new graft.storage.PartStore(spark,
        graft.storage.PartStoreConfig(work + "2", 100L)), "d", b1, "doc_id", "text")
    }
  }

  test("canonicalizeUnicode folds accents/CJK-adjacent punctuation like " +
      "the ASCII tier folds ASCII; ASCII tier degrades non-ASCII letters") {
    val d = Seq(
      (1L, "Héllo, wörld!"),
      (2L, "héllo   wörld"),
      (3L, "naïve — café"),
      (4L, "naïve café"),
      (5L, "hello world")).toDF("doc_id", "text")
    val uni = d.select(col("doc_id"),
      graft.functions.Dedup.canonicalizeUnicode(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(uni(1L) == uni(2L) && uni(1L) == "héllo wörld")
    assert(uni(3L) == uni(4L) && uni(3L) == "naïve café")
    assert(uni(5L) == "hello world")
    // the ASCII-scoped tier treats the same accented letters as
    // separators — documented, intentional divergence
    val ascii = d.select(col("doc_id"),
      graft.functions.Dedup.canonicalize(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ascii(3L) == "na ve caf")
    // both variants agree on pure-ASCII input (the oracle-gated subset)
    assert(ascii(5L) == uni(5L))
  }

  test("canonicalIncremental: reflowed copies resolve cross-batch; " +
      "raw-exact tier would miss them") {
    val work = java.nio.file.Files.createTempDirectory("graft_cincdedup_").toString
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 1L << 55, keyCols = Seq("digest")))
    val b1 = Seq((10L, "Hello, world!"), (11L, "other doc")).toDF("doc_id", "text")
    // batch 2: a case/punct/spacing reflow of doc 10 + genuinely new text
    val b2 = Seq((1L, "HELLO   world"), (2L, "brand new")).toDF("doc_id", "text")
    val r1 = Dedup.canonicalIncremental(ps, "d", b1, "doc_id", "text")
      .select("batch_copies", "keeper").as[(Long, Long)].collect().toSet
    assert(r1 === Set((1L, 10L), (1L, 11L)))
    val r2 = Dedup.canonicalIncremental(ps, "d", b2, "doc_id", "text")
      .select("batch_copies", "keeper").as[(Long, Long)].collect().toSet
    // the reflow shares doc 10's CANONICAL digest: keeper stays 10 even
    // though batch-2's id 1 is smaller — first occurrence EVER wins
    assert(r2 === Set((1L, 10L), (1L, 2L)))
    // replay idempotence: same batch again changes nothing, appends nothing
    val n = ps.readPart("d").get.count()
    val r3 = Dedup.canonicalIncremental(ps, "d", b2, "doc_id", "text")
      .select("batch_copies", "keeper").as[(Long, Long)].collect().toSet
    assert(r3 === r2)
    assert(ps.readPart("d").get.count() === n)
    // the raw-exact tier keeps the two variants apart (distinct digests) —
    // the canonical tier is a genuinely different equivalence
    assert(Dedup.exact(b1.unionByName(b2), "doc_id", "text")
      .filter(col("copies") > 1).count() === 0L)
  }

  test("tokenBudgetFill: boundary doc admitted, cut respected, deterministic") {
    val df = Seq(
      (1L, "a b c d e", "s1"), (2L, "a b c", "s1"), (3L, "a", "s1"),
      (4L, "x", "s2")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenBudgetFill(df, "doc_id", "text", "source", budget = 6L)
      .select("doc_id", "n_toks", "cum_toks").as[(Long, Long, Long)].collect()
    // every admitted doc started below budget; totals may overshoot by
    // at most one doc (the boundary doc is included)
    assert(out.forall { case (_, n, cum) => cum - n < 6L })
    val perSource = TextAnalysis.tokenBudgetFill(df, "doc_id", "text", "source", 6L)
      .groupBy("source").agg(sum(col("n_toks"))).as[(String, Long)].collect().toMap
    assert(perSource("s2") === 1L) // tiny source fully admitted
    assert(perSource("s1") >= 6L - 4L && perSource("s1") <= 6L + 5L)
    val again = TextAnalysis.tokenBudgetFill(df.repartition(5), "doc_id", "text", "source", 6L)
      .orderBy("doc_id").collect().toSeq
    assert(again === TextAnalysis.tokenBudgetFill(df, "doc_id", "text", "source", 6L)
      .orderBy("doc_id").collect().toSeq)
    intercept[IllegalArgumentException] {
      TextAnalysis.tokenBudgetFill(df, "doc_id", "text", "source", 0L)
    }
  }

  test("tokenBudgetFill: windowed fraction is bounded on a single-source corpus") {
    // 2000 one-token docs, budget 20: the two-phase cut must window only
    // the strata whose running prefix starts below the budget — the
    // admitted region (~20 docs ≈ 3 strata of ~8 docs each) plus the
    // boundary stratum, never all 256 (the one-phase form effectively
    // windowed every doc of the source in ONE task)
    val docs = (1L to 2000L).map(i => (i, "tok", "s")).toDF("doc_id", "text", "source")
    val base = docs.select(col("doc_id"), col("source"),
        lit(1L).as("n_toks"),
        md5(concat(lit("budget:"), col("doc_id").cast("string"))).as("__mk"))
      .withColumn("__stratum", substring(col("__mk"), 1, 2))
    val live = TextAnalysis.tokenBudgetStrata(base, "source", budget = 20L)
    assert(live.count() <= 8L, "budget cut did not bound the windowed strata")
    // and the cut is exact: same admit set + cum_toks as a driver-side
    // replay of the one-phase running sum
    val out = TextAnalysis.tokenBudgetFill(docs, "doc_id", "text", "source", 20L)
      .select("doc_id", "cum_toks").as[(Long, Long)].collect().toMap
    val ordered = base.select("doc_id", "__mk").as[(Long, String)].collect()
      .sortBy { case (id, mk) => (mk, id) }
    val expected = ordered.zipWithIndex
      .takeWhile { case (_, idx) => idx < 20 } // cum_before = idx < budget
      .map { case ((id, _), idx) => id -> (idx + 1L) }.toMap
    assert(out === expected)
  }

  test("containmentEstimate: quoted doc scores ~1 where Jaccard stays small") {
    // B = A's shingles plus many of its own: containment(A in B) = 1,
    // Jaccard = |A|/|B| — the asymmetric case the estimator exists for
    val values = ((0 until 20).map(i => (1L, s"s$i")) ++       // A: 20 shingles
      (0 until 100).map(i => (2L, s"s$i")) ++                  // B ⊇ A, 100 shingles
      (200 until 220).map(i => (3L, s"s$i"))).toDF("doc_id", "shingle")
    val sk = Dedup.kmvDocSketches(values, "doc_id", "shingle", k = 256)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id1", "id2")
    // below k the sketches are the sets: estimates are EXACT
    val full = Dedup.containmentEstimate(sk, "doc_id", pairs, k = 256)
      .select("id2", "jaccard_est", "containment_est").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(full(2L) === ((0.2, 1.0)))  // J = 20/100, containment = 1
    assert(full(3L) === ((0.0, 0.0)))  // disjoint
    // degenerate sketch (doc with zero values → empty minima): NULL
    // estimates, never 0/0 = NaN
    val withEmpty = sk.select(col("doc_id"), col("minima"))
      .union(Seq(99L).toDF("doc_id").withColumn("minima",
        array().cast("array<long>")))
    val degen = Dedup.containmentEstimate(withEmpty, "doc_id",
        Seq((99L, 1L)).toDF("id1", "id2"), k = 256)
      .select("jaccard_est", "containment_est").head()
    assert(degen.isNullAt(1)) // est_a = 0 → no containment estimate
  }

  test("lshIncremental: batch union == full-corpus candidates; replay idempotent") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different text with no shared shingles at all here"),
      (4L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 1
      (5L, "another unrelated document about spark query planning")
    ).toDF("doc_id", "text")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").as[(Long, Long)].collect().toSet
    val full = pairsOf(Dedup.lshCandidates(
      Dedup.lshBuckets(Dedup.minhashSignature(
        Dedup.shingles(graft.functions.TextAnalysis.tokens(docs, "doc_id", "text"),
          "doc_id", 3), "doc_id", 8), "doc_id", 4, 2), "doc_id"))
    val work = java.nio.file.Files.createTempDirectory("graft_lshinc_").toString
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 1L << 55,
        keyCols = Seq("band", "key", "entity_id")))
    val b1 = docs.filter(col("doc_id") <= 2)
    val b2 = docs.filter(col("doc_id") > 2)
    val c1 = pairsOf(Dedup.lshIncremental(ps, "lsh", b1, "doc_id", "text", 4, 2))
    val c2 = pairsOf(Dedup.lshIncremental(ps, "lsh", b2, "doc_id", "text", 4, 2))
    assert((c1 ++ c2) === full, s"incremental union ${c1 ++ c2} != full $full")
    assert(full.contains((1L, 4L)), "exact dup pair must be a candidate")
    // replaying batch 2 overwrites its own state rows and re-emits its pairs
    val c2again = pairsOf(Dedup.lshIncremental(ps, "lsh", b2, "doc_id", "text", 4, 2))
    assert(c2again === c2)
    intercept[IllegalArgumentException] {
      Dedup.lshIncremental(new graft.storage.PartStore(spark,
        graft.storage.PartStoreConfig(work + "2", 100L)), "lsh", b1,
        "doc_id", "text", 4, 2)
    }
  }

  test("nearDupIncremental: as-of keepers match the batch pipeline per schedule") {
    // three near-dup families: {1,4} identical, {2,6} identical (cross-
    // batch), 7 ~ 2 (near), {3,5} unrelated singletons
    val base = "the quick brown fox jumps over the lazy dog tonight again"
    val docs = Seq(
      (1L, base), (2L, base + " extra tail words here"),
      (3L, "completely different text with no shared shingles at all"),
      (4L, base),
      (5L, "another unrelated document about spark query planning"),
      (6L, base + " extra tail words here"),
      (7L, base + " extra tail words here and more")
    ).toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_ndinc_").toString
    def store(name: String, keys: Seq[String]) = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"$work/$name", 1L << 55, keyCols = keys))
    val bs = store("b", Seq("band", "key", "entity_id"))
    val ss = store("s", Seq("entity_id"))
    val ps = store("p", Seq("entity_id"))
    def run(b: org.apache.spark.sql.DataFrame) =
      Dedup.nearDupIncremental(bs, ss, ps, b, "doc_id", "text",
          bands = 4, rowsPerBand = 2, shingleK = 3, sketchK = 256,
          threshold = 0.8)
        .as[(Long, Long)].collect().toMap
    // threshold 0.8: j(1,2) = 9/13 ≈ 0.69 — a CANDIDATE (shared band)
    // that the sketch-verify tier must REJECT; j(1,4) = 1 merges
    val r1 = run(docs.filter(col("doc_id") <= 4))
    assert(r1 === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    // 6 == 2 exactly (cross-batch merge through persisted state);
    // 7 ~ 6 at j = 13/15 ≈ 0.87 chains into the same component
    val r2 = run(docs.filter(col("doc_id") > 4))
    assert(r2(5L) === 5L)
    assert(r2(6L) === 2L, s"cross-batch merge failed: $r2")
    assert(r2(7L) === 2L, s"transitive chain failed: $r2")
    // replay of batch 2 is idempotent (state converged)
    assert(run(docs.filter(col("doc_id") > 4)) === r2)
  }

  test("exactIncremental: empty first batch is a no-op, not a crash") {
    val work = java.nio.file.Files.createTempDirectory("graft_incdedup_e_").toString
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 1L << 55, keyCols = Seq("digest")))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // zero-row store write leaves readPart = None — must return the
    // empty (digest, batch_copies, keeper) frame, not throw on .get
    val r0 = Dedup.exactIncremental(ps, "d", empty, "doc_id", "text")
    assert(r0.columns.toSeq === Seq("digest", "batch_copies", "keeper"))
    assert(r0.count() === 0L)
    // state still works for subsequent real batches
    val r1 = Dedup.exactIncremental(ps, "d",
        Seq((5L, "alpha")).toDF("doc_id", "text"), "doc_id", "text")
      .select("batch_copies", "keeper").as[(Long, Long)].collect().toSet
    assert(r1 === Set((1L, 5L)))
  }

  test("compactParents: pointer doubling flattens chains to roots") {
    val work = java.nio.file.Files.createTempDirectory("graft_cpar_").toString
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 1L << 55, keyCols = Seq("entity_id")))
    // a 5-deep chain 5→4→3→2→1→1 plus a flat pair 10→9→9
    val rows = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 1L),
      (10L, 9L), (9L, 9L)).toDF("entity_id", "parent")
    ps.store("par", rows.select(col("entity_id"),
      col("entity_id").as("timestamp"), col("parent"), lit(1L).as("modified")))
    val changed = Dedup.compactParents(ps, "par")
    assert(changed === 3L) // 5, 4, 3 re-pointed to 1; 2,1,10,9 already flat
    val after = ps.readPart("par").get.select("entity_id", "parent")
      .as[(Long, Long)].collect().toMap
    assert(after === Map(5L -> 1L, 4L -> 1L, 3L -> 1L, 2L -> 1L, 1L -> 1L,
      10L -> 9L, 9L -> 9L))
    assert(Dedup.compactParents(ps, "par") === 0L) // idempotent
  }

  test("bpeTrain: learns the hand-computed merges; run-parity matches greedy") {
    // vocab: "abab" ×3, "ab" ×2, "aaaa" ×2
    // pair counts step 1: (a,b) = 3·2 + 2·1 = 8; (b,a) = 3; (a,a) = 2·3 = 6
    //   → merge 1 = (a,b) freq 8; "abab"→[ab,ab], "ab"→[ab], "aaaa" stays
    // step 2: (ab,ab) = 3; (a,a) = 6 → merge 2 = (a,a) freq 6
    //   "aaaa"→[aa,aa] (greedy on the run: positions 0,2 — run parity)
    // step 3: (ab,ab) = 3; (aa,aa) = 2 → merge 3 = (ab,ab) freq 3
    val docs = Seq(
      (1L, "abab abab abab ab ab"),
      (2L, "aaaa aaaa")
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "doc_id", "text", nMerges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges === Seq(
      (1, "a", "b", 8L), (2, "a", "a", 6L), (3, "ab", "ab", 3L)))
    // partition-invariant (windows are per-word; argmax is ordered)
    val again = TextAnalysis.bpeTrain(docs.repartition(7), "doc_id", "text", 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(again === merges)
    // odd-run greedy: "aaa" run of 2 occurrences takes only the first
    val odd = TextAnalysis.bpeTrain(
      Seq((1L, "aaa aaa")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .as[(Int, String, String, Long)].collect().toSeq
    // step 1: (a,a) freq 2·2 = 4 → "aaa" → [aa, a]; step 2: (aa,a) = 2
    assert(odd === Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("minKProbStored: kBp=10000 equals the full stored sum_p; small " +
      "quotas take the least-probable occurrences first") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a dog ran over a log"),
      (3L, "completely different words here zz qq")).toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_mink_").toString
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 64L, keyCols = Seq("tri")))
    TextAnalysis.charLmCountsAppend(ps, "lm", d, "doc_id", "text", 1L)
    // full quota: min-k degenerates to the whole covered sum. NOT
    // bit-compared: minK folds in (p, tri) order, charLmScoreStored in
    // (tri) order — same terms, different association, last-ULP drift.
    // (Cross-ENGINE exactness holds because the oracle replays the
    // (p, tri) order; this asserts the same-terms property.)
    val full = TextAnalysis.minKProbStored(ps, "lm", d, "doc_id", "text",
        kBp = 10000)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ref = TextAnalysis.charLmScoreStored(ps, "lm", d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for ((id, s) <- full)
      assert(math.abs(s - ref(id)) <= 1e-12 * math.abs(ref(id)), s"$id")
    // tiny quota: n_scored = max(1, n*1/10000) = 1 → sum = the single
    // lowest (p, tri) occurrence's probability
    val one = TextAnalysis.minKProbStored(ps, "lm", d, "doc_id", "text",
        kBp = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(one.values.forall(_._1 == 1L))
    // mean over quota 1 == the minimum per-trigram p of the doc
    for ((id, (_, s)) <- one) assert(s <= full(id) && s > 0.0, s"$id: $s")
  }

  test("cohenKappa: hand-computed matrix, perfect, and negative agreement") {
    // textbook 2x2: diag 45+15, off 15+25 -> po=.60, pe=.54,
    // kappa = .06/.46; fixed point = 1e9*600 div 4600 = 130434782
    val rows = Seq.fill(45)((0L, 0L)) ++ Seq.fill(15)((0L, 1L)) ++
      Seq.fill(25)((1L, 0L)) ++ Seq.fill(15)((1L, 1L))
    val out = TextAnalysis.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .collect()
    assert(out.head.getAs[Long]("kappa_scaled") == 130434782L)
    assert(out.head.getAs[Long]("n_total") == 100L)
    assert(out.head.getAs[Long]("n_agree") == 60L)
    assert(out.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap ==
      Map((0L, 0L) -> 45L, (0L, 1L) -> 15L, (1L, 0L) -> 25L, (1L, 1L) -> 15L))
    // perfect agreement -> exactly 1e9
    val perfect = TextAnalysis.cohenKappa(
      Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("a", "b"), "a", "b").collect()
    assert(perfect.head.getAs[Long]("kappa_scaled") == 1000000000L)
    // perfect DISagreement on a symmetric 2x2 -> exactly -1e9 (the
    // sign-split magnitude division; trunc == floor on the magnitude)
    val neg = TextAnalysis.cohenKappa(
      (Seq.fill(50)((0L, 1L)) ++ Seq.fill(50)((1L, 0L))).toDF("a", "b"),
      "a", "b").collect()
    assert(neg.head.getAs[Long]("kappa_scaled") == -1000000000L)
    // one-label degenerate: kden = 0 -> reported 0, not a crash
    val degen = TextAnalysis.cohenKappa(
      Seq((7L, 7L), (7L, 7L)).toDF("a", "b"), "a", "b").collect()
    assert(degen.head.getAs[Long]("kappa_scaled") == 0L)
  }

  test("winnowIncremental: cross-batch pairs resolve through the stored " +
      "fingerprints; two-batch union == one-shot pairs when caps idle") {
    val base = (1 to 30).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (1L, s"$base a1"),   // batch A (even ids split below)
      (2L, s"$base a2"),   // batch B — near-dup of 1 ACROSS batches
      (3L, s"$base a3"),   // batch A — near-dup of 1 within batch
      (8L, (1 to 20).map(i => s"z$i").mkString(" ")), // unrelated, batch B
      (9L, (1 to 20).map(i => s"y$i").mkString(" "))) // unrelated, batch A
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_wninc_").toString
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 1L << 16,
        keyCols = Seq("h", "entity_id")))
    def run(b: org.apache.spark.sql.DataFrame) =
      Dedup.winnowIncremental(ps, "fp", b, "doc_id", "text",
        k = 4, w = 5, minShared = 2, maxDocFreq = 50)
    val c1 = run(d.filter(col("doc_id") % 2 === 1)) // 1, 3, 9
    val c2 = run(d.filter(col("doc_id") % 2 === 0)) // 2, 8
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 1 sees only its own docs: (1,3)
    assert(pairs(c1) == Set((1L, 3L)))
    // batch 2's doc 2 pairs with BOTH stored near-dups through the store
    assert(pairs(c2) == Set((1L, 2L), (2L, 3L)))
    // with caps idle, the union equals the one-shot batch pair set
    val oneShot = Dedup.winnowPairs(
        Dedup.winnowFingerprints(d, "doc_id", "text", k = 4, w = 5),
        minShared = 2, maxDocFreq = 50)
      .select("id1", "id2")
    assert(pairs(c1.union(c2).distinct()) == pairs(oneShot))
  }

  test("bpeApply: stored rules == trainer's segmentation on the training " +
      "corpus; unseen words segment under the same rules") {
    val train = Seq(
      (1L, "abab abab abab ab ab"),
      (2L, "aaaa aaaa")
    ).toDF("doc_id", "text")
    val rules = TextAnalysis.bpeTrain(train, "doc_id", "text", nMerges = 3)
      .orderBy("step").as[(Int, String, String, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    // encode(training corpus) ≡ bpeVocab, bit for bit
    val fromVocab = TextAnalysis.bpeVocab(train, "doc_id", "text", nMerges = 3)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val fromApply = TextAnalysis.bpeApply(train, "doc_id", "text", rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(fromApply == fromVocab)
    // held-out words: rules (a,b)(a,a)(ab,ab) learned above apply to
    // words the trainer never saw
    val heldout = Seq((9L, "ababab ba aab zz")).toDF("doc_id", "text")
    val seg = TextAnalysis.bpeApply(heldout, "doc_id", "text", rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("ababab") == Seq("abab", "ab")) // (a,b)×3 then (ab,ab) greedy
    assert(seg("ba") == Seq("b", "a"))         // no rule matches
    assert(seg("aab") == Seq("a", "ab"))       // (a,b) wins pos 1; (a,a) gone
    assert(seg("zz") == Seq("z", "z"))         // fully OOV symbols
  }

  test("bpeTrainBatched: batch=1 IS sequential greedy; batched rounds " +
      "equal sequential on disjoint rankings; 512 merges train") {
    val docs = Seq(
      (1L, "abab abab abab ab ab"),
      (2L, "aaaa aaaa"),
      (3L, "xyz xyz wv wv wv wv")
    ).toDF("doc_id", "text")
    val seq6 = TextAnalysis.bpeTrain(docs, "doc_id", "text", nMerges = 6)
      .as[(Int, String, String, Long)].collect().toSeq
    val b1 = TextAnalysis.bpeTrainBatched(docs, "doc_id", "text",
        nMerges = 6, batch = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(b1 === seq6) // batch=1 is the sequential loop, any corpus
    // disjoint-prefix corpus: batched(8) == sequential (the q265 shape)
    val crafted = Seq((1L, ('a' to 'h').zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(50 - i)(c.toString * 4) }.mkString(" "))).toDF("doc_id", "text")
    val sq = TextAnalysis.bpeTrain(crafted, "doc_id", "text", nMerges = 16)
      .as[(Int, String, String, Long)].collect().toSeq
    val bt = TextAnalysis.bpeTrainBatched(crafted, "doc_id", "text",
        nMerges = 16, batch = 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(bt === sq)
    // merge budget beyond the sequential trainer's 64-step bound: a
    // 600-word synthetic vocab trains 512 merges in ~512/64 rounds
    val wide = Seq((1L, (1 to 600).map(i =>
      s"w${i}x${i % 7}y${i % 13}z").mkString(" "))).toDF("doc_id", "text")
    val big = TextAnalysis.bpeTrainBatched(wide, "doc_id", "text",
        nMerges = 512, batch = 64)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(big.size == 512)
    assert(big.map(_._1) == (1 to 512)) // dense, ranking-ordered steps
  }

  test("packSequences: global cumsum in id order, boundary crossings, " +
      "partition-invariant") {
    val docsDf = (1 to 300).map(i =>
      (i.toLong, (1 to (i % 17 + 1)).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docsDf, "doc_id", "text", seqLen = 64L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // local reference
    var cum = 0L
    val exp = (1 to 300).map { i =>
      val n = (i % 17 + 1).toLong
      val row = (i.toLong, n, cum, cum / 64, (cum + n - 1) / 64,
        (cum + n - 1) / 64 > cum / 64)
      cum += n
      row
    }
    assert(got.toSeq == exp)
    val again = TextAnalysis.packSequences(docsDf.repartition(17), "doc_id",
        "text", seqLen = 64L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(again.toSeq == exp)
    // the plan has no partition-less window (the cumsum is keyed by the
    // physical partition id)
    val plan = TextAnalysis.packSequences(docsDf, "doc_id", "text", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [sum") ||
      plan.contains("windowspecdefinition(__pid"), plan)
  }

  test("spanCorruptionStats: one span per block, clipped, ~15% masked, " +
      "deterministic") {
    val docsDf = Seq(
      (1L, (1 to 60).map(i => s"t$i").mkString(" ")), // 3 full blocks
      (2L, (1 to 7).map(i => s"t$i").mkString(" ")),  // 1 short block
      (3L, "x"))                                       // 1-token doc
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanCorruptionStats(docsDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (n1, s1, m1, bp1) = out(1L)
    assert(n1 == 60L && s1 == 3L && m1 <= 9L && m1 >= 3L)
    assert(bp1 == m1 * 10000 / 60)
    val (n2, s2, m2, _) = out(2L)
    assert(n2 == 7L && s2 == 1L && m2 >= 1L && m2 <= 3L)
    assert(out(3L) == ((1L, 1L, 1L, 10000L))) // the whole doc masked
    // masks are a pure (id, pos) function: partition layout can't move them
    val again = TextAnalysis.spanCorruptionStats(docsDf.repartition(5),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(again == out)
  }

  test("bigramKneserNey: counts, continuation counts, integer discount") {
    val docsDf = Seq(
      (1L, "a b a b c"),   // (a,b)x2 (b,a) (b,c)
      (2L, "x b"))          // (x,b)
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramKneserNey(docsDf, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // c(a,b)=2; cont_left(a)=|{b}|=1; cont_right(b)=|{a,x}|=2; 4c-3=5
    assert(out(("a", "b")) == ((2L, 1L, 2L, 5L)), out)
    // c(b,a)=1: cont_left(b)=|{a,c}|=2; cont_right(a)=|{b}|=1; 4-3=1
    assert(out(("b", "a")) == ((1L, 2L, 1L, 1L)))
    assert(out(("x", "b")) == ((1L, 1L, 2L, 1L)))
    assert(out.size == 4) // no cross-doc bigram (c,x) ever forms
  }

  test("cdcChunks: insertion-robust boundaries; fixed-stride chunking is not") {
    val words = (1 to 400).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words), (2L, "inserted prefix tokens " + words))
      .toDF("doc_id", "text")
    val ch = TextAnalysis.cdcChunks(docs, "doc_id", "text", maskBits = 4)
      .select("doc_id", "chunk_digest").as[(Long, String)].collect()
    val d1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val d2 = ch.filter(_._1 == 2L).map(_._2).toSet
    // all of doc 1's chunks except (possibly) the first reappear in the
    // shifted doc — the boundary after the first content match re-anchors
    val shared = d1.intersect(d2).size.toDouble / d1.size
    assert(shared >= 0.8, s"CDC lost chunk alignment under insertion: $shared")
    // fixed-stride chunking on the same pair shares almost nothing
    // (3-token shift breaks every 16-token grid chunk)
    val fixed = TextAnalysis.chunkTokens(docs, "doc_id", "text",
        chunkSize = 16, stride = 16)
      .select(col("doc_id"), md5(col("chunk_text")).as("d"))
      .as[(Long, String)].collect()
    val f1 = fixed.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fixed.filter(_._1 == 2L).map(_._2).toSet
    assert(f1.intersect(f2).size.toDouble / f1.size < shared)
    // expected chunk length ≈ 2^4 tokens, and token totals are preserved
    val n = TextAnalysis.cdcChunks(docs, "doc_id", "text", 4)
      .groupBy("doc_id").agg(sum("n_toks")).as[(Long, Long)].collect().toMap
    assert(n(1L) === 400L && n(2L) === 403L)
    intercept[IllegalArgumentException] {
      TextAnalysis.cdcChunks(docs, "doc_id", "text", 0)
    }
  }

  test("sourceOverlapMatrix: exact below k, pairs ordered, null source dropped") {
    val df = Seq(
      (1L, "a b c d", "s1"), (2L, "c d e", "s2"), (3L, "x y", "s3"),
      (4L, "ghost", null.asInstanceOf[String])
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceOverlapMatrix(df, "source", "text", k = 64)
      .select("source_a", "source_b", "n_a", "n_b", "kx", "y", "inter_est")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    // below k the sketches ARE the vocab sets: everything exact
    assert(out.keySet === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    assert(out(("s1", "s2")) === ((4L, 3L, 5L, 2L, 2.0))) // {c,d} shared
    assert(out(("s1", "s3")) === ((4L, 2L, 6L, 0L, 0.0)))
    assert(out(("s2", "s3")) === ((3L, 2L, 5L, 0L, 0.0)))
  }

  test("kmvOverlapEstimate: exact below k, close estimate above") {
    // below k the sketches ARE the sets: estimator must be exact
    val a = (0 until 30).map(i => s"v$i").toDF("v")
    val b = (20 until 50).map(i => s"v$i").toDF("v")
    val r = TextAnalysis.kmvOverlapEstimate(a, b, "v", k = 256)
      .select("kx", "y", "jaccard_est", "union_est", "inter_est").head()
    assert(r.getLong(0) === 50L && r.getLong(1) === 10L)
    assert(r.getDouble(2) === 10.0 / 50.0)
    assert(r.getDouble(3) === 50.0 && r.getDouble(4) === 10.0)
    // above k: estimate within a loose band of truth (J = 1/3)
    val big1 = (0 until 20000).map(i => s"x$i").toDF("v")
    val big2 = (10000 until 30000).map(i => s"x$i").toDF("v")
    val e = TextAnalysis.kmvOverlapEstimate(big1, big2, "v", k = 512)
      .select("jaccard_est", "inter_est").head()
    assert(math.abs(e.getDouble(0) - 1.0 / 3.0) < 0.08, s"J est ${e.getDouble(0)}")
    assert(e.getDouble(1) > 6000 && e.getDouble(1) < 15000, s"inter est ${e.getDouble(1)}")
  }

  test("lshTune picks the S-curve midpoint; curve arithmetic sane") {
    // (1/4)^(1/2) = 0.5 exactly — the unique diff-0 option within budget 16
    assert(Dedup.lshTune(0.5, 16) === ((4, 2)))
    // with budget 64 the steeper exact solution (16 bands of 4) wins
    assert(Dedup.lshTune(0.5, 64) === ((16, 4)))
    // higher thresholds push toward more rows per band / fewer bands
    val (b1, r1) = Dedup.lshTune(0.2, 32)
    val (b2, r2) = Dedup.lshTune(0.9, 32)
    assert(math.pow(1.0 / b1, 1.0 / r1) < math.pow(1.0 / b2, 1.0 / r2))
    // the S-curve's 50% crossing is bracketed around the tuned midpoint
    // (at the midpoint itself P = 1-(1-1/b)^b ≈ 0.63, the MMDS
    // approximation's known offset) and the curve is monotone in s
    val (b, r) = Dedup.lshTune(0.5, 64)
    assert(Dedup.lshCurve(b, r, 0.3) < 0.5 && Dedup.lshCurve(b, r, 0.7) > 0.5)
    assert(math.abs(Dedup.lshCurve(b, r, 0.5) - (1 - math.pow(1 - 1.0 / b, b))) < 1e-12)
    assert(Dedup.lshCurve(b, r, 0.9) > Dedup.lshCurve(b, r, 0.5))
    intercept[IllegalArgumentException](Dedup.lshTune(1.5, 16))
  }

  test("linearScore: bias-only model, monotone in counts, keep = logit>0") {
    val df = Seq((1L, "aa bb"), (2L, "aa bb aa bb"), (3L, "")).toDF("doc_id", "text")
    // zero weights: logit == bias for any doc with tokens; empty doc absent
    val z = TextAnalysis.linearScore(df, "doc_id", "text",
        Seq.fill(8)(0.0), bias = 0.25)
      .select("doc_id", "logit", "keep").as[(Long, Double, Boolean)].collect()
    assert(z.toSet === Set((1L, 0.25, true), (2L, 0.25, true)))
    // uniform positive weights: doubling the text doubles (logit - bias)
    val p = TextAnalysis.linearScore(df, "doc_id", "text",
        Seq.fill(8)(0.5), bias = -1.5)
      .select("doc_id", "logit").as[(Long, Double)].collect().toMap
    assert(math.abs((p(2L) + 1.5) - 2 * (p(1L) + 1.5)) < 1e-12)
    assert(p(1L) == -0.5 && p(2L) == 0.5) // 2 toks * .5 - 1.5 / 4 toks * .5 - 1.5
    intercept[IllegalArgumentException] {
      TextAnalysis.linearScore(df, "doc_id", "text", Seq.empty, 0.0)
    }
  }

  test("CMS: never underestimates, exact without collisions, bounded state, broadcast estimate") {
    val keys = (0 until 200).flatMap(i => Seq.fill(1 + i % 5)(s"key$i"))
    val df = keys.toDF("k")
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // tiny sketch: collisions guaranteed, estimates are still >= exact
    val sk = TextAnalysis.cmsSketch(df, "k", d = 3, w = 16)
    assert(sk.count() <= 3L * 16)
    val est = TextAnalysis.cmsEstimate(df.distinct(), "k", sk, d = 3, w = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k: CMS underestimated ${est(k)} < $c")
    }
    // wide sketch: 200 keys in 3×4096 counters — no collisions, exact
    val skWide = TextAnalysis.cmsSketch(df, "k", d = 3, w = 4096)
    val estWide = TextAnalysis.cmsEstimate(df.distinct(), "k", skWide,
        d = 3, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(estWide(k) == c) }
    // a never-seen key estimates 0 only if all its counters are empty —
    // with w=4096 that is overwhelmingly likely and deterministic here
    val unseen = TextAnalysis.cmsEstimate(
        Seq("never-seen-key-xyz").toDF("k"), "k", skWide, d = 3, w = 4096)
      .collect().head.getLong(1)
    assert(unseen == 0L)
    // partition invariance: the sketch is a pure function of the multiset
    val sk2 = TextAnalysis.cmsSketch(df.repartition(13), "k", d = 3, w = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val sk1 = sk.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(sk1 == sk2)
    // estimate-side plan: sketch is broadcast, no sort-merge join
    val plan = TextAnalysis.cmsEstimate(df.distinct(), "k", sk, 3, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("capPerKey: deterministic per-key cap, partition-invariant, no Window") {
    val docs = (0L until 300L).map(i => (i, s"src_${i % 3}"))
      .toDF("doc_id", "source")
    val capped = TextAnalysis.capPerKey(docs, "source", "doc_id", 20)
    val byKey = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey.values.forall(_ == 20), byKey) // 100 per key, capped to 20
    // keys under the cap keep everything
    val small = TextAnalysis.capPerKey(docs.filter(col("doc_id") < 10), "source",
      "doc_id", 20)
    assert(small.count() == 10)
    // deterministic + partition-invariant: same survivors any layout
    val a = capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = TextAnalysis.capPerKey(docs.repartition(13), "source", "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // map-side bounded aggregate, not a per-key sort
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // NULL keys form their own capped group (null-safe semi-join), exactly
    // like the SQL window oracle's NULL partition
    val withNull = docs.union(
      (1000L until 1030L).map(i => (i, null.asInstanceOf[String]))
        .toDF("doc_id", "source"))
    val cappedNull = TextAnalysis.capPerKey(withNull, "source", "doc_id", 20)
    assert(cappedNull.filter(col("source").isNull).count() == 20)
    // non-integral ids are refused up front instead of silently deleting
    intercept[IllegalArgumentException] {
      TextAnalysis.capPerKey(
        docs.withColumn("doc_id", col("doc_id").cast("string")),
        "source", "doc_id", 20)
    }
  }

  test("temperatureMixture flattens source shares; rates cap at 1") {
    val docs = ((1 to 160).map(i => (i.toLong, "big")) ++
      (161 to 170).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val m = TextAnalysis.temperatureMixture(docs, "source", sqrtIters = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // sqrt weighting: small source upsamples to the cap, big downsamples
    assert(m("small")._2 == 1.0)
    assert(m("big")._2 > 0.5 && m("big")._2 < 1.0, m)
    // composing with stratifiedSample applies the rates deterministically
    val rates = m.map { case (s, (_, r)) => s -> r }
    val sampled = TextAnalysis.stratifiedSample(docs, "doc_id", "source", rates)
    val kept = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 10)        // rate 1 keeps everything
    assert(kept("big") < 160)          // rate < 1 thins the big source
  }

  test("weightedSample: A-ES law — bounded per group, weight-monotone, " +
      "non-positive weights excluded") {
    val docs = ((1 to 50).map(i => (i.toLong, "a", 10.0)) ++
      Seq((51L, "a", 1e9), (52L, "a", 0.0), (53L, "a", -3.0)) ++
      (61 to 65).map(i => (i.toLong, "b", 5.0)))
      .toDF("doc_id", "source", "w")
    val s = TextAnalysis.weightedSample(docs, "doc_id", "source", "w", n = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // bounded per group; group b has only 5 eligible rows
    assert(s.count(_._1 == "a") == 8)
    assert(s.count(_._1 == "b") == 5)
    // ranks are 1..n dense per group
    assert(s.filter(_._1 == "a").map(_._3).sorted.toSeq == (1 to 8))
    // the overwhelming weight wins rank 1 (its key ln(u)/1e9 ≈ 0 beats
    // every weight-10 key with overwhelming probability — and the md5
    // coins are fixed, so this is deterministic here)
    assert(s.find(r => r._1 == "a" && r._3 == 1).map(_._2).contains(51L))
    // zero/negative weights never sampled
    assert(!s.exists(r => r._2 == 52L || r._2 == 53L))
    // determinism: same input → same sample
    val s2 = TextAnalysis.weightedSample(docs, "doc_id", "source", "w", n = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(s.toSet == s2.toSet)
  }

  test("distributionDrift: zero on the corpus itself, positive under " +
      "skew, tokenless group finite") {
    // one group == the corpus: p and q are the same smoothed counts
    val same = Seq(("s", "aa bb cc"), ("s", "aa dd")).toDF("source", "text")
    val r1 = TextAnalysis.distributionDrift(same, "source", "text").collect()
    assert(r1.length == 1 && r1(0).getAs[Long]("n_toks") == 5L)
    assert(r1(0).getAs[Double]("chi2") == 0.0 && r1(0).getAs[Double]("kl") == 0.0)
    // two disjoint vocabularies: both sides diverge from the pooled corpus
    val skew = Seq(("a", "x x x x"), ("b", "y z w v")).toDF("source", "text")
    val r2 = TextAnalysis.distributionDrift(skew, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_toks"), r.getAs[Double]("chi2"), r.getAs[Double]("kl"))).toMap
    assert(r2("a")._2 > 0.0 && r2("a")._3 > 0.0, r2)
    assert(r2("b")._2 > 0.0 && r2("b")._3 > 0.0, r2)
    // KL is a true divergence (≥ 0 by Gibbs) for every group
    assert(r2.values.forall(_._3 >= 0.0), r2)
    // a group whose docs tokenize to nothing: n_toks 0, finite scores
    // (uniform smoothed p vs corpus q), never NULL/NaN
    val empt = Seq(("a", "x y"), ("e", "")).toDF("source", "text")
    val r3 = TextAnalysis.distributionDrift(empt, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_toks"), r.getAs[Double]("chi2"), r.getAs[Double]("kl"))).toMap
    assert(r3("e")._1 == 0L)
    assert(!r3("e")._2.isNaN && !r3("e")._3.isNaN && r3("e")._2 > 0.0)
  }

  test("setSimilarityJoin: exact pair set, boundary Jaccard kept, " +
      "below-threshold dropped") {
    val d = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"), // i=4, union 6 → 2/3 ≥ 3/5
      (3L, "a b x y z"),                    // vs 1: i=2, union 8 → 1/4
      (4L, "a b c d e"),                    // ≡ doc 1 → J = 1
      (5L, "q r s t u v")).toDF("doc_id", "text")
    val out = Dedup.setSimilarityJoin(d, "doc_id", "text", 3, 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(4), r.getDouble(5)))).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)), out)
    assert(out((1L, 4L)) == ((5L, 1.0)))
    assert(out((1L, 2L))._1 == 4L)
    // boundary: J exactly 3/5 survives the integer filter
    val onEdge = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    assert(Dedup.setSimilarityJoin(onEdge, "doc_id", "text", 3, 5).count() == 1)
    // just below: J = 1/2 drops
    val below = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    assert(Dedup.setSimilarityJoin(below, "doc_id", "text", 3, 5).count() == 0)
  }

  test("setSimJoinIncremental: batched emission == one-shot pair set, " +
      "unseen-token batches included") {
    val all = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"), (4L, "a b c d e"),
      (3L, "a b x y z"), (5L, "q r s t u v"),
      (6L, "a b c d g"),        // batch 2, overlaps batch-1 vocab
      (7L, "m n o p"), (8L, "m n o p"))  // batch 2, vocab UNSEEN by the model
    val df = all.toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("ssji").toString
    def st(sub: String) = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"$work/$sub", 500,
        keyCols = Seq("entity_id", "tok")))
    val (t, p, f) = (st("t"), st("p"), st("f"))
    val b1 = df.filter(col("doc_id") <= 5)
    val b2 = df.filter(col("doc_id") > 5)
    val r1 = Dedup.setSimJoinIncremental(t, p, f, "g", b1, "doc_id", "text", 3, 5)
    val r2 = Dedup.setSimJoinIncremental(t, p, f, "g", b2, "doc_id", "text", 3, 5)
    val inc = (r1.collect() ++ r2.collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val oneShot = Dedup.setSimilarityJoin(df, "doc_id", "text", 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(inc == oneShot, s"inc=$inc vs one-shot=$oneShot")
    // the unseen-vocab pair (7, 8) was found despite freq-0 model rows
    assert(inc.exists(x => x._1 == 7L && x._2 == 8L), inc)
  }

  test("setSimJoinIncremental: an old-format (pos/n-less) prefix store " +
      "fails loudly with a rebuild message, not an AnalysisException") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("ssjv1").toString
    def st(sub: String) = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"$work/$sub", 500,
        keyCols = Seq("entity_id", "tok")))
    val (t, p, f) = (st("t"), st("p"), st("f"))
    Dedup.setSimJoinIncremental(t, p, f, "g", df, "doc_id", "text", 3, 5)
    // simulate a v1 store: strip pos/n from the stored prefix part
    val v1 = p.readPart("g").get.drop("pos", "n").localCheckpoint()
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(s"$work/p/g"), true)
    p.store("g", v1)
    val e = intercept[IllegalArgumentException] {
      Dedup.setSimJoinIncremental(t, p, f, "g",
        Seq((3L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 3, 5)
    }
    assert(e.getMessage.contains("rebuild required"), e.getMessage)
  }

  test("suffixDupSpans: exact longest duplicated span per doc, " +
      "cross-doc and within-doc") {
    val docsDf = Seq(
      (1L, "a b c d e f g h i j"),  // shares "a b c d e" with doc 2
      (2L, "x y z a b c d e q r"),
      (3L, "p p p p"),              // internal: "p p p" at pos 0 vs 1
      (4L, "u v w"))                // unique
      .toDF("doc_id", "text")
    val out = Dedup.suffixDupSpans(docsDf, "doc_id", "text", minLen = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((10L, 5L, 4L)), out(1L)) // dup lens 5,4,3,2 at pos 0-3
    assert(out(2L) == ((10L, 5L, 4L)), out(2L)) // same span starting pos 3
    assert(out(3L) == ((4L, 3L, 3L)), out(3L))  // "p p p" at 0 AND 1; "p p" at 2
    assert(out(4L) == ((3L, 0L, 0L)), out(4L))
  }

  test("suffixDupSpans: deterministic under repartition; 128-token cap") {
    val base = (1 to 40).map(i =>
      (i.toLong, (1 to 150).map(j => s"t${(i * 7 + j) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Dedup.suffixDupSpans(base, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.suffixDupSpans(base.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // cap: only the first 128 tokens of the 150 participate
    assert(a.forall(_.getAs[Long]("n_tokens") == 128L))
    // 23-token vocabulary cycling => long duplicated spans exist
    assert(a.exists(_.getAs[Long]("max_dup") >= 8L))
  }

  test("anchorDupIncremental: n_dup_pos equals suffixDupSpans over the " +
      "union; old docs update retroactively") {
    // doc 1 and doc 30 share an 8+-token span, but land in DIFFERENT
    // batches (split below is by doc_id parity): the batch-1 doc's dup
    // only exists once batch 2 arrives — the retroactivity under test
    val docsDf = ((1 to 28).map(i =>
        (i.toLong, (1 to 40).map(j => s"w${(i * 131 + j * 17) % 9973}").mkString(" "))) ++
      Seq((29L, "a b c d e f g h i j k l unique tail one"),
          (30L, "prefix two a b c d e f g h i j k l z")))
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_anch_").toString
    val as = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"$work/a", 1L << 55,
        keyCols = Seq("digest", "gpos")))
    val ds = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"$work/d", 500, keyCols = Seq("entity_id")))
    val b1 = docsDf.filter(col("doc_id") % 2 === 1)
    val b2 = docsDf.filter(col("doc_id") % 2 === 0)
    val r1 = Dedup.anchorDupIncremental(as, ds, "s", b1, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // batch 1 alone: doc 29's partner (30) hasn't arrived
    assert(r1(29L) == 0L, s"doc 29 dup before partner arrived: $r1")
    val r2 = Dedup.anchorDupIncremental(as, ds, "s", b2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // batch 2's doc 30 sees the batch-1 doc 29 through the store:
    // shared 12-token run "a b c d e f g h i j k l" = 5 anchors
    assert(r2(30L) == 5L, s"doc 30 cross-batch dup: $r2")
    // read-time stats are retroactive AND equal the fresh rank chain
    val got = Dedup.anchorDupStats(as, ds, "s")
      .select("doc_id", "n_tokens", "n_dup_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = Dedup.suffixDupSpans(docsDf, "doc_id", "text")
      .select("doc_id", "n_tokens", "n_dup_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == fresh, s"store read != fresh suffixDupSpans chain")
    assert(got.exists { case (d, _, nd) => d == 29L && nd == 5L },
      s"doc 29 not retroactively updated: $got")
    // idempotent replay: re-running batch 2 upserts the same keys
    Dedup.anchorDupIncremental(as, ds, "s", b2, "doc_id", "text").count()
    val again = Dedup.anchorDupStats(as, ds, "s")
      .select("doc_id", "n_tokens", "n_dup_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == fresh)
  }

  test("contaminationSpans: shared spans flag, clean eval scores zero") {
    val train = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      // 10 tokens copied from train doc 1 (t2..t11) then clean tail:
      // anchors at pos 0..2 contaminated (runs of 3), rest clean
      (100L, "t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 c1 c2 c3 c4 c5"),
      (101L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")) // fully clean
      .toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(train, eval_, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 100: 8 anchors total (15 tokens), pos 0..2 are 8-grams fully
    // inside the copied 10 tokens → 3 contaminated, run 3, 3750 bp
    assert(out(100L) == ((8L, 3L, 3L, 3750L)), out(100L))
    assert(out(101L) == ((3L, 0L, 0L, 0L)), out(101L))
  }

  test("ngramPrecision: BLEU clipping (Papineni et al. 2002 fig. ex.)") {
    // the canonical clipping example: candidate = 'the'×7 vs a reference
    // with two 'the' → clip1 = 2 of 7
    val d = Seq(
      (1L, "the the the the the the the"),
      (2L, "the cat is on the mat"),
      (3L, "the cat is on the mat"),   // identical pair 3→4? no: cand 3 ref 4
      (4L, "the cat is on the mat"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("cand_id", "ref_id")
    val out = TextAnalysis.ngramPrecision(pairs, d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("cand_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("len_c") == 7 && r1.getAs[Long]("len_r") == 6)
    assert(r1.getAs[Long]("clip1") == 2 && r1.getAs[Long]("tot1") == 7)
    assert(r1.getAs[Long]("p1_bp") == 2857) // 10000*2/7
    assert(r1.getAs[Long]("clip2") == 0 && r1.getAs[Long]("tot2") == 6)
    val r3 = out(3L) // identical texts: perfect precision both n
    assert(r3.getAs[Long]("p1_bp") == 10000 && r3.getAs[Long]("p2_bp") == 10000)
  }

  test("curriculumInterleave: hardest-first per source, balanced rounds") {
    val d = Seq(
      (1L, "a", 30L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 5L), (5L, "b", 50L), (6L, "b", 5L))
      .toDF("doc_id", "source", "score")
    val out = TextAnalysis.curriculumInterleave(d, "doc_id", "source", "score")
      .orderBy("interleave_pos")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(3), r.getLong(4))).toSeq
    // round 1: a's hardest (doc 1, 30) then b's hardest (doc 5, 50);
    // round 2: a#2 (doc 3, 20) then b#2 (doc 4, score 5, id tiebreak);
    // round 3: a#3 (doc 2) then b#3 (doc 6)
    assert(out == Seq(
      (1L, "a", 1L, 1L), (5L, "b", 1L, 2L),
      (3L, "a", 2L, 3L), (4L, "b", 2L, 4L),
      (2L, "a", 3L, 5L), (6L, "b", 3L, 6L)), out)
  }

  test("charLm store: two appended batches == one-shot counts; stored " +
      "scoring bit-equals fresh") {
    val d = Seq(
      (1L, "the quick brown fox"), (2L, "the quick red fox"),
      (3L, "lorem ipsum dolor sit"), (4L, "pack my box with jugs"))
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_clm_").toString
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 64L, keyCols = Seq("tri")))
    TextAnalysis.charLmCountsAppend(ps, "lm",
      d.filter(col("doc_id") <= 2), "doc_id", "text", 1L)
    TextAnalysis.charLmCountsAppend(ps, "lm",
      d.filter(col("doc_id") > 2), "doc_id", "text", 2L)
    val stored = ps.readPart("lm").get.select("tri", "c3")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = TextAnalysis.charTrigrams(d, "doc_id", "text")
      .groupBy("tri").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored == fresh) // addition-merge == one-shot counts
    val a = TextAnalysis.charLmScoreStored(ps, "lm", d, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.charLmScore(d, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b) // identical model -> bit-identical floats
  }

  test("winnowFingerprints: shared substring >= w+k-1 tokens shares a " +
      "fingerprint; density ~ 2/(w+1)") {
    // docs 1 and 2 share an 8-token run (= w + k - 1 with k=4, w=5):
    // winnowing GUARANTEES at least one common (hash) fingerprint
    val d = Seq(
      (1L, "a1 a2 s1 s2 s3 s4 s5 s6 s7 s8 z1 z2 z3"),
      (2L, "b1 b2 b3 s1 s2 s3 s4 s5 s6 s7 s8 y1"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"))
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(d, "doc_id", "text", k = 4, w = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "guaranteed shared fingerprint missing")
    assert((byDoc(3L) intersect byDoc(1L)).isEmpty) // disjoint text
    // every fingerprint's position is a real gram position of its doc
    assert(fp.forall { case (_, _, pos) => pos >= 0 && pos <= 9 })
    // selection is deterministic under repartition
    val fp2 = Dedup.winnowFingerprints(d.repartition(7), "doc_id", "text",
      k = 4, w = 5).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fp.toSet == fp2.toSet)
  }

  test("winnowKeepers: verified chain collapses to one keeper; " +
      "candidates failing Jaccard stay kept") {
    // doc1 = A, doc2 = A·B, doc3 = B: J(1,2) = J(2,3) = 13/29 ≈ 0.45 ≥ 1/3
    // but J(1,3) = 0 — a true CHAIN with no direct 1–3 pair; components
    // must still collapse all three to keeper 1. Doc 4 shares one 8-token
    // run (= w+k−1 → a GUARANTEED shared fingerprint candidate with 1)
    // but gram-Jaccard ≈ 0.15 < 1/3 — verification must reject it.
    // Doc 5 is disjoint filler.
    val a = (1 to 16).map(i => s"a$i").mkString(" ")
    val b = (1 to 16).map(i => s"b$i").mkString(" ")
    val d = Seq(
      (1L, a),
      (2L, s"$a $b"),
      (3L, b),
      (4L, "a1 a2 a3 a4 a5 a6 a7 a8 " +
        (1 to 20).map(i => s"q$i").mkString(" ")),
      (5L, (1 to 15).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.winnowKeepers(d, "doc_id", "text",
        k = 4, w = 5, minShared = 1, maxDocFreq = 50,
        tauNum = 1, tauDen = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out(1L) == ((1L, "kept")))
    assert(out(2L) == ((1L, "dup")))
    assert(out(3L) == ((1L, "dup"))) // via the chain, not a direct pair
    assert(out(4L) == ((4L, "kept"))) // candidate, but verify rejects
    assert(out(5L) == ((5L, "kept")))
  }

  test("calibrationBins: clamped fixed-width bins, exact pieces") {
    val scored = Seq(
      (1L, -9.0, 0L), // clamps into bin 0
      (2L, -0.1, 0L), // bin 4
      (3L, 0.1, 1L),  // bin 5
      (4L, 0.9, 1L),  // bin 5
      (5L, 9.0, 1L)   // clamps into bin 9
    ).toDF("id", "score", "y")
    val out = TextAnalysis.calibrationBins(scored, "id", "score", "y",
        nBins = 10, lo = -5.0, hi = 5.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    def fp(x: Double) = math.floor(x * (1L << 24) + 0.5).toLong
    assert(out(0L) == ((1L, 0L, fp(-9.0))))
    assert(out(4L) == ((1L, 0L, fp(-0.1))))
    assert(out(5L) == ((2L, 2L, fp(0.1) + fp(0.9))))
    assert(out(9L) == ((1L, 1L, fp(9.0))))
  }

  test("splitLeakage: only train-straddling pairs, holdout-oriented") {
    val pairs = Seq(
      (1L, 2L, 0.95),   // train ~ test  → leak, holdout = 2
      (3L, 4L, 0.93),   // val   ~ train → leak, holdout = 3
      (5L, 6L, 0.99),   // train ~ train → not leakage
      (7L, 8L, 0.97))   // val   ~ test  → not leakage (no train side)
      .toDF("id1", "id2", "cos")
    val splits = Seq(1L -> "train", 2L -> "test", 3L -> "val", 4L -> "train",
      5L -> "train", 6L -> "train", 7L -> "val", 8L -> "test")
      .toDF("doc_id", "split")
    val out = Dedup.splitLeakage(pairs, splits, "doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((2L, "test", 1L), (3L, "val", 4L)), out.toSeq)
  }

  test("materializeTemperatureSample = manual mixture → sample composition") {
    val docs = ((1 to 160).map(i => (i.toLong, "big")) ++
      (161 to 170).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    // manual two-step: collect rates, then stratifiedSample
    val rates = TextAnalysis.temperatureMixture(docs, "source", sqrtIters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val manual = TextAnalysis.stratifiedSample(docs, "doc_id", "source", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val auto = TextAnalysis.materializeTemperatureSample(
        docs, "source", "doc_id", sqrtIters = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(auto == manual)
    assert(auto.nonEmpty && auto.size < 170) // actually thinned something
    // a NULL source is its own mixture group, not silently rate-1: with
    // enough NULL-source rows the group downsamples like any other
    val withNull = ((1 to 160).map(i => (i.toLong, null: String)) ++
      (161 to 170).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val sampledNull = TextAnalysis.materializeTemperatureSample(
        withNull, "source", "doc_id", sqrtIters = 2)
      .filter(col("source").isNull).count()
    assert(sampledNull > 0 && sampledNull < 160, sampledNull)
  }

  test("groupQuantiles: exact R-7 cutoffs drive per-source filters") {
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", i.toLong * 2))).toDF("source", "len")
    val q = TextAnalysis.groupQuantiles(df, Seq("source"), "len",
      Seq("p50" -> 0.5, "p10" -> 0.1))
    val a = q.filter(col("source") === "a").head
    assert(a.getLong(1) == 100)
    assert(a.getDouble(2) == 50.5)  // p50 of 1..100
    assert(a.getDouble(3) == 10.9)  // 1 + 0.1*(100-1) interpolated
    // the intended usage: cutoffs join back as a tiny broadcast frame and
    // drop each source's bottom decile
    val kept = df.join(q.select(col("source"), col("p10")), "source")
      .filter(col("len") >= col("p10"))
    assert(kept.filter(col("source") === "a").count() == 90)
  }

  test("groupQuantiles approx=true: bounded sketch state, near-exact cutoffs") {
    // the scale escape hatch: t-digest state instead of O(distinct)/group.
    // On a bounded domain with generous accuracy the cutoffs land within
    // one domain step of exact — close, but NOT the oracle's R-7 bits
    // (documented trade: gate exact, scale approx).
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", i.toLong * 2))).toDF("source", "len")
    val exact = TextAnalysis.groupQuantiles(df, Seq("source"), "len",
      Seq("p50" -> 0.5, "p90" -> 0.9))
    val approx = TextAnalysis.groupQuantiles(df, Seq("source"), "len",
      Seq("p50" -> 0.5, "p90" -> 0.9), approx = true)
    // same shape: joinable drop-in for the exact frame
    assert(approx.schema.fieldNames.toSeq == exact.schema.fieldNames.toSeq)
    val e = exact.filter(col("source") === "a").head
    val ap = approx.filter(col("source") === "a").head
    assert(math.abs(ap.getDouble(2) - e.getDouble(2)) <= 1.0,
      s"approx p50 ${ap.getDouble(2)} far from exact ${e.getDouble(2)}")
    assert(math.abs(ap.getDouble(3) - e.getDouble(3)) <= 1.0,
      s"approx p90 ${ap.getDouble(3)} far from exact ${e.getDouble(3)}")
  }

  test("kmvDistinct: 52-bit hash keeps the estimate tight at 1e5 distinct") {
    val big = (0 until 100000).map(i => ("g", s"value_$i")).toDF("g", "v")
    val est = TextAnalysis.kmvDistinct(big, Seq("g"), "v", k = 512)
      .collect().head.getDouble(2)
    // KMV std error ≈ 1/sqrt(k-1) ≈ 4.4%; 3σ bound. Deterministic, so a
    // pass is stable — this guards the estimator arithmetic, and a 32-bit
    // hash regression (collision bias) would also surface here.
    assert(math.abs(est - 100000.0) / 100000.0 < 0.14,
      s"KMV estimate off: $est for 100000 distinct")
  }

  test("KMV sketches persist through PartStore and merge across batches") {
    import graft.expressions.MinKLongs
    // two ingest batches of tokens for one source; the scaladoc contract:
    // per-batch sketches stored as array<bigint> columns merge (explode +
    // re-aggregate) to EXACTLY the one-shot sketch of the union
    val b1 = (0 until 3000).map(i => s"tok_$i").toDF("v")
    val b2 = (1500 until 4500).map(i => s"tok_$i").toDF("v")
    val hv = conv(substring(md5(col("v")), 1, 13), 16, 10).cast("long")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.agg(MinKLongs.mink(hv, 64).as("sketch"))
    val base = "target/tmp/kmv_persist"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(base, 86400))
    // one sketch row per (source entity, batch timestamp)
    ps.store("vocab_sketch", sketch(b1).select(
      lit(1L).as("entity_id"), lit(1000L).as("timestamp"),
      col("sketch"), lit(1L).as("modified")))
    ps.store("vocab_sketch", sketch(b2).select(
      lit(1L).as("entity_id"), lit(87000L).as("timestamp"),
      col("sketch"), lit(2L).as("modified")))
    val stored = ps.readPart("vocab_sketch").get
    assert(stored.count() == 2) // two batch rows, two partitions
    // merge: union of minima re-aggregated under the same k
    val mergedSketch = stored
      .select(explode(col("sketch")).as("h"))
      .agg(MinKLongs.mink(col("h"), 64).as("sketch"))
      .head.getSeq[Long](0)
    val oneShot = sketch(b1.union(b2)).head.getSeq[Long](0)
    assert(mergedSketch == oneShot)
  }

  test("Lloyd-refined PQ codebooks beat sampled ones on ADC recall") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").cache()
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallWith(cbs: Seq[Seq[(Int, Seq[Float])]]): Double = {
      val codes = vecs.select(col("vec_id"),
        Similarity.pqCode(col("embedding"), cbs).as("pq_code"))
      val got = Similarity.adcTopK(queries, codes, vecs, "vec_id", "embedding",
          cbs, k = 5, shortlist = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val sampled = recallWith(
      Similarity.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 4, dim = 16))
    val refined = recallWith(
      Similarity.pqCodebooksRefined(vecs, "vec_id", "embedding", m = 4, k = 4, dim = 16))
    // deterministic inputs → deterministic recalls; the refinement must
    // never lose to the raw sample, and must clear a floor the sampled
    // codebook doesn't guarantee
    assert(refined >= sampled, s"refined $refined < sampled $sampled")
    assert(refined >= 0.6, s"refined ADC recall too low: $refined")
  }

  test("canonical 64-bit PQ (m=8, k=256): array codes, recall >= k=16 floor") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 300L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").cache()
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallArray(kCodes: Int): Double = {
      val cbs = Similarity.pqCodebooksRefined(
        vecs, "vec_id", "embedding", m = 8, k = kCodes, dim = 16)
      val codes = Similarity.pqEncodeArray(vecs, "vec_id", "embedding", cbs)
      val got = Similarity.adcTopKArray(queries, codes, vecs,
          "vec_id", "embedding", cbs, k = 5, shortlist = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val floor = recallArray(16)
    val canonical = recallArray(256)
    // 256 centroids per 2-dim subspace over 300 points ≈ lossless codes:
    // the canonical config must meet the small-codebook floor and a high
    // absolute bar (deterministic inputs → deterministic recalls)
    assert(canonical >= floor, s"k=256 recall $canonical < k=16 floor $floor")
    assert(canonical >= 0.8, s"canonical 64-bit PQ recall too low: $canonical")
    // representations agree at a config where all three hold (m=8, k=16
    // → 16^8 < 2^53): the join-based encoder's array equals the
    // literal-inlined Column's, and the packed BIGINT's digits are
    // exactly those subcodes
    val cbs16 = Similarity.pqCodebooksRefined(
      vecs, "vec_id", "embedding", m = 8, k = 16, dim = 16)
    val viaJoin = Similarity.pqEncodeArray(vecs, "vec_id", "embedding", cbs16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Short](1)).toMap
    val both = vecs.select(col("vec_id"),
        Similarity.pqCode(col("embedding"), cbs16).as("packed"),
        Similarity.pqCodeArray(col("embedding"), cbs16).as("arr"))
      .collect()
    both.foreach { r =>
      val packed = r.getLong(1)
      val arr = r.getSeq[Short](2)
      assert(viaJoin(r.getLong(0)) == arr,
        s"vec ${r.getLong(0)}: join-encoded ${viaJoin(r.getLong(0))} != $arr")
      val repacked = arr.zipWithIndex.map { case (c, j) =>
        c.toLong * math.pow(16, j).toLong }.sum
      assert(repacked == packed, s"vec ${r.getLong(0)}: $arr != $packed")
    }
  }

  test("pqCodebooksRefined sampleN: a 32·k sample never loses to a k-row one") {
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 1000L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").cache()
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(sampleN: Int): Double = {
      val cbs = Similarity.pqCodebooksRefined(
        vecs, "vec_id", "embedding", m = 8, k = 16, dim = 16, sampleN = sampleN)
      val codes = Similarity.pqEncodeArray(vecs, "vec_id", "embedding", cbs)
      val got = Similarity.adcTopKArray(queries, codes, vecs,
          "vec_id", "embedding", cbs, k = 5, shortlist = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    // sampleN = k trains each centroid on ~1 vector (the seed itself);
    // sampleN = 32·k is the documented sizing the canonical gates use.
    // Deterministic inputs → deterministic recalls; the well-sized sample
    // must never lose to the degenerate one and must clear a floor.
    val starved = recallAt(16)
    val sized = recallAt(32 * 16)
    assert(sized >= starved, s"32·k recall $sized < k-row recall $starved")
    assert(sized >= 0.5, s"32·k-sample ADC recall too low: $sized")
  }

  test("ivfCentroidsRefined tightens cells: mean cosine-to-centroid rises") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 300L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").cache()
    def meanCos(cents: Seq[(Int, Seq[Float])]): Double = {
      val byId = cents.toMap
      vecs.select(col("vec_id"),
          Similarity.ivfBucket(col("embedding"), cents).as("bucket"),
          col("embedding"))
        .collect().map { r =>
          val v = r.getSeq[Float](2)
          val c = byId(r.getInt(1))
          val d = (v, c).zipped.map((a, b) => a.toDouble * b.toDouble).sum
          val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
          val nc = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
          d / (nv * nc)
        }.sum / 300.0
    }
    val seeds = Similarity.ivfCentroids(vecs, "vec_id", "embedding", 8)
    val refined = Similarity.ivfCentroidsRefined(vecs, "vec_id", "embedding", 8)
    val before = meanCos(seeds)
    val after = meanCos(refined)
    assert(after > before,
      s"one Lloyd pass should tighten cells: $after <= $before")
  }

  test("ivfCellMeans: fixed-point means are partition-invariant; full-corpus refinement tightens cells") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 300L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").cache()
    val seeds = Similarity.ivfCentroids(vecs, "vec_id", "embedding", 8)
    // float sums would drift with partition layout; the quantized LONG
    // sums must not — bit-identical rows under 1, 7, and 32 partitions
    val base = Similarity.ivfCellMeans(vecs, "embedding", seeds)
      .orderBy("cell", "dim").collect().map(_.toSeq).toSeq
    for (p <- Seq(1, 7, 32)) {
      val rep = Similarity.ivfCellMeans(
          vecs.repartition(p), "embedding", seeds)
        .orderBy("cell", "dim").collect().map(_.toSeq).toSeq
      assert(rep == base, s"partitioning $p changed the means")
    }
    // the full-corpus pass is a real refinement: mean cosine-to-centroid
    // rises vs the raw seeds (same criterion as the sampled Lloyd spec)
    def meanCos(cents: Seq[(Int, Seq[Float])]): Double = {
      val byId = cents.toMap
      vecs.select(col("vec_id"),
          Similarity.ivfBucket(col("embedding"), cents).as("bucket"),
          col("embedding"))
        .collect().map { r =>
          val v = r.getSeq[Float](2)
          val c = byId(r.getInt(1))
          val d = (v, c).zipped.map((a, b) => a.toDouble * b.toDouble).sum
          val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
          val nc = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
          d / (nv * nc)
        }.sum / 300.0
    }
    val refined = Similarity.ivfCentroidsRefinedFull(vecs, "vec_id", "embedding", 8)
    assert(meanCos(refined) > meanCos(seeds),
      s"full-corpus Lloyd pass should tighten cells: ${meanCos(refined)} <= ${meanCos(seeds)}")
    // quantization error vs the driver-side unquantized fold is bounded
    // by the fixed-point step (2^-24 per element, plus float rounding) —
    // at 300 vectors the 2048-sample driver pass covers the whole corpus
    // with the same seeds and assignment, so only the summation differs
    val unquantized = Similarity.ivfCentroidsRefined(vecs, "vec_id", "embedding", 8)
    refined.zip(unquantized).foreach { case ((_, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 2e-6, s"quantized mean drifted: $x vs $y")
      }
    }
  }

  test("dsirWeights: target-like docs score higher; totals are exact") {
    // target speaks 'aa bb', raw docs either match the target distribution
    // or don't
    val target = Seq((100L, "aa bb aa bb aa bb")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "aa bb aa bb"),
      (2L, "zz qq zz qq")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(toks(raw), toks(target), "doc_id", 64)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L)) // n_feats exact
    val w1 = out(0).getDouble(4)
    val w2 = out(1).getDouble(4)
    assert(w1 > 0 && w2 < 0 && w1 > w2,
      s"target-like doc must out-weigh off-target doc: $w1 vs $w2")
  }

  test("dsirWeights plan: model joins broadcast; no window") {
    val target = Seq((100L, "aa bb")).toDF("doc_id", "text")
    val raw = Seq((1L, "aa cc")).toDF("doc_id", "text")
    val df = TextAnalysis.dsirWeights(toks(raw), toks(target), "doc_id", 64)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"model join should broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }

  test("dsirWeights and adcTopK float outputs are partition-invariant") {
    // both fold floats in sorted key order inside an aggregate — the
    // result must be bit-identical under any input partitioning
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}")).toDF("doc_id", "text")
    val t1 = toks(docs)
    val t2 = toks(docs.repartition(11))
    def dsir(t: org.apache.spark.sql.DataFrame) =
      TextAnalysis.dsirWeights(t.filter(col("doc_id") % 3 =!= 0),
          t.filter(col("doc_id") % 3 === 0), "doc_id", 64)
        .orderBy("doc_id").collect().toSeq
    assert(dsir(t1) == dsir(t2))

    val rnd = new scala.util.Random(3)
    val vecs = (0L until 80L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val cbs = Similarity.pqCodebooks(vecs, "vec_id", "embedding", 4, 4, 16)
    def adc(v: org.apache.spark.sql.DataFrame) = {
      val codes = v.select(col("vec_id"),
        Similarity.pqCode(col("embedding"), cbs).as("pq_code"))
      Similarity.adcTopK(v.filter(col("vec_id") < 5), codes, v,
          "vec_id", "embedding", cbs, k = 3, shortlist = 20)
        .orderBy("query_id", "rank").collect().toSeq
    }
    assert(adc(vecs) == adc(vecs.repartition(9)))
  }

  test("hashSplit: total, disjoint, deterministic, roughly proportional") {
    val df = (0L until 2000L).toDF("doc_id")
    val out = TextAnalysis.hashSplit(df, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L) // total: every doc exactly one band
    assert(counts("train") > 1700 && counts("train") < 1900)
    assert(counts("val") > 50 && counts("test") > 50)
    // deterministic: independent of corpus content and recomputation
    val again = TextAnalysis.hashSplit(df.repartition(7), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    assert(out.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
  }

  test("adcTopK: exact cosines out, high recall vs brute force, broadcast dtable") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val cbs = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 4, dim = 16)
    val codes = vecs.select(col("vec_id"),
      Similarity.pqCode(col("embedding"), cbs).as("pq_code"))
    val queries = vecs.filter(col("vec_id") < 10)
    val adc = Similarity.adcTopK(queries, codes, vecs, "vec_id", "embedding",
      cbs, k = 5, shortlist = 60)
    val plan = adc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"distance-table join should broadcast:\n$plan")
    val adcRows = adc.collect()
    assert(adcRows.length == 50) // 10 queries × k
    // cosines are EXACT (rerank stage) — spot-check one against cosine()
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = adcRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // a 30%-of-corpus shortlist from a 256-cell codebook recovers most of
    // the true top-5; the floor guards regressions, not a recall SLA
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"ADC recall collapsed: $recall")
    // ranks are 1..k and cos non-increasing per query
    adcRows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to 5))
      assert(sorted.sliding(2).forall(p =>
        p.head.getDouble(3) >= p.last.getDouble(3)))
    }
  }

  test("edge inputs: empty/degenerate corpora don't throw or mis-code") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(toks(empty), "doc_id", 8).count() == 0)
    assert(Dedup.removeDuplicatedSpans(toks(empty), "doc_id", 8).count() == 0)
    assert(TextAnalysis.kmvDistinct(empty, Seq("doc_id"), "text", 8).count() == 0)
    assert(TextAnalysis.hashSplit(empty, "doc_id", Seq("a" -> 1.0)).count() == 0)
    // dsir with an EMPTY target: smoothing floor only, still well-defined
    val raw = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(toks(raw), toks(empty), "doc_id", 64)
      .collect()
    assert(w.length == 1 && !w.head.isNullAt(2))
    // a codebook cannot be sampled from a too-small corpus — loud, not wrong
    val tiny = Seq((1L, Array.fill(16)(1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.pqCodebooks(tiny, "vec_id", "embedding", 4, 4, 16))
    assert(e.getMessage.contains("codebook"))
  }

  test("pqCode: m sub-codes pack positionally; codes index the codebooks") {
    val vecs = (0L until 32L).map { i =>
      (i, Array.tabulate(16)(d => (math.sin(i * 16 + d) * 10).toFloat))
    }.toDF("vec_id", "embedding")
    val cbs = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 4, dim = 16)
    assert(cbs.length == 4 && cbs.forall(_.length == 4))
    assert(cbs.forall(_.forall(_._2.length == 4)))
    val codes = vecs.select(col("vec_id"),
      Similarity.pqCode(col("embedding"), cbs).as("code")).collect()
    // 4 subspaces × 2 bits each → codes in [0, 256)
    assert(codes.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 256L))
    // a sampled centroid vector quantizes to ITSELF in every subspace:
    // its packed code has the centroid's own index in each position
    val sample = Similarity.ivfCentroids(vecs, "vec_id", "embedding", 4)
    val sampleIds = vecs.select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toSeq -> r.getLong(0)).toMap
    sample.foreach { case (i, v) =>
      val selfCode = (0 until 4).map(j => i.toLong * (1L << (2 * j))).sum
      val got = codes.find(_.getLong(0) == sampleIds(v)).get.getLong(1)
      assert(got == selfCode, s"centroid $i should self-quantize: $got != $selfCode")
    }
  }

  test("semanticDedup: outlier survives, sub-threshold and cross-cell pairs kept") {
    val centroids = Seq(
      0 -> Seq(1f, 0f, 0f, 0f),
      1 -> Seq(0f, 1f, 0f, 0f))
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),      // cell 0, ON the centroid (cos = 1)
      (2L, Seq(0.99f, 0.1f, 0f, 0f)), // cell 0, near-dup of 1, slight outlier
      (3L, Seq(0f, 1f, 0.2f, 0f)),    // cell 1, no near-dup
      (4L, Seq(0.9f, 0.95f, 0f, 0f)), // cell 1 (0.95 > 0.9)
      (5L, Seq(0.95f, 0.9f, 0f, 0f))  // cell 0 — near-dup of 4 but ACROSS cells
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", centroids, minCos = 0.9)
      .orderBy("vec_id").collect()
    val keep = out.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val cell = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cell == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 0))
    // the SemDeDup keep policy: of the (1,2) duplicate pair the OUTLIER
    // (lower centroid cos — doc 2) survives, the cluster-core copy drops
    assert(!keep(1L) && keep(2L), s"outlier policy violated: $keep")
    // doc 3: same cell as 4 but pair cos << 0.9 → both kept
    assert(keep(3L) && keep(4L))
    // docs 4/5 are near-identical but land in DIFFERENT cells → never
    // compared (the SemDeDup trade: recall bounded by the cell partition)
    assert(keep(5L))
    // one row per input doc, centroid_cos is the winning assignment cos
    assert(out.length == 5)
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-12)
  }

  test("semanticDedup: every cell's minimal (centroid_cos, id) doc always survives") {
    val rnd = new scala.util.Random(11)
    val emb = (0L until 60L).map { i =>
      val base = Array.tabulate(8)(d => math.sin((i % 6) * 8 + d).toFloat)
      (i, base.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroidsRefined(emb, "vec_id", "embedding", 4)
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", cents, minCos = 0.95)
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(0), r.getBoolean(3)))
    out.groupBy(_._1).foreach { case (c, rows) =>
      val minRow = rows.minBy(r => (r._2, r._3))
      assert(minRow._4, s"cell $c minimal element was dropped: $minRow")
    }
    // with a tight threshold over 6 repeated directions, something drops
    assert(out.exists(!_._4), "expected at least one dropped near-dup")
  }

  test("semanticDedup maxCell: a degenerate cell fails open, others dedup") {
    val centroids = Seq(
      0 -> Seq(1f, 0f, 0f, 0f),
      1 -> Seq(0f, 1f, 0f, 0f))
    // cell 0 degenerate: 40 near-identical embeddings (a constant-embedding
    // pathology); cell 1 small with one genuine near-dup pair
    val bigCell = (0L until 40L).map(i =>
      (i, Seq(1f, 0.001f * i, 0f, 0f)))
    val smallCell = Seq(
      (100L, Seq(0f, 1f, 0f, 0f)),
      (101L, Seq(0f, 0.99f, 0.05f, 0f)))
    val emb = (bigCell ++ smallCell).toDF("vec_id", "embedding")
    val capped = Dedup.semanticDedup(emb, "vec_id", "embedding", centroids,
        minCos = 0.9, maxCell = 10)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // every doc of the over-cap cell is kept (excluded from pair
    // generation — fails open), still one output row each
    assert(capped.size == 42)
    bigCell.foreach { case (id, _) =>
      assert(capped(id), s"over-cap cell doc $id was dropped") }
    // the small cell still dedups: 100 is the cluster-core copy (cos = 1
    // to its centroid), 101 the outlier — outlier survives, core drops
    assert(capped(101L) && !capped(100L),
      s"under-cap cell lost its dedup: $capped")
    // uncapped, the degenerate cell pairs quadratically and all but the
    // minimal element drop — the guard is what kept them
    val uncapped = Dedup.semanticDedup(emb, "vec_id", "embedding", centroids,
        minCos = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(bigCell.count { case (id, _) => uncapped(id) } == 1)
  }

  test("gramNovelty: first-occurrence attribution, repeats, short docs") {
    val d = Seq(
      (1L, "a b c"),     // grams "a b","b c" — both first here
      (2L, "a b a b"),   // "a b"×2 (doc 1's), "b a" first here
      (3L, "a b"),       // nothing novel
      (4L, "x")          // too short for any bigram → zero row survives
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gramNovelty(d, "doc_id", "text", n = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    assert(r(1L) == ((2L, 2L, 2L, 2L, 10000L)))
    assert(r(2L) == ((3L, 1L, 2L, 1L, 5000L)))
    assert(r(3L) == ((1L, 0L, 1L, 0L, 0L)))
    assert(r(4L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("gramNoveltyAppend: batched union equals one-shot; registry insert-missing") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "a b c d"),   // batch 1
      (2L, "a b c x"),   // batch 1 — "a b" recycled from doc 1
      (3L, "a b c d"),   // batch 2 — everything recycled
      (4L, "p q r s")    // batch 2 — all novel
    ).toDF("doc_id", "text")
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(
        s"target/tmp/novreg_${System.nanoTime()}", 64L, keyCols = Seq("digest")))
    val r1 = TextAnalysis.gramNoveltyAppend(ps, "reg",
      d.filter(col("doc_id") <= 2), "doc_id", "text", n = 2, modified = 1L)
      .localCheckpoint()
    val regAfter1 = ps.readPart("reg").get.count()
    val r2 = TextAnalysis.gramNoveltyAppend(ps, "reg",
      d.filter(col("doc_id") > 2), "doc_id", "text", n = 2, modified = 2L)
    val inc = r1.unionByName(r2)
    val oneShot = TextAnalysis.gramNovelty(d, "doc_id", "text", n = 2)
    assert(inc.orderBy("doc_id").collect().toSeq ==
      oneShot.orderBy("doc_id").collect().toSeq)
    // batch 1 grams: a b, b c, c d, c x → 4; batch 2 adds p q, q r, r s
    assert(regAfter1 == 4 && ps.readPart("reg").get.count() == 7)
    // a replayed gram keeps its FIRST owner (insert-missing)
    val firstOwners = ps.readPart("reg").get
      .select("first_doc").collect().map(_.getLong(0))
    assert(!firstOwners.contains(3L), "recycled grams must keep doc 1/2 owners")
  }

  test("gramNoveltyAppend: registry scan carries a pindex partition filter") {
    import org.apache.spark.sql.functions.col
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(
        s"target/tmp/novprune_${System.nanoTime()}", 64L, keyCols = Seq("digest")))
    TextAnalysis.gramNoveltyAppend(ps, "reg",
      Seq((1L, "a b c d e")).toDF("doc_id", "text"),
      "doc_id", "text", n = 2, modified = 1L).count()
    val out = TextAnalysis.gramNoveltyAppend(ps, "reg",
      Seq((2L, "a b x y z")).toDF("doc_id", "text"),
      "doc_id", "text", n = 2, modified = 2L)
    val plan = out.queryExecution.executedPlan.toString
    val scanLines = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(scanLines.nonEmpty, s"expected a registry parquet scan in:\n$plan")
    assert(scanLines.forall(_.contains("pindex")),
      s"registry scan not pindex-pruned:\n${scanLines.mkString("\n")}")
  }

  test("bigramLmScore: seen / backoff / OOV classification is exact") {
    val train = Seq((0L, "a b c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b x c b")).toDF("doc_id", "text")
    // (a,b) seen; (b,x) OOV (x unseen); (x,c) and (c,b) backoff
    val r = TextAnalysis.bigramLmScore(train, score, "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("n_bigrams") == 4 && r.getAs[Long]("n_seen") == 1 &&
      r.getAs[Long]("n_backoff") == 2 && r.getAs[Long]("n_oov") == 1 &&
      r.getAs[Long]("seen_bp") == 2500)
  }

  test("turnTruncate: suffix-keep under budget; partial last turn") {
    // doc 0, 20 tokens: turn lens 3,4,5,6 then partial 2 (start 18);
    // costs 5,6,7,8,4 — suffix sums 4,12,19,25,30: budget 20 keeps the
    // last three turns (tokens 5+6+2)
    val d = Seq((0L, Seq.fill(20)("t").mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.turnTruncate(d, "doc_id", "text", budget = 20L)
      .collect().head
    assert(r.getAs[Long]("n_tokens") == 20 && r.getAs[Long]("n_turns") == 5)
    assert(r.getAs[Long]("kept_turns") == 3 && r.getAs[Long]("kept_tokens") == 13 &&
      r.getAs[Long]("kept_cost") == 19)
    // budget large enough keeps everything
    val all = TextAnalysis.turnTruncate(d, "doc_id", "text", budget = 99L)
      .collect().head
    assert(all.getAs[Long]("kept_turns") == 5 &&
      all.getAs[Long]("kept_tokens") == 20 && all.getAs[Long]("kept_cost") == 30)
  }
}
