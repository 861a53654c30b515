package graft

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operator inventory: dedup, similarity search,
  * text analysis, multimodal plumbing — first-class operators alongside the
  * reference's own surface (BASELINE.json north star).
  *
  * Hash functions in the SQL-checked queries are md5-based so the DuckDB
  * oracle computes identical values; the operators accept any hash expr and
  * production would swap in xxhash64 (same shapes, cheaper).
  */
object QueriesLLM {
  import Tables.load

  /** Per-invocation scratch dir for the end-to-end index queries
    * (q96/q99), deleted recursively at JVM exit — repeated gate/bench
    * runs in one JVM accumulate only until exit, and nothing survives
    * the process. (Deleting eagerly after the query returns would break
    * it: the returned frame reads the stored parquet lazily.) */
  private[graft] def tempWorkDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val children = f.listFiles()
        if (children != null) children.foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }

  private def docs(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  private def toks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokens(docs(s, dir), "doc_id", "text")

  /** DuckDB CTE producing (doc_id, pos, tok) — parallel unnest zips. */
  private val ToksCte =
    """toks AS (
        SELECT doc_id,
          unnest(generate_series(0, len(regexp_split_to_array(trim(text), '\s+')) - 1)) AS pos,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents)"""

  /** Count-min top-20 replay — shared by the batch (q243), incremental
    * (q244), and streaming (q246) gates, which are equivalent because
    * cell addition is associative+commutative (any batch split produces
    * the one-shot grid). Cells and probes use the repo's md5-ladder
    * hash; everything is BIGINT. */
  private def cmsTopkOracleOver(docsSql: String) = {
    val ladder = md5Ladder32("'cms' || CAST(rw.r AS VARCHAR) || ':' || tok")
    s"""WITH d_ AS ($docsSql),
       t AS (
         SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         FROM d_),
       tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
       rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
       cells AS (
         SELECT rw.r AS r, ($ladder) % 512 AS bucket,
           CAST(sum(cnt) AS BIGINT) AS cell
         FROM tf, rows_ rw GROUP BY 1, 2),
       top_ AS (
         SELECT tok, cnt AS exact_cnt FROM tf
         ORDER BY cnt DESC, tok LIMIT 20),
       probes AS (
         SELECT tok, exact_cnt, rw.r AS r, ($ladder) % 512 AS bucket
         FROM top_, rows_ rw),
       est AS (
         SELECT p.tok, p.exact_cnt, min(coalesce(c.cell, 0)) AS est
         FROM probes p LEFT JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
         GROUP BY 1, 2)
       SELECT tok, exact_cnt, CAST(est AS BIGINT) AS est
       FROM est ORDER BY exact_cnt DESC, tok"""
  }

  private lazy val CmsTopkOracle =
    cmsTopkOracleOver("SELECT text FROM documents")

  /** q246's md5-capped 512-doc replay slice (the q218/q230 convention). */
  private lazy val CmsStreamOracle =
    cmsTopkOracleOver(
      """SELECT text FROM documents
         ORDER BY md5('cmscap:' || CAST(doc_id AS VARCHAR)), doc_id
         LIMIT 512""")

  /** Textbook log-idf BM25 top-20 over the full corpus — shared by the
    * fresh (q235) and stored (q236) gates, which are equivalent by the
    * stats-reconstruct-at-query-time contract. The ln enters only the
    * ORDER BY key (selection tier); emitted columns are exact integers. */
  private val Bm25LogIdfOracle =
    """WITH t AS (
         SELECT doc_id,
           unnest(list_filter(string_split_regex(trim(text), '\s+'),
             x -> x <> '')) AS tok
         FROM documents),
       tf AS (
         SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         FROM t GROUP BY 1, 2),
       dl AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         FROM t GROUP BY 1),
       dfq AS (
         SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         FROM t GROUP BY 1),
       n AS (
         SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_toks
         FROM t),
       hits AS (
         SELECT tf.doc_id, tf.tf, dl.dl,
           CAST(floor(
             (CAST(tf.tf AS DOUBLE) * 2.2 /
               (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 +
                 0.75 * CAST(dl.dl AS DOUBLE) /
                   (CAST(n.n_toks AS DOUBLE) / CAST(n.n_docs AS DOUBLE)))))
             * ln(1 + ((CAST(n.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5) /
                (CAST(dfq.df AS DOUBLE) + 0.5)))
             * 1e9) AS BIGINT) AS contrib
         FROM tf JOIN dl USING (doc_id) JOIN dfq USING (tok) CROSS JOIN n
         WHERE tf.tok IN ('hash', 'join', 'merge'))
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_toks,
         CAST(sum(tf) AS BIGINT) AS sum_tf, CAST(max(dl) AS BIGINT) AS dl
       FROM hits GROUP BY 1
       ORDER BY sum(contrib) DESC, doc_id LIMIT 20"""

  /** DuckDB CTE producing distinct (doc_id, shingle) word 3-shingles. */
  private val ShinglesCte =
    s"""$ToksCte,
       led AS (
         SELECT doc_id, tok,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
         FROM toks),
       sh AS (
         SELECT DISTINCT doc_id, tok || ' ' || t2 || ' ' || t3 AS shingle
         FROM led WHERE t3 IS NOT NULL)"""

  /** Shared repeated-span tail for q75 (appended to every 4th doc). */
  private val PromoTail =
    " click here to subscribe to our newsletter today please thanks"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup: hash-groupBy on normalized text ----
    "q25_dedup_exact" -> { (s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text").orderBy("digest")
    },
    // ---- MinHash signatures (one pass, k simultaneous minima) ----
    "q26_minhash_sig" -> { (s, dir) =>
      Dedup.minhashSignature(Dedup.shingles(toks(s, dir), "doc_id", 3), "doc_id", 8)
        .orderBy("doc_id")
    },
    // ---- LSH banding → candidate pairs (degenerate buckets capped) ----
    "q27_lsh_candidates" -> { (s, dir) =>
      val sig = Dedup.minhashSignature(Dedup.shingles(toks(s, dir), "doc_id", 3), "doc_id", 8)
      Dedup.lshCandidates(Dedup.lshBuckets(sig, "doc_id", 4, 2), "doc_id", maxBucket = 50)
        .orderBy("id1", "id2")
    },
    // ---- n-gram Jaccard near-dup pairs (exact verify, hot shingles capped) ----
    "q28_jaccard_pairs" -> { (s, dir) =>
      // 3-word shingles: on this corpus's tiny vocabulary, 2-shingles make
      // nearly every doc pair a candidate (quadratic blowup); k=3 keeps the
      // candidate set selective — the same reason production MinHash/LSH
      // prefilters before exact Jaccard. maxDocFreq bounds the f² join
      // blowup of boilerplate shingles (mirrored in the oracle SQL).
      Dedup.jaccardPairs(Dedup.shingles(toks(s, dir), "doc_id", 3), "doc_id", 0.10,
          maxDocFreq = 100)
        .orderBy("id1", "id2")
    },
    // ---- SimHash (16-bit, portable arithmetic) ----
    "q29_simhash" -> { (s, dir) =>
      Dedup.simhash(toks(s, dir), "doc_id").orderBy("doc_id")
    },
    // ---- SimHash Hamming-ball near-dup pairs (multi-index banding) ----
    "q80_simhash_neardup" -> { (s, dir) =>
      Dedup.simhashNearDups(Dedup.simhash(toks(s, dir), "doc_id"),
          "doc_id", maxHam = 3, maxBucket = 200)
        .orderBy("id1", "id2")
    },
    // ---- KMV distinct-count sketch vs exact (per-source vocabulary) ----
    "q81_kmv_distinct" -> { (s, dir) =>
      val d = docs(s, dir)
      val t = TextAnalysis.tokens(d, "doc_id", "text")
        .join(d.select(col("doc_id"), col("source")), "doc_id")
      val sk = TextAnalysis.kmvDistinct(t, Seq("source"), "tok", k = 128)
      t.groupBy("source").agg(countDistinct(col("tok")).as("exact_distinct"))
        .join(sk, "source")
        .orderBy("source")
    },
    // ---- incremental persisted KMV distinct sketch: per-batch minima
    // merged into the store by min-union (minima-of-union ≡
    // union-of-minima, so the grown store equals the one-shot corpus
    // sketch — q81's oracle verbatim); the rewrite touches only
    // sketch-sized data ----
    "q229_kmv_incremental" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      val work = tempWorkDir("graft_q229_")
      val ps = new PartStore(s, PartStoreConfig(s"$work/kmv", 64L,
        keyCols = Seq("source", "h")))
      val d = docs(s, dir)
      val t = TextAnalysis.tokens(d, "doc_id", "text")
        .join(d.select(col("doc_id"), col("source")), "doc_id")
      TextAnalysis.kmvIncrementalAppend(ps, "kmv",
        t.filter(pmod(col("doc_id"), lit(2)) === 0),
        Seq("source"), "tok", k = 128, modified = 1L)
      TextAnalysis.kmvIncrementalAppend(ps, "kmv",
        t.filter(pmod(col("doc_id"), lit(2)) === 1),
        Seq("source"), "tok", k = 128, modified = 2L)
      t.groupBy("source").agg(countDistinct(col("tok")).as("exact_distinct"))
        .join(TextAnalysis.kmvEstimateStored(ps, "kmv", Seq("source"), k = 128),
          "source")
        .orderBy("source")
    },
    // ---- Boolean retrieval (AND + NOT): docs containing ALL of
    // {hash, join, scan} and NOT {slow}. AND = one (doc, tok)-distinct
    // postings pass + HAVING count = |terms| (set intersection without
    // a per-term scan); NOT = anti-join. Cost ∝ the query terms'
    // postings, never the corpus ----
    "q253_boolean_search" -> { (s, dir) =>
      val must = Seq("hash", "join", "scan")
      val t = toks(s, dir).select("doc_id", "tok").distinct()
      val ands = t.filter(col("tok").isin(must: _*))
        .groupBy("doc_id").agg(count(lit(1)).as("n_terms"))
        .filter(col("n_terms") === must.length)
      val nots = t.filter(col("tok") === "slow").select("doc_id")
      ands.join(nots, Seq("doc_id"), "left_anti")
        .select("doc_id").orderBy("doc_id")
    },
    // ---- Exact-phrase retrieval over POSITIONAL postings: "hash join"
    // = equi-join of the two terms' (doc, pos) lists on (doc, pos+1) —
    // the adjacency probe an inverted index with positions answers in
    // O(df(hash) + df(join)), never a corpus substring scan ----
    "q254_phrase_search" -> { (s, dir) =>
      val t = toks(s, dir)
      val a = t.filter(col("tok") === "hash").select(col("doc_id"), col("pos"))
      val b = t.filter(col("tok") === "join")
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      a.join(b, Seq("doc_id", "pos"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
        .orderBy("doc_id")
    },
    // ---- Proximity retrieval: docs where 'hash' and 'scan' occur
    // within 3 tokens — the positional-postings join of q254 with a
    // band predicate instead of adjacency (NEAR/k of a search engine).
    // Cost ∝ df(hash) · occurrences-per-doc(scan), never corpus ----
    "q258_proximity_search" -> { (s, dir) =>
      val t = toks(s, dir)
      val a = t.filter(col("tok") === "hash")
        .select(col("doc_id"), col("pos").as("pa"))
      val b = t.filter(col("tok") === "scan")
        .select(col("doc_id"), col("pos").as("pb"))
      a.join(b, "doc_id")
        .filter(abs(col("pa") - col("pb")) <= 3)
        .groupBy("doc_id").agg(count(lit(1)).as("n_pairs"),
          min(abs(col("pa") - col("pb"))).cast("long").as("min_dist"))
        .orderBy("doc_id")
    },
    // ---- Incremental vocabulary growth (Heaps-law monitoring): the
    // token-type store admits only unseen types per batch (anti-join,
    // idempotent on replay); the gate reports per-batch occurrence /
    // type / new-type counts + the cumulative vocabulary — "is this
    // source still contributing new language, or scraping duplicates?"
    // — a curation signal the dedup tier doesn't give ----
    "q251_vocab_growth" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      import s.implicits._
      val work = tempWorkDir("graft_q251_")
      val ps = new PartStore(s, PartStoreConfig(s"$work/vocab", 64L,
        keyCols = Seq("tok")))
      val t = toks(s, dir)
      def batch(b: Long) =
        t.filter(pmod(col("doc_id"), lit(2)) === b).select("tok")
      val r0 = TextAnalysis.vocabGrowthAppend(ps, "vocab", batch(0), "tok", 1L)
      val r1 = TextAnalysis.vocabGrowthAppend(ps, "vocab", batch(1), "tok", 2L)
      Seq((0L, r0._1, r0._2, r0._3, r0._3),
          (1L, r1._1, r1._2, r1._3, r0._3 + r1._3))
        .toDF("batch", "n_tokens", "n_types", "n_new_types", "cum_types")
        .orderBy("batch")
    },
    // ---- Count-min sketch heavy hitters: token frequencies through a
    // fixed 4×512 integer grid (Cormode–Muthukrishnan) — the
    // open-vocabulary path where an exact token shuffle is the
    // bottleneck. Estimates are min-over-rows of md5-hashed cells: pure
    // integer, engine-invariant, replayed cell-for-cell by the oracle.
    // Selection stays the exact tier (top-20 by true count) so the gate
    // pins BOTH the grid and the ≥-exact overestimate guarantee ----
    "q243_cms_topk" -> { (s, dir) =>
      val t = toks(s, dir)
      val sk = CountMin.sketch(t, "tok", None)
      val exact = t.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
      CountMin.estimate(exact, sk, "tok")
        .orderBy(col("exact_cnt").desc, col("tok"))
    },
    // ---- incremental persisted CMS: per-batch grids merge into the
    // store by cell ADDITION (addition is associative+commutative, so
    // the grown store ≡ the one-shot corpus grid — q243's oracle
    // verbatim); each append rewrites only grid-sized data (≤ d·w
    // rows), never the corpus ----
    "q244_cms_incremental" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      val work = tempWorkDir("graft_q244_")
      val ps = new PartStore(s, PartStoreConfig(s"$work/cms", 64L,
        keyCols = Seq("r", "bucket")))
      val t = toks(s, dir)
      CountMin.incrementalAppend(ps, "cms",
        t.filter(pmod(col("doc_id"), lit(2)) === 0), "tok", modified = 1L)
      CountMin.incrementalAppend(ps, "cms",
        t.filter(pmod(col("doc_id"), lit(2)) === 1), "tok", modified = 2L)
      val exact = t.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
      CountMin.estimateStored(ps, "cms", exact, "tok")
        .orderBy(col("exact_cnt").desc, col("tok"))
    },
    // ---- Z-order key for multi-dimensional file clustering ----
    "q82_zorder_key" -> { (s, dir) =>
      load(s, dir, "events")
        .select(col("event_id"),
          graft.operators.Layout.zorderKey(
            pmod(col("user_id"), lit(1024L)), pmod(col("event_id"), lit(1024L)),
            bits = 10).as("zkey"))
        .orderBy("event_id")
    },
    // ---- eval-set decontamination (broadcast n-gram overlap) ----
    "q63_decontaminate" -> { (s, dir) =>
      val sh = Dedup.shingles(toks(s, dir), "doc_id", 3)
      val eval = sh.filter(col("doc_id") % 17 === 0)
      val train = sh.filter(col("doc_id") % 17 =!= 0)
      Dedup.contamination(train, eval, "doc_id", minOverlap = 2)
        .orderBy("doc_id")
    },
    // ---- Bloom-prefiltered decontamination: the eval-set-too-big-to-
    // broadcast path. Tier 1 prunes corpus shingles through a codegen'd
    // might_contain on a BloomFilterAggregate sketch; tier 2's exact
    // confirm join kills false positives, so the output is deterministic
    // and the oracle is the PLAIN exact-overlap SQL ----
    "q98_bloom_decontaminate" -> { (s, dir) =>
      val sh = Dedup.shingles(toks(s, dir), "doc_id", 3)
      val eval = sh.filter(col("doc_id") % 13 === 0)
      val train = sh.filter(col("doc_id") % 13 =!= 0)
      Dedup.contaminationBloom(train, eval, "doc_id", minOverlap = 1)
        .orderBy("doc_id")
    },
    // ---- kNN majority-label assignment over the exact top-k ----
    "q66_knn_label" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val seeds = emb.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id"), col("embedding"), col("label"))
      Similarity.knnLabel(emb.select(col("vec_id"), col("embedding")),
          seeds, "vec_id", "embedding", "label", k = 5)
        .orderBy("vec_id")
    },
    // ---- data mixing: per-source mixture statistics ----
    "q64_source_mixture" -> { (s, dir) =>
      TextAnalysis.sourceMixture(docs(s, dir), "doc_id", "text", "source")
        .orderBy("source")
    },
    // ---- data mixing: deterministic stratified downsample ----
    "q65_stratified_sample" -> { (s, dir) =>
      TextAnalysis.stratifiedSample(docs(s, dir), "doc_id", "source",
          rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0),
          defaultRate = 0.25)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },
    // ---- repetition removal signals (Gopher rep rules) ----
    "q67_repetition" -> { (s, dir) =>
      TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },
    // ---- cross-doc boilerplate line removal ----
    // The synthetic corpus is single-line, so wrap every doc in shared
    // header/footer chrome (the mirrored-page shape boilerplate removal
    // exists for) — the operator must flag exactly the shared lines and
    // reassemble the unique body in order.
    "q68_boilerplate" -> { (s, dir) =>
      val corpus = docs(s, dir).select(col("doc_id"),
        concat_ws("\n", lit("shared header banner"), col("text"),
          lit("shared footer banner")).as("text"))
      CorpusClean.boilerplateLines(corpus, "doc_id", "text", minDocs = 2)
        .orderBy("doc_id")
    },
    // ---- first-occurrence line dedup (CCNet hash-dedup keep policy):
    // the single-line corpus is composed into two-line docs where each
    // odd doc repeats its even buddy's line (cross-doc dup) and each even
    // doc repeats its own (within-doc dup) — exactly one copy of every
    // line must survive, at the globally smallest (doc, pos) ----
    "q114_line_dedup" -> { (s, dir) =>
      val d = docs(s, dir)
      val buddy = d.select(col("doc_id").as("bid"), col("text").as("btext"))
      val corpus = d.withColumn("bid", col("doc_id") - (col("doc_id") % 2))
        .join(buddy, Seq("bid"), "left")
        .select(col("doc_id"),
          concat_ws("\n", coalesce(col("btext"), col("text")), col("text"))
            .as("text"))
      CorpusClean.dedupLinesFirstOccurrence(corpus, "doc_id", "text")
        .orderBy("doc_id")
    },
    // ---- PII detect + redact (deterministic injected fixtures) ----
    "q69_pii_redact" -> { (s, dir) =>
      val id = col("doc_id")
      val pii = docs(s, dir).select(id, concat_ws(" ", col("text"),
        when(id % 3 === 0,
          concat(lit("contact user"), id.cast("string"), lit("@example.com"))),
        when(id % 5 === 0,
          concat(lit("from 10.0."), (id % 256).cast("string"), lit(".1"))),
        when(id % 7 === 0,
          concat(lit("call +1 555 01"), id.cast("string")))).as("text"))
      CorpusClean.piiRedact(pii, "doc_id", "text").orderBy("doc_id")
    },
    // ---- sequence packing (concat-and-chunk, 512-token budget) ----
    "q70_seq_pack" -> { (s, dir) =>
      CorpusClean.packSequences(docs(s, dir), "doc_id", "text",
        budget = 512, shards = 8).orderBy("doc_id")
    },
    // ---- curation pipeline capstone: quality gate → first-occurrence
    // dedup → sequence packing, three oracle-gated operators composed in
    // ONE plan — the library's actual usage shape (dedup changes which
    // docs survive, which changes every downstream packing offset) ----
    "q116_pipeline_pack" -> { (s, dir) =>
      // the raw fixture passes both gates vacuously (no short docs, no
      // exact dups) — inject both failure modes so every stage fires:
      // every 10th doc shrinks to 2 tokens (fails the quality gate),
      // every 7th≡3 doc copies its left neighbor (dedup drops the copy)
      val d = docs(s, dir)
      val buddy = d.select((col("doc_id") + 1).as("doc_id"),
        col("text").as("__btext"))
      val corpus = d.join(buddy, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0, lit("tiny doc"))
            .when(col("doc_id") % 7 === 3,
              coalesce(col("__btext"), col("text")))
            .otherwise(col("text")).as("text"))
      val toks = size(filter(split(trim(col("text")), "\\s+"), t => t =!= ""))
        .cast("long")
      val survivors = CorpusClean.dedupLinesFirstOccurrence(
          corpus.filter(toks >= 3), "doc_id", "text")
        .filter(col("clean_text") =!= "")
        .select(col("doc_id"), col("clean_text").as("text"))
      CorpusClean.packSequences(survivors, "doc_id", "text",
          budget = 256, shards = 4)
        .orderBy("doc_id")
    },
    // ---- char-trigram LM quality score (CCNet-style perplexity filter) ----
    // Gate columns are the rational (bit-exact) score; avg_logp/ppl are
    // libm-dependent and spec-tested instead.
    "q71_lm_score" -> { (s, dir) =>
      TextAnalysis.charLmScore(docs(s, dir), "doc_id", "text")
        .select("doc_id", "n_trigrams", "sum_p", "mean_p")
        .orderBy("doc_id")
    },
    // ---- MinHash Jaccard estimate for LSH candidates (cheap verify tier) ----
    "q73_minhash_est" -> { (s, dir) =>
      val sig = Dedup.minhashSignature(Dedup.shingles(toks(s, dir), "doc_id", 3), "doc_id", 8)
      val pairs = Dedup.lshCandidates(Dedup.lshBuckets(sig, "doc_id", 4, 2),
        "doc_id", maxBucket = 50)
      Dedup.minhashEstimate(sig, pairs, "doc_id", 8).orderBy("id1", "id2")
    },
    // ---- DSIR importance weights (data selection toward a target set) ----
    // Gate columns are the rational folds; logw is libm-dependent and
    // spec-tested instead (same contract as q71).
    "q74_dsir_weights" -> { (s, dir) =>
      val t = toks(s, dir)
      TextAnalysis.dsirWeights(
          t.filter(col("doc_id") % 17 =!= 0),
          t.filter(col("doc_id") % 17 === 0), "doc_id", buckets = 64)
        .select("doc_id", "n_feats", "sum_pt", "sum_pr")
        .orderBy("doc_id")
    },
    // ---- duplicated n-gram span coverage (exact-substr dedup signal) ----
    // The synthetic corpus has no repeated 8-grams, so append a shared
    // promo sentence to every 4th doc — the mirrored shape (cross-doc
    // repeated span with unique surroundings) the detector exists for.
    "q75_dup_spans" -> { (s, dir) =>
      val corpus = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(PromoTail))).otherwise(col("text")).as("text"))
      Dedup.duplicatedSpans(
          TextAnalysis.tokens(corpus, "doc_id", "text"), "doc_id", 8)
        .orderBy("doc_id")
    },
    // ---- exact longest-duplicated-span per doc via distributed
    // prefix-doubling suffix ranks (Lee et al.'s suffix-array form;
    // q75's fixed-8-gram coverage is the approximation, this is exact
    // longest-match). 7 ranking rounds + 7 LCP joins, each a linear
    // shuffle; ranks assigned by range-partition + zipWithIndex, no
    // single-partition window. Oracle replays the identical rounds as
    // chained dense_rank CTEs ----
    "q264_suffix_dedup" -> { (s, dir) =>
      graft.functions.Dedup.suffixDupSpans(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },
    // ---- duplicated-span removal (drop-every-occurrence rebuild) ----
    "q79_dup_span_removal" -> { (s, dir) =>
      val corpus = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(PromoTail))).otherwise(col("text")).as("text"))
      Dedup.removeDuplicatedSpans(
          TextAnalysis.tokens(corpus, "doc_id", "text"), "doc_id", 8)
        .orderBy("doc_id")
    },
    // ---- TF-IDF term weighting: gate-exact counts (tf, df, n_docs);
    // the libm ln product is spec-tested per the charLmScore convention ----
    "q120_tfidf" -> { (s, dir) =>
      TextAnalysis.tfIdf(docs(s, dir), "doc_id", "text")
        .select("doc_id", "tok", "tf", "df", "n_docs")
        .orderBy("doc_id", "tok")
    },
    // ---- BM25 weights: counts + the rational tf-saturation term
    // gate-exact (k1 = 1.2, b = 0.75 → plain double arithmetic); the
    // ln-idf product is spec-tested ----
    "q121_bm25" -> { (s, dir) =>
      TextAnalysis.bm25(docs(s, dir), "doc_id", "text")
        .select("doc_id", "tok", "tf", "df", "dl", "n_docs", "tf_norm")
        .orderBy("doc_id", "tok")
    },
    // ---- Count-Min sketch frequency estimates (Cormode & Muthukrishnan
    // 2005): d·w bounded counters, point estimate = min over d rows —
    // deliberately tiny w=16 so the 31-token vocabulary genuinely
    // collides and the oracle must reproduce the overestimates ----
    "q119_cms_heavy_hitters" -> { (s, dir) =>
      val t = TextAnalysis.tokens(docs(s, dir), "doc_id", "text")
        .filter(col("tok") =!= "").select(col("tok"))
      val sketch = TextAnalysis.cmsSketch(t, "tok", d = 3, w = 16)
      val exact = t.groupBy("tok").agg(count(lit(1)).as("exact_count"))
      TextAnalysis.cmsEstimate(exact.select(col("tok")), "tok", sketch,
          d = 3, w = 16)
        .join(exact, "tok")
        .select(col("tok"), col("exact_count"), col("est_count"))
        .orderBy("tok")
    },
    // ---- sliding-window token chunking (RAG corpus prep): 64-token
    // chunks every 48 tokens, map-side chunk-id fan-out, no join ----
    "q125_chunking" -> { (s, dir) =>
      TextAnalysis.chunkTokens(docs(s, dir), "doc_id", "text",
          chunkSize = 64, stride = 48)
        .orderBy("doc_id", "chunk_id")
    },
    // ---- fixed-point PageRank over a derived link graph (source
    // weighting signal; ranks bit-exact under any partition layout) ----
    "q126_pagerank" -> { (s, dir) =>
      val e = load(s, dir, "events")
      val edges = e.select(col("user_id").as("src"),
        pmod(col("event_id"), lit(97)).cast("long").as("dst"))
      Graph.pageRank(edges, "src", "dst", iterations = 3)
        .orderBy("node")
    },
    // ---- BM25 retrieval: query-token probe over the corpus stats,
    // fixed-point scoring, bounded top-20 ----
    "q129_bm25_search" -> { (s, dir) =>
      TextAnalysis.bm25Search(docs(s, dir), "doc_id", "text",
          queryToks = Seq("hash", "join", "merge"), topN = 20)
    },
    // ---- incremental persisted BM25 index: postings + doc lengths
    // upserted per batch (cost ∝ batch), corpus stats reconstructed at
    // query time so stored search ≡ full-corpus bm25Search exactly —
    // same oracle as q129; postings scan partition-pruned to the query
    // tokens' crc32 cells ----
    "q226_bm25_incremental" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      val work = tempWorkDir("graft_q226_")
      val psP = new PartStore(s, PartStoreConfig(s"$work/post", 64L,
        keyCols = Seq("tok", "doc_id")))
      val psD = new PartStore(s, PartStoreConfig(s"$work/docs", 64L,
        keyCols = Seq("doc_id")))
      val d = docs(s, dir)
      TextAnalysis.bm25IndexAppend(psP, psD,
        d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", 1L)
      TextAnalysis.bm25IndexAppend(psP, psD,
        d.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", 2L)
      TextAnalysis.bm25SearchStored(psP, psD,
        Seq("hash", "join", "merge"), topN = 20)
    },
    // ---- TEXTBOOK multi-term BM25 (q129's successor): rank by the
    // summed fixed-point log-idf contribution — the standard BM25 doc
    // order, where q129's raw-ratio weighting is only per-term
    // rank-equivalent. ln is the selection key (q74/q195 convention);
    // the hash-compared columns are exact integers ----
    "q235_bm25_logidf" -> { (s, dir) =>
      TextAnalysis.bm25SearchLog(docs(s, dir), "doc_id", "text",
          queryToks = Seq("hash", "join", "merge"), topN = 20)
        .drop("score_scaled")
    },
    // ---- stored-index textbook BM25: the log-idf ranking over the
    // incrementally-appended postings store ≡ fresh bm25SearchLog over
    // the union corpus (stats reconstruct at query time) ----
    "q236_bm25_logidf_stored" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      val work = tempWorkDir("graft_q236_")
      val psP = new PartStore(s, PartStoreConfig(s"$work/post", 64L,
        keyCols = Seq("tok", "doc_id")))
      val psD = new PartStore(s, PartStoreConfig(s"$work/docs", 64L,
        keyCols = Seq("doc_id")))
      val d = docs(s, dir)
      TextAnalysis.bm25IndexAppend(psP, psD,
        d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", 1L)
      TextAnalysis.bm25IndexAppend(psP, psD,
        d.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", 2L)
      TextAnalysis.bm25SearchStoredLog(psP, psD,
          Seq("hash", "join", "merge"), topN = 20)
        .drop("score_scaled")
    },
    // ---- right-to-be-forgotten purge through the derived index: build
    // the stored BM25 index over the full corpus, physically purge a
    // takedown list (doc_id % 5 = 0) from postings + doclens, and
    // search — because stats reconstruct at query time, the purged
    // index is byte-identical to a FRESH index on the surviving corpus
    // (deleted docs stop influencing df/avgdl for everyone else, which
    // a lazy hit-stage tombstone filter would get wrong). Oracle = the
    // q235 replay over the surviving corpus ----
    "q269_index_purge" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      val work = tempWorkDir("graft_q269_")
      val psP = new PartStore(s, PartStoreConfig(s"$work/post", 64L,
        keyCols = Seq("tok", "doc_id")))
      val psD = new PartStore(s, PartStoreConfig(s"$work/docs", 64L,
        keyCols = Seq("doc_id")))
      val d = docs(s, dir)
      TextAnalysis.bm25IndexAppend(psP, psD,
        d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", 1L)
      TextAnalysis.bm25IndexAppend(psP, psD,
        d.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", 2L)
      TextAnalysis.bm25IndexPurge(psP, psD,
        d.filter(pmod(col("doc_id"), lit(5)) === 0).select("doc_id"), "doc_id")
      TextAnalysis.bm25SearchStoredLog(psP, psD,
          Seq("hash", "join", "merge"), topN = 20)
        .drop("score_scaled")
    },
    // ---- audio CONTENT: loudness over real 16-bit PCM frames — peak,
    // Σ|s|, Σs² exact BIGINT, per-channel-stride zero crossings, RMS by
    // the exact-floor IEEE sqrt. One narrow pass per blob; the oracle
    // replays the sample formula with generate_series ----
    "q270_wav_loudness" -> { (s, dir) =>
      Multimodal.pcmLoudness(
        Multimodal.pcmBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
        .orderBy("id")
    },
    // ---- audio CONTENT: silence segmentation (voice-activity shape) —
    // a frame is silent iff every channel |s| < 8192; reports silent
    // frames, maximal active runs, longest silent run ----
    "q271_wav_silence" -> { (s, dir) =>
      Multimodal.pcmSilence(
        Multimodal.pcmBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob",
        threshold = 8192)
        .orderBy("id")
    },
    // ---- image CONTENT: BMP 24-bit pixel-array decode (stride padding +
    // bottom-up rows) → exact per-channel sums + weighted checksum of the
    // 2×2 integer box downsample — real decode/resize, no codec needed ----
    "q272_bmp_pixels" -> { (s, dir) =>
      Multimodal.bmpPixelStats(
        Multimodal.bmpPixelBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
        .orderBy("id")
    },
    // ---- leakage-SAFE train/val/test split: the split key is the
    // near-dup CLUSTER (connected-component minimum), never the doc —
    // near-duplicates land in the same split by construction, which
    // q198 could only measure after the fact. Same pairs + CC as q61,
    // same md5 bands as q76 ----
    "q273_clustersafe_split" -> { (s, dir) =>
      val d = docs(s, dir)
      val emb = TextAnalysis.hashEmbedding(d, "doc_id", "text", 16)
      val pairs = Similarity.bucketedNeighbors(emb, "doc_id", "embedding",
          nBits = 4, minCos = 0.98, maxBucket = 100)
        .select("id1", "id2")
      TextAnalysis.hashSplit(
          Dedup.connectedKeepers(d.select("doc_id"), "doc_id", pairs),
          "keeper", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select("doc_id", "keeper", "split")
        .orderBy("doc_id")
    },
    // ---- first-occurrence 8-gram novelty per doc (memorization /
    // boilerplate profile): one gram-keyed min-doc aggregate + join
    // back; integer basis-point rate ----
    "q274_gram_novelty" -> { (s, dir) =>
      TextAnalysis.gramNovelty(docs(s, dir), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    },
    // ---- bigram-LM scoring (CCNet-style filter core, exact counts):
    // LM trained on even docs, odd docs classified per adjacent pair as
    // seen / backoff / OOV ----
    "q275_bigram_lm_score" -> { (s, dir) =>
      val d = docs(s, dir)
      TextAnalysis.bigramLmScore(
          d.filter(pmod(col("doc_id"), lit(2)) === 0),
          d.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text")
        .orderBy("doc_id")
    },
    // ---- chat-history truncation to a context budget (SFT pipeline):
    // synthetic turns (3 + (id+t) mod 5 tokens, +2 template tokens
    // each), keep the maximal suffix fitting 32 ----
    "q276_turn_truncate" -> { (s, dir) =>
      TextAnalysis.turnTruncate(docs(s, dir), "doc_id", "text", budget = 32L)
        .orderBy("doc_id")
    },
    // ---- incremental gram novelty against a persisted registry: each
    // batch scored vs everything ingested so far, registry grows by the
    // batch's new grams (insert-missing — a gram's first owner never
    // changes). Batches in ascending id order make the union equal the
    // one-shot q274 run, which is exactly what the oracle certifies ----
    "q277_novelty_incremental" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      val work = tempWorkDir("graft_q277_")
      val ps = new PartStore(s, PartStoreConfig(s"$work/grams", 64L,
        keyCols = Seq("digest")))
      val d = docs(s, dir)
      val r1 = TextAnalysis.gramNoveltyAppend(ps, "reg",
        d.filter(col("doc_id") < 250), "doc_id", "text", n = 8, modified = 1L)
        .localCheckpoint() // materialize before append 2 rewrites the part
      val r2 = TextAnalysis.gramNoveltyAppend(ps, "reg",
        d.filter(col("doc_id") >= 250), "doc_id", "text", n = 8, modified = 2L)
      r1.unionByName(r2).orderBy("doc_id")
    },
    // ---- streaming face of the gram-novelty registry: two micro-batches
    // through noveltySink (same ascending-id schedule as q277), then the
    // registry grouped by the batch that registered each gram — batch ≡
    // incremental ≡ streaming on one store contract ----
    "q279_stream_novelty" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      // md5-capped replay slice (q104/q190's convention): driver memory
      // O(1) in sf — the cap binds above sf0.01's 500 docs and is
      // mirrored in the oracle's capdocs CTE
      val rows = docs(s, dir).select("doc_id", "text")
        .withColumn("__h", md5(concat(lit("novcap:"),
          col("doc_id").cast("string"))))
        .orderBy("__h", "doc_id").limit(2048)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val work = tempWorkDir("graft_q279_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/grams", 64L,
          keyCols = Seq("digest")))
      val mem = MemoryStream[(Long, String)]
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.noveltySink(
        mem.toDF().toDF("doc_id", "text"), ps, "reg", "doc_id", "text", n = 8)
      try {
        mem.addData(rows.filter(_._1 < 250).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._1 >= 250).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      ps.readPart("reg").get
        .groupBy(col("modified").as("batch"))
        .agg(count(lit(1)).as("n_new_grams"))
        .orderBy("batch")
    },
    // ---- audio CONTENT dedup: loudness-envelope fingerprint over the
    // decoded samples — re-containered copies (same samples, different
    // rate label) collide on the envelope where q25's byte digest
    // cannot; min-id keeper per fingerprint ----
    "q280_audio_fingerprint" -> { (s, dir) =>
      val env = Multimodal.pcmEnvelope(
        Multimodal.pcmDupBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      val fp = env.select(col("id").as("doc_id"), md5(col("env")).as("fp"))
      val keepers = fp.groupBy("fp").agg(min(col("doc_id")).as("keeper"))
      fp.join(keepers, "fp")
        .select(col("doc_id"), col("fp"), col("keeper"),
          (col("doc_id") =!= col("keeper")).as("is_dup"))
        .orderBy("doc_id")
    },
    // ---- l-diversity audit (Machanavajjhala et al. 2006, public — the
    // step BEYOND q223's k-anonymity): a quasi-identifier class can be
    // large yet still leak if its SENSITIVE attribute is uniform.
    // QI = (source, length bucket), sensitive = lang; classes with
    // fewer than l = 2 distinct langs violate even when k-anonymous ----
    "q281_l_diversity" -> { (s, dir) =>
      docs(s, dir)
        .select(col("source"), expr("n_chars DIV 100").as("len_bucket"),
          col("lang"))
        .groupBy("source", "len_bucket")
        .agg(count(lit(1)).as("group_n"),
          countDistinct(col("lang")).as("n_langs"))
        .withColumn("k_anonymous", col("group_n") >= 5L)
        .withColumn("l_diverse", col("n_langs") >= 2L)
        .orderBy("source", "len_bucket")
    },
    // ---- deterministic negative sampling (contrastive/recsys training):
    // per user, the 3 md5-ranked catalog items they never interacted
    // with. The catalog is broadcast (bounded), negatives come from one
    // anti-join + a bounded sorted-slice aggregate — no RNG state, no
    // per-user window ----
    "q282_negative_sampling" -> { (s, dir) =>
      val inter = load(s, dir, "events")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull)
        .distinct()
      val items = inter.select("item").distinct()
      val users = inter.select("user_id").distinct()
      val top = users.crossJoin(broadcast(items))
        .join(inter, Seq("user_id", "item"), "left_anti")
        .withColumn("h", md5(concat(lit("neg:"), col("user_id").cast("string"),
          lit(":"), col("item").cast("string"))))
        .groupBy("user_id")
        .agg(slice(array_sort(collect_list(struct(col("h"), col("item")))),
          1, 3).as("top"))
      top.select(col("user_id"), posexplode(col("top")).as(Seq("i", "sel")))
        .select(col("user_id"), col("sel.item").as("neg_item"),
          (col("i") + 1).cast("long").as("rnk"))
        .orderBy("user_id", "rnk")
    },
    // ---- fill-in-the-middle transform audit (FIM, Bavarian et al.
    // 2022, public): md5-deterministic cut points split each doc into
    // prefix/middle/suffix, reassembled in PSM order (prefix, <SUF>,
    // suffix, <MID>, middle); lengths + the reassembly md5 gate the
    // transform exactly. Pure per-row expressions, no shuffle ----
    "q283_fim_transform" -> { (s, dir) =>
      val arr = split(trim(col("text")), "\\s+")
      val n = size(arr).cast("long")
      def cut(salt: String) = lit(1L) + pmod(
        conv(substring(md5(concat(lit(salt), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long"), n - 1L)
      val lo = least(cut("fim1:"), cut("fim2:"))
      val hi = greatest(cut("fim1:"), cut("fim2:"))
      val psm = concat_ws(" ", concat(
        slice(arr, lit(1), lo.cast("int")),
        array(lit("<SUF>")),
        slice(arr, (hi + 1L).cast("int"), (n - hi).cast("int")),
        array(lit("<MID>")),
        slice(arr, (lo + 1L).cast("int"), (hi - lo).cast("int"))))
      docs(s, dir).select(col("doc_id"), n.as("n_tokens"),
          lo.as("p_len"), (hi - lo).as("m_len"), (n - hi).as("s_len"),
          md5(psm).as("psm_md5"))
        .orderBy("doc_id")
    },
    // ---- retrieval evaluation (IR eval over the q235 textbook BM25):
    // relevance = docs carrying ALL query tokens; precision@10,
    // recall@20 and MRR in integer basis points. Ranks come from
    // Ranks.globalDenseRank (range partition + zipWithIndex), never a
    // partition-less window ----
    // ---- nDCG@10 completes the retrieval-eval family (q284 has
    // P@10/MRR): same BM25 ranking, GRADED judgments (gain = how many of
    // the 3 query tokens the doc contains — nDCG's whole point over
    // binary P@k). Gate compares the exact (rank, doc, gain, ideal_gain)
    // table; the log2-weighted quotient is spec-tested and dropped, per
    // the q74/q235 fixed-point-ln convention ----
    "q298_ndcg" -> { (s, dir) =>
      val d = docs(s, dir)
      val q = Seq("dup", "key", "vector")
      val top = TextAnalysis.bm25SearchLog(d, "doc_id", "text", q, topN = 20)
      val ranked = graft.functions.Ranks.globalDenseRank(
          top.select((-col("score_scaled")).as("negscore"), col("doc_id")),
          Seq("negscore", "doc_id"))
        .select(col("doc_id"), col("__r").as("rnk"))
      val gains = TextAnalysis.tokens(d, "doc_id", "text")
        .filter(col("tok").isin(q: _*))
        .groupBy("doc_id")
        .agg(countDistinct(col("tok")).cast("long").as("gain"))
      TextAnalysis.ndcgAtK(ranked, gains, "doc_id", k = 10)
        .drop("ndcg_scaled")
        .orderBy("rnk")
    },
    "q284_retrieval_eval" -> { (s, dir) =>
      val d = docs(s, dir)
      val q = Seq("dup", "key", "vector")
      val top = TextAnalysis.bm25SearchLog(d, "doc_id", "text", q, topN = 20)
      val ranked = graft.functions.Ranks.globalDenseRank(
          top.select((-col("score_scaled")).as("negscore"), col("doc_id")),
          Seq("negscore", "doc_id"))
        .select(col("doc_id"), col("__r").as("rnk"))
      val rel = TextAnalysis.tokens(d, "doc_id", "text")
        .filter(col("tok").isin(q: _*))
        .groupBy("doc_id").agg(countDistinct(col("tok")).as("nq"))
        .filter(col("nq") === q.length)
        .select(col("doc_id"), lit(1).as("relv"))
      ranked.join(rel, Seq("doc_id"), "left")
        .agg(count(lit(1)).as("n_retrieved"),
          sum(when(col("rnk") <= 10 && col("relv").isNotNull, 1L)
            .otherwise(0L)).as("hits_at_10"),
          sum(when(col("relv").isNotNull, 1L).otherwise(0L)).as("rel_retrieved"),
          min(when(col("relv").isNotNull, col("rnk"))).as("first_rel"))
        .crossJoin(broadcast(rel.agg(count(lit(1)).as("n_relevant"))))
        .select(col("n_retrieved"), col("n_relevant"), col("hits_at_10"),
          col("rel_retrieved"),
          expr("10000 * hits_at_10 DIV 10").as("prec10_bp"),
          when(col("n_relevant") === 0L, 0L)
            .otherwise(expr("10000 * rel_retrieved DIV n_relevant"))
            .as("recall20_bp"),
          coalesce(expr("10000 DIV first_rel"), lit(0L)).as("mrr_bp"))
    },
    // ---- deterministic random-walk corpus (DeepWalk/node2vec shape,
    // Perozzi et al. 2014): 3-hop walks over the user–item bipartite
    // graph, each hop picking the md5-minimal neighbor (salted by step,
    // so hops differ) — graph-to-sequence training data with no RNG
    // state. Three message-passing joins + min_by aggregates ----
    "q285_deepwalk" -> { (s, dir) =>
      val adj = load(s, dir, "events")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull)
        .distinct()
        .localCheckpoint() // three hops reuse it
      def hopItem(step: Int, userCol: String, out: String) = adj
        .groupBy(col("user_id").as(userCol))
        .agg(expr(s"min_by(item, md5(concat('w:$step:', " +
          "cast(user_id as string), ':', cast(item as string))))").as(out))
      val hopUser = adj
        .groupBy(col("item").as("i1"))
        .agg(expr("min_by(user_id, md5(concat('w:2:', " +
          "cast(item as string), ':', cast(user_id as string))))").as("u2"))
      hopItem(1, "u0", "i1")
        .join(hopUser, "i1")
        .join(hopItem(3, "u2", "i3"), "u2")
        .select(col("u0"), col("i1"), col("u2"), col("i3"))
        .orderBy("u0")
    },
    // ---- epoch shuffling for training (md5-permuted order per epoch,
    // fixed-size shards): the cross-epoch shard contingency table —
    // exactly how much of each shard epoch 1 reshuffles away. Ranks by
    // globalDenseRank, never a partition-less window ----
    "q286_epoch_shuffle" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id")
      def shards(epoch: Int) = graft.functions.Ranks.globalDenseRank(
          d.withColumn("h",
            md5(concat(lit(s"ep:$epoch:"), col("doc_id").cast("string"))))
            .select("h", "doc_id"),
          Seq("h"))
        .select(col("doc_id"), expr("(__r - 1) DIV 64").as(s"shard_e$epoch"))
      shards(0).join(shards(1), "doc_id")
        .groupBy("shard_e0", "shard_e1")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("shard_e0", "shard_e1")
    },
    // ---- dedup-quality evaluation: LSH candidate recall/precision vs
    // the exact Jaccard ground truth (both already oracle-gated alone —
    // this gate measures the APPROXIMATION, the number a dedup rollout
    // decision actually turns on). Integer basis points ----
    "q287_lsh_eval" -> { (s, dir) =>
      val sh = Dedup.shingles(toks(s, dir), "doc_id", 3).localCheckpoint()
      val sig = Dedup.minhashSignature(sh, "doc_id", 8)
      val cand = Dedup.lshCandidates(Dedup.lshBuckets(sig, "doc_id", 4, 2),
        "doc_id", maxBucket = 50).select("id1", "id2")
      val truth = Dedup.jaccardPairs(sh, "doc_id", 0.10, maxDocFreq = 100)
        .select("id1", "id2").localCheckpoint()
      val hit = truth.join(cand, Seq("id1", "id2"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
        .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
        .select(col("n_truth"), col("n_candidates"), col("n_hit"),
          when(col("n_truth") === 0L, 0L)
            .otherwise(expr("10000 * n_hit DIV n_truth")).as("recall_bp"),
          when(col("n_candidates") === 0L, 0L)
            .otherwise(expr("10000 * n_hit DIV n_candidates")).as("precision_bp"))
    },
    // ---- ANN index health check: IVF(nProbe=2) recall@5 per query vs
    // the exact brute-force top-5 — the monitoring gate an embedding
    // index deployment runs after every build ----
    "q288_ann_recall_eval" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") % 100 === 0)
      val centroids = Similarity.ivfCentroidsRefinedFull(e, "vec_id", "embedding", 8)
      val ivf = Similarity.ivfTopK(queries, e, "vec_id", "embedding",
          centroids, k = 5, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      exact.join(ivf, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
        .withColumn("recall_bp", expr("10000 * n_overlap DIV 5"))
        .orderBy("query_id")
    },
    // ---- tokenizer evaluation (compression rate / fertility per
    // stratum): chars-per-BPE-token and pieces-per-word over the
    // q187-learned merges, per (lang, source) — the numbers a tokenizer
    // rollout compares across corpora. Broadcast vocab, two aggregates ----
    "q289_tokenizer_eval" -> { (s, dir) =>
      val d = docs(s, dir)
      val vocab = TextAnalysis.bpeVocab(d, "doc_id", "text", nMerges = 3)
        .select(col("word"), size(col("toks")).cast("long").as("n_pieces"))
      val per = TextAnalysis.tokens(d, "doc_id", "text").filter(col("tok") =!= "")
        .join(broadcast(vocab), col("tok") === col("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_bpe"))
      d.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .join(per, "doc_id")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          sum("n_words").as("n_words"), sum("n_bpe").as("n_bpe_tokens"))
        .withColumn("chars_per_token_bp",
          expr("10000 * sum_chars DIV n_bpe_tokens"))
        .withColumn("fertility_bp", expr("10000 * n_bpe_tokens DIV n_words"))
        .orderBy("lang", "source")
    },
    // ---- Spearman rank correlation between two corpus signals (length
    // vs 8-gram novelty), exact: ranks via globalDenseRank with doc-id
    // tie-break, Σd² and ρ = 1 − 6Σd²/(n(n²−1)) carried as exact
    // integers (the division keeps positive operands — DIV ≡ // only
    // holds for positives) ----
    "q290_spearman" -> { (s, dir) =>
      val d = docs(s, dir)
      val base = d.select(col("doc_id"), col("n_chars"))
        .join(TextAnalysis.gramNovelty(d, "doc_id", "text", n = 8)
          .select(col("doc_id"), col("novelty_bp")), "doc_id")
        .localCheckpoint() // both rank passes read it
      val rx = graft.functions.Ranks.globalDenseRank(
          base.select("n_chars", "doc_id"), Seq("n_chars", "doc_id"))
        .select(col("doc_id"), col("__r").as("rx"))
      val ry = graft.functions.Ranks.globalDenseRank(
          base.select("novelty_bp", "doc_id"), Seq("novelty_bp", "doc_id"))
        .select(col("doc_id"), col("__r").as("ry"))
      rx.join(ry, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("sum_d2"))
        .select(col("n"), col("sum_d2"),
          (col("n") * (col("n") * col("n") - 1L)).as("rho_den"),
          (lit(10000L) - expr("(60000 * sum_d2) DIV (n * (n * n - 1))"))
            .as("rho_bp"))
    },
    // ---- multi-probe LSH retrieval (Lv et al. 2007): own bucket + all
    // Hamming-1 buckets probed, exact rerank — recall without more hash
    // tables, the missing rung between single-bucket LSH (q36) and IVF ----
    "q291_multiprobe_lsh" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      Similarity.multiProbeTopK(e.filter(col("vec_id") % 100 === 0), e,
          "vec_id", "embedding", nBits = 8, k = 5)
        .orderBy("query_id", "rank")
    },
    // ---- t-closeness audit (Li et al. 2007, public — the third rung of
    // the privacy triad after q223 k-anonymity and q281 l-diversity): a
    // class can be k-anonymous AND l-diverse yet still leak when its
    // sensitive distribution diverges from the table's. For categorical
    // attributes EMD = total-variation distance — a rational, carried as
    // exact integers: t = Σ|cnt·N − total·n| / (2·n·N) ----
    // ---- the split applied to a STORED by-bucket index: moved rows
    // physically change partition directory through the staged swap,
    // subcell centroids are fixed-point means, and the partition-pruned
    // retrieval over the post-split index is oracle-exact — index
    // maintenance end to end ----
    "q306_ivf_split_stored" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefinedFull(e, "vec_id", "embedding", 8)
      val work = tempWorkDir("graft_q306_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 1L, keyCols = Seq("entity_id")))
      ps.store("emb", e.select(col("vec_id").as("entity_id"),
        Similarity.ivfBucket(col("embedding"), cents).cast("long")
          .as("timestamp"),
        col("embedding"),
        Similarity.ivfBucket(col("embedding"), cents).as("bucket"),
        lit(1L).as("modified")))
      val newCents = Similarity.applyCellSplitStored(ps, "emb", cents, cap = 70)
      Similarity.ivfTopKStoredPruned(e.filter(col("vec_id") % 100 === 0),
          ps, "emb", "vec_id", "embedding", newCents, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    },
    // ---- IVF hot-cell split (the skewed-cell maintenance verb — FAISS
    // retrains, SPANN re-partitions hot leaves; here a deterministic
    // 2-way split around the cell's two md5-minimal members): cells over
    // the cap split, subcell 0 keeps the id, subcell 1 takes
    // maxBucket + rank. No per-cell window on the Spark side — a hot
    // cell is exactly what one task must never sort ----
    "q305_ivf_cell_split" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefinedFull(e, "vec_id", "embedding", 8)
      val assigned = e.select(col("vec_id"),
        col("embedding"), Similarity.ivfBucket(col("embedding"), cents).as("bucket"))
      Similarity.ivfCellSplit(assigned, "vec_id", "embedding", "bucket", cap = 70)
        .select(col("id").as("vec_id"), col("bucket_old"), col("bucket_new"))
        .orderBy("vec_id")
    },
    // ---- Unicode NFC normalization audit (UAX #15) via the native
    // codegen'd NfcNormalize expression: decomposed and precomposed
    // accents are different BYTES for the same text — normalize before
    // any digest/dedup/shingle or the same document splits. Fixture
    // injects a decomposed e+U+0301 (doc_id%3==0) and a precomposed é
    // (%3==1); the audit reports NFC status, char lengths, and the
    // post-normalization digest ----
    "q304_unicode_nfc" -> { (s, dir) =>
      val mod = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("é "), col("text")))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            concat(lit("é "), col("text")))
          .otherwise(col("text")).as("text"))
      val nfc = graft.expressions.StringExpressions.nfc(col("text"))
      mod.select(col("doc_id"),
          (col("text") === nfc).as("is_nfc"),
          length(col("text")).cast("long").as("len_raw"),
          length(nfc).cast("long").as("len_nfc"),
          md5(nfc).as("dg_nfc"))
        .orderBy("doc_id")
    },
    // ---- streaming decontamination sink completes the q63 family's
    // triangle (batch digest / incremental q302 spans / streaming here):
    // train docs stream in two md5-capped micro-batches, the eval digest
    // store is fixed state, every doc lands stamped with its verdict.
    // Splice: train docs with doc_id % 10 == 1 carry the PREVIOUS (eval)
    // doc's text, so contaminated rows are guaranteed, not incidental ----
    "q303_stream_decontam" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val d = docs(s, dir).select("doc_id", "text")
      val donor = d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1).as("doc_id"), col("text").as("donor"))
      val train = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        .join(donor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(10)) === 1 && col("donor").isNotNull,
            col("donor")).otherwise(col("text")).as("text"))
      val work = tempWorkDir("graft_q303_")
      val es = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/eval", 1L << 55,
          keyCols = Seq("digest")))
      es.store("ev", d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(Dedup.digest(col("text")).as("digest")).distinct()
        .withColumn("entity_id",
          conv(substring(col("digest"), 1, 15), 16, 10).cast("long"))
        .withColumn("timestamp", col("entity_id"))
        .withColumn("modified", lit(1L)))
      val os = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/out", 500,
          keyCols = Seq("entity_id")))
      // md5-capped replay slice (q104's convention; binds above sf0.01)
      val rows = train
        .withColumn("__h", md5(concat(lit("dctcap:"),
          col("doc_id").cast("string"))))
        .orderBy("__h", "doc_id").limit(2048)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val mem = MemoryStream[(Long, String)]
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.decontamSink(
        mem.toDF().toDF("doc_id", "text"), es, "ev", os, "out",
        "doc_id", "text")
      try {
        mem.addData(rows.filter(_._1 % 2 == 0).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._1 % 2 == 1).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      os.readPart("out").get
        .select(col("entity_id").as("doc_id"), col("contaminated"))
        .orderBy("doc_id")
    },
    // ---- incremental contamination registry: the SAME answer as q299,
    // but the train anchors accrue through a two-batch persisted store
    // (anchorDupIncremental) before the eval probe — the weeks-long
    // training-corpus reality. Oracle literally IS q299's: storage is
    // answer-invisible ----
    "q302_contamination_incremental" -> { (s, dir) =>
      val d = docs(s, dir)
      val donor = d.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("donor_text"))
      val evalDf = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .join(donor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(10)) === 0 && col("donor_text").isNotNull,
            concat_ws(" ", col("donor_text"), col("text")))
            .otherwise(col("text")).as("text"))
      val trainDf = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val hv = conv(substring(md5(concat(lit("ctr:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      val work = tempWorkDir("graft_q302_")
      val as = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/a", 1L << 55,
          keyCols = Seq("digest", "gpos")))
      val ds2 = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/d", 500,
          keyCols = Seq("entity_id")))
      Dedup.anchorDupIncremental(as, ds2, "tr",
        trainDf.filter(hv === 0L), "doc_id", "text").count()
      Dedup.anchorDupIncremental(as, ds2, "tr",
        trainDf.filter(hv === 1L), "doc_id", "text").count()
      Dedup.contaminationSpansStored(as, "tr", evalDf, "doc_id", "text")
        .orderBy("doc_id")
    },
    // ---- curriculum interleave (Bengio et al. 2009 curriculum order ×
    // mixture balance): hardest-first within each source, round-robin
    // across sources — the training-order permutation, with NO
    // per-source window (two globalDenseRank passes + a |sources|-row
    // broadcast offset) ----
    "q301_curriculum_interleave" -> { (s, dir) =>
      TextAnalysis.curriculumInterleave(docs(s, dir),
          "doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },
    // ---- generation-eval: BLEU modified n-gram precision (Papineni et
    // al. 2002) per (candidate, reference) pair — candidate doc i vs
    // reference doc i+1, so q142's engineered dup clusters surface as
    // perfect-precision rows against a mostly-disjoint background.
    // Exact clipped/total integers + bp precisions; the exp/log BLEU
    // composite is spec-side ----
    "q300_ngram_precision" -> { (s, dir) =>
      val d = docs(s, dir)
      val pairs = d.select(col("doc_id").as("cand_id"),
          (col("doc_id") + 1).as("ref_id"))
        .join(d.select(col("doc_id").as("ref_id")), Seq("ref_id"))
      TextAnalysis.ngramPrecision(pairs, d, "doc_id", "text", ns = Seq(1, 2))
        .orderBy("cand_id")
    },
    // ---- span-level contamination audit (the Lee et al. 2022 / GPT-3
    // n-gram overlap methodology): eval docs with doc_id % 10 == 0 get a
    // TRAIN doc's text prepended, so the gate measures real shared
    // spans — per eval doc, contaminated anchors, longest shared run,
    // contamination basis points. Completes the decontamination family
    // (q63 exact digest, q98 Bloom) at span granularity ----
    "q299_contamination_spans" -> { (s, dir) =>
      val d = docs(s, dir)
      val donor = d.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("donor_text"))
      val evalDf = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .join(donor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(10)) === 0 && col("donor_text").isNotNull,
            concat_ws(" ", col("donor_text"), col("text")))
            .otherwise(col("text")).as("text"))
      val trainDf = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      Dedup.contaminationSpans(trainDf, evalDf, "doc_id", "text")
        .orderBy("doc_id")
    },
    // ---- incremental exact-substring dedup (q264's incremental tier):
    // two md5-split batches append anchor grams to a digest-range store;
    // the read-time stats are RETROACTIVE (a batch-1 doc duplicated only
    // by batch 2 reports it) and equal the fresh chain over the union —
    // n_dup_pos is bit-equal to q264's rank-chain definition by the
    // anchor identity (exact dup prefix >= 8 iff the 8-gram repeats),
    // spec-asserted against suffixDupSpans itself ----
    "q297_suffix_incremental" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val hv = conv(substring(md5(concat(lit("sfx:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      val work = tempWorkDir("graft_q297_")
      val as = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/a", 1L << 55,
          keyCols = Seq("digest", "gpos")))
      val ds = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/d", 500,
          keyCols = Seq("entity_id")))
      def run(b: org.apache.spark.sql.DataFrame) =
        Dedup.anchorDupIncremental(as, ds, "sfx", b, "doc_id", "text")
      run(d.filter(hv === 0L)).count() // batch 1 -> state (+ its stats)
      run(d.filter(hv === 1L)).count() // batch 2 appends + probes
      Dedup.anchorDupStats(as, ds, "sfx").orderBy("doc_id")
    },
    // ---- small-file compaction is answer-invisible (the q216/q226
    // "stored ≡ fresh" convention, here "stored ≡ compacted"): two
    // z-ordered store batches fragment every partition dir into many
    // range-task files, compactPart bin-packs them, and the read-back
    // must still equal the fresh per-doc token counts. did_compact rides
    // along so the oracle also pins that the compactor REWROTE partitions
    // (how many is physical — range-sampling decides which pindexes span
    // multiple tasks — so the exact counts live in PartStoreSpec) ----
    "q295_compact_store" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
      val sp = pmod(conv(substring(md5(concat(lit("cpt:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val rows = d.select(col("doc_id").as("entity_id"),
        pmod(col("doc_id"), lit(256L)).as("timestamp"),
        col("n_toks"), lit(1L).as("modified"), sp.as("__s"))
        .localCheckpoint()
      val work = tempWorkDir("graft_q295_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 64L))
      ps.store("toks", rows.filter(col("__s") === 0).drop("__s"),
        zorderBy = Seq("entity_id", "n_toks"))
      ps.store("toks", rows.filter(col("__s") === 1).drop("__s"),
        zorderBy = Seq("entity_id", "n_toks"))
      val compacted = ps.compactPart("toks")
      ps.readPart("toks").get
        .select(col("entity_id").as("doc_id"), col("n_toks"),
          lit(compacted >= 1).as("did_compact"))
        .orderBy("doc_id")
    },
    "q294_t_closeness" -> { (s, dir) =>
      val d = docs(s, dir)
        .select(col("source"), expr("n_chars DIV 100").as("len_bucket"),
          col("lang")).localCheckpoint()
      val cl = d.groupBy("source", "len_bucket", "lang")
        .agg(count(lit(1)).as("cnt"))
      val cls = d.groupBy("source", "len_bucket").agg(count(lit(1)).as("n"))
      val g = d.groupBy("lang").agg(count(lit(1)).as("total"))
      val nTotal = d.agg(count(lit(1)).as("n_corpus"))
      cls.crossJoin(broadcast(g)).crossJoin(broadcast(nTotal))
        .join(cl, Seq("source", "len_bucket", "lang"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .groupBy("source", "len_bucket")
        .agg(max(col("n")).as("group_n"),
          sum(abs(col("cnt") * col("n_corpus") - col("total") * col("n")))
            .as("t_num"),
          (max(col("n")) * max(col("n_corpus")) * 2L).as("t_den"))
        .withColumn("t_bp", expr("10000 * t_num DIV t_den"))
        .orderBy("source", "len_bucket")
    },
    // ---- dataset card (Datasheets for Datasets, Gebru et al. 2018,
    // public): the corpus datasheet a release publishes, as one
    // long-format (metric, value) table of exact integers — sizes,
    // diversity, duplication. Every metric is a one-scan aggregate ----
    "q292_dataset_card" -> { (s, dir) =>
      val d = docs(s, dir).localCheckpoint()
      def metric(name: String, df: DataFrame) =
        df.select(lit(name).as("metric"), col("value").cast("long").as("value"))
      val toks = TextAnalysis.tokens(d, "doc_id", "text")
        .filter(col("tok") =!= "")
      metric("n_docs", d.agg(count(lit(1)).as("value")))
        .unionByName(metric("n_tokens", toks.agg(count(lit(1)).as("value"))))
        .unionByName(metric("n_chars", d.agg(sum("n_chars").as("value"))))
        .unionByName(metric("n_langs", d.agg(countDistinct("lang").as("value"))))
        .unionByName(metric("n_sources",
          d.agg(countDistinct("source").as("value"))))
        .unionByName(metric("vocab_size",
          toks.agg(countDistinct("tok").as("value"))))
        .unionByName(metric("exact_dup_docs",
          d.select(Dedup.digest(col("text")).as("dg"))
            .groupBy("dg").agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)
            .agg(coalesce(sum("c"), lit(0L)).as("value"))))
        .unionByName(metric("median_doc_chars",
          d.agg(expr("CAST(percentile(n_chars, 0.5) * 2 AS BIGINT)")
            .as("value")))) // doubled to stay integer at even counts
        .orderBy("metric")
    },
    // ---- the LLM data-pipeline funnel as ONE driver-checked gate (the
    // q238 treatment for the curation loop): raw → integer-exact quality
    // rule (n_toks ≥ 20, top-token ratio ≤ 1/5) → near-dup keep-best
    // (clusters computed corpus-wide so cluster identity is stable;
    // quality and dedup INTERSECT) → cluster-safe train split → 512-token
    // packing estimate; per-stage doc/token counts ----
    "q293_pipeline_capstone" -> { (s, dir) =>
      val d = docs(s, dir)
      val tc = TextAnalysis.tokens(d, "doc_id", "text").filter(col("tok") =!= "")
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(sum("cnt").as("n_toks"), max("cnt").as("max_tok"))
        .localCheckpoint()
      val qual = tc.filter(col("n_toks") >= 20L && col("max_tok") * 5 <= col("n_toks"))
        .select("doc_id", "n_toks")
      val emb = TextAnalysis.hashEmbedding(d, "doc_id", "text", 16)
      val pairs = Similarity.bucketedNeighbors(emb, "doc_id", "embedding",
        nBits = 4, minCos = 0.98, maxBucket = 100).select("id1", "id2")
      val comp = Dedup.connectedKeepers(d.select("doc_id"), "doc_id", pairs)
        .localCheckpoint()
      val nd = qual.join(
        comp.filter(col("keeper") === col("doc_id")).select("doc_id"), "doc_id")
      val tr = TextAnalysis.hashSplit(nd.join(comp, "doc_id"), "keeper",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .filter(col("split") === "train").select("doc_id", "n_toks")
        .localCheckpoint() // two funnel rows read it
      def stage(name: String, df: DataFrame) = df
        .agg(count(lit(1)).as("n_docs"), coalesce(sum("n_toks"), lit(0L)).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs").cast("long").as("n_docs"),
          col("n_tokens").cast("long").as("n_tokens"))
      stage("0_raw", tc.select("doc_id", "n_toks"))
        .unionByName(stage("1_quality", qual))
        .unionByName(stage("2_neardup", nd))
        .unionByName(stage("3_train", tr))
        .unionByName(tr
          .agg(coalesce(sum("n_toks"), lit(0L)).as("tok"))
          .select(lit("4_packed_512").as("stage"),
            expr("(tok + 511) DIV 512").as("n_docs"), col("tok").as("n_tokens")))
        .orderBy("stage")
    },
    // ---- cross-modal curation capstone: one keep/drop decision joining
    // the text tier (8-gram novelty), the audio tier (silence fraction)
    // and the image tier (orientation) — the shape a multimodal corpus
    // filter actually runs, all thresholds on exact integers ----
    "q278_multimodal_curation" -> { (s, dir) =>
      val d = docs(s, dir)
      val nov = TextAnalysis.gramNovelty(d, "doc_id", "text", n = 8)
        .select(col("doc_id"), col("novelty_bp"))
      val sil = Multimodal.pcmSilence(
          Multimodal.pcmBlobs(d, "doc_id", "n_chars"), "doc_id", "blob",
          threshold = 8192)
        .select(col("id").as("doc_id"),
          when(col("frames") === 0L, 10000L)
            .otherwise(expr("10000 * silent_frames DIV frames")).as("silence_bp"))
      val img = Multimodal.bmpPixelStats(
          Multimodal.bmpPixelBlobs(d, "doc_id", "n_chars"), "doc_id", "blob")
        .select(col("id").as("doc_id"), (col("width") > col("height")).as("landscape"))
      nov.join(sil, "doc_id").join(img, "doc_id")
        .withColumn("keep",
          col("novelty_bp") >= 5000L && col("silence_bp") <= 2500L && col("landscape"))
        .orderBy("doc_id")
    },
    // ---- token co-occurrence association (PMI's ratio form): pairs
    // within a 3-token window via constant-fanout offset expansion +
    // equi-join on (doc, pos) — never a per-doc range join; counts
    // exact, the association ratio p(xy)/(p(x)p(y)) reported as one
    // fixed double expression; selection by exact pair count ----
    "q228_cooccurrence" -> { (s, dir) =>
      val t = TextAnalysis.tokens(docs(s, dir), "doc_id", "text")
        .filter(col("tok") =!= "")
      val right = t.select(col("doc_id"), col("pos").as("rpos"),
        col("tok").as("rtok"))
      val pairs = t
        .withColumn("k", explode(array(lit(1), lit(2), lit(3))))
        .withColumn("rpos", col("pos") + col("k"))
        .join(right, Seq("doc_id", "rpos"))
        .select(least(col("tok"), col("rtok")).as("a"),
          greatest(col("tok"), col("rtok")).as("b"))
      val cxy = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_xy"))
      val cx = t.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val totals = t.agg(count(lit(1)).as("n_toks"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
      cxy
        .join(cx.select(col("tok").as("a"), col("c").as("c_a")), "a")
        .join(cx.select(col("tok").as("b"), col("c").as("c_b")), "b")
        .crossJoin(broadcast(totals))
        .filter(col("c_xy") >= 5)
        .withColumn("assoc_ratio",
          col("c_xy").cast("double") * col("n_toks") / col("n_pairs")
            * col("n_toks") / col("c_a") / col("c_b"))
        .select("a", "b", "c_xy", "c_a", "c_b", "assoc_ratio")
        .orderBy(col("c_xy").desc, col("a"), col("b"))
        .limit(50)
    },
    // ---- graph-based ANN: NN-Descent k-NN graph (Dong et al. 2011),
    // deterministic bucket + md5-ring init, 2 neighbor-of-neighbor rounds ----
    "q130_nn_descent" -> { (s, dir) =>
      Similarity.nnDescent(load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 4, iterations = 2, initBits = 4)
        .orderBy("query_id", "rank")
    },
    // ---- max-passage retrieval: chunk the corpus, BM25-score passages,
    // keep each doc's best passage from the top-50 pool (composition of
    // chunkTokens + bm25Search, the standard long-doc retrieval shape) ----
    "q131_passage_search" -> { (s, dir) =>
      val chunks = TextAnalysis.chunkTokens(docs(s, dir), "doc_id", "text",
          chunkSize = 64, stride = 48)
        .withColumn("passage_id", col("doc_id") * 100000 + col("chunk_id"))
      TextAnalysis.bm25Search(chunks, "passage_id", "chunk_text",
          queryToks = Seq("hash", "join", "merge"), topN = 50)
        .withColumn("doc_id", expr("passage_id div 100000"))
        .groupBy("doc_id")
        .agg(max(col("score_scaled")).as("best_passage_score"),
          count(lit(1)).as("n_passages_in_top"))
        .orderBy(col("best_passage_score").desc, col("doc_id"))
    },
    // ---- exact triangle counts on the derived interaction graph
    // (degree-ordered node-iterator — wedge work O(m^1.5), not Σdeg²) ----
    "q132_triangles" -> { (s, dir) =>
      val e = load(s, dir, "events")
      val edges = e.select(col("user_id").as("src"),
        pmod(col("event_id"), lit(97)).cast("long").as("dst"))
      Graph.triangleCounts(edges, "src", "dst").orderBy("node")
    },
    // ---- graph-ANN retrieval: greedy beam search over the NN-Descent
    // graph (HNSW layer-0 walk) — md5-smallest entry points, 2 hops,
    // beam 8, exact top-4 out ----
    "q133_graph_search" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val g = Similarity.nnDescent(e, "vec_id", "embedding",
        k = 4, iterations = 0, initBits = 4)
      val qs = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      Similarity.graphSearch(qs, g, e, "vec_id", "embedding",
          k = 4, beam = 8, hops = 2, entries = 4, seedBits = 4)
        .orderBy("query_id", "rank")
    },
    // ---- two-layer graph-ANN retrieval (the HNSW shape): md5-level
    // 1/16 coarse subset, NN-Descent graph per layer, LSH-seeded coarse
    // walk (beam 4, 2 hops) locates + refines the basin and seeds the
    // layer-0 beam search — measured (LayeredSweep / AnnRecallProbe):
    // matches flat search one hop deeper at fewer distance evals ----
    "q161_layered_search" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val sub = e.join(
        Similarity.coarseLayerNodes(e, "vec_id", denom = 16)
          .select(col("id").as("vec_id")),
        Seq("vec_id"), "left_semi")
      val g0 = Similarity.nnDescent(e, "vec_id", "embedding",
        k = 4, iterations = 0, initBits = 4)
      val g1 = Similarity.nnDescent(sub, "vec_id", "embedding",
        k = 4, iterations = 0, initBits = 4)
      val qs = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      Similarity.graphSearchLayered(qs, g0, g1, e, "vec_id", "embedding",
          k = 4, beam = 8, hops = 2, entries = 4, beam1 = 4, hops1 = 2,
          seedBits = 4)
        .orderBy("query_id", "rank")
    },
    // ---- semi-supervised label propagation over the k-NN graph: 5% of
    // nodes keep ground-truth labels, two synchronous majority-vote
    // rounds spread them along graph edges (ties → smallest label) —
    // the weak-supervision expansion step of a labeling pipeline ----
    "q183_label_propagation" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val g = Similarity.nnDescent(e, "vec_id", "embedding",
        k = 4, iterations = 0, initBits = 4)
      val seeds = e.filter(pmod(col("vec_id"), lit(20)) === 0)
        .select("vec_id", "label")
      Graph.labelPropagate(g, "query_id", "neighbor_id",
          seeds, "vec_id", "label", iterations = 2)
        .orderBy("node")
    },
    // ---- incremental persisted graph-ANN index (the HNSW insert loop):
    // two batches build the stored graph — batch 2 beam-searches the
    // EXISTING index for its neighbors, links bidirectionally, appends —
    // then retrieval runs over the accumulated store. Insertion-order
    // semantics, but the SCHEDULE is fixed and deterministic, so the
    // oracle replays it end-to-end as chained CTEs (per-batch nnDescent
    // + the cross-link beam search + retrieval over the union edge set);
    // SimilaritySpec still measures recall vs the fresh build ----
    "q194_graph_incremental" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val work = tempWorkDir("graft_q194_")
      val es = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/e", 500, keyCols = Seq("entity_id", "dst")))
      val vs = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/v", 500, keyCols = Seq("entity_id")))
      val hv = conv(substring(md5(concat(lit("gidx:"),
          col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      def insert(b: org.apache.spark.sql.DataFrame): Unit =
        Similarity.graphInsertBatch(es, vs, "g", b, "vec_id", "embedding",
          k = 4, beam = 8, hops = 2, entries = 4, seedBits = 4)
      insert(e.filter(hv === 0L))
      insert(e.filter(hv === 1L))
      val (g, v) = Similarity.readGraphIndex(es, vs, "g")
      Similarity.graphSearch(e.filter(col("vec_id") % 50 === 0), g,
          v.select(col("entity_id").as("vec_id"), col("vec").as("embedding")),
          "vec_id", "embedding", k = 4, beam = 8, hops = 2, entries = 4,
          seedBits = 4)
        .orderBy("query_id", "rank")
    },
    // ---- graph-store degree compaction (the HNSW M-prune, bulk form):
    // q194's insert schedule grows hot nodes' degrees through reverse
    // links; compaction prunes every node to its top-4 out-edges by
    // exact cosine inside the store rewrite, then retrieval runs over
    // the pruned store. Oracle = q194's replay + one prune CTE ----
    "q239_graph_compact" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val work = tempWorkDir("graft_q239_")
      val es = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/e", 500, keyCols = Seq("entity_id", "dst")))
      val vs = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/v", 500, keyCols = Seq("entity_id")))
      val hv = conv(substring(md5(concat(lit("gidx:"),
          col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      def insert(b: org.apache.spark.sql.DataFrame): Unit =
        Similarity.graphInsertBatch(es, vs, "g", b, "vec_id", "embedding",
          k = 4, beam = 8, hops = 2, entries = 4, seedBits = 4)
      insert(e.filter(hv === 0L))
      insert(e.filter(hv === 1L))
      Similarity.graphCompact(es, vs, "g", k = 4)
      val (g, v) = Similarity.readGraphIndex(es, vs, "g")
      Similarity.graphSearch(e.filter(col("vec_id") % 50 === 0), g,
          v.select(col("entity_id").as("vec_id"), col("vec").as("embedding")),
          "vec_id", "embedding", k = 4, beam = 8, hops = 2, entries = 4,
          seedBits = 4)
        .orderBy("query_id", "rank")
    },
    // ---- LAYERED incremental graph index: q194's insert schedule with
    // the coarse 1/16 layer maintained incrementally alongside (same
    // loop, 1/denom of the work), so the ACCUMULATED store serves the
    // two-layer q161 retrieval — stored-index HNSW, both layers grown
    // by appends. Deterministic schedule → the oracle replays both
    // layers' construction and the layered walk as chained CTEs ----
    "q234_layered_incremental" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val work = tempWorkDir("graft_q234_")
      val es = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/e", 500, keyCols = Seq("entity_id", "dst")))
      val vs = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/v", 500, keyCols = Seq("entity_id")))
      val hv = conv(substring(md5(concat(lit("gidx:"),
          col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      def insert(b: org.apache.spark.sql.DataFrame): Unit =
        Similarity.graphInsertBatchLayered(es, vs, "g", b, "vec_id", "embedding",
          k = 4, beam = 8, hops = 2, entries = 4, seedBits = 4, denom = 16)
      insert(e.filter(hv === 0L))
      insert(e.filter(hv === 1L))
      val (g0, g1, v) = Similarity.readGraphIndexLayered(es, vs, "g")
      Similarity.graphSearchLayered(e.filter(col("vec_id") % 50 === 0), g0, g1,
          v.select(col("entity_id").as("vec_id"), col("vec").as("embedding")),
          "vec_id", "embedding", k = 4, beam = 8, hops = 2, entries = 4,
          beam1 = 4, hops1 = 2, seedBits = 4)
        .orderBy("query_id", "rank")
    },
    // ---- weighted sampling without replacement (Efraimidis-Spirtakis
    // A-ES): per-source top-8 by the ln(u)/w priority, w = doc length —
    // the bounded-aggregate shape (TopKPairs partials, no per-group
    // row_number window) ----
    "q195_weighted_sample" -> { (s, dir) =>
      val d = docs(s, dir).withColumn("w_len",
        greatest(col("n_chars").cast("double"), lit(1.0)))
      TextAnalysis.weightedSample(d, "doc_id", "source", "w_len", n = 8)
        .orderBy("source", "rank")
    },
    // ---- hybrid retrieval: Reciprocal Rank Fusion of two tiers — exact
    // full-dim cosine top-20 ⊕ the matryoshka prefix-dim tier — the
    // calibration-free rank combiner (only ranks enter, so heterogeneous
    // scorers compose; same as fusing BM25 ⊕ dense) ----
    "q196_rrf_hybrid" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val qs = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      val full = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 20)
        .select("query_id", "neighbor_id", "rank")
      val mat = Similarity.matryoshkaTopK(qs, e, "vec_id", "embedding",
          prefixDim = 16, k = 20, shortlist = 50)
        .select("query_id", "neighbor_id", "rank")
      Similarity.rrfFuse(Seq(full, mat), k = 10)
        .orderBy("query_id", "rank")
    },
    // ---- MMR diversification: greedy λ·rel − (1−λ)·max-sim-to-selected
    // over the brute-force top-10 shortlist, k=3 picks per query —
    // the diverse-subset selector, k bounded aggregate rounds (no
    // ranking window, no corpus rescan) ----
    "q197_mmr_diversify" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val qs = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      val cand = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"), col("cos").as("rel"))
      Similarity.mmrDiversify(cand, e, "vec_id", "embedding",
          k = 3, lambda = 0.5)
        .orderBy("query_id", "step")
    },
    // ---- cross-split leakage: near-dup pairs straddling the train
    // boundary — the semantic contamination n-gram decontamination
    // can't see. LSH-bucketed hash-embedding pairs (q57's tier at a
    // looser 0.9) × the q76 hash split at 70/15/15 ----
    "q198_split_leakage" -> { (s, dir) =>
      val d = docs(s, dir)
      val sp = TextAnalysis.hashSplit(d, "doc_id",
        Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
      val emb = TextAnalysis.hashEmbedding(d, "doc_id", "text", 16)
      val pairs = Similarity.bucketedNeighbors(emb, "doc_id", "embedding",
        nBits = 4, minCos = 0.9, maxBucket = 100)
      Dedup.splitLeakage(pairs, sp, "doc_id", "split")
        .orderBy("holdout_id", "train_id")
    },
    // ---- mixture drift monitoring: per-source smoothed χ² divergence
    // from the corpus token distribution over the 64-bucket hashed
    // domain (KL rides alongside in the API, spec-tested — the q74
    // libm-ln convention keeps it out of the oracle) ----
    "q199_source_drift" -> { (s, dir) =>
      TextAnalysis.distributionDrift(docs(s, dir), "source", "text",
          buckets = 64)
        .select("source", "n_toks", "chi2")
        .orderBy("source")
    },
    // ---- selection-tier capstone: split → drop train docs leaking into
    // holdout (q198's straddle set) → A-ES quality-weighted sample per
    // source (q195) → per-source drift report of the SAMPLED set (q199).
    // One plan, composed oracle; every stage's scale shape is the
    // component gate's ----
    "q200_curation_select" -> { (s, dir) =>
      val d = docs(s, dir)
      val sp = TextAnalysis.hashSplit(d, "doc_id",
        Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
      val emb = TextAnalysis.hashEmbedding(d, "doc_id", "text", 16)
      val pairs = Similarity.bucketedNeighbors(emb, "doc_id", "embedding",
        nBits = 4, minCos = 0.9, maxBucket = 100)
      val leakTrain = Dedup.splitLeakage(pairs, sp, "doc_id", "split")
        .select(col("train_id").as("doc_id")).distinct()
      val train = sp.filter(col("split") === "train")
        .join(leakTrain, Seq("doc_id"), "left_anti")
        .withColumn("w_len", greatest(col("n_chars").cast("double"), lit(1.0)))
      val picked = TextAnalysis.weightedSample(train, "doc_id", "source",
        "w_len", n = 8)
      val sampled = picked.join(d.select("doc_id", "text"), "doc_id")
      TextAnalysis.distributionDrift(sampled, "source", "text", buckets = 64)
        .join(picked.groupBy("source").agg(count(lit(1)).as("n_docs")),
          "source")
        .select("source", "n_docs", "n_toks", "chi2")
        .orderBy("source")
    },
    // ---- EXACT set-similarity join (prefix filtering): all pairs with
    // token-set Jaccard >= 3/5, integer-exact threshold — the oracle
    // computes naive all-pairs, so a hash match PROVES the prefix
    // filter dropped nothing. The synthetic fixture is DENSELY self-
    // similar (most doc pairs clear 0.6), so the gate runs on the
    // doc_id % 7 slice — the TRUE answer on the full corpus is
    // O(corpus²) rows on this fixture, a fixture property, not an
    // operator cost ----
    "q201_setsim_join" -> { (s, dir) =>
      Dedup.setSimilarityJoin(
          docs(s, dir).filter(pmod(col("doc_id"), lit(7)) === 0),
          "doc_id", "text", tauNum = 3, tauDen = 5)
        .orderBy("id1", "id2")
    },
    // ---- incremental exact set-sim join: two batches through persisted
    // token/prefix/frequency stores; union of per-batch emissions must
    // equal q201's one-shot naive all-pairs answer (the frozen rarity
    // model shifts efficiency, never the pair set) ----
    "q202_setsim_incremental" -> { (s, dir) =>
      val d = docs(s, dir).filter(pmod(col("doc_id"), lit(7)) === 0)
      val work = tempWorkDir("graft_q202_")
      def st(sub: String) = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/$sub", 500,
          keyCols = Seq("entity_id", "tok")))
      val (toks, prefs, freqs) = (st("t"), st("p"), st("f"))
      val hv = conv(substring(md5(concat(lit("ssj:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      def run(b: org.apache.spark.sql.DataFrame) =
        Dedup.setSimJoinIncremental(toks, prefs, freqs, "g", b,
          "doc_id", "text", tauNum = 3, tauDen = 5)
      val r1 = run(d.filter(hv === 0L))
      val r2 = run(d.filter(hv === 1L))
      r1.unionByName(r2).orderBy("id1", "id2")
    },
    // ---- hard-negative mining (contrastive data prep): per-anchor top-5
    // in the cosine band [0.05, 0.30) from LSH-bucket candidates ----
    "q134_hard_negatives" -> { (s, dir) =>
      Similarity.hardNegatives(load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, minCos = 0.05, maxCos = 0.30, nBits = 4)
        .orderBy("anchor_id", "rank")
    },
    // ---- CCNet-style fluency bucketing: char-LM score → per-language
    // VALUE-threshold terciles (head/middle/tail) from R-7 cutoffs —
    // CCNet's actual formulation (perplexity cutoffs per language), and
    // the scale shape: the previous ntile window sorted each language's
    // ENTIRE corpus on one task; cutoffs are one tiny aggregate
    // broadcast back (R-7 interpolation is bit-identical in Spark
    // `percentile` and DuckDB `quantile_cont`, and both engines compute
    // mean_p identically, so the >= comparisons agree exactly) ----
    // ---- TextTiling topic boundaries (Hearst 1997, block comparison,
    // integerized): distinct-token overlap between adjacent 10-token
    // blocks; a STRICT interior local minimum flags a topic shift ----
    "q315_texttiling" -> { (s, dir) =>
      TextAnalysis.textTileBoundaries(docs(s, dir), "doc_id", "text",
          blockSize = 10)
        .orderBy("doc_id", "boundary")
    },
    // ---- MOSS matching: near-dup candidate pairs from shared winnowing
    // fingerprints, hot-fingerprint doc-freq cap mirrored in the oracle
    // (the LSH bucket-cap convention) ----
    "q316_winnow_pairs" -> { (s, dir) =>
      Dedup.winnowPairs(
          Dedup.winnowFingerprints(docs(s, dir), "doc_id", "text",
            k = 4, w = 5),
          minShared = 2, maxDocFreq = 50)
        .orderBy("id1", "id2")
    },
    // ---- the MOSS family closed end-to-end (r15 verdict item 7):
    // winnowing fingerprints → df-capped candidate pairs → exact
    // k-gram-Jaccard verification → star-contraction components →
    // kept/dup fate ledger (q318 convention). The keeper SET is
    // oracle-replayed: same grams, same caps, recursive min-label
    // reach over the same verified edges ----
    "q322_winnow_keepers" -> { (s, dir) =>
      Dedup.winnowKeepers(docs(s, dir), "doc_id", "text",
          k = 4, w = 5, minShared = 2, maxDocFreq = 50,
          tauNum = 1, tauDen = 4)
        .orderBy("doc_id")
    },
    // ---- incremental MOSS matching against the persisted fingerprint
    // store (the q175 discipline for winnowing): two md5-split batches,
    // each probing state-as-of-its-call with cumulative df caps; the
    // oracle replays the schedule, not the one-shot corpus ----
    "q325_winnow_incremental" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val split = pmod(conv(substring(md5(concat(lit("wnb:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val work = tempWorkDir("graft_q325_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 1L << 16,
          keyCols = Seq("h", "entity_id")))
      val c1 = Dedup.winnowIncremental(ps, "fp", d.filter(split === 0),
        "doc_id", "text", k = 4, w = 5, minShared = 2, maxDocFreq = 50)
      val c2 = Dedup.winnowIncremental(ps, "fp", d.filter(split === 1),
        "doc_id", "text", k = 4, w = 5, minShared = 2, maxDocFreq = 50)
      c1.union(c2).distinct().orderBy("id1", "id2")
    },
    // ---- quota rebalancing: md5-first admission per source until the
    // target-composition quota fills; short groups contribute all they
    // have (src3's 800 bp quota exceeds its rows at every sf) ----
    "q317_quota_sample" -> { (s, dir) =>
      TextAnalysis.quotaSample(docs(s, dir), "doc_id", "source",
          Map("src0" -> 400L, "src1" -> 200L, "src2" -> 100L,
            "src3" -> 800L))
        .orderBy("doc_id")
    },
    // ---- drop-provenance ledger over the q314 funnel: every input doc
    // gets a FATE (kept / dup / contaminated) — the lineage answer
    // "why is my document not in the training set" ----
    "q318_drop_ledger" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val b15 = d.select((col("doc_id") + 15).as("doc_id"),
        col("text").as("b_text"))
      val c2 = d.select((col("doc_id") - 2).as("doc_id"),
        col("text").as("c_text"))
      val mods = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        .join(b15, Seq("doc_id"), "left")
        .join(c2, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(30)) === 1,
            concat(lit("é "), col("text"))) // decomposed e+U+0301
            .when(pmod(col("doc_id"), lit(30)) === 16 && col("b_text").isNotNull,
              concat(lit("é "), col("b_text")))
            .when(pmod(col("doc_id"), lit(20)) === 3 && col("c_text").isNotNull,
              col("c_text"))
            .otherwise(col("text")).as("text"))
      val normed = mods.select(col("doc_id"),
          Dedup.digest(graft.expressions.StringExpressions.nfc(col("text")))
            .as("dg"))
        .localCheckpoint()
      val keepers = normed.groupBy("dg").agg(min("doc_id").as("__keeper"))
      val evalDg = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(Dedup.digest(
          graft.expressions.StringExpressions.nfc(col("text"))).as("dg"))
        .distinct().withColumn("__ev", lit(1))
      normed.join(keepers, "dg")
        .join(evalDg, Seq("dg"), "left")
        .select(col("doc_id"),
          when(col("doc_id") =!= col("__keeper"), "dup")
            .when(col("__ev").isNotNull, "contaminated")
            .otherwise("kept").as("fate"))
        .orderBy("doc_id")
    },
    // ---- round-15 funnel capstone (the q293 treatment for THIS round's
    // newcomers): raw → NFC normalize (a decomposed/precomposed dup pair
    // unifies ONLY after normalization) → exact dedup keep-first →
    // decontaminate vs the eval set (spliced eval texts planted in
    // train) → JSONL export, whose manifest must reconcile with the
    // surviving stage. Every stage count oracle-replayed ----
    "q314_funnel_r15" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val b15 = d.select((col("doc_id") + 15).as("doc_id"),
        col("text").as("b_text"))
      val c2 = d.select((col("doc_id") - 2).as("doc_id"),
        col("text").as("c_text"))
      val mods = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        .join(b15, Seq("doc_id"), "left")
        .join(c2, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(30)) === 1,
            concat(lit("é "), col("text"))) // decomposed e+U+0301
            .when(pmod(col("doc_id"), lit(30)) === 16 && col("b_text").isNotNull,
              concat(lit("é "), col("b_text"))) // precomposed, donor base
            .when(pmod(col("doc_id"), lit(20)) === 3 && col("c_text").isNotNull,
              col("c_text")) // planted eval text (doc_id + 2 is % 5 == 0)
            .otherwise(col("text")).as("text"))
        .localCheckpoint()
      val ntext = graft.expressions.StringExpressions.nfc(col("text"))
      val normed = mods.select(col("doc_id"), ntext.as("text"))
        .withColumn("dg", Dedup.digest(col("text")))
        .localCheckpoint()
      val kept = normed.groupBy("dg").agg(min("doc_id").as("doc_id"))
        .join(normed, Seq("dg", "doc_id"))
      val evalDg = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(Dedup.digest(
          graft.expressions.StringExpressions.nfc(col("text"))).as("dg"))
        .distinct()
      val clean = kept.join(evalDg, Seq("dg"), "left_anti")
        .localCheckpoint()
      val work = tempWorkDir("graft_q314_")
      val manifest = CorpusClean.exportJsonlShards(clean, "doc_id", "text",
        s"$work/out", nShards = 4)
      val toks = (c: org.apache.spark.sql.Column) =>
        size(filter(split(trim(c), "\\s+"), t => t =!= "")).cast("long")
      def stage(name: String, df: DataFrame) =
        df.agg(coalesce(count(lit(1)), lit(0L)).as("n_docs"),
            coalesce(sum(toks(col("text"))), lit(0L)).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      stage("a_raw", mods)
        .unionByName(stage("b_dedup", kept))
        .unionByName(stage("c_decontam", clean))
        .unionByName(manifest.agg(sum("n_docs").as("n_docs"),
            sum("n_tokens").as("n_tokens"))
          .select(lit("d_export").as("stage"),
            col("n_docs").cast("long").as("n_docs"),
            col("n_tokens").cast("long").as("n_tokens")))
        .orderBy("stage")
    },
    // ---- incremental OOV audit: a NEW batch scored against the
    // ACCUMULATED vocab store (q251's vocabGrowthAppend state) — the
    // ingest-time "how novel is this feed" signal, q313's streaming-age
    // sibling. Two md5-split batches build the store; the third probes ----
    "q319_oov_incremental" -> { (s, dir) =>
      val d = docs(s, dir)
      val hv = conv(substring(md5(concat(lit("oov:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 3L
      val work = tempWorkDir("graft_q319_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 64L, keyCols = Seq("tok")))
      def toksOf(b: org.apache.spark.sql.DataFrame) =
        TextAnalysis.tokens(b, "doc_id", "text").filter(col("tok") =!= "")
      TextAnalysis.vocabGrowthAppend(ps, "v", toksOf(d.filter(hv === 0L)),
        "tok", epoch = 1L)
      TextAnalysis.vocabGrowthAppend(ps, "v", toksOf(d.filter(hv === 1L)),
        "tok", epoch = 2L)
      // the fixture's 31-token vocabulary is fully covered by two
      // batches, so the probe plants one genuinely-novel doc-specific
      // token per doc_id % 7 == 0 doc (mirrored in the oracle) — the
      // audit must MEASURE novelty, not assert zero
      val probe = toksOf(d.filter(hv === 2L)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(7)) === 0,
              concat(col("text"), lit(" nv"), col("doc_id").cast("string")))
              .otherwise(col("text")).as("text")))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val vocab = ps.readPart("v").get.select("tok")
      probe.join(vocab.withColumn("__in", lit(1)), Seq("tok"), "left")
        .agg(sum(col("cnt")).as("n_occ"),
          sum(when(col("__in").isNull, col("cnt")).otherwise(0L))
            .as("n_oov_occ"),
          count(lit(1)).as("n_types"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov_types"))
        .select(col("n_occ"), col("n_oov_occ"), col("n_types"),
          col("n_oov_types"),
          expr("10000 * n_oov_occ DIV n_occ").as("oov_bp"))
    },
    // ---- vocabulary-size planning: OOV rate at candidate vocab caps —
    // rank types by frequency (globalDenseRank, no global window), then
    // for each cap the occurrence coverage the truncated vocab buys.
    // The table a tokenizer-budget decision actually reads ----
    "q313_oov_coverage" -> { (s, dir) =>
      val cnt = TextAnalysis.tokens(docs(s, dir), "doc_id", "text")
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val ranked = graft.functions.Ranks.globalDenseRank(
          cnt.select((-col("cnt")).as("__nc"), col("tok")),
          Seq("__nc", "tok"))
        .join(cnt, "tok")
        .select(col("tok"), col("cnt"), col("__r").as("rnk"))
        .localCheckpoint() // three caps read it
      val total = ranked.agg(sum("cnt").as("__tot"),
        count(lit(1)).as("__types"))
      val caps = Seq(64, 256, 1024)
      caps.map { k =>
        ranked.filter(col("rnk") <= k)
          .agg(coalesce(sum("cnt"), lit(0L)).as("covered"),
            count(lit(1)).as("vocab_used"))
          .select(lit(k.toLong).as("vocab_cap"), col("vocab_used"),
            col("covered"))
      }.reduce(_.unionByName(_))
        .crossJoin(broadcast(total))
        .select(col("vocab_cap"), col("vocab_used"), col("covered"),
          col("__tot").as("total_occ"), col("__types").as("n_types"),
          expr("10000 * (__tot - covered) DIV __tot").as("oov_bp"))
        .orderBy("vocab_cap")
    },
    // ---- classifier calibration audit (reliability-diagram bins, Guo
    // et al. 2017): q136's hashed-BoW logits against a deterministic
    // binary target (lang = 'en'), 10 fixed-width bins over [-5, 5) —
    // per bin exact n / positives / fixed-point score sum, the pieces
    // ECE divides ----
    // ---- round-16 funnel capstone (the q293/q314 treatment for THIS
    // round's newcomers): raw → MOSS keeper ledger (winnow → verify →
    // components, q322) drops dups → TAG scope (tag by source, flush
    // src2 — the reference's tag-scoped corpus selection, q321/q324) →
    // BPE encode of the survivors against rules trained on them (q323).
    // Every stage count oracle-replayed, one ledger row per stage ----
    "q327_funnel_r16" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text", "source")
      val fates = Dedup.winnowKeepers(d, "doc_id", "text",
        k = 4, w = 5, minShared = 2, maxDocFreq = 50, tauNum = 1, tauDen = 4)
      val kept = d.join(
        fates.filter(col("fate") === "kept").select("doc_id"), "doc_id")
      val work = tempWorkDir("graft_q327_")
      val tags = new graft.storage.TagDirectory(s, work)
      tags.tagEntities(kept.select(lit("src").as("tag_group"),
        col("source").as("tag"), col("doc_id").as("entity_id")))
      tags.flushTag("src2")
      val scoped = kept.join(
        broadcast(tags.links.select(col("entity_id").as("doc_id")).distinct()),
        "doc_id")
      // bounded control-plane read: the trainer's own ≤3-row rule list
      val rules = TextAnalysis.bpeTrain(scoped, "doc_id", "text", nMerges = 3)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val seg = TextAnalysis.bpeApply(scoped, "doc_id", "text", rules)
        .select(col("word"), size(col("toks")).cast("long").as("__np"))
      val enc = TextAnalysis.tokens(scoped, "doc_id", "text")
        .filter(col("tok") =!= "")
        .join(broadcast(seg), col("tok") === col("word"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_words"), sum("__np").as("n_pieces"))
      def stage(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(name).as("stage"), col("n_docs"),
            lit(0L).as("n_words"), lit(0L).as("n_pieces"))
      stage("0_raw", d)
        .unionByName(stage("1_kept", kept))
        .unionByName(stage("2_tagged", scoped))
        .unionByName(enc.select(lit("3_encoded").as("stage"),
          col("n_docs"), col("n_words"), col("n_pieces")))
        .orderBy("stage")
    },
    // ---- fully incremental MOSS keepers (the q177 capstone, winnowing
    // flavor): winnow-fingerprint candidates from the persisted store →
    // KMV gram-sketch verify → union-find parent state; two md5-split
    // batches each emit their docs' as-of keepers, cross-batch merges
    // flow through all three stores. Oracle replays the schedule ----
    "q332_winnow_dup_incremental" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val split = pmod(conv(substring(md5(concat(lit("wnb:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val work = tempWorkDir("graft_q332_")
      val fps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/f", 1L << 16,
          keyCols = Seq("h", "entity_id")))
      val ss = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/s", 1L << 55,
          keyCols = Seq("entity_id")))
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/p", 1L << 55,
          keyCols = Seq("entity_id")))
      def run(b: org.apache.spark.sql.DataFrame) =
        Dedup.winnowDupIncremental(fps, ss, ps, b, "doc_id", "text",
          k = 4, w = 5, minShared = 2, maxDocFreq = 50,
          sketchK = 256, threshold = 0.25)
      val r1 = run(d.filter(split === 0)).withColumn("batch", lit(0L))
      val r2 = run(d.filter(split === 1)).withColumn("batch", lit(1L))
      r1.union(r2).select("doc_id", "batch", "keeper")
        .orderBy("doc_id", "batch")
    },
    // ---- streaming quota admission (q317's rebalancer, streaming face):
    // per-source caps enforced ACROSS micro-batches through the
    // persisted admitted-count state; within a batch admission order is
    // the deterministic (md5, id). src1/src2 bind in batch 1, src0 binds
    // across the batch boundary, src3 never binds — the oracle replays
    // the two-stage schedule ----
    "q331_stream_quota" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val capped = docs(s, dir).select("doc_id", "source")
        .withColumn("__h", md5(concat(lit("sqcap:"),
          col("doc_id").cast("string"))))
        .orderBy("__h", "doc_id").limit(2048)
        .select("doc_id", "source").localCheckpoint()
      val split = pmod(conv(substring(md5(concat(lit("sq:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val rows = capped.withColumn("__s", split)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val work = tempWorkDir("graft_q331_")
      val kept = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/k", 64L,
          keyCols = Seq("entity_id")))
      val cnt = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/c", 64L,
          keyCols = Seq("source")))
      val mem = MemoryStream[(Long, String)]
      // src1 binds inside batch 1, src0 binds ACROSS the batch boundary
      // (cross-batch state), src3 never binds, the 16 unlisted sources
      // have no quota (the q317 target-composition semantic: absent from
      // the mix = admit none)
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.quotaSink(
        mem.toDF().toDF("doc_id", "source"), kept, cnt, "doc_id", "source",
        Map("src0" -> 15L, "src1" -> 8L, "src2" -> 20L, "src3" -> 1000L))
      try {
        mem.addData(rows.filter(_._3 == 0L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._3 == 1L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      kept.readPart("kept").get
        .select(col("entity_id").as("doc_id"), col("source"))
        .orderBy("doc_id")
    },
    // ---- Zipf rank-frequency curve in power-of-2 rank buckets (corpus
    // health: flat per-bucket mass = Zipfian; head spikes = boilerplate).
    // Ranks via globalDenseRank, buckets via exact bit-length ----
    "q333_zipf_buckets" -> { (s, dir) =>
      TextAnalysis.zipfBuckets(docs(s, dir), "doc_id", "text")
        .orderBy("bucket")
    },
    // ---- canonical ("fuzzy-exact") dedup: case/punct/whitespace-folded
    // digests — the C4/RefinedWeb tier between raw-exact and MinHash.
    // One digest-partitioned window = one shuffle; fate ledger out ----
    "q334_canonical_dedup" -> { (s, dir) =>
      Dedup.canonicalKeepers(docs(s, dir), "doc_id", "text")
        .select("doc_id", "canon_digest", "keeper", "copies", "fate")
        .orderBy("doc_id")
    },
    // ---- incremental canonical dedup against a PERSISTED digest store:
    // q142's two-batch store discipline keyed by the CANONICAL digest.
    // Cross-batch dups are case/punct/spacing-mangled copies (docs id ≡ 3
    // mod 7 carry '** ' + double-spaced text of id−3 + ' !!') — invisible
    // to the raw-exact tier, folded identical by canonicalize; batch 2
    // must resolve keepers from batch 1's persisted state ----
    "q336_canonical_incremental" -> { (s, dir) =>
      val d0 = docs(s, dir).select("doc_id", "text")
      val dupSrc = d0.select((col("doc_id") + 3).as("doc_id"),
        concat(lit("** "), regexp_replace(col("text"), " ", "  "),
          lit(" !!")).as("dup_text"))
      val corpus = d0.join(dupSrc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 3 && col("dup_text").isNotNull,
            col("dup_text")).otherwise(col("text")).as("text"))
      val split = pmod(conv(substring(md5(concat(lit("cinc:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val work = tempWorkDir("graft_q336_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 1L << 55, keyCols = Seq("digest")))
      Dedup.canonicalIncremental(ps, "digests",
        corpus.filter(split === 0), "doc_id", "text").count() // batch 1 → state
      Dedup.canonicalIncremental(ps, "digests",
          corpus.filter(split === 1), "doc_id", "text")
        .orderBy("digest")
    },
    // ---- rendezvous/HRW sharding (consistent re-sharding): growing the
    // fleet 8 → 9 must move ONLY docs whose new shard's hash wins —
    // every off-diagonal transition lands on shard 9's new index 8, and
    // E[moved] = 1/9 (mod-sharding would reshuffle 7/8 of a 100 TB
    // corpus for the same change). Transition matrix oracle-replayed ----
    "q330_rendezvous_shards" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id")
      val a = graft.operators.Layout.rendezvousShard(d, "doc_id", 8)
        .withColumnRenamed("shard", "shard8")
      val b = graft.operators.Layout.rendezvousShard(a, "doc_id", 9)
        .withColumnRenamed("shard", "shard9")
      b.groupBy("shard8", "shard9").agg(count(lit(1)).as("n"))
        .orderBy("shard8", "shard9")
    },
    // ---- min-k% probability membership inference (Shi et al. 2023):
    // the char-LM store trains on the EVEN half only; every doc then
    // scores by the mean probability of its 20% least-probable covered
    // trigram occurrences under that stored model — members trim away a
    // fatter low-p tail. Greedy bottom-quota selection is an integer-
    // remaining fold over the (p, tri)-sorted list, engine-exact ----
    "q328_mink_membership" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val work = tempWorkDir("graft_q328_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 64L, keyCols = Seq("tri")))
      TextAnalysis.charLmCountsAppend(ps, "lm",
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", modified = 1L)
      TextAnalysis.minKProbStored(ps, "lm", d, "doc_id", "text", kBp = 2000)
        .withColumn("member", pmod(col("doc_id"), lit(2)) === 0)
        .orderBy("doc_id")
    },
    // ---- inter-annotator agreement (Cohen's κ): annotator B is a
    // deterministic md5-corrupted copy of the labels (1-in-7 rotated) —
    // the q219 dirtied-copy convention; confusion matrix + exact
    // fixed-point κ, the label-quality audit before labels are trusted ----
    "q326_annotator_kappa" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val flip = pmod(conv(substring(md5(concat(lit("ann:"),
        col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(7L))
      val ab = e.select(col("label").cast("long").as("a"),
        when(flip === 0, pmod(col("label").cast("long") + 1, lit(10L)))
          .otherwise(col("label").cast("long")).as("b"))
      TextAnalysis.cohenKappa(ab, "a", "b")
        .orderBy("a", "b")
    },
    "q312_calibration_bins" -> { (s, dir) =>
      val d = docs(s, dir)
      val weights = (0 until 64).map(b => ((b * 37) % 21 - 10) / 10.0)
      val scored = TextAnalysis.linearScore(d, "doc_id", "text",
          weights, bias = -0.55)
        .join(d.select(col("doc_id"), (col("lang") === "en").as("y")),
          "doc_id")
      TextAnalysis.calibrationBins(scored, "doc_id", "logit", "y",
          nBins = 10, lo = -5.0, hi = 5.0)
        .orderBy("bin")
    },
    // ---- winnowing fingerprints (Schleimer et al. 2003, the MOSS
    // algorithm): rightmost-minimal 32-bit k-gram hash per w-window —
    // the position-localized fingerprint family member (exact digest /
    // MinHash / SimHash cover the others). Raw fingerprint rows are the
    // gate surface ----
    "q311_winnowing" -> { (s, dir) =>
      Dedup.winnowFingerprints(docs(s, dir), "doc_id", "text", k = 4, w = 5)
        .orderBy("doc_id", "pos", "h")
    },
    // ---- JSONL export + manifest (hand-off to the trainer): md5-mod
    // shards, explicitly-constructed escaped lines, and an exact
    // per-shard manifest — counts plus an order-insensitive md5-prefix
    // fingerprint the consumer can re-derive without Spark ----
    "q310_jsonl_export" -> { (s, dir) =>
      val work = tempWorkDir("graft_q310_")
      CorpusClean.exportJsonlShards(docs(s, dir), "doc_id", "text",
          s"$work/out", nShards = 8)
        .orderBy("shard")
    },
    // ---- trainer-side length-bucket batching: docs bucket by padded
    // length, md5-order within bucket, group into batches of 16 — per
    // batch the padding waste pad-to-max leaves (what bucketing exists
    // to minimize). Within-bucket rank = rankWithinGroup (global rank +
    // broadcast offsets, no per-bucket window) ----
    "q309_length_batching" -> { (s, dir) =>
      CorpusClean.lengthBucketBatches(docs(s, dir), "doc_id", "text",
          bucketWidth = 16, batchSize = 16)
        .orderBy("bucket", "batch_idx")
    },
    // ---- the char-LM triangle, incremental face: trigram counts are a
    // commutative monoid, so two appended batches equal the one-shot
    // corpus counts and the q135 oracle applies verbatim to scoring
    // against the STORE ----
    "q307_charlm_incremental" -> { (s, dir) =>
      val d = docs(s, dir)
      val hv = conv(substring(md5(concat(lit("clm:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      val work = tempWorkDir("graft_q307_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 64L, keyCols = Seq("tri")))
      TextAnalysis.charLmCountsAppend(ps, "lm", d.filter(hv === 0L),
        "doc_id", "text", modified = 1L)
      TextAnalysis.charLmCountsAppend(ps, "lm", d.filter(hv === 1L),
        "doc_id", "text", modified = 2L)
      val scored = TextAnalysis.charLmScoreStored(ps, "lm", d, "doc_id", "text")
        .join(d.select("doc_id", "lang"), "doc_id")
        .filter(col("mean_p").isNotNull)
      val cuts = TextAnalysis.groupQuantiles(scored, Seq("lang"), "mean_p",
        Seq("c13" -> (1.0 / 3), "c23" -> (2.0 / 3))).drop("n_docs")
      scored.join(broadcast(cuts), "lang")
        .withColumn("ppl_bucket",
          when(col("mean_p") >= col("c23"), "head")
            .when(col("mean_p") >= col("c13"), "middle").otherwise("tail"))
        .select("doc_id", "lang", "mean_p", "ppl_bucket")
        .orderBy("doc_id")
    },
    // ---- the char-LM triangle, streaming face: the model accrues
    // through charLmSink micro-batches over an md5-capped slice, then
    // that slice scores against the streamed store ----
    "q308_charlm_stream" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val capped = docs(s, dir)
        .withColumn("__h", md5(concat(lit("lmcap:"),
          col("doc_id").cast("string"))))
        .orderBy("__h", "doc_id").limit(2048)
        .select("doc_id", "text", "lang").localCheckpoint()
      val rows = capped.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val work = tempWorkDir("graft_q308_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 64L, keyCols = Seq("tri")))
      val mem = MemoryStream[(Long, String)]
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.charLmSink(
        mem.toDF().toDF("doc_id", "text"), ps, "lm", "doc_id", "text")
      try {
        mem.addData(rows.filter(_._1 % 2 == 0).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._1 % 2 == 1).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      val scored = TextAnalysis.charLmScoreStored(ps, "lm", capped,
          "doc_id", "text")
        .join(capped.select("doc_id", "lang"), "doc_id")
        .filter(col("mean_p").isNotNull)
      val cuts = TextAnalysis.groupQuantiles(scored, Seq("lang"), "mean_p",
        Seq("c13" -> (1.0 / 3), "c23" -> (2.0 / 3))).drop("n_docs")
      scored.join(broadcast(cuts), "lang")
        .withColumn("ppl_bucket",
          when(col("mean_p") >= col("c23"), "head")
            .when(col("mean_p") >= col("c13"), "middle").otherwise("tail"))
        .select("doc_id", "lang", "mean_p", "ppl_bucket")
        .orderBy("doc_id")
    },
    "q135_perplexity_filter" -> { (s, dir) =>
      val d = docs(s, dir)
      val scored = TextAnalysis.charLmScore(d, "doc_id", "text")
        .join(d.select("doc_id", "lang"), "doc_id")
        .filter(col("mean_p").isNotNull)
        .localCheckpoint() // doc-count rows, consumed by the quantile
        // cuts AND the final bucket join (the q141 pin)
      val cuts = TextAnalysis.groupQuantiles(scored, Seq("lang"), "mean_p",
        Seq("c13" -> (1.0 / 3), "c23" -> (2.0 / 3))).drop("n_docs")
      scored.join(broadcast(cuts), "lang")
        .withColumn("ppl_bucket",
          when(col("mean_p") >= col("c23"), "head")
            .when(col("mean_p") >= col("c13"), "middle").otherwise("tail"))
        .select("doc_id", "lang", "mean_p", "ppl_bucket")
        .orderBy("doc_id")
    },
    // ---- classifier-based quality filter plumbing (fastText pass):
    // hashed-BoW linear score, logit-space threshold, synthetic weights ----
    "q136_classifier_filter" -> { (s, dir) =>
      val weights = (0 until 64).map(b => ((b * 37) % 21 - 10) / 10.0)
      TextAnalysis.linearScore(docs(s, dir), "doc_id", "text",
          weights, bias = -0.55)
        .orderBy("doc_id")
    },
    // ---- TRAINED linear probe (squared loss, 2 full-batch GD
    // iterations, fixed-point gradients): closes the loop the synthetic-
    // weight classifier gates (q136) leave open — weights learned from
    // the labeled corpus, bit-exact cross-engine, ready for
    // score-and-filter ----
    "q174_linear_probe" -> { (s, dir) =>
      import s.implicits._
      val e = load(s, dir, "embeddings")
      Similarity.linearProbeTrain(e, "embedding", "label",
          positiveLabel = 0L, iterations = 2, lrShift = 8, dim = 64)
        .zipWithIndex.map { case (v, j) => (j.toLong, v) }
        .toDF("j", "w").orderBy("j")
    },
    // ---- matryoshka retrieval: 16-dim prefix shortlist → full-dim
    // exact rerank (MRL two-stage) ----
    "q137_matryoshka_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      Similarity.matryoshkaTopK(e.filter(pmod(col("vec_id"), lit(50)) === 0), e,
          "vec_id", "embedding", prefixDim = 16, k = 5, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- round-11 curation capstone: classifier gate → per-language
    // fluency terciles (keep head+middle) → chunking → per-source shard
    // stats. Composes q136 + q135 + q125 end to end; any stage silently
    // passing everything (or nothing) shifts every per-source count ----
    "q141_curation_capstone" -> { (s, dir) =>
      val d = docs(s, dir)
      val weights = (0 until 64).map(b => ((b * 37) % 21 - 10) / 10.0)
      val cls = TextAnalysis.linearScore(d, "doc_id", "text", weights, bias = -0.55)
        .filter(col("keep")).select("doc_id")
      val scored = TextAnalysis.charLmScore(d, "doc_id", "text")
        .join(d.select("doc_id", "lang", "source"), "doc_id")
        .join(cls, "doc_id")
        .filter(col("mean_p").isNotNull)
        .localCheckpoint() // doc-count rows; consumed by the quantile
        // cuts AND the keep join — without the pin the char-LM scoring
        // subtree is embedded (and can execute) twice in the final plan
      // keep head+middle = top two-thirds BY VALUE per language (R-7
      // cutoff broadcast, q135's shape — no per-language global sort)
      val cuts = TextAnalysis.groupQuantiles(scored, Seq("lang"), "mean_p",
        Seq("c13" -> (1.0 / 3))).drop("n_docs")
      val keep = scored.join(broadcast(cuts), "lang")
        .filter(col("mean_p") >= col("c13"))
        .select("doc_id", "source")
        .localCheckpoint() // two consumers below (chunk input + re-join)
      val chunks = TextAnalysis.chunkTokens(
        d.join(keep.select("doc_id"), "doc_id"), "doc_id", "text", 64, 48)
      chunks.join(keep, "doc_id")
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("n_tokens"))
        .orderBy("source")
    },
    // ---- incremental MinHash/LSH near-dup candidates against PERSISTED
    // bucket state (q142's append-only contract on the near-dup tier):
    // two md5-split batches, each probing only its keys' partitions; the
    // union of both calls' candidates must equal the full-corpus LSH run
    // under the same batch schedule (caps applied at each probe's
    // as-of sizes — the oracle replays the schedule exactly) ----
    "q175_lsh_incremental" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val split = pmod(conv(substring(md5(concat(lit("lshb:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val work = tempWorkDir("graft_q175_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 1L << 55,
          keyCols = Seq("band", "key", "entity_id")))
      val c1 = Dedup.lshIncremental(ps, "lsh", d.filter(split === 0),
        "doc_id", "text", bands = 4, rowsPerBand = 2, maxBucket = 50)
      val c2 = Dedup.lshIncremental(ps, "lsh", d.filter(split === 1),
        "doc_id", "text", bands = 4, rowsPerBand = 2, maxBucket = 50)
      c1.union(c2).distinct().orderBy("id1", "id2")
    },
    // ---- fully incremental near-dup KEEPERS (the append-only capstone:
    // q175 candidates → persisted-sketch Jaccard verify → union-find
    // parent state): two md5-split batches, each emitting its docs'
    // as-of keepers; cross-batch merges flow through all three stores.
    // Oracle replays the schedule — batch-1 keepers from batch-1
    // verified pairs only, batch-2 keepers from both — with the same
    // per-probe bucket caps ----
    "q177_neardup_incremental" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val split = pmod(conv(substring(md5(concat(lit("ndup:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val work = tempWorkDir("graft_q177_")
      def mk(name: String, keys: Seq[String]) = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/$name", 1L << 55, keyCols = keys))
      val bs = mk("b", Seq("band", "key", "entity_id"))
      val ss = mk("s", Seq("entity_id"))
      val ps = mk("p", Seq("entity_id"))
      def run(b: org.apache.spark.sql.DataFrame) =
        Dedup.nearDupIncremental(bs, ss, ps, b, "doc_id", "text",
          bands = 4, rowsPerBand = 2, shingleK = 3, sketchK = 256,
          threshold = 0.5, maxBucket = 50)
      val r1 = run(d.filter(split === 0)).withColumn("batch", lit(0L))
      val r2 = run(d.filter(split === 1)).withColumn("batch", lit(1L))
      r1.union(r2).select("doc_id", "batch", "keeper")
        .orderBy("doc_id", "batch")
    },
    // ---- incremental exact dedup against a PERSISTED digest store:
    // two md5-split batches, cross-batch duplicates injected (docs with
    // id ≡ 3 mod 7 carry the text of id−3), second batch must resolve
    // keepers from batch 1's persisted state ----
    "q142_incremental_dedup" -> { (s, dir) =>
      val d0 = docs(s, dir).select("doc_id", "text")
      val dupSrc = d0.select((col("doc_id") + 3).as("doc_id"), col("text").as("dup_text"))
      val corpus = d0.join(dupSrc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 3 && col("dup_text").isNotNull,
            col("dup_text")).otherwise(col("text")).as("text"))
      val split = pmod(conv(substring(md5(concat(lit("inc:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val work = tempWorkDir("graft_q142_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 1L << 55, keyCols = Seq("digest")))
      Dedup.exactIncremental(ps, "digests",
        corpus.filter(split === 0), "doc_id", "text").count() // batch 1 → state
      Dedup.exactIncremental(ps, "digests",
          corpus.filter(split === 1), "doc_id", "text")
        .orderBy("digest")
    },
    // ---- per-source token-budget fill (mixture construction at token
    // granularity; md5-shuffled admission order, boundary doc included) ----
    "q143_token_budget" -> { (s, dir) =>
      TextAnalysis.tokenBudgetFill(docs(s, dir), "doc_id", "text", "source",
          budget = 800L)
        .orderBy("doc_id")
    },
    // ---- KMV sketch overlap: contamination planning from two <=256-long
    // sketches, never a corpus join (A = shingles of docs id%3!=0, B =
    // docs id%2==0 — genuinely overlapping sets) ----
    // ---- mixture-build capstone: temperature resample (q88) → per-
    // source token-budget fill (q143) → sequence packing (q70) → per-
    // shard stats, the full "build a training mixture" chain in one
    // plan — a defect in any stage shifts every downstream shard ----
    "q184_mixture_capstone" -> { (s, dir) =>
      val d = docs(s, dir)
      val sampled = TextAnalysis.materializeTemperatureSample(
        d, "source", "doc_id", sqrtIters = 2)
      val admitted = TextAnalysis.tokenBudgetFill(
        sampled, "doc_id", "text", "source", budget = 600L)
      val packed = CorpusClean.packSequences(
        d.join(admitted.select("doc_id"), "doc_id"), "doc_id", "text",
        budget = 512, shards = 8)
      packed.groupBy("shard").agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          (max("seq_index") + 1).as("n_bins"))
        .orderBy("shard")
    },
    // ---- distributed BPE merge training: the top-3 byte-pair merges
    // learned from the word vocabulary (pair-frequency argmax per step,
    // greedy merge application via per-word run-parity windows — each
    // step costs O(vocab), never O(corpus)) ----
    "q187_bpe_train" -> { (s, dir) =>
      TextAnalysis.bpeTrain(docs(s, dir), "doc_id", "text", nMerges = 3)
        .orderBy("step")
    },
    // ---- bigram LM statistics with Kneser-Ney pieces: raw counts,
    // left/right continuation counts (the KN backoff quantity), and the
    // absolute-discount numerator as the exact integer 4c−3 (D = 3/4 —
    // float probability assembly stays downstream per the q74
    // convention). Top-50 bigrams by (count, w1, w2) ----
    "q268_bigram_kn" -> { (s, dir) =>
      TextAnalysis.bigramKneserNey(docs(s, dir), "doc_id", "text", topK = 50)
        .orderBy(col("c").desc, col("w1"), col("w2"))
    },
    // ---- T5-style span-corruption mask audit: blocked deterministic
    // spans (one md5-minimal 3-token span per 20-token block — block
    // disjointness replaces the sequential greedy non-overlap scan, so
    // the mask is a pure (id, pos) function). Per-doc span/mask counts
    // + integer basis-point corruption rate ----
    "q267_span_corruption" -> { (s, dir) =>
      TextAnalysis.spanCorruptionStats(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },
    // ---- training-sequence packing (concat-then-chunk): the global
    // token stream in doc_id order splits into 512-token sequences;
    // per-doc placement + boundary-crossing audit. The prefix sum is the
    // two-pass range-partition form (per-partition totals → broadcast
    // offsets → partition-keyed running window) — never a global
    // single-partition window ----
    "q266_pack_sequences" -> { (s, dir) =>
      TextAnalysis.packSequences(docs(s, dir), "doc_id", "text", seqLen = 512L)
        .orderBy("doc_id")
    },
    // ---- batched-merge BPE ≡ sequential greedy: 32 merges learned in
    // 4 driver rounds (batch = 8) on a crafted corpus whose ranking
    // prefixes are symbol-disjoint at every round — the regime where
    // simultaneous application provably equals one-at-a-time greedy
    // (disjoint pairs' occurrence sets are invariant under each other's
    // merges). The oracle is the analytically-derived merge table, which
    // sequential greedy also produces — so the gate pins batched ==
    // sequential == closed form. The production bound moves from 64
    // driver round-trips to nMerges/batch ----
    "q265_bpe_batched" -> { (s, dir) =>
      import s.implicits._
      val text = ('a' to 'p').zipWithIndex.flatMap { case (ch, i) =>
        Seq.fill(100 - i)(ch.toString * 4) }.mkString(" ")
      val doc = Seq((1L, text)).toDF("doc_id", "text")
      TextAnalysis.bpeTrainBatched(doc, "doc_id", "text",
          nMerges = 32, batch = 8)
        .orderBy("step")
    },
    // ---- BPE encoding: per-doc piece counts after the q187-learned
    // merges — corpus tokens join the segmented vocab (encode is a
    // broadcast-size lookup, never a per-doc merge replay) ----
    // ---- BPE ENCODE against a STORED rule list (the inference half the
    // train-side gates leave open): merges learned on the even-doc half,
    // replayed by bpeApply over the FULL corpus — held-out words (n_oov
    // > 0 proves they exist) segment under the same rules, which a
    // memoized word→pieces vocab cannot do ----
    "q323_bpe_apply" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val train = d.filter(pmod(col("doc_id"), lit(2)) === 0)
      // every odd doc gets one planted word the trainer never saw — the
      // fixture's even/odd halves otherwise share their whole vocabulary
      // and the held-out claim would be vacuous (n_oov must be > 0)
      val enc = d.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 1,
          concat(col("text"), lit(" oovword"), col("doc_id")))
          .otherwise(col("text")).as("text"))
      // bounded control-plane read: the trainer's own ≤3-row rule list
      val rules = TextAnalysis.bpeTrain(train, "doc_id", "text", nMerges = 3)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val seg = TextAnalysis.bpeApply(enc, "doc_id", "text", rules)
        .select(col("word"), size(col("toks")).cast("long").as("__np"))
      val trainVocab = TextAnalysis.tokens(train, "doc_id", "text")
        .filter(col("tok") =!= "").select(col("tok").as("__tw")).distinct()
      TextAnalysis.tokens(enc, "doc_id", "text").filter(col("tok") =!= "")
        .join(broadcast(seg), col("tok") === col("word"))
        .join(broadcast(trainVocab), col("tok") === col("__tw"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("__np").as("n_pieces"),
          sum(when(col("__tw").isNull, 1L).otherwise(0L)).as("n_oov_words"))
        .orderBy("doc_id")
    },
    "q188_bpe_tokens" -> { (s, dir) =>
      val d = docs(s, dir)
      val vocab = TextAnalysis.bpeVocab(d, "doc_id", "text", nMerges = 3)
        .select(col("word"), size(col("toks")).cast("long").as("n_pieces"))
      TextAnalysis.tokens(d, "doc_id", "text").filter(col("tok") =!= "")
        .join(broadcast(vocab), col("tok") === col("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_bpe_tokens"))
        .orderBy("doc_id")
    },
    // ---- robust per-source outlier stats: median + MAD of document
    // length (two R-7 passes) and the 3-MAD outlier count — the
    // heavy-tail-immune filter primitive (one 10 MB doc moves a mean
    // arbitrarily, a median not at all) ----
    "q180_robust_outliers" -> { (s, dir) =>
      val d = docs(s, dir)
      val stats = TextAnalysis.groupRobustStats(d, Seq("source"), "n_chars")
      d.join(broadcast(stats), "source")
        .withColumn("__out",
          (abs(col("n_chars").cast("double") - col("med")) >
            lit(3.0) * col("mad")).cast("long"))
        .groupBy("source")
        .agg(first(col("n_docs")).as("n_docs"), first(col("med")).as("med"),
          first(col("mad")).as("mad"), sum(col("__out")).as("n_outliers"))
        .orderBy("source")
    },
    // ---- per-user interval coverage: events padded to 900-second
    // intervals, overlaps merged with the lag/cummax window chain (the
    // classic interval-union), total covered seconds + merged count ----
    "q181_interval_coverage" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = load(s, dir, "events").select(col("user_id"),
        graft.Tables.epochSec(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + 900L)
      val wOrd = Window.partitionBy("user_id").orderBy("lo", "hi")
      val wMax = wOrd.rowsBetween(Window.unboundedPreceding, -1)
      val grouped = e
        .withColumn("__pmax", max(col("hi")).over(wMax))
        .withColumn("__new",
          when(col("__pmax").isNull || col("lo") > col("__pmax"), 1L)
            .otherwise(0L))
        .withColumn("grp",
          sum(col("__new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      grouped.groupBy("user_id", "grp")
        .agg(min("lo").as("m_lo"), max("hi").as("m_hi"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("m_hi") - col("m_lo")).as("covered_sec"))
        .orderBy("user_id")
    },
    // ---- multi-level aggregation (ROLLUP grouping sets): per
    // (event_type, user-decile), per event_type, and grand total in ONE
    // pass — Catalyst expands the grouping sets, no multi-scan union ----
    "q182_rollup_sets" -> { (s, dir) =>
      val e = load(s, dir, "events").select(col("event_type"),
        pmod(col("user_id"), lit(10L)).as("user_mod"),
        floor(col("value") * 1e6 + 0.5).cast("long").as("micro"))
      e.rollup("event_type", "user_mod")
        .agg(count(lit(1)).as("n"), sum("micro").as("sum_micro"))
        .orderBy(col("event_type").asc_nulls_first, col("user_mod").asc_nulls_first)
    },
    // ---- content-defined chunking + cross-doc chunk dedup: word-level
    // Rabin/LBFS boundaries (expected 16-token chunks), per-chunk
    // digests, and each chunk's corpus-wide copy count — the sub-doc
    // dedup granularity fixed-stride chunking can't give (an insertion
    // shifts stride grids; CDC boundaries re-anchor on content) ----
    "q178_cdc_chunks" -> { (s, dir) =>
      val ch = TextAnalysis.cdcChunks(docs(s, dir), "doc_id", "text", maskBits = 4)
      val copies = ch.groupBy("chunk_digest").agg(count(lit(1)).as("n_copies"))
      ch.join(copies, "chunk_digest")
        .select("doc_id", "chunk_id", "n_toks", "chunk_digest", "n_copies")
        .orderBy("doc_id", "chunk_id")
    },
    // ---- cross-source vocabulary overlap matrix: per-source KMV token
    // sketches → pairwise Jaccard/union/intersection estimates — the
    // mixture-QA triage that flags duplicated crawls / train-eval
    // leakage between sources before any doc-level dedup pass ----
    "q170_source_overlap" -> { (s, dir) =>
      TextAnalysis.sourceOverlapMatrix(docs(s, dir), "source", "text", k = 256)
        .orderBy("source_a", "source_b")
    },
    "q144_sketch_overlap" -> { (s, dir) =>
      val sh = Dedup.shingles(toks(s, dir), "doc_id", 3)
      val a = sh.filter(pmod(col("doc_id"), lit(3)) =!= 0).select("shingle")
      val b = sh.filter(pmod(col("doc_id"), lit(2)) === 0).select("shingle")
      TextAnalysis.kmvOverlapEstimate(a, b, "shingle", k = 256)
    },
    // ---- asymmetric containment from per-doc KMV sketches: docs with
    // id ≡ 1 mod 4 QUOTE the whole previous doc (prev_text || ' ' ||
    // text), so pairs (4k, 4k+1) have containment ≈ 1 while Jaccard
    // stays small — the signal this estimator exists for ----
    "q147_containment" -> { (s, dir) =>
      val d0 = docs(s, dir).select("doc_id", "text")
      val prev = d0.select((col("doc_id") + 1).as("doc_id"), col("text").as("prev_text"))
      val corpus = d0.join(prev, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4)) === 1 && col("prev_text").isNotNull,
            concat(col("prev_text"), lit(" "), col("text")))
            .otherwise(col("text")).as("text"))
      val sh = Dedup.shingles(TextAnalysis.tokens(corpus, "doc_id", "text"), "doc_id", 3)
      val sk = Dedup.kmvDocSketches(sh, "doc_id", "shingle", k = 64)
      val pairs = d0.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id").as("id1"), (col("doc_id") + 1).as("id2"))
        .join(d0.select(col("doc_id").as("id2")), "id2") // id2 must exist
      Dedup.containmentEstimate(sk, "doc_id", pairs, k = 64).orderBy("id1")
    },
    // ---- blocklist filter (C4-style badwords stage): word-level exact
    // match against a broadcast list ----
    "q148_blocklist" -> { (s, dir) =>
      CorpusClean.blocklistFilter(docs(s, dir), "doc_id", "text",
          blocklist = Seq("slow", "big", "merge"))
        .orderBy("doc_id")
    },
    // ---- personalized PageRank: teleport mass pinned to a seed set
    // (trusted-source relevance propagation), 3 integer-exact rounds ----
    "q158_ppr" -> { (s, dir) =>
      val e = load(s, dir, "events")
      val edges = e.select(col("user_id").as("src"),
        pmod(col("event_id"), lit(97)).cast("long").as("dst"))
      Graph.pageRankPersonalized(edges, "src", "dst",
          seeds = Seq(0L, 7L, 21L), iterations = 3)
        .orderBy("node")
    },
    // ---- per-window distinct sketches: hourly unique users, exact vs
    // the KMV estimate from a bounded per-window sketch ----
    "q159_window_distinct" -> { (s, dir) =>
      val e = load(s, dir, "events")
        .withColumn("ts_sec", expr("ts div 1000000000"))
        .withColumn("hr", (col("ts_sec") - pmod(col("ts_sec"), lit(3600L))).cast("long"))
      val est = TextAnalysis.kmvDistinct(
        e.select(col("hr"), col("user_id").cast("string").as("u")),
        Seq("hr"), "u", k = 64)
      val exact = e.groupBy("hr").agg(countDistinct(col("user_id")).as("exact_distinct"))
      est.join(exact, "hr")
        .select("hr", "n_minima", "est_distinct", "exact_distinct")
        .orderBy("hr")
    },
    // ---- deterministic train/val/test split ----
    "q76_hash_split" -> { (s, dir) =>
      TextAnalysis.hashSplit(docs(s, dir), "doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select("doc_id", "split")
        .orderBy("doc_id")
    },
    // ---- product-quantization code assignment (compressed ANN index) ----
    "q77_pq_codes" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding", m = 8, k = 4, dim = 64)
      e.select(col("vec_id"), Similarity.pqCode(col("embedding"), cbs).as("pq_code"))
        .orderBy("vec_id")
    },
    // ---- ADC retrieval over PQ codes + exact rerank (compressed ANN) ----
    "q78_adc_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding", m = 8, k = 4, dim = 64)
      val codes = e.select(col("vec_id"),
        Similarity.pqCode(col("embedding"), cbs).as("pq_code"))
      Similarity.adcTopK(e.filter(col("vec_id") % 100 === 0), codes, e,
          "vec_id", "embedding", cbs, k = 5, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- canonical 64-bit PQ (m=8, k=256): array subcodes, no packing.
    // sampleN = 32·k (the recommended floor for k=256 — the default 2048
    // is only ~8 samples/centroid); the gate projects the code array as a
    // comma-joined string because the harness sorts/hashes scalar cells —
    // array<smallint> stays the storage form (pqEncodeArray, parity spec) ----
    "q89_pq_codes64" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      Similarity.pqEncodeArray(e, "vec_id", "embedding", cbs)
        .select(col("vec_id"),
          array_join(col("pq_code"), ",").as("pq_code_csv"))
        .orderBy("vec_id")
    },
    // ---- ADC retrieval over canonical 64-bit array codes ----
    "q90_adc_topk64" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      val codes = Similarity.pqEncodeArray(e, "vec_id", "embedding", cbs)
      Similarity.adcTopKArray(e.filter(col("vec_id") % 100 === 0), codes, e,
          "vec_id", "embedding", cbs, k = 5, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- full-corpus residual codebook training: q101's fixed-point
    // pass applied to RESIDUALS (vector − cell centroid, the encoder's
    // exact Float arithmetic) — completes the training matrix: IVF full
    // (q95), PQ full (q101), residual full (here); no codebook is
    // bounded by a driver sample anywhere ----
    "q106_residual_codes_full" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val cbs = Similarity.pqCodebooksResidualFull(e, "vec_id", "embedding",
        cents, m = 8, k = 256, dim = 64)
      Similarity.ivfPqEncodeResidual(e, "vec_id", "embedding", cents, cbs)
        .select(col("vec_id"), col("bucket"),
          array_join(col("pq_code"), ",").as("pq_code_csv"))
        .orderBy("vec_id")
    },
    // ---- by-bucket index + partition-pruned stored retrieval: the
    // probe-cell union (≤ k values) becomes a pindex PartitionFilter, so
    // the scan reads only probed cells' directories — retrieval IO ∝
    // nProbe/k. Results equal a fresh whole-corpus retrieval, so the
    // oracle IS q83's — pruning must be pure IO elision ----
    "q105_ivf_pruned" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      val work = tempWorkDir("graft_q105_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 1)) // pindex == bucket
      Similarity.writeIndexBatchByBucket(ps, "emb", e, "vec_id", "embedding",
        cents, cbs, modified = 1L)
      Similarity.ivfTopKStoredPruned(e.filter(col("vec_id") % 100 === 0),
          ps, "emb", "vec_id", "embedding", cents, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    },
    // ---- partition-pruned stored IVF-PQ retrieval (q105's pruning on
    // the COMPRESSED path): by-bucket index part (pindex == cell), the
    // probe set becomes a PartitionFilter, ADC reads only probed cells'
    // stored codes — the nProbe/k-of-index-bytes retrieval at 100 TB ----
    "q186_ivfpq_pruned" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      val work = tempWorkDir("graft_q186_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 1)) // pindex == bucket
      Similarity.writeIndexBatchByBucket(ps, "emb", e, "vec_id", "embedding",
        cents, cbs, modified = 1L)
      Similarity.ivfPqTopKStoredPruned(e.filter(col("vec_id") % 100 === 0),
          ps, "emb", e, "vec_id", "embedding", cents, cbs,
          k = 5, nProbe = 2, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- streaming late-data gate (SURVEY I3): events replay through
    // the streaming trendSink in two micro-batches where EVERY row of the
    // second batch is event-time OLDER than the first — late stragglers
    // upsert into already-written early pindex partitions through the
    // staged merge. Batch-reprocessing equivalence is the contract: the
    // stored part equals the one-shot batch aggregate of all events, so
    // the oracle is that batch computation (arrival order invisible).
    // MemoryStream is the harness feed (driver-side by nature); the
    // operator under test is the sink, not the feed. The replayed slice
    // is CAPPED at 4096 rows by a deterministic md5 top-N (a distributed
    // TakeOrdered, not a full sort) so driver memory is O(1) in sf —
    // the cap binds at the gate sf (10k aggregated rows at sf0.01), so
    // oracle equivalence of the capped slice is itself verified ----
    "q104_streaming_late" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = load(s, dir, "events").select(
        col("user_id").as("entity_id"),
        graft.Tables.epochSec(col("ts")).as("timestamp"),
        col("value"))
      // fixed-point micro-units: LONG sums are order-free, so the stored
      // hash is deterministic on both engines (a double sum would not be)
      val base = ev.groupBy("entity_id", "timestamp")
        .agg(sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("power"))
      val capped = base
        .withColumn("__h", md5(concat(lit("late:"),
          col("entity_id").cast("string"), lit(":"),
          col("timestamp").cast("string"))))
        .orderBy(col("__h"), col("entity_id"), col("timestamp"))
        .limit(4096)
      val rows = capped.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), 1L))
      // late-half split point from the replayed slice itself (driver-side
      // min/max over the already-collected bounded rows — no extra job)
      val ts = rows.map(_._2)
      val mid = (ts.min + ts.max) / 2
      val work = tempWorkDir("graft_q104_")
      // daily partitions: the events fixture spans ~30 days, so the late
      // batch rewrites ~15 already-written partition dirs through the
      // staged swap — the semantics under test — without the per-dir swap
      // overhead of hourly partitioning (720 dirs ≈ 16 s of bench time)
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 86400))
      val mem = MemoryStream[(Long, Long, Long, Long)]
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.trendSink(
        mem.toDF().toDF("entity_id", "timestamp", "power", "modified"),
        ps, "ev", nowSec = () => 42L)
      try {
        mem.addData(rows.filter(_._2 >= mid).toSeq: _*) // recent half first
        q.processAllAvailable()
        mem.addData(rows.filter(_._2 < mid).toSeq: _*)  // then the late half
        q.processAllAvailable()
      } finally q.stop()
      }
      ps.readPart("ev").get
        .select(col("entity_id"), col("timestamp"), col("power"))
        .orderBy("entity_id", "timestamp")
    },
    // ---- streaming funnel detection gate (CEP-lite custom state): the
    // md5-capped event slice replays in two time-split batches; each
    // user's earliest in-order view→click→purchase chain must equal the
    // batch q156 chained-min computation over the same slice ----
    "q193_streaming_funnel" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = load(s, dir, "events").select(col("event_id"), col("user_id"),
        graft.Tables.epochSec(col("ts")).as("sec"), col("event_type"))
      val capped = ev
        .filter(col("event_type").isin("view", "click", "purchase"))
        .withColumn("__h", md5(concat(lit("fun:"), col("event_id").cast("string"))))
        .orderBy("__h", "event_id").limit(4096)
        .select("user_id", "sec", "event_type").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val ts = capped.map(_._2)
      val mid = (ts.min + ts.max) / 2
      val mem = MemoryStream[(Long, Long, String)]
      val hits = graft.streaming.StreamingRollup.funnelDetect(
        mem.toDF().toDF("user_id", "sec", "event_type"),
        "user_id", "sec", "event_type", Seq("view", "click", "purchase"))
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = hits.toDF()
        .select(col("entity_id").as("user_id"),
          element_at(col("times"), 1).as("v_ts"),
          element_at(col("times"), 2).as("c_ts"),
          element_at(col("times"), 3).as("p_ts"))
        .writeStream.format("memory").queryName("q193_funnel")
        .outputMode("append").start()
      try {
        mem.addData(capped.filter(_._2 < mid).toSeq: _*)
        q.processAllAvailable()
        mem.addData(capped.filter(_._2 >= mid).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      s.table("q193_funnel").orderBy("user_id")
    },
    // ---- streaming index sink gate (q99's loop through the streaming
    // face): an md5-capped embedding slice replays through indexSink in
    // two micro-batches — each batch buckets + PQ-codes itself at write
    // time with the LOADED sidecars — and stored retrieval must equal
    // the fresh single-pass chain over the same slice (batch split is
    // invisible in the final state, so the oracle ignores it) ----
    "q191_streaming_index" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val e = load(s, dir, "embeddings")
        .withColumn("__h", md5(concat(lit("sidx:"), col("vec_id").cast("string"))))
        .orderBy("__h", "vec_id").limit(4096)
        .select("vec_id", "embedding")
        .localCheckpoint()
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      val work = tempWorkDir("graft_q191_")
      Similarity.saveCentroids(s, s"$work/centroids", cents)
      Similarity.savePqCodebooks(s, s"$work/codebooks", cbs)
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 200))
      // bounded: e is the md5-capped 4096-row slice selected above —
      // driver memory is O(cap), not O(sf)
      val rows = e.as[(Long, Seq[Float])].collect()
      val mem = MemoryStream[(Long, Seq[Float])]
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.indexSink(
        mem.toDF().toDF("vec_id", "embedding"), ps, "emb",
        s"$work/centroids", s"$work/codebooks", "vec_id", "embedding",
        nowSec = () => 42L)
      try {
        mem.addData(rows.filter(_._1 % 2 == 0).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._1 % 2 == 1).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      val stored = ps.readPart("emb").get.select(
        col("entity_id").as("vec_id"), col("embedding"),
        col("bucket"), col("pq_code"))
      Similarity.ivfPqTopKStored(e.filter(col("vec_id") % 100 === 0), stored,
          e, "vec_id", "embedding", "bucket", "pq_code", cents, cbs,
          k = 5, nProbe = 2, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- streaming dedup sink gate: documents replay through
    // dedupSink (foreachBatch → exactIncremental against the persisted
    // digest store) in two md5-split micro-batches; the stored state
    // must equal the batch two-call schedule — first-occurrence-wins
    // ACROSS batches, keeper = the first batch's min id per digest ----
    "q190_streaming_dedup" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      // md5-capped replay slice (q104's convention): driver memory O(1)
      // in sf — the cap binds above sf0.01's 500 docs
      val d = docs(s, dir).select("doc_id", "text")
        .withColumn("__h", md5(concat(lit("sddcap:"), col("doc_id").cast("string"))))
        .orderBy("__h", "doc_id").limit(2048)
        .select("doc_id", "text")
      val split = pmod(conv(substring(md5(concat(lit("sdd:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val rows = d.withColumn("__s", split)
        .select("doc_id", "text", "__s").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val work = tempWorkDir("graft_q190_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 1L << 55, keyCols = Seq("digest")))
      val mem = MemoryStream[(Long, String)]
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.dedupSink(
        mem.toDF().toDF("doc_id", "text"), ps, "d", "doc_id", "text")
      try {
        mem.addData(rows.filter(_._3 == 0L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._3 == 1L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      ps.readPart("d").get
        .select(col("digest"), col("keeper"))
        .orderBy("digest")
    },
    // ---- streaming HdrHistogram sketch sink: two micro-batches merge
    // into the persisted (source,bucket) store by bucket addition; the
    // stored sketch answers quantiles byte-identical to the batch sketch
    // of the same capped slice (oracle replays the q211 arithmetic over
    // the slice) ----
    "q218_streaming_sketch" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val d = docs(s, dir).select("doc_id", "source", "n_chars")
        .withColumn("__h", md5(concat(lit("skscap:"), col("doc_id").cast("string"))))
        .orderBy("__h", "doc_id").limit(2048)
      val split = pmod(conv(substring(md5(concat(lit("sks:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val rows = d.withColumn("__s", split)
        .select("source", "n_chars", "__s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val work = tempWorkDir("graft_q218_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 64L,
          keyCols = Seq("source", "bucket")))
      val mem = MemoryStream[(String, Long)]
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.sketchSink(
        mem.toDF().toDF("source", "n_chars"), ps, "hdr",
        Seq("source"), "n_chars")
      try {
        mem.addData(rows.filter(_._3 == 0L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._3 == 1L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      graft.functions.HdrQuantiles.quantilesFromSketch(
          ps.readPart("hdr").get.select("source", "bucket", "cnt"),
          Seq("source"),
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99), p = 5)
        .orderBy("source")
    },
    // ---- streaming count-min sink: two micro-batches of tokens merge
    // into the persisted 4×512 grid by cell addition; heavy-hitter
    // estimates from the STORE over an md5-capped doc slice (the
    // q218/q230 replay convention) — oracle replays grid and probes over
    // the same slice ----
    "q246_stream_cms" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val capped = docs(s, dir)
        .withColumn("__h", md5(concat(lit("cmscap:"), col("doc_id").cast("string"))))
        .orderBy("__h", "doc_id").limit(512)
      val splitCoin = pmod(conv(substring(md5(concat(lit("cmss:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val rows = capped.withColumn("__s", splitCoin)
        .select("doc_id", "text", "__s").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val work = tempWorkDir("graft_q246_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/cms", 64L,
          keyCols = Seq("r", "bucket")))
      val mem = MemoryStream[(Long, String)]
      val tokStream = mem.toDF().toDF("doc_id", "text")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.cmsSink(tokStream, ps, "cms", "tok")
      try {
        mem.addData(rows.filter(_._3 == 0L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._3 == 1L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      val t = TextAnalysis.tokens(capped, "doc_id", "text")
      val exact = t.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
      CountMin.estimateStored(ps, "cms", exact, "tok")
        .orderBy(col("exact_cnt").desc, col("tok"))
    },
    // ---- streaming vocabulary sink: 3-shingle types (a genuinely
    // growing type space, unlike the 31-word token vocab) stream in two
    // doc micro-batches; the store admits only unseen types (idempotent
    // replay) and its modified column IS the first-seen log — read back
    // as per-batch growth. Shingling is a window-free streaming-safe
    // transform(sequence) projection; oracle replays first-seen-batch
    // per type over the capped slice ----
    "q260_stream_vocab" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val capped = docs(s, dir)
        .withColumn("__h", md5(concat(lit("vcap:"), col("doc_id").cast("string"))))
        .orderBy("__h", "doc_id").limit(512)
      val coin = pmod(conv(substring(md5(concat(lit("vs:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2L))
      val rows = capped.withColumn("__s", coin)
        .select("doc_id", "text", "__s").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val work = tempWorkDir("graft_q260_")
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(s"$work/vocab", 64L,
          keyCols = Seq("tok")))
      val mem = MemoryStream[(Long, String)]
      val shingleStream = mem.toDF().toDF("doc_id", "text")
        .withColumn("__arr", split(trim(col("text")), "\\s+"))
        .filter(size(col("__arr")) >= 3)
        .select(explode(expr("array_distinct(transform(" +
          "sequence(0, size(__arr) - 3), " +
          "i -> concat_ws(' ', __arr[i], __arr[i+1], __arr[i+2])))"))
          .as("tok"))
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = graft.streaming.StreamingRollup.vocabSink(
        shingleStream, ps, "vocab", "tok")
      try {
        mem.addData(rows.filter(_._3 == 0L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._3 == 1L).map(r => (r._1, r._2)).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      ps.readPart("vocab").get
        .groupBy(col("modified").as("batch"))
        .agg(count(lit(1)).as("n_new_types"))
        .orderBy("batch")
    },
    // ---- streaming CUSUM monitor (calibrate-then-monitor): per-user
    // median targets from the reference half (stream-static join
    // upstream), then the O(1)-state monitor over the time-ordered
    // second half in two micro-batches; oracle replays the closed form
    // over the same capped slice ----
    "q230_streaming_cusum" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val mid = 1705361400L
      val ev = load(s, dir, "events")
        .withColumn("sec", expr("ts div 1000000000"))
        .withColumn("__h", md5(concat(lit("csmcap:"), col("event_id").cast("string"))))
        .orderBy("__h", "event_id").limit(4096)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
        .select("user_id", "event_id", "sec", "cents")
      val med = ev.filter(col("sec") < mid).groupBy("user_id")
        .agg((expr("percentile(cents, 0.5)") * 2).cast("long").as("med2"))
      val monitor = ev.filter(col("sec") >= mid)
        .join(med, "user_id")
        .select(col("user_id"),
          (col("sec") * 10000000L + col("event_id")).as("ord"),
          (col("cents") * 2 - col("med2") - 50L).as("y"))
      val mid2 = 1706008500L * 10000000L
      val rows = monitor.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val mem = MemoryStream[(Long, Long, Long)]
      val alarms = graft.streaming.StreamingRollup.cusumDetect(
        mem.toDF().toDF("user_id", "ord", "y"), "user_id", "ord", "y",
        threshold = 2000L)
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val sink = alarms.writeStream.outputMode("append")
        .format("memory").queryName("q230_alarms").start()
      try {
        mem.addData(rows.filter(_._2 < mid2).toSeq: _*)
        sink.processAllAvailable()
        mem.addData(rows.filter(_._2 >= mid2).toSeq: _*)
        sink.processAllAvailable()
      } finally sink.stop()
      }
      s.table("q230_alarms")
        .groupBy(col("entity_id").as("user_id"))
        .agg(count(lit(1)).as("n_alarms"),
          min(col("ord")).as("first_alarm_ord"),
          max(col("cusum")).as("max_cusum"))
        .orderBy("user_id")
    },
    // ---- stream-stream interval join gate (view⋈click attribution):
    // both sides replay in time-split batches; inner-join rows emit on
    // arrival of the matching side (no sentinel needed), watermark
    // eviction at lateness 0 is sound because an evicted view (ts +
    // window < mid) cannot match any batch-2 click (ts >= mid). Oracle =
    // the batch interval join over the same capped slices ----
    "q189_stream_interval_join" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = load(s, dir, "events").select(col("event_id"), col("user_id"),
        graft.Tables.epochSec(col("ts")).as("sec"), col("event_type"))
      def capped(kind: String, salt: String) = ev
        .filter(col("event_type") === kind)
        .withColumn("__h", md5(concat(lit(salt), col("event_id").cast("string"))))
        .orderBy("__h", "event_id").limit(4096)
        .select("event_id", "user_id", "sec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val views = capped("view", "sij_v:")
      val clicks = capped("click", "sij_c:")
      val all = views.map(_._3) ++ clicks.map(_._3)
      val mid = (all.min + all.max) / 2
      val memV = MemoryStream[(Long, Long, Long)]
      val memC = MemoryStream[(Long, Long, Long)]
      val joined = graft.streaming.StreamingRollup.streamIntervalJoin(
        memV.toDF().toDF("view_id", "v_user", "v_ts"), "v_user", "v_ts",
        memC.toDF().toDF("click_id", "c_user", "c_ts"), "c_user", "c_ts",
        windowSeconds = 7200L, latenessSeconds = 0L)
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = joined.select(col("view_id"), col("click_id"),
          unix_timestamp(col("v_ts")).as("v_sec"),
          unix_timestamp(col("c_ts")).as("c_sec"))
        .writeStream.format("memory").queryName("q189_sij")
        .outputMode("append").start()
      try {
        memV.addData(views.filter(_._3 < mid).toSeq: _*)
        memC.addData(clicks.filter(_._3 < mid).toSeq: _*)
        q.processAllAvailable()
        memV.addData(views.filter(_._3 >= mid).toSeq: _*)
        memC.addData(clicks.filter(_._3 >= mid).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      s.table("q189_sij")
        .select("view_id", "click_id", "v_sec", "c_sec")
        .orderBy("view_id", "click_id")
    },
    // ---- streaming AS-OF join gate (latest-at-or-before feature
    // attachment, q138's shape on a live stream): closed-hour stats
    // stream alongside the click stream; each click attaches the newest
    // available hour within 2 h. Two time-split batches per side (the
    // q193/q230 event-time-ordered contract buys O(1) per-key state);
    // oracle = DuckDB ASOF LEFT JOIN over the same capped slice ----
    "q237_stream_asof" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = load(s, dir, "events").select(col("event_id"), col("user_id"),
        graft.Tables.epochSec(col("ts")).as("sec"), col("event_type"))
      val base = ev
        .withColumn("__h", md5(concat(lit("saj:"), col("event_id").cast("string"))))
        .orderBy("__h", "event_id").limit(4096)
        .select("event_id", "user_id", "sec", "event_type")
        .localCheckpoint()
      val rights = base.groupBy(col("user_id"),
          ((col("sec") - pmod(col("sec"), lit(3600L))) + 3600L).as("avail_sec"))
        .agg(count(lit(1)).as("hr_events"))
        .select("user_id", "avail_sec", "hr_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val lefts = base.filter(col("event_type") === "click")
        .select("user_id", "sec", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val allTs = lefts.map(_._2) ++ rights.map(_._2)
      val mid = (allTs.min + allTs.max) / 2
      // ONE tagged source (side 0 = hourly feature, 1 = click): both row
      // kinds of a time window share each micro-batch — the co-delivery
      // the operator's contract requires
      val tagged = lefts.map { case (u, sec, id) => (u, sec, 1L, id) } ++
        rights.map { case (u, avail, ev) => (u, avail, 0L, ev) }
      val mem = MemoryStream[(Long, Long, Long, Long)]
      val joined = graft.streaming.StreamingRollup.streamAsofJoinTagged(
        mem.toDS(), tolerance = Some(7200L))
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = joined.toDF()
        .writeStream.format("memory").queryName("q237_saj")
        .outputMode("append").start()
      try {
        mem.addData(tagged.filter(_._2 < mid).toSeq: _*)
        q.processAllAvailable()
        mem.addData(tagged.filter(_._2 >= mid).toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      }
      s.table("q237_saj")
        .select(col("entity_id"), col("l_ord"), col("l_ts"),
          col("asof_ts"), col("r_val"))
        .orderBy("entity_id", "l_ts", "l_ord")
    },
    // ---- streaming windowed rollup gate (SURVEY I1/I3's watermarked
    // tumbling-window aggregation, Append mode): the md5-capped slice
    // replays in two TIME-SPLIT batches — lateness 0 is sound because a
    // window finalized at watermark=mid can only contain pre-mid rows
    // and batch 2 is entirely >= mid — then sentinel batches flush the
    // open windows. Fixed-point micro-unit LONG sums keep the stored
    // hash engine-exact; oracle = the batch per-(entity, hour-end)
    // aggregate over the same slice ----
    "q171_streaming_rollup" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = load(s, dir, "events").select(col("event_id"), col("user_id"),
        graft.Tables.epochSec(col("ts")).as("sec"), col("value"))
      val capped = ev
        .withColumn("__h", md5(concat(lit("roll:"), col("event_id").cast("string"))))
        .orderBy("__h", "event_id").limit(4096)
        .select(col("user_id"), col("sec"),
          floor(col("value") * 1e6 + 0.5).cast("long").as("micro"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val ts = capped.map(_._2)
      val mid = (ts.min + ts.max) / 2
      val mem = MemoryStream[(Long, Long, Long)]
      val rolled = graft.streaming.StreamingRollup.rollup(
        mem.toDF().toDF("user_id", "sec", "micro")
          .withColumn("ets", col("sec").cast("timestamp")),
        "user_id", "ets", granSeconds = 3600L, latenessSeconds = 0L,
        aggs = Seq(sum(col("micro")).as("power")))
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = rolled.writeStream.format("memory")
        .queryName("q171_rollup").outputMode("append").start()
      try {
        mem.addData(capped.filter(_._2 < mid).toSeq: _*)
        q.processAllAvailable()
        mem.addData(capped.filter(_._2 >= mid).toSeq: _*)
        q.processAllAvailable()
        val sentinel = ts.max + 3L * 3600L
        mem.addData((-1L, sentinel, 0L))
        q.processAllAvailable()
        mem.addData((-1L, sentinel + 3L * 3600L, 0L)) // flush sentinel's window
        q.processAllAvailable()
      } finally q.stop()
      }
      s.table("q171_rollup")
        .filter(col("entity_id") =!= -1L)
        .select(col("entity_id"), col("timestamp"), col("power"))
        .orderBy("entity_id", "timestamp")
    },
    // ---- streaming sessionization gate (custom flatMapGroupsWithState
    // state, SURVEY I5's custom-state path): a bounded md5-capped event
    // slice replays through StreamingRollup.sessionize in two TIME-SPLIT
    // micro-batches (lateness 0 — time-split batches are never late, and
    // an event-time timeout can only fire for sessions a batch-2 event
    // could not extend anyway: watermark > end+gap implies any later
    // event starts a new session in batch semantics too), then two
    // far-future sentinel batches flush the remaining open sessions via
    // the event-time timeout. Batch-reprocessing equivalence is the
    // contract: emitted sessions == the batch q45 window composition
    // over the same slice, so the oracle is that batch computation ----
    "q176_streaming_sessions" -> { (s, dir) =>
      implicit val sc = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ev = load(s, dir, "events").select(col("event_id"),
        col("user_id"), graft.Tables.epochSec(col("ts")).as("sec"))
      val capped = ev
        .withColumn("__h", md5(concat(lit("sess:"), col("event_id").cast("string"))))
        .orderBy("__h", "event_id").limit(4096)
        .select("user_id", "sec").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val ts = capped.map(_._2)
      val mid = (ts.min + ts.max) / 2
      val mem = MemoryStream[(Long, Long)]
      val sessions = graft.streaming.StreamingRollup.sessionize(
        mem.toDF().toDF("user_id", "sec"), "user_id", "sec",
        gapSeconds = 1800L, latenessSeconds = 0L)
      graft.streaming.StreamingRollup.withStateSeam(s) {
      val q = sessions.toDF().writeStream.format("memory")
        .queryName("q176_sessions").outputMode("append").start()
      try {
        mem.addData(capped.filter(_._2 < mid).toSeq: _*)  // earlier half
        q.processAllAvailable()
        mem.addData(capped.filter(_._2 >= mid).toSeq: _*) // later half
        q.processAllAvailable()
        val sentinel = ts.max + 1800L + 1000000L
        mem.addData((-1L, sentinel))
        q.processAllAvailable()
        mem.addData((-1L, sentinel + 1800L + 10L)) // second advance: flush
        q.processAllAvailable()
      } finally q.stop()
      }
      s.table("q176_sessions")
        .filter(col("entity_id") =!= -1L)
        .select(col("entity_id").as("user_id"), col("session_start"),
          col("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")
    },
    // ---- scalar quantization (FAISS IndexScalarQuantizer QT_8bit
    // shape): per-dim (min, max) trained over the full corpus, one uint8
    // code per dimension — 4× compression at per-dim fidelity, the rung
    // between raw float32 and PQ's 32×. All-double affine arithmetic, so
    // codes are bit-identical cross-engine ----
    "q107_sq_codes" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val ps = Similarity.sqParams(e, "embedding", 64)
      Similarity.sqEncode(e, "vec_id", "embedding", ps)
        .select(col("vec_id"), array_join(col("sq_code"), ",").as("sq_code_csv"))
        .orderBy("vec_id")
    },
    // ---- asymmetric SQ retrieval: full-vector queries against the
    // uint8-coded corpus (decode-on-the-fly estimate), exact rerank for
    // the shortlist — the same estimate→shortlist→rerank tail as ADC ----
    "q108_sq_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val ps = Similarity.sqParams(e, "embedding", 64)
      val codes = Similarity.sqEncode(e, "vec_id", "embedding", ps)
      Similarity.sqTopK(e.filter(col("vec_id") % 100 === 0), codes, e,
          "vec_id", "embedding", ps, k = 5, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- IVF × SQ (FAISS IndexIVFScalarQuantizer shape): 2-of-8 cell
    // probe gates the corpus, the SQ affine decode estimates only probed
    // candidates, exact rerank pays full vectors for the shortlist —
    // completes the gate × estimator matrix (full vectors / PQ / SQ) ----
    "q112_ivfsq_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val ps = Similarity.sqParams(e, "embedding", 64)
      val codes = Similarity.sqEncode(e, "vec_id", "embedding", ps)
      Similarity.ivfSqTopK(e.filter(col("vec_id") % 100 === 0), codes, e,
          "vec_id", "embedding", cents, ps, k = 5, nProbe = 2, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- binary quantization (FAISS IndexBinaryFlat shape): 1 sign bit
    // per dimension packed 32-per-BIGINT — the 32× compression floor.
    // Training-free, integer end to end, so the oracle replays the codes
    // exactly ----
    "q110_bq_codes" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      Similarity.bqEncode(e, "vec_id", "embedding", 64)
        .select(col("vec_id"), array_join(col("bq_code"), ",").as("bq_code_csv"))
        .orderBy("vec_id")
    },
    // ---- BQ retrieval: Hamming-agreement estimate (XOR + popcount, the
    // cheapest candidate scan of any rung) shortlists for the shared
    // exact rerank ----
    "q111_bq_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val codes = Similarity.bqEncode(e, "vec_id", "embedding", 64)
      Similarity.bqTopK(e.filter(col("vec_id") % 100 === 0), codes, e,
          "vec_id", "embedding", dim = 64, k = 5, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- IVF × BQ (FAISS IndexBinaryIVF shape): the probe gate over
    // sign codes — XOR+popcount per probed candidate, the final cell of
    // the gate × estimator matrix ----
    "q115_ivfbq_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val codes = Similarity.bqEncode(e, "vec_id", "embedding", 64)
      Similarity.ivfBqTopK(e.filter(col("vec_id") % 100 === 0), codes, e,
          "vec_id", "embedding", cents, dim = 64, k = 5, nProbe = 2,
          shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- exact cosine range search (FAISS range_search shape): ALL
    // neighbors above the similarity threshold — data-driven result
    // size, the retrieval contract top-k can't express. The exactness
    // anchor; rangeSearchIvf is the gated scale path (subset + recall
    // spec-asserted) ----
    "q109_range_search" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      Similarity.rangeSearch(e.filter(col("vec_id") % 100 === 0), e,
          "vec_id", "embedding", minCos = 0.25)
        .orderBy("query_id", "neighbor_id")
    },
    // ---- OPQ (Ge et al. 2013): variance-balanced dimension permutation
    // before PQ — an orthogonal transform the ORACLE recomputes end to
    // end (fixed-point per-dim variances → snake allocation → permuted
    // q90 chain). Cosines are permutation-invariant, so only the ADC
    // estimate (subspace grouping) differs from q90 ----
    "q103_opq_adc_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val perm = Similarity.opqPermutation(e, "embedding", m = 8, dim = 64)
      val p = Similarity.permuteVectors(e, "embedding", perm)
      val cbs = Similarity.pqCodebooksRefined(p, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      val codes = Similarity.pqEncodeArray(p, "vec_id", "embedding", cbs)
      Similarity.adcTopKArray(p.filter(col("vec_id") % 100 === 0), codes, p,
          "vec_id", "embedding", cbs, k = 5, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- stored OPQ × IVF-PQ index (FAISS OPQ8,IVF8,PQ8 shape): the
    // permutation persists as a THIRD sidecar next to centroids and
    // codebooks; two md5-split batches permute + bucket + code at write
    // time with the LOADED sidecars (writeIndexBatchOpq), and stored
    // retrieval runs entirely in OPQ space with permuted queries —
    // closing round 11's gap (OPQ was fresh-build-only: the 1.7 s
    // permutation retrain ran on every q103 query). Oracle = the fresh
    // OPQ'd q97 chain: identical results certify the sidecar round-trip
    // AND that appends re-index nothing ----
    "q160_opq_ivfpq_stored" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val work = tempWorkDir("graft_q160_")
      Similarity.savePermutation(s, s"$work/perm",
        Similarity.opqPermutation(e, "embedding", m = 8, dim = 64))
      val perm = Similarity.loadPermutation(s, s"$work/perm")
      val p = Similarity.permuteVectors(e, "embedding", perm)
      val cents = Similarity.ivfCentroidsRefined(p, "vec_id", "embedding", 8)
      val cbs = Similarity.pqCodebooksRefined(p, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      Similarity.saveCentroids(s, s"$work/centroids", cents)
      Similarity.savePqCodebooks(s, s"$work/codebooks", cbs)
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 200))
      def writeBatch(batch: org.apache.spark.sql.DataFrame): Unit =
        Similarity.writeIndexBatchOpq(ps, "emb", batch, "vec_id", "embedding",
          Similarity.loadPermutation(s, s"$work/perm"),
          Similarity.loadCentroids(s, s"$work/centroids"),
          Similarity.loadPqCodebooks(s, s"$work/codebooks"), modified = 1L)
      val hv = conv(substring(md5(concat(lit("batch:"),
          col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      writeBatch(e.filter(hv === 0L))
      writeBatch(e.filter(hv === 1L))
      // rerank corpus = the STORED permuted vectors: certifies the
      // embedding column round-trips, not just the codes
      val stored = ps.readPart("emb").get.select(
        col("entity_id").as("vec_id"), col("embedding"),
        col("bucket"), col("pq_code"))
      Similarity.ivfPqTopKStored(p.filter(col("vec_id") % 100 === 0), stored,
          stored.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", "bucket", "pq_code", cents, cbs,
          k = 5, nProbe = 2, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- IVF-PQ retrieval (IVFADC / FAISS IndexIVFPQ shape): 2-of-8
    // cell probe gates the corpus, ADC scores only the probed codes,
    // exact rerank pays full vectors for the shortlist alone — the
    // composition of q83's gate and q90's compressed scan ----
    "q97_ivfpq_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      val codes = Similarity.pqEncodeArray(e, "vec_id", "embedding", cbs)
      Similarity.ivfPqTopK(e.filter(col("vec_id") % 100 === 0), codes, e,
          "vec_id", "embedding", cents, cbs, k = 5, nProbe = 2, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- incremental IVF-PQ, end to end: q96's appendable-index loop on
    // the COMPRESSED path. Both codebooks persist as sidecars; each ingest
    // batch computes its own bucket AND code array at write time with the
    // LOADED sidecars; retrieval runs ivfPqTopKStored over the stored
    // columns. Oracle = q97's fresh single-pass retrieval — identical
    // results certify that appending a batch re-indexes nothing ----
    "q99_ivfpq_incremental" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val cbs = Similarity.pqCodebooksRefined(e, "vec_id", "embedding",
        m = 8, k = 256, dim = 64, sampleN = 8192)
      val work = tempWorkDir("graft_q99_")
      Similarity.saveCentroids(s, s"$work/centroids", cents)
      Similarity.savePqCodebooks(s, s"$work/codebooks", cbs)
      // id-range index partitioning (200 ids/partition) — writeIndexBatch
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 200))
      def writeBatch(batch: org.apache.spark.sql.DataFrame): Unit =
        Similarity.writeIndexBatch(ps, "emb", batch, "vec_id", "embedding",
          Similarity.loadCentroids(s, s"$work/centroids"),
          Similarity.loadPqCodebooks(s, s"$work/codebooks"), modified = 1L)
      val hv = conv(substring(md5(concat(lit("batch:"),
          col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      writeBatch(e.filter(hv === 0L))
      writeBatch(e.filter(hv === 1L)) // corpus grows; first batch untouched
      val stored = ps.readPart("emb").get.select(
        col("entity_id").as("vec_id"), col("embedding"),
        col("bucket"), col("pq_code"))
      Similarity.ivfPqTopKStored(e.filter(col("vec_id") % 100 === 0), stored,
          e, "vec_id", "embedding", "bucket", "pq_code", cents, cbs,
          k = 5, nProbe = 2, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- incremental stored SQ index (q99's loop on the SQ rung):
    // params + centroids persisted as sidecars, two md5-split batches
    // encode their bucket AND uint8 codes at write time with the LOADED
    // sidecars, stored retrieval recomputes nothing — and must equal the
    // fresh q112 chain exactly (shared oracle) ----
    "q117_ivfsq_stored" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val ps0 = Similarity.sqParams(e, "embedding", 64)
      val work = tempWorkDir("graft_q117_")
      Similarity.saveCentroids(s, s"$work/centroids", cents)
      Similarity.saveSqParams(s, s"$work/sqparams", ps0)
      val store = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 200))
      def writeBatch(batch: org.apache.spark.sql.DataFrame): Unit =
        Similarity.writeIndexBatchSq(store, "emb", batch, "vec_id",
          "embedding", Similarity.loadCentroids(s, s"$work/centroids"),
          Similarity.loadSqParams(s, s"$work/sqparams"), modified = 1L)
      val hv = conv(substring(md5(concat(lit("batch:"),
          col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      writeBatch(e.filter(hv === 0L))
      writeBatch(e.filter(hv === 1L))
      val stored = store.readPart("emb").get.select(
        col("entity_id").as("vec_id"), col("bucket"), col("sq_code"))
      Similarity.ivfSqTopKStored(e.filter(col("vec_id") % 100 === 0), stored,
          e, "vec_id", "embedding", "bucket", "sq_code", cents, ps0,
          k = 5, nProbe = 2, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- residual IVF-PQ (the FAISS IndexIVFPQ default): codes encode
    // vector − cell centroid, the ADC table reconstructs cell + residual
    // per probed cell — tighter estimates than the cell-agnostic q97 ----
    "q100_ivfpq_residual" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val cbs = Similarity.pqCodebooksResidual(e, "vec_id", "embedding",
        cents, m = 8, k = 256, dim = 64, sampleN = 8192)
      val index = Similarity.ivfPqEncodeResidual(e, "vec_id", "embedding",
        cents, cbs)
      Similarity.ivfPqTopKResidual(e.filter(col("vec_id") % 100 === 0), index,
          e, "vec_id", "embedding", "bucket", "pq_code", cents, cbs,
          k = 5, nProbe = 2, shortlist = 50)
        .orderBy("query_id", "rank")
    },
    // ---- full-corpus PQ codebook training: q92's fixed-point Lloyd
    // arithmetic per (subspace, code, dim) — no codebook bounded by a
    // driver sample anymore; codes re-derived with the refined books ----
    "q101_pq_codes_full" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cbs = Similarity.pqCodebooksRefinedFull(e, "vec_id", "embedding",
        m = 8, k = 256, dim = 64)
      Similarity.pqEncodeArray(e, "vec_id", "embedding", cbs)
        .select(col("vec_id"),
          array_join(col("pq_code"), ",").as("pq_code_csv"))
        .orderBy("vec_id")
    },
    // ---- distributed Lloyd pass: fixed-point per-cell means over the
    // FULL corpus (deterministic under any partitioning) ----
    "q92_ivf_cell_means" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val seeds = Similarity.ivfCentroids(e, "vec_id", "embedding", 8)
      Similarity.ivfCellMeans(e, "embedding", seeds)
        .orderBy("cell", "dim")
    },
    // ---- SemDeDup: within-IVF-cell near-dup, keep the centroid outlier ----
    "q93_semantic_dedup" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val centroids = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      Dedup.semanticDedup(e, "vec_id", "embedding", centroids, minCos = 0.4)
        .orderBy("vec_id")
    },
    // ---- per-source document cap (domain balancing) ----
    "q84_domain_cap" -> { (s, dir) =>
      TextAnalysis.capPerKey(docs(s, dir), "source", "doc_id", 15)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },
    // ---- temperature-balanced source sampling rates (T=4) ----
    "q87_temperature_mix" -> { (s, dir) =>
      TextAnalysis.temperatureMixture(docs(s, dir), "source", sqrtIters = 2)
        .orderBy("source")
    },
    // ---- temperature resample materialized end to end (rates → sample) ----
    "q88_temperature_sample" -> { (s, dir) =>
      TextAnalysis.materializeTemperatureSample(docs(s, dir), "source",
          "doc_id", sqrtIters = 2)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },
    // ---- temperature resample on a SKEWED source grouping: the real
    // documents.source is near-uniform, so q88's least(1.0, …) caps every
    // rate at 1 and the gate can't discriminate the weight fold — here a
    // hash-derived 50/30/15/5 source makes the two big groups downsample
    // (rates < 1) while the small ones keep everything ----
    "q94_temperature_skew" -> { (s, dir) =>
      val hv = conv(substring(md5(concat(lit("skew:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1000000L
      val skewed = docs(s, dir).withColumn("skew_source",
        when(hv < 500000L, "s0").when(hv < 800000L, "s1")
          .when(hv < 950000L, "s2").otherwise("s3"))
      TextAnalysis.materializeTemperatureSample(skewed, "skew_source",
          "doc_id", sqrtIters = 2)
        .select("doc_id", "skew_source")
        .orderBy("doc_id")
    },
    // ---- end-to-end curation pipeline: exact dedup → quality floor →
    // per-source cap → deterministic split, composed from the primitives
    // exactly as a real corpus build chains them. The cap runs on the
    // q94-style 50/30/15/5 hash-derived source so it fires ASYMMETRICALLY
    // (big sources hit the cap, small ones keep everything) — a cap over
    // the near-uniform real `source` drops symmetric counts and the gate
    // can't tell a per-key cap from a global sample ----
    "q91_curation_pipeline" -> { (s, dir) =>
      val d = docs(s, dir)
      val keepers = Dedup.exact(d, "doc_id", "text")
        .select(col("keeper").as("doc_id"))
      val deduped = d.join(keepers, Seq("doc_id"), "left_semi")
      val filtered = deduped.filter(col("n_chars") >= 50)
      val hv = conv(substring(md5(concat(lit("skew:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1000000L
      val skewed = filtered.withColumn("skew_source",
        when(hv < 500000L, "s0").when(hv < 800000L, "s1")
          .when(hv < 950000L, "s2").otherwise("s3"))
      val capped = TextAnalysis.capPerKey(skewed, "skew_source", "doc_id", 100)
      TextAnalysis.hashSplit(capped, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.2))
        .select("doc_id", "source", "skew_source", "split")
        .orderBy("doc_id")
    },
    // ---- per-source length-distribution cutoffs (filter thresholds) ----
    "q85_source_quantiles" -> { (s, dir) =>
      TextAnalysis.groupQuantiles(docs(s, dir), Seq("source"), "n_chars",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .orderBy("source")
    },
    // ---- quality scoring ----
    "q30_quality" -> { (s, dir) =>
      TextAnalysis.quality(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    // ---- language ID heuristic ----
    "q31_langid" -> { (s, dir) =>
      TextAnalysis.langId(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    // ---- token counting / vocabulary histogram ----
    "q32_token_hist" -> { (s, dir) =>
      TextAnalysis.tokenHistogram(docs(s, dir), "doc_id", "text")
        .orderBy(desc("freq"), asc("tok")).limit(50)
    },
    // ---- rolling document fingerprint ----
    "q33_doc_fingerprint" -> { (s, dir) =>
      TextAnalysis.fingerprint(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    // ---- ANN: hyperplane bucket assignment (LSH/IVF bucketing) ----
    "q34_ann_buckets" -> { (s, dir) =>
      load(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          Similarity.hyperplaneBucket(col("embedding"), 8).as("bucket"))
        .orderBy("vec_id")
    },
    // ---- ANN: brute-force cosine top-k (exact baseline) ----
    "q35_ann_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    // ---- ANN: bucketed candidate + exact rerank ----
    "q36_bucketed_neighbors" -> { (s, dir) =>
      Similarity.bucketedNeighbors(load(s, dir, "embeddings"), "vec_id", "embedding", 8, 0.2)
        .orderBy("bucket", "id1", "id2")
    },
    // ---- multimodal: binary column metadata (no decode) ----
    "q37_multimodal_meta" -> { (s, dir) =>
      Multimodal.binaryMetadata(
        docs(s, dir).withColumn("blob", col("text").cast("binary")), "doc_id", "blob")
        .orderBy("doc_id")
    },
    // ---- BPE-ish regex tokenizer over punctuated text (JSON payloads) ----
    "q41_regex_tokens" -> { (s, dir) =>
      TextAnalysis.tokensRegex(load(s, dir, "events"), "event_id", "props")
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), asc("tok")).limit(30)
    },
    // ---- composite corpus filter: quality ∧ language ∧ dedup-keeper ----
    "q42_corpus_filter" -> { (s, dir) =>
      val d = docs(s, dir)
      val q = TextAnalysis.quality(d, "doc_id", "text")
        .filter(col("n_tokens") >= 30 && col("stopword_ratio") <= 0.4)
      val l = TextAnalysis.langId(d, "doc_id", "text").filter(col("lang_pred") === "en")
      val keepers = Dedup.exact(d, "doc_id", "text").select(col("keeper").as("doc_id"))
      q.join(l, "doc_id").join(keepers, "doc_id")
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    },
    // ---- multimodal: REAL header decode (PNG/JPEG/GIF/AVI) + thumbnails.
    // Testdata has no media bytes, so the gate synthesizes format-conformant
    // containers from (doc_id, n_chars) and runs the real byte parser; the
    // oracle recomputes dimensions arithmetically, so a parser reading the
    // wrong offset/endianness hash-mismatches. ----
    "q38_multimodal_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.fixtureBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      Multimodal.thumbnailPlan(d, 256).orderBy("id")
    },
    // ---- multimodal audio: real RIFF/WAVE fmt+data chunk walk — sample
    // rate, channels, and sample-frame count from genuine header fields
    // (frames = dataSize / blockAlign over a real zero payload) ----
    "q118_wav_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.audioBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width").as("sample_rate"),
          col("height").as("channels"), col("frames"))
        .orderBy("id")
    },
    // ---- multimodal video container: real ISO-BMFF box walk (ftyp
    // sniff, nested moov/mvhd/trak/tkhd) — duration from mvhd, frame
    // dimensions from tkhd's 16.16 fixed-point fields ----
    "q179_mp4_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.mp4Blobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width"), col("height"),
          col("frames").as("duration_ts"))
        .orderBy("id")
    },
    // ---- multimodal: WEBP/VP8X RIFF chunk walk — 24-bit LE canvas
    // dimensions from the extended header ----
    "q192_webp_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.webpBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width"), col("height"))
        .orderBy("id")
    },
    // ---- multimodal: OGG page walk (RFC 3533) with a real Vorbis id
    // header — lacing-value page hops, rate/channels from the BOS packet,
    // total samples from the EOS granule position ----
    "q214_ogg_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.oggBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width").as("sample_rate"),
          col("height").as("channels"), col("frames").as("total_samples"))
        .orderBy("id")
    },
    // ---- multimodal: AIFF COMM chunk walk — the sample rate decoded
    // from a REAL 80-bit extended float in integer arithmetic, decoy
    // chunk hopped with odd-size even-padding ----
    "q231_aiff_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.aiffBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width").as("sample_rate"),
          col("height").as("channels"), col("frames").as("n_frames"))
        .orderBy("id")
    },
    // ---- multimodal: MPEG-1 Layer III frame walk (ID3v2 skip + per-frame
    // length hops; rate/channels from the first header, frames counted) ----
    "q127_mp3_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.mp3Blobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width").as("sample_rate"),
          col("height").as("channels"), col("frames"))
        .orderBy("id")
    },
    // ---- multimodal: BMP BITMAPINFOHEADER parse (le32 dims, negative
    // height = top-down rows → magnitude) ----
    "q128_bmp_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.bmpBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width"), col("height"), col("frames"))
        .orderBy("id")
    },
    // ---- multimodal: FLAC STREAMINFO packed-bitfield parse ----
    "q139_flac_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.flacBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width").as("sample_rate"),
          col("height").as("channels"), col("frames").as("total_samples"))
        .orderBy("id")
    },
    // ---- multimodal: TIFF IFD walk (both byte orders, SHORT and LONG
    // value types, skip-over of unrelated tags) ----
    "q140_tiff_decode" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.tiffBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      d.select(col("id"), col("format"), col("width"), col("height"), col("frames"))
        .orderBy("id")
    },
    // ---- multimodal: frame sampling over decoded video (every 4th).
    // AVI docs (doc_id%4==3) carry real dwTotalFrames; stills decode to 1. ----
    "q60_frame_sample" -> { (s, dir) =>
      val d = Multimodal.decode(
        Multimodal.fixtureBlobs(docs(s, dir), "doc_id", "n_chars"), "doc_id", "blob")
      Multimodal.frameSamplePlan(d, 4)
        .select(col("id"), col("frames"),
          size(col("frame_idx")).as("n_sampled"),
          array_join(col("frame_idx"), ",").as("idx_str"))
        .orderBy("id")
    },
    // ---- multi-language ID (6 langs, argmax with priority tie-break) ----
    "q58_langid_multi" -> { (s, dir) =>
      TextAnalysis.langIdMulti(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    // ---- Gopher-style quality signals + composite pass flag ----
    "q59_gopher_quality" -> { (s, dir) =>
      TextAnalysis.gopherQuality(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    // ---- embedding-cosine near-dup over the documents table: hashed-BoW
    // embedding → LSH buckets → cos-threshold pairs → min-label keeper ----
    "q57_embedding_neardup" -> { (s, dir) =>
      val emb = TextAnalysis.hashEmbedding(docs(s, dir), "doc_id", "text", 16)
      Dedup.embeddingNearDups(emb, "doc_id", "embedding",
          nBits = 4, minCos = 0.98, maxBucket = 100)
        .orderBy("doc_id")
    },
    // ---- full connected-component keepers over the near-dup graph ----
    "q61_neardup_components" -> { (s, dir) =>
      val d = docs(s, dir)
      val emb = TextAnalysis.hashEmbedding(d, "doc_id", "text", 16)
      val pairs = Similarity.bucketedNeighbors(emb, "doc_id", "embedding",
          nBits = 4, minCos = 0.98, maxBucket = 100)
        .select("id1", "id2")
      Dedup.connectedKeepers(d.select("doc_id"), "doc_id", pairs)
        .orderBy("doc_id")
    },
    // ---- connected components via large-star/small-star contraction
    // (Kiveris et al. 2014): O(log n) rounds vs the min-label fixpoint's
    // O(diameter) — the scale path for chain-heavy near-dup graphs. Same
    // pairs and the same recursive-CTE oracle as q61: both algorithms
    // must land on identical component minima ----
    "q113_components_star" -> { (s, dir) =>
      val d = docs(s, dir)
      val emb = TextAnalysis.hashEmbedding(d, "doc_id", "text", 16)
      val pairs = Similarity.bucketedNeighbors(emb, "doc_id", "embedding",
          nBits = 4, minCos = 0.98, maxBucket = 100)
        .select("id1", "id2")
      Dedup.connectedKeepersStar(d.select("doc_id"), "doc_id", pairs)
        .orderBy("doc_id")
    },
    // ---- cluster representative by quality (keep the longest copy) ----
    "q86_cluster_rep" -> { (s, dir) =>
      val d = docs(s, dir)
      val emb = TextAnalysis.hashEmbedding(d, "doc_id", "text", 16)
      val pairs = Similarity.bucketedNeighbors(emb, "doc_id", "embedding",
          nBits = 4, minCos = 0.98, maxBucket = 100)
        .select("id1", "id2")
      val labels = Dedup.connectedKeepers(d.select("doc_id"), "doc_id", pairs)
      Dedup.clusterRepresentatives(labels, "doc_id", "keeper",
          d.select(col("doc_id"), col("n_chars")), "n_chars")
        .orderBy("doc_id")
    },
    // ---- ANN: IVF-style nearest-centroid assignment (deterministic
    // md5-sampled codebook; k-means would swap in transparently) ----
    "q56_ann_ivf" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val centroids = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      e.select(col("vec_id"),
          Similarity.ivfBucket(col("embedding"), centroids).as("bucket"))
        .orderBy("vec_id")
    },
    // ---- clustering-quality QA: IVF cell × ground-truth label counts →
    // per-cell purity (majority-label fraction) — the curation check
    // that an embedding index's cells actually align with semantics
    // before cell-level dedup/sampling trusts them ----
    "q172_cluster_purity" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val cellLabel = e.select(col("vec_id"), col("label"),
          Similarity.ivfBucket(col("embedding"), cents).as("bucket"))
        .groupBy("bucket", "label").agg(count(lit(1)).as("n"))
      // majority by (n desc, label asc) — the struct-max tie-break the
      // oracle's row_number ORDER BY mirrors exactly
      cellLabel.groupBy("bucket").agg(
          sum("n").as("n_vecs"),
          max(struct(col("n"), (-col("label")).cast("long").as("neg_label"))).as("m"))
        .select(col("bucket"), col("n_vecs"),
          col("m.n").as("majority_n"),
          (-col("m.neg_label")).as("majority_label"),
          (col("m.n").cast("double") / col("n_vecs")).as("purity"))
        .orderBy("bucket")
    },
    // ---- per-label mean embedding (domain centroids — the DSIR-style
    // target-profile primitive): fixed-point 2^24 quantized per-dim sums
    // through DECIMAL, so the means are bit-identical cross-engine ----
    "q173_label_centroids" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * lit(16777216.0) + lit(0.5))
            .cast("long").as("q"))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("q").cast("decimal(38,0)")).as("sq"))
        .select(col("label"), col("dim"), col("n_vecs"),
          (col("sq").cast("double") / col("n_vecs") / lit(16777216.0))
            .as("mean_x"))
        .orderBy("label", "dim")
    },
    // ---- IVF retrieval end-to-end: probe 2 of 8 cells, exact rerank ----
    "q83_ivf_topk" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val centroids = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      Similarity.ivfTopK(e.filter(col("vec_id") % 100 === 0), e,
          "vec_id", "embedding", centroids, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    },
    // ---- IVF retrieval on FULL-corpus-refined centroids: the distributed
    // fixed-point Lloyd pass (q92's ivfCellMeans) feeding retrieval — the
    // 100 TB index-build rung, vs q83's 2048-row driver-sample refinement ----
    "q95_ivf_topk_full" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val centroids = Similarity.ivfCentroidsRefinedFull(e, "vec_id", "embedding", 8)
      Similarity.ivfTopK(e.filter(col("vec_id") % 100 === 0), e,
          "vec_id", "embedding", centroids, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    },
    // ---- multi-pass distributed Lloyd: q95's fixed-point pass ITERATED —
    // pass 1's Float-rounded centroids feed pass 2's assignment; the
    // deterministic movement-based early stop (ε=0 here) makes the pass
    // count engine-reproducible, so the oracle replays both passes ----
    "q102_ivf_topk_lloyd2" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val centroids = Similarity.ivfCentroidsIteratedFull(
        e, "vec_id", "embedding", 8, nIter = 2)
      Similarity.ivfTopK(e.filter(col("vec_id") % 100 === 0), e,
          "vec_id", "embedding", centroids, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    },
    // ---- incremental IVF index, end to end: the codebook is trained
    // once and PERSISTED as a sidecar; each ingest batch computes its own
    // bucket column at write time with the LOADED codebook; retrieval
    // probes the stored column across every batch written so far. The
    // oracle is q83's FRESH single-pass retrieval — identical results
    // certify write-time bucketing == whole-corpus reassignment, the
    // property that makes the index appendable at 100 TB (new data never
    // forces re-indexing old data) ----
    "q96_ivf_incremental" -> { (s, dir) =>
      val e = load(s, dir, "embeddings")
      val centroids = Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8)
      val work = tempWorkDir("graft_q96_")
      Similarity.saveCentroids(s, s"$work/centroids", centroids)
      // 200 "ids per partition": the stored index is ID-RANGE partitioned
      // (timestamp = vec_id), so each batch's merge touches only the
      // partitions holding its ids — see Similarity.writeIndexBatch
      val ps = new graft.storage.PartStore(s,
        graft.storage.PartStoreConfig(work, 200))
      def writeBatch(batch: org.apache.spark.sql.DataFrame): Unit = {
        val cb = Similarity.loadCentroids(s, s"$work/centroids")
        ps.store("emb", batch.select(
          col("vec_id").as("entity_id"),
          col("vec_id").cast("long").as("timestamp"),
          col("embedding"),
          Similarity.ivfBucket(col("embedding"), cb).as("bucket"),
          lit(1L).as("modified")))
      }
      val hv = conv(substring(md5(concat(lit("batch:"),
          col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
      writeBatch(e.filter(hv === 0L))
      writeBatch(e.filter(hv === 1L)) // corpus grows; first batch untouched
      val stored = ps.readPart("emb").get.select(
        col("entity_id").as("vec_id"), col("embedding"), col("bucket"))
      Similarity.ivfTopKStored(e.filter(col("vec_id") % 100 === 0), stored,
          "vec_id", "embedding", "bucket", centroids, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    },
    // ---- ANN: seeded-Gaussian LSH buckets + capped join + exact rerank —
    // the production ANN shape (q36 with the production hash family) ----
    "q51_ann_gaussian" -> { (s, dir) =>
      Similarity.bucketedNeighborsGaussian(
          load(s, dir, "embeddings"), "vec_id", "embedding",
          nBits = 8, dim = 64, seed = 20260812L, minCos = 0.2, maxBucket = 100)
        .orderBy("bucket", "id1", "id2")
    }
  )

  /** The Gaussian planes are deterministic from the seed, so the SAME plane
    * constants are inlined into the DuckDB oracle — the hash family itself
    * is oracle-checked, not just the join shape. Sequential zip/fold dot
    * products are bit-identical across both engines (proven for q35). */
  private def gaussianOracle: String = {
    val planes = Similarity.gaussianPlanes(8, 64, 20260812L)
    val bucketExpr = planes.zipWithIndex.map { case (p, j) =>
      val arr = p.mkString("[", ",", "]")
      s"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), $arr) > 0 " +
        s"THEN ${1L << j} ELSE 0 END"
    }.mkString("\n           + ")
    s"""WITH bk AS (
         SELECT vec_id, CAST($bucketExpr AS BIGINT) AS bucket FROM embeddings),
       sz AS (SELECT bucket FROM bk GROUP BY 1 HAVING count(*) <= 100),
       capped AS (SELECT bk.* FROM bk JOIN sz USING (bucket)),
       pairs AS (
         SELECT x.bucket, x.vec_id AS id1, y.vec_id AS id2
         FROM capped x JOIN capped y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
       scored AS (
         SELECT p.bucket, p.id1, p.id2,
           list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
             (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
             AS cos
         FROM pairs p
         JOIN embeddings a ON a.vec_id = p.id1
         JOIN embeddings b ON b.vec_id = p.id2)
       SELECT bucket, id1, id2, cos FROM scored
       WHERE cos >= 0.2 ORDER BY bucket, id1, id2"""
  }

  /** Shared duplicated-span CTE chain (q75/q79): promo-tail corpus (stays
    * in sync with [[PromoTail]]), 8-gram occurrences with positions,
    * corpus-duplicated grams, covered positions `cov(doc_id, cp)`, and
    * per-doc token totals `tot(doc_id, n_tokens)`. */
  private val DupSpansCte =
    """corpus AS (
           SELECT doc_id, CASE WHEN doc_id % 4 = 0
             THEN text || ' click here to subscribe to our newsletter today please thanks'
             ELSE text END AS text
           FROM documents),
         base AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM corpus),
         occ AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i
           FROM base),
         gr AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS g
           FROM occ),
         dups AS (SELECT g FROM gr GROUP BY g HAVING count(*) > 1),
         cov AS (
           SELECT DISTINCT doc_id, cp FROM (
             SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS cp
             FROM gr JOIN dups USING (g))),
         tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM base)"""

  /** DuckDB md5→uniform-in-[0,1e6) fragment over an arbitrary SQL
    * expression — the q76 8-nibble expansion, shared so every split/
    * sample oracle hashes identically. */
  /** The raw first-8-nibble md5 value (0..2³²−1) — Spark's
    * `conv(substring(md5(...), 1, 8), 16, 10)`. */
  private def hv32Sql(salt: String, e: String): String =
    (0 until 8).map { i =>
      val mult = 1L << (4 * (7 - i))
      s"(strpos('0123456789abcdef', substr(md5('$salt' || $e), ${i + 1}, 1)) - 1) * $mult"
    }.mkString("(", "\n           + ", ")")

  private def hvSql(salt: String, e: String): String =
    s"(${hv32Sql(salt, e)} % 1000000)"

  /** Shared 8-gram first-occurrence novelty CTE (q274/q277/q278):
    * list-slice grams + min-doc attribution → `novstats(doc_id, n_grams,
    * n_novel_occ, n_distinct, n_novel)`; docs shorter than 8 tokens are
    * absent (callers LEFT JOIN and zero-fill). */
  /** q135's char-trigram tercile chain, parameterized on the corpus
    * source CTE — reused verbatim by the incremental (q307) and capped
    * streaming (q308) faces: counts add-merge, so stored ≡ fresh. */
  private def charLmTercilesCte(src: String) =
    s"""norm AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z]+', ' ',
             'g')) AS s FROM $src),
         tri AS (
           SELECT doc_id, substring(s, i, 3) AS tri FROM (
             SELECT doc_id, s,
               unnest(generate_series(1, greatest(length(s) - 2, 0))) AS i
             FROM norm)),
         c3 AS (SELECT tri, count(*) AS c3 FROM tri GROUP BY 1),
         c2 AS (SELECT substring(tri, 1, 2) AS pre, sum(c3) AS c2
                FROM c3 GROUP BY 1),
         model AS (
           SELECT tri, CAST(c3 + 1 AS DOUBLE) / (CAST(c2 AS DOUBLE) + 27)
             AS p
           FROM c3 JOIN c2 ON substring(c3.tri, 1, 2) = c2.pre),
         dt AS (SELECT doc_id, tri, count(*) AS c FROM tri GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(
                 list(struct_pack(tri := tri, c := c, p := p) ORDER BY tri),
                 x -> x.c * x.p)), (a, b) -> a + b) AS sum_p
           FROM dt JOIN model USING (tri) GROUP BY 1),
         scored AS (
           SELECT d.doc_id, d.lang, agg.sum_p / agg.n_trigrams AS mean_p
           FROM $src d JOIN agg USING (doc_id)
           WHERE agg.n_trigrams > 0),
         cuts AS (
           SELECT lang,
             quantile_cont(mean_p, CAST(1 AS DOUBLE) / 3) AS c13,
             quantile_cont(mean_p, CAST(2 AS DOUBLE) / 3) AS c23
           FROM scored GROUP BY 1)
         SELECT doc_id, lang, mean_p,
           CASE WHEN mean_p >= c23 THEN 'head'
                WHEN mean_p >= c13 THEN 'middle' ELSE 'tail' END
             AS ppl_bucket
         FROM scored JOIN cuts USING (lang) ORDER BY doc_id"""

  private def gramNoveltyCte(src: String) =
    s"""nbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM $src),
         nocc AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i
           FROM nbase),
         ngr AS (
           SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS g FROM nocc),
         nfd AS (SELECT g, min(doc_id) AS first_doc FROM ngr GROUP BY 1),
         novstats AS (
           SELECT ngr.doc_id,
             count(*) AS n_grams,
             sum(CASE WHEN nfd.first_doc = ngr.doc_id THEN 1 ELSE 0 END)
               AS n_novel_occ,
             count(DISTINCT ngr.g) AS n_distinct,
             count(DISTINCT CASE WHEN nfd.first_doc = ngr.doc_id THEN ngr.g END)
               AS n_novel
           FROM ngr JOIN nfd USING (g) GROUP BY 1)"""

  private val GramNoveltyCte = gramNoveltyCte("documents")

  /** q299/q302 shared replay: eval (with the %10 donor splice) probes
    * the train corpus's distinct anchor set; runs via gaps-and-islands.
    * q302 reuses it verbatim — the persisted registry must be
    * answer-invisible. */
  private val ContamSpansOracle =
      """WITH donor AS (
           SELECT doc_id - 1 AS doc_id, text AS donor_text FROM documents),
         ev AS (
           SELECT d.doc_id,
             CASE WHEN d.doc_id % 10 = 0 AND s.donor_text IS NOT NULL
               THEN s.donor_text || ' ' || d.text ELSE d.text END AS text
           FROM documents d LEFT JOIN donor s USING (doc_id)
           WHERE d.doc_id % 5 = 0),
         tr AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
         evb AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM ev),
         trb AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM tr),
         eva AS (
           SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+7], ' ')) AS g
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1,
               greatest(least(len(toks), 128) - 7, 0))) AS i FROM evb)
           WHERE len(list_filter(toks[i:i+7], x -> x = '')) = 0),
         tra AS (
           SELECT DISTINCT md5(array_to_string(toks[i:i+7], ' ')) AS g
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1,
               greatest(least(len(toks), 128) - 7, 0))) AS i FROM trb)
           WHERE len(list_filter(toks[i:i+7], x -> x = '')) = 0),
         fl AS (
           SELECT e.doc_id, e.pos, t.g IS NOT NULL AS dup
           FROM eva e LEFT JOIN tra t USING (g)),
         isl AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
           FROM fl WHERE dup),
         runs AS (
           SELECT doc_id, grp, count(*) AS run FROM isl GROUP BY 1, 2),
         mr AS (SELECT doc_id, max(run) AS max_run FROM runs GROUP BY 1),
         st AS (
           SELECT doc_id, count(*) AS n_anchors,
             sum(CASE WHEN dup THEN 1 ELSE 0 END) AS n_contaminated
           FROM fl GROUP BY 1)
         SELECT st.doc_id, CAST(st.n_anchors AS BIGINT) AS n_anchors,
           CAST(st.n_contaminated AS BIGINT) AS n_contaminated,
           CAST(COALESCE(mr.max_run, 0) AS BIGINT) AS max_run,
           CAST(10000 * st.n_contaminated // st.n_anchors AS BIGINT)
             AS contam_bp
         FROM st LEFT JOIN mr USING (doc_id) ORDER BY doc_id"""

  /** One final select shared by the one-shot (q274) and incremental
    * (q277) novelty gates: ascending-id batches make the incremental
    * union provably equal the one-shot run, so ONE oracle certifies
    * both. */
  private val GramNoveltyOracle =
    s"""WITH $GramNoveltyCte
         SELECT d.doc_id,
           CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(p.n_novel_occ, 0) AS BIGINT) AS n_novel_occ,
           CAST(coalesce(p.n_distinct, 0) AS BIGINT) AS n_distinct,
           CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(CASE WHEN coalesce(p.n_distinct, 0) = 0 THEN 0
                ELSE 10000 * p.n_novel // p.n_distinct END AS BIGINT) AS novelty_bp
         FROM documents d LEFT JOIN novstats p USING (doc_id) ORDER BY d.doc_id"""

  /** Shared PCM silence CTE (q271/q278): replay of the q270 sample
    * formula at frame level → `silstats(doc_id, frames, silent_frames,
    * n_active_segments, longest_silence)`. */
  private val PcmSilenceCte =
    """apar AS (
           SELECT doc_id, 1 + doc_id % 2 AS channels,
             50 + (doc_id * 13) % 400 AS frames
           FROM documents),
         afr AS (
           SELECT doc_id, channels, frames,
             unnest(generate_series(0, frames - 1)) AS f
           FROM apar),
         ach AS (
           SELECT doc_id, channels, frames, f,
             unnest(generate_series(0, channels - 1)) AS c
           FROM afr),
         asil AS (
           SELECT doc_id, frames, f,
             CASE WHEN max(abs(((doc_id * 7919 + (f * channels + c) * 104729)
               % 65536) - 32768)) < 8192 THEN 1 ELSE 0 END AS silent
           FROM ach GROUP BY doc_id, frames, f),
         aw AS (
           SELECT doc_id, frames, f, silent,
             lag(silent, 1, 1) OVER (PARTITION BY doc_id ORDER BY f) AS prev_silent
           FROM asil),
         aruns AS (
           SELECT doc_id,
             f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS isl
           FROM aw WHERE silent = 1),
         arlen AS (SELECT doc_id, count(*) AS rl FROM aruns GROUP BY doc_id, isl),
         along AS (SELECT doc_id, max(rl) AS longest FROM arlen GROUP BY 1),
         silstats AS (
           SELECT b.doc_id, b.frames, b.silent_frames, b.n_active_segments,
             coalesce(l.longest, 0) AS longest_silence
           FROM (
             SELECT doc_id, max(frames) AS frames, sum(silent) AS silent_frames,
               sum(CASE WHEN silent = 0 AND prev_silent = 1 THEN 1 ELSE 0 END)
                 AS n_active_segments
             FROM aw GROUP BY 1) b
           LEFT JOIN along l USING (doc_id))"""

  /** q27's LSH banding chain as a fragment (expects `sh` from
    * [[ShinglesCte]]): yields `lshcand(id1, id2)` — shared with the
    * q287 eval gate. */
  private val LshCandChainCte =
    """sig AS (
           SELECT doc_id,
             min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
             min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
             min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
             min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
           FROM sh GROUP BY 1),
         buckets AS (
           SELECT doc_id, 0 AS band, md5(h0 || h1) AS key FROM sig
           UNION ALL SELECT doc_id, 1, md5(h2 || h3) FROM sig
           UNION ALL SELECT doc_id, 2, md5(h4 || h5) FROM sig
           UNION ALL SELECT doc_id, 3, md5(h6 || h7) FROM sig),
         bsz AS (SELECT band, key FROM buckets GROUP BY 1, 2 HAVING count(*) <= 50),
         capped AS (
           SELECT b.* FROM buckets b JOIN bsz s ON b.band = s.band AND b.key = s.key),
         lshcand AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM capped a JOIN capped b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)"""

  /** q28's exact-Jaccard chain as a fragment (expects `sh`): yields
    * `jpairs(id1, id2, inter, jaccard)` at τ = 0.10, maxDocFreq 100 —
    * shared with the q287 eval gate. */
  private val JaccardChainCte =
    """shc AS (
           SELECT * FROM sh WHERE shingle IN (
             SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100)),
         jcounts AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
         jp0 AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
           FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         jpairs AS (
           SELECT id1, id2, inter,
             CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
           FROM jp0
           JOIN jcounts ca ON ca.doc_id = id1
           JOIN jcounts cb ON cb.doc_id = id2
           WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.10)"""

  /** Shared 16-bit SimHash CTE (q29/q80): md5-nibble token values, ±1
    * per-bit votes, sign → bit; yields `sh16(doc_id, simhash)`. */
  private val SimhashCte =
    s"""$ToksCte,
         tv AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) AS BIGINT) AS v
           FROM toks),
         votes AS (
           SELECT doc_id, b,
             sum(CASE WHEN (v >> b) % 2 = 1 THEN 1 ELSE -1 END) AS s
           FROM tv CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) bs
           GROUP BY 1, 2),
         sh16 AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
               AS BIGINT) AS simhash
           FROM votes GROUP BY 1)"""

  /** Shared PQ CTE prefix (q77/q78): md5-sampled 4-centroid codebook, 8
    * subspaces, per-(vector, subspace) nearest-centroid code — the single
    * SQL definition of what a PQ code is. */
  /** 13-nibble (52-bit) md5 → BIGINT ladder, mirroring the Spark side's
    * `conv(substring(md5(x), 1, 13), 16, 10)` (kmvDistinct, capPerKey). */
  private def md5Ladder52(sqlExpr: String): String =
    (0 until 13).map { i =>
      val mult = BigInt(16).pow(12 - i)
      val term =
        s"(strpos('0123456789abcdef', substr(md5($sqlExpr), ${i + 1}, 1)) - 1)"
      if (mult == 1) term else s"$term * $mult"
    }.mkString("\n           + ")

  /** q194/q239 shared oracle: the fixed two-batch incremental graph
    * build replayed as chained CTEs (see the q194 entry); with `prune`
    * the accumulated edge set additionally passes the compaction top-4
    * cut — (cos DESC, dst) per node, mirroring Similarity.graphCompact
    * — before the final beam search reads it. */
  private def graphIncOracle(prune: Boolean): String = {
    val sg = if (prune) "prd" else "eset"
        val rankRound = (pairs: String, out: String, k: Int) =>
          s"""s_$out AS (
               SELECT p.q, p.nb,
                 list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
               FROM $pairs p JOIN n a ON p.q = a.id JOIN n b ON p.nb = b.id),
             $out AS MATERIALIZED (
               SELECT q, nb FROM (
                 SELECT q, nb,
                   CAST(row_number() OVER (PARTITION BY q
                     ORDER BY cos DESC, nb) AS INT) AS rank
                 FROM s_$out)
               WHERE rank <= $k)"""
        val expand = (prev: String, out: String) =>
          s"""g_$out AS (
               SELECT q AS a, nb AS b FROM $prev
               UNION SELECT nb, q FROM $prev),
             h_$out AS (
               SELECT g1.a, g2.b FROM g_$out g1 JOIN g_$out g2 ON g1.b = g2.a),
             c_$out AS MATERIALIZED (
               SELECT DISTINCT a AS q, b AS nb FROM (
                 SELECT * FROM g_$out UNION SELECT * FROM h_$out)
               WHERE a <> b)"""
        val beamRound = (cands: String, out: String, n: Int, qcte: String) =>
          s"""s_$out AS (
               SELECT c.qid, c.node,
                 list_dot_product(qv.qvec, nv.vec) / (qv.qnrm * nv.nrm) AS cos
               FROM $cands c
               JOIN n nv ON c.node = nv.id
               JOIN $qcte qv ON c.qid = qv.qid
               WHERE c.qid <> c.node),
             $out AS MATERIALIZED (
               SELECT qid, node, cos, rank FROM (
                 SELECT qid, node, cos,
                   CAST(row_number() OVER (PARTITION BY qid
                     ORDER BY cos DESC, node) AS INT) AS rank
                 FROM s_$out)
               WHERE rank <= $n)"""
        val hop = (prev: String, out: String, graph: String) =>
          s"""c_$out AS MATERIALIZED (
               SELECT f.qid, r.nb AS node FROM $prev f JOIN $graph r ON f.node = r.q
               UNION SELECT qid, node FROM $prev)"""
        // internal k-NN graph of one batch: nnDescent(k=4, iterations=1,
        // initBits=4) restricted to the subset CTE `s` → g_$s(q, nb)
        val knnInternal = (s: String) =>
          s"""mk_$s AS (SELECT m.id, m.mk FROM mkr m JOIN $s USING (id)),
             ring_$s AS (
               SELECT id, COALESCE(
                   lead(id) OVER (ORDER BY mk, id),
                   first_value(id) OVER (ORDER BY mk, id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
                 AS succ
               FROM mk_$s),
             bkc_$s AS (
               SELECT bk.id, bk.b FROM bk JOIN $s USING (id)
               QUALIFY count(*) OVER (PARTITION BY b) <= 4096),
             p0_$s AS (
               SELECT x.id AS q, y.id AS nb
               FROM bkc_$s x JOIN bkc_$s y ON x.b = y.b AND x.id <> y.id
               UNION SELECT id, succ FROM ring_$s WHERE id <> succ
               UNION SELECT succ, id FROM ring_$s WHERE id <> succ),
             ${rankRound(s"p0_$s", s"r0_$s", 4)},
             ${expand(s"r0_$s", s"i1_$s")},
             ${rankRound(s"c_i1_$s", s"g_$s", 4)}"""
        s"""WITH v AS (
             SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
             FROM embeddings),
           n AS MATERIALIZED (
             SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
           bk AS (
             SELECT id, CAST(sum(CASE WHEN vec[2*b + 1] > vec[2*b + 2]
               THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS b
             FROM n CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bs
             GROUP BY 1),
           mkr AS (SELECT id, md5(CAST(id AS VARCHAR)) AS mk FROM n),
           hvt AS (
             SELECT id, (${md5Ladder32("'gidx:' || CAST(id AS VARCHAR)")}) % 2
               AS h
             FROM n),
           b0 AS (SELECT id FROM hvt WHERE h = 0),
           b1 AS (SELECT id FROM hvt WHERE h = 1),
           ${knnInternal("b0")},
           ${knnInternal("b1")},
           qs1 AS (
             SELECT nn.id AS qid, nn.vec AS qvec, nn.nrm AS qnrm
             FROM n nn JOIN b1 USING (id)),
           ent_x AS (SELECT id FROM mk_b0 ORDER BY mk, id LIMIT 4),
           bent_x AS (
             SELECT b, id AS node FROM (
               SELECT bk.b, bk.id,
                 CAST(row_number() OVER (PARTITION BY bk.b
                   ORDER BY m.mk, bk.id) AS INT) AS rn
               FROM bk JOIN b0 USING (id) JOIN mkr m ON bk.id = m.id)
             WHERE rn <= 4),
           qb_x AS (SELECT q.qid, bk.b FROM qs1 q JOIN bk ON q.qid = bk.id),
           c_x0 AS (
             SELECT q.qid, e.id AS node FROM qs1 q CROSS JOIN ent_x e
             UNION
             SELECT qb_x.qid, bent_x.node FROM qb_x JOIN bent_x USING (b)),
           ${beamRound("c_x0", "x0", 8, "qs1")},
           ${hop("x0", "x1", "g_b0")},
           ${beamRound("c_x1", "x1", 8, "qs1")},
           ${hop("x1", "x2", "g_b0")},
           ${beamRound("c_x2", "x2", 8, "qs1")},
           c_xf AS (SELECT qid, node FROM x2),
           ${beamRound("c_xf", "xf", 4, "qs1")},
           crossE AS (
             SELECT qid AS q, node AS nb FROM xf
             UNION SELECT node, qid FROM xf),
           eset AS MATERIALIZED (
             SELECT q, nb FROM g_b0
             UNION SELECT q, nb FROM g_b1
             UNION SELECT q, nb FROM crossE),
           ${if (prune) rankRound("eset", "prd", 4) + "," else ""}
           qsq AS (
             SELECT id AS qid, vec AS qvec, nrm AS qnrm FROM n
             WHERE id % 50 = 0),
           ent AS (SELECT id FROM mkr ORDER BY mk, id LIMIT 4),
           bent AS (
             SELECT b, id AS node FROM (
               SELECT bk.b, bk.id,
                 CAST(row_number() OVER (PARTITION BY bk.b
                   ORDER BY m.mk, bk.id) AS INT) AS rn
               FROM bk JOIN mkr m ON bk.id = m.id)
             WHERE rn <= 4),
           qb AS (SELECT q.qid, bk.b FROM qsq q JOIN bk ON q.qid = bk.id),
           c_f0 AS (
             SELECT q.qid, e.id AS node FROM qsq q CROSS JOIN ent e
             UNION
             SELECT qb.qid, bent.node FROM qb JOIN bent USING (b)),
           ${beamRound("c_f0", "f0", 8, "qsq")},
           ${hop("f0", "f1", sg)},
           ${beamRound("c_f1", "f1", 8, "qsq")},
           ${hop("f1", "f2", sg)},
           ${beamRound("c_f2", "f2", 8, "qsq")},
           c_fin AS (SELECT qid, node FROM f2),
           ${beamRound("c_fin", "fin", 4, "qsq")}
           SELECT qid AS query_id, node AS neighbor_id, rank, cos
           FROM fin ORDER BY query_id, rank"""
  }

  /** 8-nibble (32-bit) md5 ladder — mirrors TextAnalysis.hashUniform. */
  private def md5Ladder32(sqlExpr: String): String =
    (0 until 8).map { i =>
      val mult = BigInt(16).pow(7 - i)
      val term =
        s"(strpos('0123456789abcdef', substr(md5($sqlExpr), ${i + 1}, 1)) - 1)"
      if (mult == 1) term else s"$term * $mult"
    }.mkString("\n           + ")

  /** The codebook training sample: first `sampleN` vectors by
    * (md5(id), id) — mirrors Similarity.codebookSample. */
  private def sampCteNamed(name: String, sampleN: Int) =
    s"""$name AS (
           SELECT CAST(vec_id AS VARCHAR) AS sid,
             CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings
           ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
           LIMIT $sampleN)"""

  private def sampCte(sampleN: Int) = sampCteNamed("samp", sampleN)

  private val SampCte = sampCte(2048)

  /** Refined IVF centroids (k=8): seeds = first k sample vectors, one
    * Lloyd pass — assignment with the argmax/higher-index tiebreak, then
    * a per-cell per-dimension mean summed in id order (list_reduce over
    * an id-ordered list = the same sequential fold the Scala refinement
    * runs) rounded through REAL. Empty cells keep their seed. Mirrors
    * Similarity.lloydOnce bit for bit. Every CTE name takes the prefix
    * `p` so the chain can share one WITH clause with the PQ chain (which
    * owns the bare `samp`/`cent` names) — p = "" reproduces the
    * historical q56/q83 text. */
  private def refinedCentCte(p: String) =
    s"""${sampCteNamed(s"${p}samp", 2048)},
         ${p}seeds AS (
           SELECT CAST(row_number() OVER (ORDER BY md5(sid), sid) - 1 AS INT)
             AS i, emb
           FROM ${p}samp ORDER BY md5(sid), sid LIMIT 8),
         ${p}asg AS (
           SELECT s.sid, s.emb, c.i,
             list_dot_product(s.emb, c.emb) /
               (sqrt(list_dot_product(s.emb, s.emb)) *
                sqrt(list_dot_product(c.emb, c.emb))) AS cos
           FROM ${p}samp s CROSS JOIN ${p}seeds c),
         ${p}mem AS (
           SELECT sid, emb, i FROM ${p}asg
           QUALIFY row_number() OVER (PARTITION BY sid
             ORDER BY cos DESC, i DESC) = 1),
         ${p}sums AS (
           SELECT i, count(*) AS n,
             list_reduce(list(emb ORDER BY sid),
               (a, b) -> list_transform(list_zip(a, b), p -> p[1] + p[2]))
             AS vsum
           FROM ${p}mem GROUP BY 1),
         ${p}cent AS (
           SELECT c.i,
             CASE WHEN s.i IS NULL THEN c.emb
                  ELSE list_transform(s.vsum,
                         x -> CAST(CAST(x / s.n AS REAL) AS DOUBLE)) END
               AS embedding
           FROM ${p}seeds c LEFT JOIN ${p}sums s USING (i))"""

  private val RefinedCentCte = refinedCentCte("")

  /** md5-ordered k=8 seeds over the full corpus, (i, embedding) shape. */
  private val FullSeedsCte =
    """fseeds AS (
           SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
               CAST(vec_id AS VARCHAR)) - 1 AS INT) AS i,
             CAST(embedding AS DOUBLE[]) AS embedding
           FROM embeddings
           ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
           LIMIT 8)"""

  /** One FULL-corpus fixed-point Lloyd pass in SQL: every corpus vector
    * assigned to its nearest `inCent` centroid (argmax/higher-index
    * tiebreak), per-(cell, dim) means via floor(x·2²⁴+0.5) BIGINT sums —
    * the q92 arithmetic, deterministic under any partitioning — rounded
    * through REAL exactly like the Scala collect-to-Float. Empty cells
    * keep their input centroid. Chains: pass N's `outName` is pass N+1's
    * `inCent`, mirroring Similarity.ivfCentroidsIteratedFull pass for
    * pass. */
  private def fullLloydPassCte(p: String, inCent: String, outName: String) =
    s"""${p}asg AS (
           SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, s.i AS cell
           FROM embeddings e CROSS JOIN $inCent s
           QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(CAST(e.embedding AS DOUBLE[]), s.embedding) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(s.embedding, s.embedding))) DESC, s.i DESC) = 1),
         ${p}dims AS (SELECT unnest(generate_series(0, 63)) AS dim),
         ${p}qx AS (
           SELECT a.cell, d.dim,
             CAST(floor(a.emb[d.dim + 1] * 16777216.0 + 0.5) AS BIGINT) AS q
           FROM ${p}asg a CROSS JOIN ${p}dims d),
         ${p}dm AS (
           SELECT cell, dim,
             CAST(CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*)
               / 16777216.0 AS REAL) AS mr
           FROM ${p}qx GROUP BY 1, 2),
         ${p}means AS (
           SELECT cell, list(CAST(mr AS DOUBLE) ORDER BY dim) AS emb
           FROM ${p}dm GROUP BY cell),
         $outName AS (
           SELECT s.i, coalesce(f.emb, s.embedding) AS embedding
           FROM $inCent s LEFT JOIN ${p}means f ON f.cell = s.i)"""

  /** FULL-corpus-refined IVF centroids (k=8): seeds + ONE fixed-point
    * Lloyd pass — mirrors ivfCentroidsRefinedFull. */
  private val FullRefinedCentCte =
    s"""$FullSeedsCte,
         ${fullLloydPassCte("f", "fseeds", "cent")}"""

  /** TWO full-corpus Lloyd passes (q102): pass 1's Float-rounded output
    * feeds pass 2's assignment — mirrors ivfCentroidsIteratedFull(nIter=2)
    * including the Float rounding between passes. */
  private val TwoPassCentCte =
    s"""$FullSeedsCte,
         ${fullLloydPassCte("g1", "fseeds", "g1cent")},
         ${fullLloydPassCte("g2", "g1cent", "cent")}"""

  private def cosdSql(a: String, b: String) =
    s"""list_dot_product($a, $b) /
        (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"""

  /** q305/q306 shared replay: full-corpus refined cells, hot detection
    * (> 70), per-hot-cell 2 md5-minimal seeds, cos argmax with the q92
    * tiebreak (>= sends ties to subcell 1), new ids = maxBucket + rank.
    * Ends with `fin(id, emb, b, fb)` — every vector with its final
    * bucket. */
  private val CellSplitCtes =
    s"""$FullRefinedCentCte,
         casg AS (
           SELECT e.vec_id AS id, CAST(e.embedding AS DOUBLE[]) AS emb,
             s.i AS b
           FROM embeddings e CROSS JOIN cent s
           QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY
             ${cosdSql("CAST(e.embedding AS DOUBLE[])", "s.embedding")} DESC,
             s.i DESC) = 1),
         ccnt AS (SELECT b, count(*) AS n FROM casg GROUP BY 1),
         chot AS (SELECT b FROM ccnt WHERE n > 70),
         chr2 AS (
           SELECT b, CAST(row_number() OVER (ORDER BY b) AS BIGINT) AS hr
           FROM chot),
         cmx AS (SELECT CAST(max(b) AS BIGINT) AS mb FROM ccnt),
         chm AS (
           SELECT c.id, c.emb, c.b, md5(CAST(c.id AS VARCHAR)) AS mk
           FROM casg c JOIN chot USING (b)),
         csd AS (
           SELECT b, id, emb,
             row_number() OVER (PARTITION BY b ORDER BY mk, id) AS rn
           FROM chm),
         cs1 AS (SELECT b, emb AS v1 FROM csd WHERE rn = 1),
         cs2 AS (SELECT b, emb AS v2 FROM csd WHERE rn = 2),
         csb AS (
           SELECT h.id,
             CASE WHEN ${cosdSql("h.emb", "s2.v2")} >= ${cosdSql("h.emb", "s1.v1")}
               THEN 1 ELSE 0 END AS sub
           FROM chm h JOIN cs1 s1 USING (b) JOIN cs2 s2 USING (b)),
         fin AS (
           SELECT c.id, c.emb, c.b,
             CAST(CASE WHEN csb.sub = 1 THEN cmx.mb + chr2.hr
                  ELSE c.b END AS BIGINT) AS fb
           FROM casg c
           LEFT JOIN csb ON csb.id = c.id
           LEFT JOIN chr2 ON chr2.b = c.b
           CROSS JOIN cmx)"""

  /** IVF retrieval body shared by q83 (driver-sample-refined centroids)
    * and q95 (full-corpus fixed-point centroids): reads whichever `cent`
    * CTE precedes it — 2-of-8 cell probe per query (probe tie-break
    * cos DESC, i DESC), exact cosine rerank, (cos DESC, neighbor ASC)
    * top-5 — mirrors Similarity.ivfTopK. */
  private val IvfRetrievalSql =
    """cscored AS (
           SELECT e.vec_id, c.i,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), c.embedding) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(c.embedding, c.embedding)))
               AS cos
           FROM embeddings e CROSS JOIN cent c),
         assigned AS (
           SELECT vec_id, i AS bucket FROM cscored
           QUALIFY row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, i DESC) = 1),
         probes AS (
           SELECT vec_id AS query_id, i AS bucket FROM cscored
           WHERE vec_id % 100 = 0
           QUALIFY row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, i DESC) <= 2),
         cand AS (
           SELECT p.query_id, a.vec_id AS neighbor_id
           FROM probes p JOIN assigned a USING (bucket)
           WHERE a.vec_id <> p.query_id),
         rescored AS (
           SELECT c.query_id, c.neighbor_id,
             list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[]))))
               AS cos
           FROM cand c
           JOIN embeddings q ON q.vec_id = c.query_id
           JOIN embeddings n ON n.vec_id = c.neighbor_id)
         SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS INT) AS rank, cos
         FROM rescored
         QUALIFY rank <= 5
         ORDER BY query_id, rank"""

  /** PQ codes over per-subspace Lloyd-refined codebooks (m=8 subspaces of
    * 8 dims, k centroids): the shared sample is sliced per subspace, each
    * slice refined independently — mirrors Similarity.pqCodebooksRefined.
    * k=4 is the BIGINT-packed gate config (q77/q78); k=256 the canonical
    * 64-bit config (q89/q90, trained on a 32·k = 8192-row sample — whole
    * corpus at gate scale). */
  private def pqCodesCte(k: Int, sampleN: Int = 2048) =
    s"""${sampCte(sampleN)},
         ss AS (SELECT unnest(generate_series(0, 7)) AS s),
         sseeds AS (
           SELECT ss.s, sd.i, sd.emb[1 + 8*ss.s : 8 + 8*ss.s] AS emb
           FROM (
             SELECT CAST(row_number() OVER (ORDER BY md5(sid), sid) - 1 AS INT)
               AS i, emb
             FROM samp ORDER BY md5(sid), sid LIMIT $k) sd
           CROSS JOIN ss),
         ssamp AS (
           SELECT ss.s, p.sid, p.emb[1 + 8*ss.s : 8 + 8*ss.s] AS emb
           FROM samp p CROSS JOIN ss),
         pasg AS (
           SELECT a.s, a.sid, a.emb, c.i,
             list_dot_product(a.emb, c.emb) /
               (sqrt(list_dot_product(a.emb, a.emb)) *
                sqrt(list_dot_product(c.emb, c.emb))) AS cos
           FROM ssamp a JOIN sseeds c ON a.s = c.s),
         pmem AS (
           SELECT s, sid, emb, i FROM pasg
           QUALIFY row_number() OVER (PARTITION BY s, sid
             ORDER BY cos DESC, i DESC) = 1),
         psums AS (
           SELECT s, i, count(*) AS n,
             list_reduce(list(emb ORDER BY sid),
               (a, b) -> list_transform(list_zip(a, b), p -> p[1] + p[2]))
             AS vsum
           FROM pmem GROUP BY 1, 2),
         cent AS (
           SELECT c.s, c.i,
             CASE WHEN m.i IS NULL THEN c.emb
                  ELSE list_transform(m.vsum,
                         x -> CAST(CAST(x / m.n AS REAL) AS DOUBLE)) END
               AS emb
           FROM sseeds c LEFT JOIN psums m ON m.s = c.s AND m.i = c.i),
         scored AS (
           SELECT e.vec_id, c.s, c.i,
             list_dot_product(CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]),
                              c.emb) /
               (sqrt(list_dot_product(CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]),
                                      CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]))) *
                sqrt(list_dot_product(c.emb, c.emb)))
               AS cos
           FROM embeddings e CROSS JOIN cent c),
         codes AS (
           SELECT vec_id, s, i FROM scored
           QUALIFY row_number() OVER (PARTITION BY vec_id, s
             ORDER BY cos DESC, i DESC) = 1)"""

  private val PqCodesCte = pqCodesCte(4)

  /** ADC retrieval tail shared by q78 (packed codes, k=4), q90 (array
    * codes, k=256) and the IVF-PQ pair: per-query distance table over the
    * PQ `cent`, subspace-ordered fold, shortlist by estimate, exact
    * rerank. The corpus side reads the `codes` CTE — code REPRESENTATION
    * (packed BIGINT vs positional array) is a Spark-side storage concern
    * the oracle never sees. `estFrom` is the FROM/JOIN clause feeding the
    * estimate — the full corpus scan by default, or the IVF-probed
    * candidate set (q97/q99). */
  private def adcRetrievalSql(
      estFrom: String =
        "FROM codes k JOIN dt d ON d.s = k.s AND d.code = k.i") =
    s"""qs AS (
           SELECT vec_id AS query_id, embedding,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
               CAST(embedding AS DOUBLE[]))) AS qn
           FROM embeddings WHERE vec_id % 100 = 0),
         dt AS (
           SELECT q.query_id, c.s, c.i AS code,
             list_dot_product(CAST(q.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]),
                              c.emb) AS qdot,
             list_dot_product(c.emb, c.emb) AS cn2
           FROM qs q CROSS JOIN cent c),
         est AS (
           SELECT d.query_id, k.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(j := d.s, v := d.qdot) ORDER BY d.s),
                 x -> x.v)), (a, y) -> a + y) AS sdot,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(j := d.s, v := d.cn2) ORDER BY d.s),
                 x -> x.v)), (a, y) -> a + y) AS scn2
           $estFrom
           GROUP BY 1, 2),
         $AdcTailSql"""

  /** The tail below `este` (query_id, neighbor_id, est_cos): shortlist 50
    * by estimate (ties → smaller neighbor), exact-cosine rerank, rank ≤ 5.
    * Shared by every compressed-retrieval oracle — the ADC family feeds it
    * through [[AdcTailSql]]'s sdot/scn2 arithmetic (full-scan, IVF-probed,
    * residual), the binary-quantization oracle (q111) feeds an integer
    * Hamming-agreement `este` directly. */
  private val RerankTailSql =
    """short AS (
           SELECT query_id, neighbor_id FROM este
           WHERE NOT isnan(est_cos)
           QUALIFY row_number() OVER (PARTITION BY query_id
             ORDER BY est_cos DESC, neighbor_id) <= 50),
         exact AS (
           SELECT s.query_id, s.neighbor_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
               AS cos
           FROM short s
           JOIN embeddings a ON a.vec_id = s.query_id
           JOIN embeddings b ON b.vec_id = s.neighbor_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS INT) AS rank
           FROM exact)
         SELECT query_id, neighbor_id, rank, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank"""

  private val AdcTailSql =
    s"""este AS (
           SELECT e.query_id, e.neighbor_id,
             e.sdot / (q.qn * sqrt(e.scn2)) AS est_cos
           FROM est e JOIN qs q USING (query_id)
           WHERE e.query_id <> e.neighbor_id AND q.qn > 0),
         $RerankTailSql"""

  private val AdcRetrievalSql = adcRetrievalSql()

  /** Scalar-quantizer chain shared by q107 (codes) and q108 (retrieval):
    * per-dim corpus (min, max) — min/max are order-free, so no
    * fixed-point machinery — then the all-double affine code
    * `clamp(floor((x − mn)/(mx − mn)·255 + ½))` mirroring
    * Similarity.sqCode bit for bit (FLOAT→DOUBLE casts are exact and
    * both engines run the same IEEE double ops in the same order). */
  private val SqCte =
    """sqp AS (
           SELECT d.dim,
             CAST(min(e.embedding[d.dim + 1]) AS DOUBLE) AS mn,
             CAST(max(e.embedding[d.dim + 1]) AS DOUBLE) AS mx
           FROM embeddings e
           CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
           GROUP BY 1),
         scodes AS (
           SELECT e.vec_id,
             list(CAST(least(greatest(CASE WHEN p.mx = p.mn THEN 0.0
                 ELSE floor((CAST(e.embedding[p.dim + 1] AS DOUBLE) - p.mn)
                   / (p.mx - p.mn) * 255.0 + 0.5) END, 0.0), 255.0)
               AS SMALLINT) ORDER BY p.dim) AS sq_code
           FROM embeddings e CROSS JOIN sqp p
           GROUP BY 1)"""

  /** IVF × SQ retrieval oracle shared by q112 (fresh) and q117 (stored
    * index replayed from sidecars — storage must be answer-invisible):
    * the q97 probe gate (icand) feeds the q108 SQ decode/estimate, then
    * the shared shortlist/rerank tail. */
  private lazy val IvfSqRetrievalOracle =
    s"""WITH $SqCte,
         $IvfPqGateCte,
         sdec AS (
           SELECT s.vec_id,
             list(p.mn + CAST(s.sq_code[p.dim + 1] AS DOUBLE)
                 * ((p.mx - p.mn) / 255.0) ORDER BY p.dim) AS dv
           FROM scodes s CROSS JOIN sqp p
           GROUP BY 1),
         qs AS (
           SELECT vec_id AS query_id, embedding,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
               CAST(embedding AS DOUBLE[]))) AS qn
           FROM embeddings WHERE vec_id % 100 = 0),
         este AS (
           SELECT i.query_id, i.neighbor_id,
             list_dot_product(CAST(q.embedding AS DOUBLE[]), d.dv)
               / (q.qn * sqrt(list_dot_product(d.dv, d.dv))) AS est_cos
           FROM icand i
           JOIN qs q ON q.query_id = i.query_id
           JOIN sdec d ON d.vec_id = i.neighbor_id
           WHERE q.qn > 0),
         $RerankTailSql"""

  /** Binary-quantization codes shared by q110 (codes) and q111
    * (retrieval): bit `d % 32` of word `d // 32` set iff the dim is
    * positive — integer construction mirroring Similarity.bqCode
    * exactly (no float arithmetic anywhere). */
  private val BqCte =
    """bqw AS (
           SELECT e.vec_id, d.dim // 32 AS w,
             CAST(sum(CASE WHEN e.embedding[d.dim + 1] > 0
               THEN (CAST(1 AS BIGINT) << (d.dim % 32))
               ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS word
           FROM embeddings e
           CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
           GROUP BY 1, 2),
         bq AS (
           SELECT vec_id, list(word ORDER BY w) AS bq FROM bqw GROUP BY 1)"""

  /** IVF probe gate + candidate set for the IVF-PQ oracle (q97): cell
    * scores from the `iv`-prefixed refined-centroid chain, 2-of-8 probe
    * per query (tie-break cos DESC, i DESC — mirrors probeCells), corpus
    * assignment, and the probed candidate pairs that replace the ADC
    * tail's full scan. */
  private val IvfPqGateCte =
    s"""${refinedCentCte("iv")},
         icsc AS (
           SELECT e.vec_id, c.i,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), c.embedding) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(c.embedding, c.embedding)))
               AS cos
           FROM embeddings e CROSS JOIN ivcent c),
         iassigned AS (
           SELECT vec_id, i AS bucket FROM icsc
           QUALIFY row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, i DESC) = 1),
         iprobes AS (
           SELECT vec_id AS query_id, i AS bucket FROM icsc
           WHERE vec_id % 100 = 0
           QUALIFY row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, i DESC) <= 2),
         icand AS (
           SELECT p.query_id, a.vec_id AS neighbor_id
           FROM iprobes p JOIN iassigned a USING (bucket)
           WHERE a.vec_id <> p.query_id)"""

  /** Exact train×eval shingle-overlap oracle on a `doc_id % mod` eval
    * split: q63's broadcast path and q98's bloom-prefiltered path differ
    * only in execution strategy, so both gate against this same SQL. */
  private def decontaminationOracle(mod: Int, minOverlap: Int) =
    s"""WITH $ShinglesCte,
         eval AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % $mod = 0),
         train AS (SELECT * FROM sh WHERE doc_id % $mod <> 0),
         total AS (SELECT doc_id, count(*) AS doc_ngrams FROM train GROUP BY 1),
         hits AS (
           SELECT t.doc_id, count(*) AS overlap_ngrams
           FROM train t JOIN eval e USING (shingle) GROUP BY 1)
         SELECT total.doc_id, doc_ngrams,
           COALESCE(overlap_ngrams, 0) AS overlap_ngrams,
           COALESCE(overlap_ngrams, 0) >= $minOverlap AS contaminated
         FROM total LEFT JOIN hits ON total.doc_id = hits.doc_id
         ORDER BY 1"""

  /** Residual IVF-PQ oracle (q100): mirrors pqCodebooksResidual /
    * ivfPqEncodeResidual / ivfPqTopKResidual. Builds on [[IvfPqGateCte]]'s
    * ivcent/iassigned/iprobes/icand. Residual arithmetic is Float IEEE on
    * both engines: DOUBLE-exact subtract/add rounded through REAL equals
    * Scala's Float `-`/`+`. Chain: sample residuals (assign → subtract) →
    * per-subspace Lloyd (rcent) → corpus residual codes (rcodes, carrying
    * the cell) → combined reconstruction centroids (ccomb = cell slice +
    * residual centroid) → per-(query, probed-cell) distance table → est
    * over the probed candidates → the shared ADC tail. */
  private val ResExpr = "list_transform(list_zip(%s, %s)," +
    " z -> CAST(CAST(z[1] - z[2] AS REAL) AS DOUBLE))"

  /** Residual codebook SEEDS: sample residuals (assign -> REAL-rounded
    * subtract vs the `iv` refined centroids) -> per-subspace Lloyd ->
    * `rcent` (s, i, emb). Mirrors Similarity.pqCodebooksResidual; shared
    * by the q100 retrieval oracle and q106's full-corpus trainer (where
    * rcent is pass 0). */
  private val ResidualSeedCte = {
    val resExpr = ResExpr
    s"""${sampCteNamed("rsamp", 8192)},
         rasg AS (
           SELECT p.sid, p.emb, c.i
           FROM rsamp p CROSS JOIN ivcent c
           QUALIFY row_number() OVER (PARTITION BY p.sid ORDER BY
             list_dot_product(p.emb, c.embedding) /
               (sqrt(list_dot_product(p.emb, p.emb)) *
                sqrt(list_dot_product(c.embedding, c.embedding))) DESC,
             c.i DESC) = 1),
         rres AS (
           SELECT a.sid,
             ${resExpr.format("a.emb", "c.embedding")} AS emb
           FROM rasg a JOIN ivcent c ON c.i = a.i),
         rss AS (SELECT unnest(generate_series(0, 7)) AS s),
         rsseeds AS (
           SELECT rss.s, sd.i, sd.emb[1 + 8*rss.s : 8 + 8*rss.s] AS emb
           FROM (
             SELECT CAST(row_number() OVER (ORDER BY md5(sid), sid) - 1 AS INT)
               AS i, emb
             FROM rres ORDER BY md5(sid), sid LIMIT 256) sd
           CROSS JOIN rss),
         rssamp AS (
           SELECT rss.s, p.sid, p.emb[1 + 8*rss.s : 8 + 8*rss.s] AS emb
           FROM rres p CROSS JOIN rss),
         rpasg AS (
           SELECT a.s, a.sid, a.emb, c.i,
             list_dot_product(a.emb, c.emb) /
               (sqrt(list_dot_product(a.emb, a.emb)) *
                sqrt(list_dot_product(c.emb, c.emb))) AS cos
           FROM rssamp a JOIN rsseeds c ON a.s = c.s),
         rpmem AS (
           SELECT s, sid, emb, i FROM rpasg
           QUALIFY row_number() OVER (PARTITION BY s, sid
             ORDER BY cos DESC, i DESC) = 1),
         rpsums AS (
           SELECT s, i, count(*) AS n,
             list_reduce(list(emb ORDER BY sid),
               (a, b) -> list_transform(list_zip(a, b), p -> p[1] + p[2]))
             AS vsum
           FROM rpmem GROUP BY 1, 2),
         rcent AS (
           SELECT c.s, c.i,
             CASE WHEN m.i IS NULL THEN c.emb
                  ELSE list_transform(m.vsum,
                         x -> CAST(CAST(x / m.n AS REAL) AS DOUBLE)) END
               AS emb
           FROM rsseeds c LEFT JOIN rpsums m ON m.s = c.s AND m.i = c.i)"""
  }

  /** Full-corpus residuals (vec_id, bucket, emb) vs the `iv` centroids —
    * the SQL twin of Similarity.residualFrame. */
  private val CorpusResidualCte =
    s"""crres AS (
           SELECT e.vec_id, a.bucket,
             ${ResExpr.format("CAST(e.embedding AS DOUBLE[])", "c.embedding")}
               AS emb
           FROM embeddings e
           JOIN iassigned a USING (vec_id)
           JOIN ivcent c ON c.i = a.bucket)"""

  private val IvfPqResidualOracle = {
    s"""WITH $IvfPqGateCte,
         $ResidualSeedCte,
         $CorpusResidualCte,
         rcodes AS (
           SELECT r.vec_id, r.bucket, c.s, c.i FROM crres r CROSS JOIN rcent c
           QUALIFY row_number() OVER (PARTITION BY r.vec_id, c.s ORDER BY
             list_dot_product(r.emb[1 + 8*c.s : 8 + 8*c.s], c.emb) /
               (sqrt(list_dot_product(r.emb[1 + 8*c.s : 8 + 8*c.s],
                                      r.emb[1 + 8*c.s : 8 + 8*c.s])) *
                sqrt(list_dot_product(c.emb, c.emb))) DESC, c.i DESC) = 1),
         ccomb AS (
           SELECT ic.i AS cell, rc.s, rc.i AS code,
             list_transform(
               list_zip(ic.embedding[1 + 8*rc.s : 8 + 8*rc.s], rc.emb),
               z -> CAST(CAST(z[1] + z[2] AS REAL) AS DOUBLE)) AS emb
           FROM ivcent ic CROSS JOIN rcent rc),
         qs AS (
           SELECT vec_id AS query_id, embedding,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
               CAST(embedding AS DOUBLE[]))) AS qn
           FROM embeddings WHERE vec_id % 100 = 0),
         rdt AS (
           SELECT q.query_id, p.bucket, cc.s, cc.code,
             list_dot_product(CAST(q.embedding[1 + 8*cc.s : 8 + 8*cc.s]
               AS DOUBLE[]), cc.emb) AS qdot,
             list_dot_product(cc.emb, cc.emb) AS cn2
           FROM qs q
           JOIN iprobes p ON p.query_id = q.query_id
           JOIN ccomb cc ON cc.cell = p.bucket),
         est AS (
           SELECT d.query_id, k.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(j := d.s, v := d.qdot) ORDER BY d.s),
                 x -> x.v)), (a, y) -> a + y) AS sdot,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(j := d.s, v := d.cn2) ORDER BY d.s),
                 x -> x.v)), (a, y) -> a + y) AS scn2
           FROM icand cc
           JOIN rcodes k ON k.vec_id = cc.neighbor_id
           JOIN rdt d ON d.query_id = cc.query_id AND d.bucket = k.bucket
             AND d.s = k.s AND d.code = k.i
           GROUP BY 1, 2),
         $AdcTailSql"""
  }

  /** Full IVF-PQ retrieval oracle, shared verbatim by q97 (fresh build)
    * and q99 (incremental stored index) — identical SQL is the point:
    * the stored path must hash-match the fresh one. */
  private val IvfPqRetrievalOracle =
    s"""WITH ${pqCodesCte(256, 8192)},
         $IvfPqGateCte,
         ${adcRetrievalSql(
      """FROM icand cc
           JOIN codes k ON k.vec_id = cc.neighbor_id
           JOIN dt d ON d.query_id = cc.query_id
             AND d.s = k.s AND d.code = k.i""")}"""

  /** OPQ permutation CTEs (mirrors Similarity.opqPermutation): per-dim
    * fixed-point variances — exact integers, n·Σq² − (Σq)² with
    * q = floor(x·4096 + 0.5) BIGINT — variance-rank snake allocation to
    * 8 subspaces, and `pemb` = the permuted corpus. Shared by q103
    * (fresh ADC) and q160 (stored IVF-PQ); callers substitute
    * `embeddings → pemb` in the retrieval chain that follows. */
  private val OpqPermCte =
    """pvar AS (
           SELECT d.dim, count(*) AS n,
             sum(CAST(floor(CAST(e.embedding AS DOUBLE[])[d.dim + 1]
               * 4096.0 + 0.5) AS BIGINT)) AS s1,
             sum(CAST(floor(CAST(e.embedding AS DOUBLE[])[d.dim + 1]
                   * 4096.0 + 0.5) AS BIGINT)
               * CAST(floor(CAST(e.embedding AS DOUBLE[])[d.dim + 1]
                   * 4096.0 + 0.5) AS BIGINT)) AS s2
           FROM embeddings e
           CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
           GROUP BY 1),
         prank AS (
           SELECT dim,
             CAST(row_number() OVER (ORDER BY n * s2 - s1 * s1 DESC, dim) - 1
               AS INT) AS r
           FROM pvar),
         pperm AS (
           SELECT CASE WHEN (r // 8) % 2 = 0 THEN r % 8
                       ELSE 7 - (r % 8) END * 8 + (r // 8) AS newpos,
             dim AS olddim
           FROM prank),
         pemb AS (
           SELECT e.vec_id,
             list(e.embedding[p.olddim + 1] ORDER BY p.newpos) AS embedding
           FROM embeddings e CROSS JOIN pperm p
           GROUP BY e.vec_id)"""

  /** Near-dup pairs + recursive reachability shared by q61/q86: hashed
    * embeddings, hyperplane buckets, capped in-bucket cosine pairs, and
    * min-label propagation to a fixpoint. */
  /** BPE oracle builders (q187/q188): character-level v0 vocab and one
    * merge step (pair-count argmax + run-parity greedy application). */
  private val BpeV0Cte =
    """v0 AS (
           SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq,
             list_transform(generate_series(1, length(tok)),
               i -> substring(tok, i, 1)) AS toks
           FROM toks WHERE tok <> '' GROUP BY 1)"""

  private def bpeStepCte(vp: String, n: Int): String =
    s"""p$n AS (
             SELECT toks[i] AS l, toks[i + 1] AS r,
               CAST(sum(freq) AS BIGINT) AS cnt
             FROM $vp CROSS JOIN
               unnest(generate_series(1, len(toks) - 1)) AS u(i)
             GROUP BY 1, 2),
           m$n AS (SELECT l, r, cnt FROM p$n ORDER BY cnt DESC, l, r LIMIT 1),
           e$n AS (
             SELECT word, freq, CAST(u.i AS BIGINT) AS pos, toks[u.i] AS t,
               CASE WHEN u.i < len(toks) THEN toks[u.i + 1] END AS nxt
             FROM $vp CROSS JOIN
               unnest(generate_series(1, len(toks))) AS u(i)),
           o$n AS (
             SELECT e.word, e.freq, e.pos, e.t, e.nxt, m.l AS ml, m.r AS mr,
               coalesce(e.t = m.l AND e.nxt = m.r, false) AS occ
             FROM e$n e CROSS JOIN m$n m),
           nr$n AS (
             SELECT *, CASE WHEN occ AND NOT coalesce(
                 lag(occ) OVER (PARTITION BY word ORDER BY pos), false)
               THEN 1 ELSE 0 END AS newRun
             FROM o$n),
           r$n AS (
             SELECT *, sum(newRun) OVER (PARTITION BY word ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS runId
             FROM nr$n),
           rs$n AS (
             SELECT word, runId, min(pos) AS runStart
             FROM r$n WHERE occ GROUP BY 1, 2),
           t$n AS (
             SELECT a.*, coalesce(a.occ AND (a.ml <> a.mr
                 OR (a.pos - b.runStart) % 2 = 0), false) AS taken
             FROM r$n a LEFT JOIN rs$n b
               ON a.word = b.word AND a.runId = b.runId),
           u$n AS (
             SELECT *, coalesce(lag(taken) OVER (PARTITION BY word
               ORDER BY pos), false) AS consumed
             FROM t$n),
           v$n AS (
             SELECT word, freq,
               list(CASE WHEN taken THEN t || nxt ELSE t END ORDER BY pos)
                 AS toks
             FROM u$n WHERE NOT consumed GROUP BY 1, 2)"""

  /** Apply-variant of [[bpeStepCte]] (q323): the same explode/run-parity/
    * merge chain but driven by a GIVEN one-row merge CTE (`mergeFrom`,
    * columns l/r — e.g. the train chain's m1) instead of computing the
    * argmax of its own vocab — the oracle form of bpeApply's stored-rule
    * replay. Emits ae/ao/anr/ar/ars/at/au prefixed with $n and the output
    * vocab CTE `v$n`. */
  private def bpeApplyStepCte(vp: String, mergeFrom: String, n: Int): String =
    s"""ae$n AS (
             SELECT word, freq, CAST(u.i AS BIGINT) AS pos, toks[u.i] AS t,
               CASE WHEN u.i < len(toks) THEN toks[u.i + 1] END AS nxt
             FROM $vp CROSS JOIN
               unnest(generate_series(1, len(toks))) AS u(i)),
           ao$n AS (
             SELECT e.word, e.freq, e.pos, e.t, e.nxt, m.l AS ml, m.r AS mr,
               coalesce(e.t = m.l AND e.nxt = m.r, false) AS occ
             FROM ae$n e CROSS JOIN $mergeFrom m),
           anr$n AS (
             SELECT *, CASE WHEN occ AND NOT coalesce(
                 lag(occ) OVER (PARTITION BY word ORDER BY pos), false)
               THEN 1 ELSE 0 END AS newRun
             FROM ao$n),
           ar$n AS (
             SELECT *, sum(newRun) OVER (PARTITION BY word ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS runId
             FROM anr$n),
           ars$n AS (
             SELECT word, runId, min(pos) AS runStart
             FROM ar$n WHERE occ GROUP BY 1, 2),
           at$n AS (
             SELECT a.*, coalesce(a.occ AND (a.ml <> a.mr
                 OR (a.pos - b.runStart) % 2 = 0), false) AS taken
             FROM ar$n a LEFT JOIN ars$n b
               ON a.word = b.word AND a.runId = b.runId),
           au$n AS (
             SELECT *, coalesce(lag(taken) OVER (PARTITION BY word
               ORDER BY pos), false) AS consumed
             FROM at$n),
           v$n AS (
             SELECT word, freq,
               list(CASE WHEN taken THEN t || nxt ELSE t END ORDER BY pos)
                 AS toks
             FROM au$n WHERE NOT consumed GROUP BY 1, 2)"""

  private val NearDupReachCte =
    s"""RECURSIVE $ToksCte,
         counts AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT)
               % 16 AS b,
             count(*) AS n
           FROM toks GROUP BY 1, 2),
         emb AS (
           SELECT d.doc_id, list(CAST(coalesce(c.n, 0) AS DOUBLE) ORDER BY s.i) AS v
           FROM documents d
           CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) s
           LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.b = s.i
           GROUP BY d.doc_id),
         bk AS (
           SELECT doc_id, v,
             CAST((CASE WHEN v[1] > v[2] THEN 1 ELSE 0 END)
               + (CASE WHEN v[3] > v[4] THEN 2 ELSE 0 END)
               + (CASE WHEN v[5] > v[6] THEN 4 ELSE 0 END)
               + (CASE WHEN v[7] > v[8] THEN 8 ELSE 0 END) AS BIGINT) AS bucket,
             sqrt(list_dot_product(v, v)) AS nrm
           FROM emb),
         sz AS (SELECT bucket FROM bk GROUP BY 1 HAVING count(*) <= 100),
         capped AS (SELECT bk.* FROM bk JOIN sz USING (bucket)),
         pairs AS (
           SELECT x.doc_id AS id1, y.doc_id AS id2
           FROM capped x JOIN capped y
             ON x.bucket = y.bucket AND x.doc_id < y.doc_id
           WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.98),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM pairs
           UNION ALL SELECT id2, id1 FROM pairs),
         reach AS (
           SELECT doc_id AS id, doc_id AS label FROM documents
           UNION
           SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id)"""

  /** Naive all-pairs Jaccard ≥ 3/5 on the doc_id % 7 slice — shared by
    * q201 (one-shot prefix-filtered join) and q202 (incremental). */
  private val SetSimSliceOracle: String =
    s"""WITH $ToksCte,
       td AS (
         SELECT DISTINCT doc_id, tok FROM toks
         WHERE tok <> '' AND doc_id % 7 = 0),
       sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM td GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(count(*) AS BIGINT) AS i
         FROM td a JOIN td b ON a.tok = b.tok AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT x.id1, x.id2, sa.n AS n1, sb.n AS n2, x.i AS inter,
         CAST(x.i AS DOUBLE) / CAST(sa.n + sb.n - x.i AS DOUBLE) AS jac
       FROM inter x
       JOIN sz sa ON sa.doc_id = x.id1
       JOIN sz sb ON sb.doc_id = x.id2
       WHERE x.i * 5 >= 3 * (sa.n + sb.n - x.i)
       ORDER BY x.id1, x.id2"""

  val oracleSql: Map[String, String] = Map(
    // q264: replay the prefix-doubling rounds verbatim — rk0 = md5-token
    // dense rank, 7 pair-rank rounds (missing shifted position → unique
    // negative sentinel), strict (rank, gpos) total order, sorted-
    // neighbor pairs, then 7 descending LCP accumulation steps against
    // the kept round tables. All integers; dense_rank over distinct keys
    // equals the Spark side's sorted zipWithIndex by construction.
    "q264_suffix_dedup" -> {
      val ranks = (0 until 7).map { k =>
        val sh = 1L << k
        s"""pr$k AS (
             SELECT a.gpos, a.r AS k1, COALESCE(b.r, -(a.gpos + $sh) - 1) AS k2
             FROM rk$k a LEFT JOIN rk$k b ON b.gpos = a.gpos + $sh),
           rk${k + 1} AS (
             SELECT gpos, CAST(dense_rank() OVER (ORDER BY k1, k2) AS BIGINT) AS r
             FROM pr$k)"""
      }.mkString(",\n         ")
      val lcps = (6 to 0 by -1).map { k =>
        val sh = 1L << k
        val prev = if (k == 6) "adj0" else s"l${k + 1}"
        s"""l$k AS (
             SELECT p.a, p.b,
               p.acc + CASE WHEN COALESCE(ta.r, -(p.a + p.acc) - 1) =
                 COALESCE(tb.r, -(p.b + p.acc) - 1) THEN $sh ELSE 0 END AS acc
             FROM $prev p
             LEFT JOIN rk$k ta ON ta.gpos = p.a + p.acc
             LEFT JOIN rk$k tb ON tb.gpos = p.b + p.acc)"""
      }.mkString(",\n         ")
      s"""WITH dbase AS (
             SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
             FROM documents),
           tk AS (
             SELECT doc_id, i - 1 AS pos, toks[i] AS tok
             FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks))) AS i FROM dbase)
             WHERE toks[i] <> '' AND i - 1 < 128),
           pos0 AS (
             SELECT doc_id, doc_id * 256 + pos AS gpos, tok FROM tk),
           rk0 AS (
             SELECT gpos, CAST(dense_rank() OVER (ORDER BY md5(tok)) AS BIGINT) AS r
             FROM pos0),
           $ranks,
           fin AS (
             SELECT gpos, CAST(row_number() OVER (ORDER BY r, gpos) AS BIGINT) AS fr
             FROM rk7),
           adj0 AS (
             SELECT x.gpos AS a, y.gpos AS b, CAST(0 AS BIGINT) AS acc
             FROM fin x JOIN fin y ON y.fr = x.fr + 1),
           $lcps,
           dup AS (
             SELECT gpos, max(acc) AS dup FROM (
               SELECT a AS gpos, acc FROM l0
               UNION ALL SELECT b, acc FROM l0)
             GROUP BY 1)
         SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(COALESCE(max(d.dup), 0) AS BIGINT) AS max_dup,
           CAST(COALESCE(sum(CASE WHEN d.dup >= 8 THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_dup_pos
         FROM pos0 p LEFT JOIN dup d USING (gpos)
         GROUP BY 1 ORDER BY doc_id"""
    },
    "q195_weighted_sample" -> {
      val ladder = md5Ladder32("'wrs:' || CAST(doc_id AS VARCHAR)")
      s"""WITH k AS (
           SELECT source, doc_id,
             ln(((
           $ladder
             ) % 1000000 + 0.5) / 1000000.0)
               / greatest(CAST(n_chars AS DOUBLE), 1.0) AS aes_key
           FROM documents),
         r AS (
           SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source ORDER BY aes_key DESC, doc_id ASC) AS rnk
           FROM k)
         SELECT source, doc_id, CAST(rnk AS INT) AS rank
         FROM r WHERE rnk <= 8 ORDER BY source, rank"""
    },
    // NAIVE all-pairs (no prefix filter): the oracle deliberately takes
    // the quadratic route so agreement certifies the filter's
    // completeness, not just its precision. Integer threshold i·5 ≥
    // 3·(n1+n2−i) mirrors the engine exactly. The SAME answer gates the
    // one-shot join (q201) and the two-batch incremental (q202) —
    // incremental emission must reconstruct the full pair set.
    "q201_setsim_join" -> SetSimSliceOracle,
    "q202_setsim_incremental" -> SetSimSliceOracle,
    // Capstone: q198's split + pair CTEs → leak-pruned train → q195's
    // A-ES ladder over the pruned set → q199's drift CTEs over the
    // sampled docs.
    "q200_curation_select" -> {
      val splitLadder = md5Ladder32("'split:' || CAST(doc_id AS VARCHAR)")
      val wrsLadder = md5Ladder32("'wrs:' || CAST(doc_id AS VARCHAR)")
      s"""WITH $ToksCte,
         counts AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT)
               % 16 AS b,
             count(*) AS n
           FROM toks GROUP BY 1, 2),
         emb AS (
           SELECT d.doc_id, list(CAST(coalesce(c.n, 0) AS DOUBLE) ORDER BY s.i) AS v
           FROM documents d
           CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) s
           LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.b = s.i
           GROUP BY d.doc_id),
         bk AS (
           SELECT doc_id, v,
             CAST((CASE WHEN v[1] > v[2] THEN 1 ELSE 0 END)
               + (CASE WHEN v[3] > v[4] THEN 2 ELSE 0 END)
               + (CASE WHEN v[5] > v[6] THEN 4 ELSE 0 END)
               + (CASE WHEN v[7] > v[8] THEN 8 ELSE 0 END) AS BIGINT) AS bucket,
             sqrt(list_dot_product(v, v)) AS nrm
           FROM emb),
         sz AS (SELECT bucket FROM bk GROUP BY 1 HAVING count(*) <= 100),
         capped AS (SELECT bk.* FROM bk JOIN sz USING (bucket)),
         ndp AS (
           SELECT x.doc_id AS id1, y.doc_id AS id2
           FROM capped x JOIN capped y
             ON x.bucket = y.bucket AND x.doc_id < y.doc_id
           WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.9),
         sp AS (
           SELECT doc_id,
             CASE WHEN hv < 1000000.0 * 0.7 THEN 'train'
                  WHEN hv < 1000000.0 * (0.7 + 0.15) THEN 'val'
                  ELSE 'test' END AS split
           FROM (
             SELECT doc_id, CAST((
           $splitLadder
             ) % 1000000 AS DOUBLE) AS hv
             FROM documents)),
         leak_train AS (
           SELECT DISTINCT
             CASE WHEN s1.split = 'train' THEN p.id1 ELSE p.id2 END AS doc_id
           FROM ndp p
           JOIN sp s1 ON s1.doc_id = p.id1
           JOIN sp s2 ON s2.doc_id = p.id2
           WHERE (s1.split = 'train') <> (s2.split = 'train')),
         train AS (
           SELECT d.doc_id, d.source, d.n_chars
           FROM documents d JOIN sp ON sp.doc_id = d.doc_id
           WHERE sp.split = 'train'
             AND d.doc_id NOT IN (SELECT doc_id FROM leak_train)),
         kk AS (
           SELECT source, doc_id,
             ln(((
           $wrsLadder
             ) % 1000000 + 0.5) / 1000000.0)
               / greatest(CAST(n_chars AS DOUBLE), 1.0) AS aes_key
           FROM train),
         picked AS (
           SELECT source, doc_id FROM (
             SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY aes_key DESC, doc_id ASC) AS rnk
             FROM kk) WHERE rnk <= 8),
         st AS (
           SELECT p.source,
             CAST((strpos('0123456789abcdef', substr(md5(t.tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(t.tok), 2, 1)) - 1) AS BIGINT)
               % 64 AS b
           FROM toks t JOIN picked p USING (doc_id)
           WHERE t.tok <> ''),
         gc AS (SELECT source, b, count(*) AS cg FROM st GROUP BY 1, 2),
         cc AS (SELECT b, count(*) AS ccnt FROM st GROUP BY 1),
         gtot AS (SELECT source, CAST(sum(cg) AS BIGINT) AS ng FROM gc GROUP BY 1),
         ctot AS (SELECT CAST(coalesce(sum(ccnt), 0) AS BIGINT) AS nc FROM cc),
         dom AS (SELECT unnest(generate_series(0, 63)) AS b),
         grps AS (SELECT DISTINCT source FROM picked),
         full0 AS (
           SELECT g.source, d.b,
             CAST(coalesce(t.ng, 0) AS BIGINT) AS n,
             CAST(coalesce(gc.cg, 0) + 1 AS DOUBLE)
               / (CAST(coalesce(t.ng, 0) AS DOUBLE) + 64) AS p,
             CAST(coalesce(cc.ccnt, 0) + 1 AS DOUBLE)
               / (CAST(nc AS DOUBLE) + 64) AS q
           FROM grps g CROSS JOIN dom d
           LEFT JOIN gc ON gc.source = g.source AND gc.b = d.b
           LEFT JOIN cc ON cc.b = d.b
           LEFT JOIN gtot t ON t.source = g.source
           CROSS JOIN ctot),
         ndocs AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM picked GROUP BY 1)
         SELECT f.source, ndocs.n_docs, f.n_toks, f.chi2 FROM (
           SELECT source, max(n) AS n_toks,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(b := b, p := p, q := q) ORDER BY b),
                 x -> (x.p - x.q) * (x.p - x.q) / x.q)), (a, y) -> a + y) AS chi2
           FROM full0 GROUP BY 1) f
         JOIN ndocs USING (source)
         ORDER BY f.source"""
    },
    // q74's hashed 64-bucket domain + Laplace smoothing, per SOURCE vs
    // the corpus; χ² folds in b order like the DSIR sums.
    "q199_source_drift" ->
      s"""WITH $ToksCte,
         st AS (
           SELECT d.source,
             CAST((strpos('0123456789abcdef', substr(md5(t.tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(t.tok), 2, 1)) - 1) AS BIGINT)
               % 64 AS b
           FROM toks t JOIN documents d USING (doc_id)
           WHERE t.tok <> ''),
         gc AS (SELECT source, b, count(*) AS cg FROM st GROUP BY 1, 2),
         cc AS (SELECT b, count(*) AS ccnt FROM st GROUP BY 1),
         gtot AS (SELECT source, CAST(sum(cg) AS BIGINT) AS ng FROM gc GROUP BY 1),
         ctot AS (SELECT CAST(coalesce(sum(ccnt), 0) AS BIGINT) AS nc FROM cc),
         dom AS (SELECT unnest(generate_series(0, 63)) AS b),
         grps AS (SELECT DISTINCT source FROM documents),
         full0 AS (
           SELECT g.source, d.b,
             CAST(coalesce(t.ng, 0) AS BIGINT) AS n,
             CAST(coalesce(gc.cg, 0) + 1 AS DOUBLE)
               / (CAST(coalesce(t.ng, 0) AS DOUBLE) + 64) AS p,
             CAST(coalesce(cc.ccnt, 0) + 1 AS DOUBLE)
               / (CAST(nc AS DOUBLE) + 64) AS q
           FROM grps g CROSS JOIN dom d
           LEFT JOIN gc ON gc.source = g.source AND gc.b = d.b
           LEFT JOIN cc ON cc.b = d.b
           LEFT JOIN gtot t ON t.source = g.source
           CROSS JOIN ctot)
         SELECT source, max(n) AS n_toks,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list(struct_pack(b := b, p := p, q := q) ORDER BY b),
               x -> (x.p - x.q) * (x.p - x.q) / x.q)), (a, y) -> a + y) AS chi2
         FROM full0 GROUP BY 1 ORDER BY source""",
    // q57's LSH-bucketed hash-embedding pair tier (at 0.9) joined twice
    // against the q76 split ladder at 70/15/15; straddle = exactly one
    // side lands in train.
    "q198_split_leakage" -> {
      val ladder = md5Ladder32("'split:' || CAST(doc_id AS VARCHAR)")
      s"""WITH $ToksCte,
         counts AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT)
               % 16 AS b,
             count(*) AS n
           FROM toks GROUP BY 1, 2),
         emb AS (
           SELECT d.doc_id, list(CAST(coalesce(c.n, 0) AS DOUBLE) ORDER BY s.i) AS v
           FROM documents d
           CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) s
           LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.b = s.i
           GROUP BY d.doc_id),
         bk AS (
           SELECT doc_id, v,
             CAST((CASE WHEN v[1] > v[2] THEN 1 ELSE 0 END)
               + (CASE WHEN v[3] > v[4] THEN 2 ELSE 0 END)
               + (CASE WHEN v[5] > v[6] THEN 4 ELSE 0 END)
               + (CASE WHEN v[7] > v[8] THEN 8 ELSE 0 END) AS BIGINT) AS bucket,
             sqrt(list_dot_product(v, v)) AS nrm
           FROM emb),
         sz AS (SELECT bucket FROM bk GROUP BY 1 HAVING count(*) <= 100),
         capped AS (SELECT bk.* FROM bk JOIN sz USING (bucket)),
         nd AS (
           SELECT x.doc_id AS id1, y.doc_id AS id2,
             list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cos
           FROM capped x JOIN capped y
             ON x.bucket = y.bucket AND x.doc_id < y.doc_id
           WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.9),
         sp AS (
           SELECT doc_id,
             CASE WHEN hv < 1000000.0 * 0.7 THEN 'train'
                  WHEN hv < 1000000.0 * (0.7 + 0.15) THEN 'val'
                  ELSE 'test' END AS split
           FROM (
             SELECT doc_id, CAST((
           $ladder
             ) % 1000000 AS DOUBLE) AS hv
             FROM documents))
         SELECT
           CASE WHEN s1.split = 'train' THEN p.id2 ELSE p.id1 END AS holdout_id,
           CASE WHEN s1.split = 'train' THEN s2.split ELSE s1.split END AS holdout_split,
           CASE WHEN s1.split = 'train' THEN p.id1 ELSE p.id2 END AS train_id,
           p.cos
         FROM nd p
         JOIN sp s1 ON s1.doc_id = p.id1
         JOIN sp s2 ON s2.doc_id = p.id2
         WHERE (s1.split = 'train') <> (s2.split = 'train')
         ORDER BY holdout_id, train_id"""
    },
    // Greedy MMR, k=3 unrolled: s1 = argmax rel; s2 = argmax of
    // 0.5·rel − 0.5·cos(c, s1); s3 adds the max over the two selected.
    // All arithmetic is the q35 dot/norm ladder — engine-exact.
    "q197_mmr_diversify" ->
      """WITH n AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         nn AS (
           SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM n),
         qs AS (SELECT * FROM nn WHERE id % 50 = 0),
         scored AS (
           SELECT q.id AS query_id, c.id AS neighbor_id,
             list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS rel
           FROM qs q JOIN nn c ON q.id <> c.id),
         cand AS (
           SELECT query_id, neighbor_id, rel FROM (
             SELECT query_id, neighbor_id, rel,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY rel DESC, neighbor_id) AS rn
             FROM scored) WHERE rn <= 10),
         s1 AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY rel DESC, neighbor_id) AS rn
             FROM cand) WHERE rn = 1),
         r2 AS (
           SELECT c.query_id, c.neighbor_id,
             0.5 * c.rel - 0.5 *
               (list_dot_product(cv.vec, sv.vec) / (cv.nrm * sv.nrm))
               AS score
           FROM cand c
           JOIN s1 ON s1.query_id = c.query_id
             AND s1.neighbor_id <> c.neighbor_id
           JOIN nn cv ON cv.id = c.neighbor_id
           JOIN nn sv ON sv.id = s1.neighbor_id),
         s2 AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, neighbor_id) AS rn
             FROM r2) WHERE rn = 1),
         sel12 AS (
           SELECT query_id, neighbor_id FROM s1
           UNION ALL SELECT query_id, neighbor_id FROM s2),
         r3 AS (
           SELECT c.query_id, c.neighbor_id,
             0.5 * c.rel - 0.5 *
               max(list_dot_product(cv.vec, sv.vec) / (cv.nrm * sv.nrm))
               AS score
           FROM cand c
           JOIN sel12 s ON s.query_id = c.query_id
           JOIN nn cv ON cv.id = c.neighbor_id
           JOIN nn sv ON sv.id = s.neighbor_id
           WHERE NOT EXISTS (
             SELECT 1 FROM sel12 x
             WHERE x.query_id = c.query_id
               AND x.neighbor_id = c.neighbor_id)
           GROUP BY c.query_id, c.neighbor_id, c.rel),
         s3 AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, neighbor_id) AS rn
             FROM r3) WHERE rn = 1)
         SELECT query_id, neighbor_id, step FROM (
           SELECT query_id, neighbor_id, 1 AS step FROM s1
           UNION ALL SELECT query_id, neighbor_id, 2 AS step FROM s2
           UNION ALL SELECT query_id, neighbor_id, 3 AS step FROM s3)
         ORDER BY query_id, step""",
    // Two rank tiers (q35's full-cos shape at k=20; q137's prefix tier at
    // k=20) fused by Σ 1/(60+rank); two addends per pair, so DuckDB's
    // sum == the engine's sorted fold exactly.
    "q196_rrf_hybrid" ->
      """WITH n AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec,
             CAST(embedding[1:16] AS DOUBLE[]) AS pv
           FROM embeddings),
         nn AS (
           SELECT id, vec, pv, sqrt(list_dot_product(vec, vec)) AS nrm,
             sqrt(list_dot_product(pv, pv)) AS pnrm
           FROM n),
         qs AS (SELECT * FROM nn WHERE id % 50 = 0),
         fs AS (
           SELECT q.id AS query_id, c.id AS neighbor_id,
             list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cos
           FROM qs q JOIN nn c ON q.id <> c.id),
         ra AS (
           SELECT query_id, neighbor_id, rnk FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS rnk
             FROM fs) WHERE rnk <= 20),
         ps AS (
           SELECT q.id AS query_id, c.id AS neighbor_id,
             list_dot_product(q.pv, c.pv) / (q.pnrm * c.pnrm) AS pcos
           FROM qs q JOIN nn c ON q.id <> c.id),
         short AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY pcos DESC, neighbor_id) AS rn
             FROM ps) WHERE rn <= 50),
         s2 AS (
           SELECT s.query_id, s.neighbor_id,
             list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cos
           FROM short s JOIN nn q ON s.query_id = q.id
             JOIN nn c ON s.neighbor_id = c.id),
         rb AS (
           SELECT query_id, neighbor_id, rnk FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS rnk
             FROM s2) WHERE rnk <= 20),
         contrib AS (
           SELECT query_id, neighbor_id,
             1.0 / (60.0 + CAST(rnk AS DOUBLE)) AS part FROM ra
           UNION ALL
           SELECT query_id, neighbor_id,
             1.0 / (60.0 + CAST(rnk AS DOUBLE)) AS part FROM rb),
         fused AS (
           SELECT query_id, neighbor_id, sum(part) AS rrf
           FROM contrib GROUP BY 1, 2)
         SELECT query_id, neighbor_id, rank, rrf FROM (
           SELECT query_id, neighbor_id, rrf,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY rrf DESC, neighbor_id) AS INT) AS rank
           FROM fused)
         WHERE rank <= 10 ORDER BY query_id, rank""",
    "q25_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS digest, min(doc_id) AS keeper,
           count(*) AS copies
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q26_minhash_sig" ->
      s"""WITH $ShinglesCte
         SELECT doc_id,
           min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
           min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
           min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
           min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
         FROM sh GROUP BY 1 ORDER BY 1""",
    // Incremental near-dup keepers: q175's schedule CTEs ('ndup:' salt,
    // same per-probe caps) + per-doc KMV-256 sketch verify (q170's list
    // arithmetic) + two recursive min-label reaches — batch-1 keepers
    // over batch-1 verified pairs, batch-2 keepers over both.
    "q177_neardup_incremental" -> {
      val splitLadder = md5Ladder32("'ndup:' || CAST(doc_id AS VARCHAR)")
      val skLadder = md5Ladder52("shingle")
      val verify = (pairsCte: String, out: String) =>
        s"""$out AS (
             SELECT id1, id2 FROM (
               SELECT p.id1, p.id2,
                 list_sort(list_distinct(list_concat(a.minima, b.minima)))[1:256]
                   AS x,
                 a.minima AS ma, b.minima AS mb
               FROM $pairsCte p
               JOIN skl a ON a.doc_id = p.id1
               JOIN skl b ON b.doc_id = p.id2)
             WHERE len(x) > 0
               AND CAST(len(list_intersect(list_intersect(x, ma), mb))
                 AS DOUBLE) / len(x) >= 0.5)"""
      s"""WITH RECURSIVE ${ShinglesCte.stripPrefix("")},
         spl AS (
           SELECT doc_id, CAST(($splitLadder) % 2 AS BIGINT) AS split
           FROM documents),
         sig AS (
           SELECT doc_id,
             min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
             min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
             min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
             min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
           FROM sh GROUP BY 1),
         buckets AS (
           SELECT doc_id, 0 AS band, md5(h0 || h1) AS key FROM sig
           UNION ALL SELECT doc_id, 1, md5(h2 || h3) FROM sig
           UNION ALL SELECT doc_id, 2, md5(h4 || h5) FROM sig
           UNION ALL SELECT doc_id, 3, md5(h6 || h7) FROM sig),
         bsch AS (
           SELECT b.doc_id, b.band, b.key, s.split
           FROM buckets b JOIN spl s USING (doc_id)),
         c1sz AS (
           SELECT band, key FROM bsch WHERE split = 0
           GROUP BY 1, 2 HAVING count(*) <= 50),
         c1m AS (
           SELECT bsch.* FROM bsch JOIN c1sz USING (band, key) WHERE split = 0),
         p1 AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM c1m a JOIN c1m b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         k2 AS (SELECT DISTINCT band, key FROM bsch WHERE split = 1),
         c2all AS (SELECT bsch.* FROM bsch JOIN k2 USING (band, key)),
         c2sz AS (
           SELECT band, key FROM c2all GROUP BY 1, 2 HAVING count(*) <= 50),
         c2m AS (SELECT c2all.* FROM c2all JOIN c2sz USING (band, key)),
         p2 AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM c2m a JOIN c2m b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
           WHERE a.split = 1 OR b.split = 1),
         dh AS (
           SELECT DISTINCT doc_id, CAST($skLadder AS BIGINT) AS h FROM sh),
         mkv AS (
           SELECT doc_id, h FROM dh
           QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h) <= 256),
         skl AS (
           SELECT doc_id, list(h ORDER BY h) AS minima FROM mkv GROUP BY 1),
         ${verify("p1", "v1")},
         ${verify("p2", "v2")},
         edges1 AS (
           SELECT id1 AS src, id2 AS dst FROM v1
           UNION ALL SELECT id2, id1 FROM v1),
         reach1 AS (
           SELECT doc_id AS id, doc_id AS label FROM documents
           UNION
           SELECT e.dst AS id, r.label FROM reach1 r JOIN edges1 e ON e.src = r.id),
         kp1 AS (SELECT id AS doc_id, min(label) AS keeper FROM reach1 GROUP BY 1),
         edges2 AS (
           SELECT id1 AS src, id2 AS dst FROM v1
           UNION ALL SELECT id2, id1 FROM v1
           UNION ALL SELECT id1, id2 FROM v2
           UNION ALL SELECT id2, id1 FROM v2),
         reach2 AS (
           SELECT doc_id AS id, doc_id AS label FROM documents
           UNION
           SELECT e.dst AS id, r.label FROM reach2 r JOIN edges2 e ON e.src = r.id),
         kp2 AS (SELECT id AS doc_id, min(label) AS keeper FROM reach2 GROUP BY 1)
         SELECT doc_id, batch, keeper FROM (
           SELECT s.doc_id, CAST(0 AS BIGINT) AS batch, kp1.keeper
           FROM spl s JOIN kp1 USING (doc_id) WHERE s.split = 0
           UNION ALL
           SELECT s.doc_id, CAST(1 AS BIGINT) AS batch, kp2.keeper
           FROM spl s JOIN kp2 USING (doc_id) WHERE s.split = 1)
         ORDER BY doc_id, batch"""
    },
    // Replays the two-batch schedule exactly: call 1 caps at batch-1
    // sizes, call 2 caps at merged sizes over batch-2 keys and keeps
    // pairs touching a batch-2 doc; union distinct = the gate output.
    "q175_lsh_incremental" -> {
      val splitLadder = md5Ladder32("'lshb:' || CAST(doc_id AS VARCHAR)")
      s"""WITH $ShinglesCte,
         spl AS (
           SELECT doc_id, CAST(($splitLadder) % 2 AS BIGINT) AS split
           FROM documents),
         sig AS (
           SELECT doc_id,
             min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
             min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
             min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
             min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
           FROM sh GROUP BY 1),
         buckets AS (
           SELECT doc_id, 0 AS band, md5(h0 || h1) AS key FROM sig
           UNION ALL SELECT doc_id, 1, md5(h2 || h3) FROM sig
           UNION ALL SELECT doc_id, 2, md5(h4 || h5) FROM sig
           UNION ALL SELECT doc_id, 3, md5(h6 || h7) FROM sig),
         bs AS (
           SELECT b.doc_id, b.band, b.key, s.split
           FROM buckets b JOIN spl s USING (doc_id)),
         c1sz AS (
           SELECT band, key FROM bs WHERE split = 0
           GROUP BY 1, 2 HAVING count(*) <= 50),
         c1m AS (
           SELECT bs.* FROM bs JOIN c1sz USING (band, key) WHERE split = 0),
         p1 AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM c1m a JOIN c1m b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         k2 AS (SELECT DISTINCT band, key FROM bs WHERE split = 1),
         c2all AS (SELECT bs.* FROM bs JOIN k2 USING (band, key)),
         c2sz AS (
           SELECT band, key FROM c2all GROUP BY 1, 2 HAVING count(*) <= 50),
         c2m AS (SELECT c2all.* FROM c2all JOIN c2sz USING (band, key)),
         p2 AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM c2m a JOIN c2m b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
           WHERE a.split = 1 OR b.split = 1)
         SELECT DISTINCT id1, id2
         FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
         ORDER BY 1, 2"""
    },
    "q27_lsh_candidates" ->
      s"""WITH $ShinglesCte,
         $LshCandChainCte
         SELECT id1, id2 FROM lshcand ORDER BY 1, 2""",
    "q28_jaccard_pairs" ->
      s"""WITH $ShinglesCte,
         $JaccardChainCte
         SELECT id1, id2, inter, jaccard FROM jpairs ORDER BY 1, 2""",
    "q29_simhash" ->
      s"""WITH $SimhashCte
         SELECT doc_id, simhash FROM sh16 ORDER BY 1""",
    "q80_simhash_neardup" ->
      s"""WITH $SimhashCte,
         bands AS (
           SELECT doc_id, simhash, b.band, (simhash >> (4 * b.band)) % 16 AS key
           FROM sh16 CROSS JOIN
             (SELECT unnest(generate_series(0, 3)) AS band) b),
         bsz AS (
           SELECT band, key FROM bands GROUP BY 1, 2 HAVING count(*) <= 200),
         capped AS (
           SELECT x.* FROM bands x JOIN bsz s
             ON x.band = s.band AND x.key = s.key),
         cand AS (
           SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
             x.simhash AS h1, y.simhash AS h2
           FROM capped x JOIN capped y
             ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT id1, id2,
           CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(h1, h2)) <= 3
         ORDER BY 1, 2""",
    "q82_zorder_key" -> {
      // DuckDB's % is sign-of-dividend; pmod-wrap so negative ids agree
      // with the Spark side's pmod
      val terms = (0 until 10).map { i =>
        s"((((user_id % 1024 + 1024) % 1024) >> $i) % 2) * ${1L << (2 * i)}" +
          s" + ((((event_id % 1024 + 1024) % 1024) >> $i) % 2) * ${1L << (2 * i + 1)}"
      }.mkString("\n             + ")
      s"""SELECT event_id,
           CAST($terms AS BIGINT) AS zkey
         FROM events ORDER BY event_id"""
    },
    "q87_temperature_mix" ->
      """WITH counts AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
         w AS (
           SELECT source, n_docs,
             sqrt(sqrt(CAST(n_docs AS DOUBLE))) AS weight
           FROM counts),
         tot AS (
           SELECT
             list_reduce(
               -- NULLS FIRST pins the same float fold order as Spark's
               -- sort_array (NULL structs sort first there); DuckDB's
               -- default NULLS LAST would move a NULL source's term to the
               -- end of the summation and break bit parity
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(weight ORDER BY source NULLS FIRST)),
               (a, b) -> a + b) AS sum_w,
             CAST(sum(n_docs) AS BIGINT) AS n_total
           FROM w)
         SELECT source, n_docs, weight,
           least(1.0, weight / sum_w * CAST(n_total AS DOUBLE)
             / CAST(n_docs AS DOUBLE)) AS rate
         FROM w CROSS JOIN tot ORDER BY source NULLS FIRST""",
    "q88_temperature_sample" -> {
      val ladder = md5Ladder32("'smp:' || CAST(doc_id AS VARCHAR)")
      s"""WITH counts AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
         w AS (
           SELECT source, n_docs,
             sqrt(sqrt(CAST(n_docs AS DOUBLE))) AS weight
           FROM counts),
         tot AS (
           SELECT
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(weight ORDER BY source NULLS FIRST)),
               (a, b) -> a + b) AS sum_w,
             CAST(sum(n_docs) AS BIGINT) AS n_total
           FROM w),
         rates AS (
           SELECT source,
             least(1.0, weight / sum_w * CAST(n_total AS DOUBLE)
               / CAST(n_docs AS DOUBLE)) AS rate
           FROM w CROSS JOIN tot)
         SELECT doc_id, d.source AS source FROM (
           SELECT doc_id, source,
             CAST($ladder AS BIGINT) AS hv
           FROM documents) d
         JOIN rates r ON d.source IS NOT DISTINCT FROM r.source
         WHERE CAST(d.hv % 1000000 AS DOUBLE) < 1000000.0 * r.rate
         ORDER BY doc_id"""
    },
    "q94_temperature_skew" -> {
      val skewLadder = md5Ladder32("'skew:' || CAST(doc_id AS VARCHAR)")
      val smpLadder = md5Ladder32("'smp:' || CAST(doc_id AS VARCHAR)")
      s"""WITH docs2 AS (
           SELECT doc_id,
             CASE WHEN hv < 500000 THEN 's0' WHEN hv < 800000 THEN 's1'
                  WHEN hv < 950000 THEN 's2' ELSE 's3' END AS skew_source
           FROM (
             SELECT doc_id, CAST(($skewLadder) % 1000000 AS BIGINT) AS hv
             FROM documents)),
         counts AS (
           SELECT skew_source, CAST(count(*) AS BIGINT) AS n_docs
           FROM docs2 GROUP BY 1),
         w AS (
           SELECT skew_source, n_docs,
             sqrt(sqrt(CAST(n_docs AS DOUBLE))) AS weight
           FROM counts),
         tot AS (
           SELECT
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(weight ORDER BY skew_source NULLS FIRST)),
               (a, b) -> a + b) AS sum_w,
             CAST(sum(n_docs) AS BIGINT) AS n_total
           FROM w),
         rates AS (
           SELECT skew_source,
             least(1.0, weight / sum_w * CAST(n_total AS DOUBLE)
               / CAST(n_docs AS DOUBLE)) AS rate
           FROM w CROSS JOIN tot)
         SELECT doc_id, d.skew_source AS skew_source FROM (
           SELECT doc_id, skew_source,
             CAST($smpLadder AS BIGINT) AS hv
           FROM docs2) d
         JOIN rates r USING (skew_source)
         WHERE CAST(d.hv % 1000000 AS DOUBLE) < 1000000.0 * r.rate
         ORDER BY doc_id"""
    },
    "q85_source_quantiles" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           quantile_cont(n_chars, 0.5) AS p50,
           quantile_cont(n_chars, 0.9) AS p90,
           quantile_cont(n_chars, 0.99) AS p99
         FROM documents GROUP BY 1 ORDER BY source""",
    "q91_curation_pipeline" -> {
      val skewLadder = md5Ladder32("'skew:' || CAST(doc_id AS VARCHAR)")
      val capLadder = md5Ladder52("'cap:' || CAST(doc_id AS VARCHAR)")
      val splitLadder = md5Ladder32("'split:' || CAST(doc_id AS VARCHAR)")
      s"""WITH keepers AS (
           SELECT min(doc_id) AS doc_id
           FROM documents GROUP BY md5(lower(trim(text)))),
         flt AS (
           SELECT d.doc_id, d.source,
             CASE WHEN d.shv < 500000 THEN 's0' WHEN d.shv < 800000 THEN 's1'
                  WHEN d.shv < 950000 THEN 's2' ELSE 's3' END AS skew_source
           FROM (
             SELECT doc_id, source, n_chars,
               CAST(($skewLadder) % 1000000 AS BIGINT) AS shv
             FROM documents) d
           JOIN keepers USING (doc_id)
           WHERE d.n_chars >= 50),
         capped AS (
           SELECT doc_id, source, skew_source FROM (
             SELECT doc_id, source, skew_source,
               CAST($capLadder AS BIGINT) AS hv
             FROM flt)
           QUALIFY row_number() OVER (PARTITION BY skew_source
             ORDER BY hv, doc_id) <= 100)
         SELECT doc_id, source, skew_source,
           CASE WHEN CAST(($splitLadder) % 1000000 AS DOUBLE) < 800000.0
             THEN 'train' ELSE 'val' END AS split
         FROM capped ORDER BY doc_id"""
    },
    "q92_ivf_cell_means" ->
      """WITH seeds AS (
           SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
               CAST(vec_id AS VARCHAR)) - 1 AS INT) AS i,
             CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings
           ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
           LIMIT 8),
         asg AS (
           SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, s.i AS cell
           FROM embeddings e CROSS JOIN seeds s
           QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(CAST(e.embedding AS DOUBLE[]), s.emb) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(s.emb, s.emb))) DESC, s.i DESC) = 1),
         dims AS (SELECT unnest(generate_series(0, 63)) AS dim),
         qx AS (
           SELECT a.cell, d.dim,
             CAST(floor(a.emb[d.dim + 1] * 16777216.0 + 0.5) AS BIGINT) AS q
           FROM asg a CROSS JOIN dims d)
         SELECT cell, dim, CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*) / 16777216.0 AS mean
         FROM qx GROUP BY 1, 2 ORDER BY cell, dim""",
    // SemDeDup: refined-centroid assignment (cell + winning cos), directed
    // same-cell dominance pairs (preceding in centroid_cos ASC, id ASC with
    // pair-cos ≥ 0.4), keep = never dominated — mirrors Dedup.semanticDedup.
    "q93_semantic_dedup" ->
      s"""WITH $RefinedCentCte,
         scored AS (
           SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.i,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), c.embedding) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(c.embedding, c.embedding)))
               AS cos
           FROM embeddings e CROSS JOIN cent c),
         assigned AS (
           SELECT vec_id, emb, i AS cell, cos AS centroid_cos FROM scored
           QUALIFY row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, i DESC) = 1),
         dropped AS (
           SELECT DISTINCT d.vec_id
           FROM assigned d JOIN assigned n
             ON d.cell = n.cell AND d.vec_id <> n.vec_id
           WHERE (n.centroid_cos < d.centroid_cos OR
                  (n.centroid_cos = d.centroid_cos AND n.vec_id < d.vec_id))
             AND list_dot_product(d.emb, n.emb) /
                 (sqrt(list_dot_product(d.emb, d.emb)) *
                  sqrt(list_dot_product(n.emb, n.emb))) >= 0.4)
         SELECT a.vec_id, a.cell, a.centroid_cos,
           (dr.vec_id IS NULL) AS keep
         FROM assigned a LEFT JOIN dropped dr USING (vec_id)
         ORDER BY a.vec_id""",
    "q84_domain_cap" -> {
      val ladder = md5Ladder52("'cap:' || CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, source FROM (
           SELECT doc_id, source,
             CAST($ladder AS BIGINT) AS hv
           FROM documents)
         QUALIFY row_number() OVER (PARTITION BY source
           ORDER BY hv, doc_id) <= 15
         ORDER BY doc_id"""
    },
    "q81_kmv_distinct" -> {
      val ladder = md5Ladder52("tok")
      s"""WITH $ToksCte,
         tt AS (
           SELECT t.doc_id, t.tok, d.source
           FROM toks t JOIN documents d USING (doc_id)),
         hv AS (
           SELECT DISTINCT source,
             CAST($ladder AS BIGINT)
             AS h
           FROM tt),
         mins AS (
           SELECT source, h FROM hv
           QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 128),
         agg AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_minima, max(h) AS kth
           FROM mins GROUP BY 1),
         ex AS (
           SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
           FROM tt GROUP BY 1)
         SELECT source, exact_distinct, n_minima,
           CASE WHEN n_minima < 128 THEN CAST(n_minima AS DOUBLE)
                ELSE 127 * 4503599627370496.0 / kth END AS est_distinct
         FROM ex JOIN agg USING (source) ORDER BY source"""
    },
    // The grown store equals the one-shot corpus sketch — q81's oracle,
    // replayed.
    "q243_cms_topk" -> CmsTopkOracle,
    "q244_cms_incremental" -> CmsTopkOracle,
    "q246_stream_cms" -> CmsStreamOracle,
    "q260_stream_vocab" -> {
      val ladder = md5Ladder32("'vs:' || CAST(doc_id AS VARCHAR)")
      s"""WITH d_ AS (
           SELECT doc_id, text FROM documents
           ORDER BY md5('vcap:' || CAST(doc_id AS VARCHAR)), doc_id
           LIMIT 512),
         toks AS (
           SELECT doc_id,
             unnest(generate_series(0,
               len(regexp_split_to_array(trim(text), '\\s+')) - 1)) AS pos,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
           FROM d_),
         led AS (
           SELECT doc_id, tok,
             lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
             lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
           FROM toks),
         sh AS (
           SELECT DISTINCT doc_id, tok || ' ' || t2 || ' ' || t3 AS shingle
           FROM led WHERE t3 IS NOT NULL),
         coin AS (SELECT doc_id, ($ladder) % 2 AS b FROM d_),
         f AS (
           SELECT shingle, CAST(min(c.b) AS BIGINT) AS batch
           FROM sh JOIN coin c USING (doc_id) GROUP BY 1)
         SELECT batch, CAST(count(*) AS BIGINT) AS n_new_types
         FROM f GROUP BY 1 ORDER BY 1"""
    },
    "q253_boolean_search" ->
      s"""WITH $ToksCte,
         td AS (SELECT DISTINCT doc_id, tok FROM toks),
         ands AS (
           SELECT doc_id FROM td WHERE tok IN ('hash', 'join', 'scan')
           GROUP BY 1 HAVING count(*) = 3)
         SELECT doc_id FROM ands
         WHERE doc_id NOT IN (SELECT doc_id FROM td WHERE tok = 'slow')
         ORDER BY doc_id""",
    "q258_proximity_search" ->
      s"""WITH $ToksCte
         SELECT a.doc_id, count(*) AS n_pairs,
           CAST(min(abs(a.pos - b.pos)) AS BIGINT) AS min_dist
         FROM toks a JOIN toks b ON a.doc_id = b.doc_id
         WHERE a.tok = 'hash' AND b.tok = 'scan' AND abs(a.pos - b.pos) <= 3
         GROUP BY 1 ORDER BY 1""",
    "q254_phrase_search" ->
      s"""WITH $ToksCte
         SELECT a.doc_id, count(*) AS n_occurrences
         FROM toks a JOIN toks b
           ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         WHERE a.tok = 'hash' AND b.tok = 'join'
         GROUP BY 1 ORDER BY 1""",
    "q251_vocab_growth" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x <> '')) AS tok,
           doc_id % 2 AS b
           FROM documents),
         per AS (
           SELECT b, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT tok) AS BIGINT) AS n_types
           FROM t GROUP BY 1),
         firstb AS (SELECT tok, min(b) AS b FROM t GROUP BY 1),
         newt AS (
           SELECT b, CAST(count(*) AS BIGINT) AS n_new_types
           FROM firstb GROUP BY 1),
         j AS (
           SELECT per.b AS batch, per.n_tokens, per.n_types,
             CAST(coalesce(newt.n_new_types, 0) AS BIGINT) AS n_new_types
           FROM per LEFT JOIN newt ON per.b = newt.b)
         SELECT batch, n_tokens, n_types, n_new_types,
           CAST(sum(n_new_types) OVER (ORDER BY batch) AS BIGINT) AS cum_types
         FROM j ORDER BY batch""",
    "q229_kmv_incremental" -> {
      val ladder = md5Ladder52("tok")
      s"""WITH $ToksCte,
         tt AS (
           SELECT t.doc_id, t.tok, d.source
           FROM toks t JOIN documents d USING (doc_id)),
         hv AS (
           SELECT DISTINCT source,
             CAST($ladder AS BIGINT)
             AS h
           FROM tt),
         mins AS (
           SELECT source, h FROM hv
           QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 128),
         agg AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_minima, max(h) AS kth
           FROM mins GROUP BY 1),
         ex AS (
           SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
           FROM tt GROUP BY 1)
         SELECT source, exact_distinct, n_minima,
           CASE WHEN n_minima < 128 THEN CAST(n_minima AS DOUBLE)
                ELSE 127 * 4503599627370496.0 / kth END AS est_distinct
         FROM ex JOIN agg USING (source) ORDER BY source"""
    },
    "q63_decontaminate" -> decontaminationOracle(mod = 17, minOverlap = 2),
    "q120_tfidf" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS tok
           FROM documents),
         tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY 1, 2),
         dfq AS (
           SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM t GROUP BY 1),
         n AS (
           SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM documents)
         SELECT tf.doc_id, tf.tok, tf.tf, dfq.df, n.n_docs
         FROM tf JOIN dfq USING (tok) CROSS JOIN n
         ORDER BY doc_id, tok""",
    // BM25: the tf_norm arithmetic is written in the Spark op order —
    // tf·2.2 / (tf + 1.2·(0.25 + 0.75·dl / (n_toks/n_docs))).
    "q121_bm25" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS tok
           FROM documents),
         tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY 1, 2),
         dl AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM t GROUP BY 1),
         dfq AS (
           SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM t GROUP BY 1),
         n AS (
           SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_toks
           FROM t)
         SELECT tf.doc_id, tf.tok, tf.tf, dfq.df, dl.dl, n.n_docs,
           CAST(tf.tf AS DOUBLE) * 2.2 /
             (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 +
               0.75 * CAST(dl.dl AS DOUBLE) /
                 (CAST(n.n_toks AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))
             AS tf_norm
         FROM tf JOIN dl USING (doc_id) JOIN dfq USING (tok) CROSS JOIN n
         ORDER BY doc_id, tok""",
    // BM25 search: q121's stats CTEs + the raw-idf-ratio contribution in
    // the exact Spark op order, LONG fixed-point before the per-doc sum.
    "q129_bm25_search" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS tok
           FROM documents),
         tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY 1, 2),
         dl AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM t GROUP BY 1),
         dfq AS (
           SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM t GROUP BY 1),
         n AS (
           SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_toks
           FROM t),
         hits AS (
           SELECT tf.doc_id,
             CAST(floor(
               (CAST(tf.tf AS DOUBLE) * 2.2 /
                 (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 +
                   0.75 * CAST(dl.dl AS DOUBLE) /
                     (CAST(n.n_toks AS DOUBLE) / CAST(n.n_docs AS DOUBLE)))))
               * ((CAST(n.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5) /
                  (CAST(dfq.df AS DOUBLE) + 0.5))
               * 1e9) AS BIGINT) AS contrib
           FROM tf JOIN dl USING (doc_id) JOIN dfq USING (tok) CROSS JOIN n
           WHERE tf.tok IN ('hash', 'join', 'merge'))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_toks,
           CAST(sum(contrib) AS BIGINT) AS score_scaled
         FROM hits GROUP BY 1
         ORDER BY score_scaled DESC, doc_id LIMIT 20""",
    // Stored-index search reconstructs stats at query time, so its
    // oracle is q129's full-corpus BM25 verbatim.
    "q226_bm25_incremental" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS tok
           FROM documents),
         tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY 1, 2),
         dl AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM t GROUP BY 1),
         dfq AS (
           SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM t GROUP BY 1),
         n AS (
           SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_toks
           FROM t),
         hits AS (
           SELECT tf.doc_id,
             CAST(floor(
               (CAST(tf.tf AS DOUBLE) * 2.2 /
                 (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 +
                   0.75 * CAST(dl.dl AS DOUBLE) /
                     (CAST(n.n_toks AS DOUBLE) / CAST(n.n_docs AS DOUBLE)))))
               * ((CAST(n.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5) /
                  (CAST(dfq.df AS DOUBLE) + 0.5))
               * 1e9) AS BIGINT) AS contrib
           FROM tf JOIN dl USING (doc_id) JOIN dfq USING (tok) CROSS JOIN n
           WHERE tf.tok IN ('hash', 'join', 'merge'))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_toks,
           CAST(sum(contrib) AS BIGINT) AS score_scaled
         FROM hits GROUP BY 1
         ORDER BY score_scaled DESC, doc_id LIMIT 20""",
    // Textbook log-idf BM25 (fresh and stored share one oracle: stats
    // reconstruct at query time, so stored ≡ full-corpus): the ranking
    // key is the summed fixed-point ln contribution — ln both engines'
    // libm, allowed for SELECTION per the q74/q195 convention — and the
    // hash-compared columns are exact integers.
    "q235_bm25_logidf" -> Bm25LogIdfOracle,
    "q236_bm25_logidf_stored" -> Bm25LogIdfOracle,
    // q269: the q235 replay on the SURVIVING corpus — purged docs must
    // vanish from df/n_docs/avgdl, not just from the hit list
    "q269_index_purge" -> Bm25LogIdfOracle.replace(
      "FROM documents)", "FROM documents WHERE doc_id % 5 <> 0)"),
    // q270: replay of the PCM fixture — sample j of doc d is
    // ((d·7919 + j·104729) mod 65536) − 32768; all columns exact BIGINT
    // except rms, whose floor-sqrt is provably exact below 2^30
    "q270_wav_loudness" ->
      """WITH par AS (
           SELECT doc_id, 1 + doc_id % 2 AS channels,
             (50 + (doc_id * 13) % 400) * (1 + doc_id % 2) AS n
           FROM documents),
         smp AS (
           SELECT doc_id, channels, n,
             unnest(generate_series(0, n - 1)) AS j
           FROM par),
         sv AS (
           SELECT doc_id, channels, n, j,
             ((doc_id * 7919 + j * 104729) % 65536) - 32768 AS s,
             CASE WHEN j >= channels THEN
               ((doc_id * 7919 + (j - channels) * 104729) % 65536) - 32768
             END AS prev_s
           FROM smp),
         agg AS (
           SELECT doc_id, max(n) AS n, max(abs(s)) AS peak_abs,
             sum(abs(s)) AS sum_abs, sum(s * s) AS sum_sq,
             sum(CASE WHEN prev_s IS NOT NULL AND ((s < 0) <> (prev_s < 0))
                 THEN 1 ELSE 0 END) AS zero_cross
           FROM sv GROUP BY 1)
         SELECT doc_id AS id, CAST(n AS BIGINT) AS n_samples,
           CAST(peak_abs AS BIGINT) AS peak_abs,
           CAST(sum_abs AS BIGINT) AS sum_abs,
           CAST(sum_sq AS BIGINT) AS sum_sq,
           CAST(zero_cross AS BIGINT) AS zero_cross,
           CAST(floor(sqrt(CAST(sum_sq // n AS DOUBLE))) AS BIGINT) AS rms
         FROM agg ORDER BY id""",
    // q271: frame silent iff ALL channels |s| < 8192; active segments =
    // silent→active transitions (stream starts silent); longest silent
    // run via gaps-and-islands
    "q271_wav_silence" ->
      s"""WITH $PcmSilenceCte
         SELECT doc_id AS id, CAST(frames AS BIGINT) AS frames,
           CAST(silent_frames AS BIGINT) AS silent_frames,
           CAST(n_active_segments AS BIGINT) AS n_active_segments,
           CAST(longest_silence AS BIGINT) AS longest_silence
         FROM silstats ORDER BY id""",
    // q272: pixel byte (BGR physical c) at image (x, y) of doc d is
    // (d·31 + y·509 + x·127 + c·8191) mod 256; even dims → every 2×2 box
    // complete, so the box mean is sum // 4 exactly
    "q272_bmp_pixels" ->
      """WITH par AS (
           SELECT doc_id, 4 + 2 * (doc_id % 14) AS w,
             4 + 2 * ((doc_id * 7) % 14) AS h
           FROM documents),
         xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM par),
         xy AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
         pc AS (SELECT doc_id, w, h, x, y, unnest([0, 1, 2]) AS c FROM xy),
         pv AS (
           SELECT doc_id, w, h, x, y, c,
             (doc_id * 31 + y * 509 + x * 127 + c * 8191) % 256 AS v
           FROM pc),
         sums AS (
           SELECT doc_id, max(w) AS w, max(h) AS h,
             sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS sum_b,
             sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS sum_g,
             sum(CASE WHEN c = 2 THEN v ELSE 0 END) AS sum_r
           FROM pv GROUP BY 1),
         down AS (
           SELECT doc_id,
             sum((sv // 4) * (1 + (bx + 2 * by + 3 * c) % 13)) AS down_checksum
           FROM (
             SELECT doc_id, x // 2 AS bx, y // 2 AS by, c, sum(v) AS sv
             FROM pv GROUP BY doc_id, bx, by, c) t
           GROUP BY 1)
         SELECT s.doc_id AS id, CAST(s.w AS INT) AS width,
           CAST(s.h AS INT) AS height,
           CAST(sum_b AS BIGINT) AS sum_b, CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(coalesce(d.down_checksum, 0) AS BIGINT) AS down_checksum
         FROM sums s LEFT JOIN down d USING (doc_id) ORDER BY id""",
    // q273: q61's transitive closure gives the cluster minimum; q76's
    // md5 bands hash the CLUSTER id, so a cluster can never straddle
    // splits
    "q273_clustersafe_split" ->
      s"""WITH $NearDupReachCte,
         comp AS (
           SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS keeper
           FROM reach GROUP BY 1),
         hv AS (
           SELECT doc_id, keeper,
             CAST(${hvSql("split:", "CAST(keeper AS VARCHAR)")} AS DOUBLE) AS hv
           FROM comp)
         SELECT doc_id, keeper,
           CASE WHEN hv < 1000000.0 * 0.9 THEN 'train'
                WHEN hv < 1000000.0 * (0.9 + 0.05) THEN 'val'
                ELSE 'test' END AS split
         FROM hv ORDER BY doc_id""",
    // q274: list-slice 8-grams; novelty = the gram's min doc id is mine
    "q274_gram_novelty" -> GramNoveltyOracle,
    // q277: ascending-id batches make registry insert-missing ≡ global
    // min-doc attribution, so the incremental union replays as the
    // one-shot novelty run
    "q277_novelty_incremental" -> GramNoveltyOracle,
    // q279: a gram registers under the batch whose docs first carried it;
    // batches split at doc 250, so first_doc tells which
    "q279_stream_novelty" ->
      s"""WITH capdocs AS (
           SELECT doc_id, text FROM documents
           ORDER BY md5('novcap:' || CAST(doc_id AS VARCHAR)), doc_id
           LIMIT 2048),
         ${gramNoveltyCte("capdocs")}
         SELECT CAST(CASE WHEN first_doc < 250 THEN 0 ELSE 1 END AS BIGINT)
             AS batch,
           CAST(count(*) AS BIGINT) AS n_new_grams
         FROM nfd GROUP BY 1 ORDER BY 1""",
    // q280: envelope replay — |s| means over 8 equal spans of the
    // doc_id-mod-50 sample stream; md5 of the comma-joined integers
    "q280_audio_fingerprint" ->
      """WITH dpar AS (
           SELECT doc_id, doc_id % 50 AS seed,
             (50 + ((doc_id % 50) * 13) % 400) * (1 + (doc_id % 50) % 2) AS n
           FROM documents),
         smp AS (
           SELECT doc_id, seed, n, unnest(generate_series(0, n - 1)) AS j
           FROM dpar),
         blk AS (
           SELECT doc_id, (j * 8) // n AS k,
             abs(((seed * 7919 + j * 104729) % 65536) - 32768) AS a
           FROM smp),
         env AS (
           SELECT doc_id,
             array_to_string(list(CAST(m AS VARCHAR) ORDER BY k), ',') AS env
           FROM (
             SELECT doc_id, k, CAST(sum(a) // count(*) AS BIGINT) AS m
             FROM blk GROUP BY 1, 2) t
           GROUP BY 1),
         fp AS (SELECT doc_id, md5(env) AS fp FROM env),
         kp AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY 1)
         SELECT f.doc_id, f.fp, CAST(k.keeper AS BIGINT) AS keeper,
           f.doc_id <> k.keeper AS is_dup
         FROM fp f JOIN kp k USING (fp) ORDER BY f.doc_id""",
    // q293: the funnel replayed stage by stage — quality in integers
    // (max_tok·5 ≤ n_toks), q61's reach for keepers, q76's bands on the
    // keeper, ceil-div packing estimate
    "q293_pipeline_capstone" -> {
      s"""WITH $NearDupReachCte,
         comp AS (
           SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS keeper
           FROM reach GROUP BY 1),
         tc AS (
           SELECT doc_id, sum(cnt) AS n_toks, max(cnt) AS max_tok FROM (
             SELECT doc_id, tok, count(*) AS cnt
             FROM toks WHERE tok <> '' GROUP BY doc_id, tok) x
           GROUP BY 1),
         qq AS (
           SELECT doc_id, n_toks FROM tc
           WHERE n_toks >= 20 AND max_tok * 5 <= n_toks),
         nd AS (
           SELECT qq.doc_id, qq.n_toks FROM qq
           JOIN comp c USING (doc_id) WHERE c.keeper = qq.doc_id),
         tr AS (
           SELECT nd.doc_id, nd.n_toks FROM nd
           JOIN comp c USING (doc_id)
           WHERE CAST(${hvSql("split:", "CAST(c.keeper AS VARCHAR)")} AS DOUBLE)
             < 1000000.0 * 0.9)
         SELECT * FROM (
           SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(n_toks), 0) AS BIGINT) AS n_tokens FROM tc
           UNION ALL SELECT '1_quality', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM qq
           UNION ALL SELECT '2_neardup', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM nd
           UNION ALL SELECT '3_train', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM tr
           UNION ALL SELECT '4_packed_512',
             CAST((coalesce(sum(n_toks), 0) + 511) // 512 AS BIGINT),
             CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM tr) u
         ORDER BY stage"""
    },
    // q301: the two rank passes as two row_numbers — hardest-first within
    // source (score DESC, id), then (rank_in_source, source) globally
    "q301_curriculum_interleave" ->
      """WITH r AS (
           SELECT doc_id, source, n_chars AS score,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS rank_in_source
           FROM documents)
         SELECT doc_id, source, CAST(score AS BIGINT) AS score,
           CAST(rank_in_source AS BIGINT) AS rank_in_source,
           CAST(row_number() OVER (ORDER BY rank_in_source, source)
             AS BIGINT) AS interleave_pos
         FROM r ORDER BY doc_id""",
    // q300: per-n gram bags with the anchorGrams empty-token rule;
    // clipped = sum of min(cand count, ref count) over candidate grams
    "q300_ngram_precision" ->
      """WITH dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         lens AS (
           SELECT doc_id,
             len(list_filter(toks, x -> x <> '')) AS l FROM dbase),
         g1 AS (
           SELECT doc_id, toks[i] AS g, count(*) AS cnt
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks))) AS i FROM dbase)
           WHERE toks[i] <> '' GROUP BY 1, 2),
         g2 AS (
           SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g,
             count(*) AS cnt
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 1)) AS i FROM dbase)
           WHERE len(list_filter(toks[i:i+1], x -> x = '')) = 0
           GROUP BY 1, 2),
         pairs AS (
           SELECT a.doc_id AS cand_id, a.doc_id + 1 AS ref_id
           FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
         n1 AS (
           SELECT p.cand_id, p.ref_id,
             sum(least(c.cnt, COALESCE(r.cnt, 0))) AS clip1,
             sum(c.cnt) AS tot1
           FROM pairs p
           JOIN g1 c ON c.doc_id = p.cand_id
           LEFT JOIN g1 r ON r.doc_id = p.ref_id AND r.g = c.g
           GROUP BY 1, 2),
         n2 AS (
           SELECT p.cand_id, p.ref_id,
             sum(least(c.cnt, COALESCE(r.cnt, 0))) AS clip2,
             sum(c.cnt) AS tot2
           FROM pairs p
           JOIN g2 c ON c.doc_id = p.cand_id
           LEFT JOIN g2 r ON r.doc_id = p.ref_id AND r.g = c.g
           GROUP BY 1, 2)
         SELECT p.cand_id, p.ref_id,
           CAST(COALESCE(lc.l, 0) AS BIGINT) AS len_c,
           CAST(COALESCE(lr.l, 0) AS BIGINT) AS len_r,
           CAST(COALESCE(n1.clip1, 0) AS BIGINT) AS clip1,
           CAST(COALESCE(n1.tot1, 0) AS BIGINT) AS tot1,
           CAST(CASE WHEN COALESCE(n1.tot1, 0) = 0 THEN 0
             ELSE 10000 * n1.clip1 // n1.tot1 END AS BIGINT) AS p1_bp,
           CAST(COALESCE(n2.clip2, 0) AS BIGINT) AS clip2,
           CAST(COALESCE(n2.tot2, 0) AS BIGINT) AS tot2,
           CAST(CASE WHEN COALESCE(n2.tot2, 0) = 0 THEN 0
             ELSE 10000 * n2.clip2 // n2.tot2 END AS BIGINT) AS p2_bp
         FROM pairs p
         LEFT JOIN lens lc ON lc.doc_id = p.cand_id
         LEFT JOIN lens lr ON lr.doc_id = p.ref_id
         LEFT JOIN n1 USING (cand_id, ref_id)
         LEFT JOIN n2 USING (cand_id, ref_id)
         ORDER BY cand_id""",
    // q299: the same anchor machinery split across a train/eval boundary
    // — eval docs (with the %10 donor splice replayed) probe the train
    // corpus's distinct anchor set; runs via gaps-and-islands.
    // q302 reuses this verbatim: the train anchors having passed through
    // a two-batch PERSISTED registry must be answer-invisible.
    "q299_contamination_spans" -> ContamSpansOracle,
    "q302_contamination_incremental" -> ContamSpansOracle,
    // q304: DuckDB nfc_normalize implements the same UAX #15 NFC as the
    // JDK Normalizer the native expression calls; both md5 UTF-8 bytes
    "q304_unicode_nfc" ->
      """WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'é ' || text
                  WHEN doc_id % 3 = 1 THEN 'é ' || text
                  ELSE text END AS text
           FROM documents)
         SELECT doc_id, text = nfc_normalize(text) AS is_nfc,
           CAST(length(text) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(text)) AS BIGINT) AS len_nfc,
           md5(nfc_normalize(text)) AS dg_nfc
         FROM m ORDER BY doc_id""",
    // q305: full-corpus refined cells (the q95 chain), hot detection,
    // per-hot-cell 2 md5-minimal seeds, cos argmax with the q92 tiebreak
    // (>= sends ties to subcell 1), new ids = maxBucket + rank-by-cell
    "q305_ivf_cell_split" ->
      s"""WITH $CellSplitCtes
         SELECT id AS vec_id, CAST(b AS BIGINT) AS bucket_old,
           fb AS bucket_new
         FROM fin ORDER BY vec_id""",
    // q306: the split applied to the stored index — subcell codebook =
    // fixed-point member means rounded through REAL (the q92/Lloyd
    // arithmetic), then the q95 retrieval shape over the FINAL buckets
    "q306_ivf_split_stored" ->
      s"""WITH $CellSplitCtes,
         spdims AS (SELECT unnest(generate_series(0, 63)) AS dim),
         ncm AS (
           SELECT f.fb, d.dim,
             CAST(CAST(CAST(sum(CAST(floor(f.emb[d.dim + 1] * 16777216.0
                 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
               / count(*) / 16777216.0 AS REAL) AS mr
           FROM fin f JOIN chm h ON h.id = f.id
           CROSS JOIN spdims d
           GROUP BY 1, 2),
         nsub AS (
           SELECT fb AS i, list(CAST(mr AS DOUBLE) ORDER BY dim) AS embedding
           FROM ncm GROUP BY 1),
         newcent AS (
           SELECT CAST(i AS BIGINT) AS i, embedding FROM cent
           WHERE i NOT IN (SELECT b FROM chot)
           UNION ALL SELECT i, embedding FROM nsub),
         qscored AS (
           SELECT e.vec_id, c.i,
             ${cosdSql("CAST(e.embedding AS DOUBLE[])", "c.embedding")} AS cos
           FROM embeddings e CROSS JOIN newcent c
           WHERE e.vec_id % 100 = 0),
         qprobes AS (
           SELECT vec_id AS query_id, i AS bucket FROM qscored
           QUALIFY row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, i DESC) <= 2),
         qcand AS (
           SELECT p.query_id, f.id AS neighbor_id
           FROM qprobes p JOIN fin f ON f.fb = p.bucket
           WHERE f.id <> p.query_id),
         qres AS (
           SELECT c.query_id, c.neighbor_id,
             ${cosdSql("q.emb", "n.emb")} AS cos
           FROM qcand c
           JOIN fin q ON q.id = c.query_id
           JOIN fin n ON n.id = c.neighbor_id)
         SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS INT) AS rank, cos
         FROM qres
         QUALIFY rank <= 5
         ORDER BY query_id, rank""",
    // q303: the stream ≡ the batch closed form over the same capped,
    // spliced slice — verdict per doc by digest membership in eval
    "q303_stream_decontam" ->
      """WITH dn AS (
           SELECT doc_id + 1 AS doc_id, text AS donor
           FROM documents WHERE doc_id % 10 = 0),
         tr AS (
           SELECT d.doc_id,
             CASE WHEN d.doc_id % 10 = 1 AND dn.donor IS NOT NULL
               THEN dn.donor ELSE d.text END AS text
           FROM documents d LEFT JOIN dn USING (doc_id)
           WHERE d.doc_id % 5 <> 0),
         capped AS (
           SELECT doc_id, text FROM tr
           ORDER BY md5('dctcap:' || CAST(doc_id AS VARCHAR)), doc_id
           LIMIT 2048),
         ev AS (
           SELECT DISTINCT md5(lower(trim(text))) AS dg
           FROM documents WHERE doc_id % 5 = 0)
         SELECT c.doc_id,
           CAST(CASE WHEN e.dg IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS contaminated
         FROM capped c
         LEFT JOIN ev e ON e.dg = md5(lower(trim(c.text)))
         ORDER BY doc_id""",
    // q297: the fresh-over-union replay — anchors from the same truncated
    // token slices, counts, duplicated flags, per-doc gaps-and-islands
    // runs. n_dup_pos here is definitionally q264's (exact dup prefix
    // >= 8 iff the position's 8-gram occurs twice), so the store read is
    // answer-invisible vs the one-shot chain.
    "q297_suffix_incremental" ->
      """WITH dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         tk AS (
           SELECT doc_id, count(*) AS n_tokens
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks))) AS i FROM dbase)
           WHERE toks[i] <> '' AND i - 1 < 128
           GROUP BY 1),
         anch AS (
           SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+7], ' ')) AS g
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1,
               greatest(least(len(toks), 128) - 7, 0))) AS i FROM dbase)
           WHERE len(list_filter(toks[i:i+7], x -> x = '')) = 0),
         cnt AS (SELECT g, count(*) AS c FROM anch GROUP BY 1),
         fl AS (
           SELECT a.doc_id, a.pos, (cnt.c >= 2) AS dup
           FROM anch a JOIN cnt USING (g)),
         isl AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
           FROM fl WHERE dup),
         runs AS (
           SELECT doc_id, grp, count(*) AS run FROM isl GROUP BY 1, 2),
         mr AS (SELECT doc_id, max(run) AS max_run FROM runs GROUP BY 1),
         nd AS (
           SELECT doc_id, sum(CASE WHEN dup THEN 1 ELSE 0 END) AS n_dup_pos
           FROM fl GROUP BY 1)
         SELECT d.doc_id, CAST(COALESCE(tk.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(nd.n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
           CAST(COALESCE(mr.max_run, 0) AS BIGINT) AS max_run
         FROM dbase d
         LEFT JOIN tk USING (doc_id)
         LEFT JOIN nd USING (doc_id)
         LEFT JOIN mr USING (doc_id)
         ORDER BY doc_id""",
    // q295: compaction is physical only — the oracle recomputes the token
    // counts fresh; did_compact pins that 32 range tasks over 4 pindexes
    // must fragment at least one partition, which the compactor rewrites
    "q295_compact_store" ->
      """SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
             AS n_toks,
           TRUE AS did_compact
         FROM documents ORDER BY doc_id""",
    // q294: the total-variation pieces replayed over the (class, lang)
    // grid — missing langs contribute total·n
    "q294_t_closeness" ->
      """WITH d AS (
           SELECT source, n_chars // 100 AS len_bucket, lang FROM documents),
         cl AS (
           SELECT source, len_bucket, lang, count(*) AS cnt
           FROM d GROUP BY 1, 2, 3),
         cls AS (SELECT source, len_bucket, count(*) AS n FROM d GROUP BY 1, 2),
         g AS (SELECT lang, count(*) AS total FROM d GROUP BY 1),
         nt AS (SELECT count(*) AS n_corpus FROM d),
         grid AS (
           SELECT c.source, c.len_bucket, c.n, g.lang, g.total, nt.n_corpus,
             coalesce(cl.cnt, 0) AS cnt
           FROM cls c CROSS JOIN g CROSS JOIN nt
           LEFT JOIN cl ON cl.source = c.source
             AND cl.len_bucket = c.len_bucket AND cl.lang = g.lang)
         SELECT source, CAST(len_bucket AS BIGINT) AS len_bucket,
           CAST(max(n) AS BIGINT) AS group_n,
           CAST(sum(abs(cnt * n_corpus - total * n)) AS BIGINT) AS t_num,
           CAST(max(n) * max(n_corpus) * 2 AS BIGINT) AS t_den,
           CAST(10000 * sum(abs(cnt * n_corpus - total * n))
             // (max(n) * max(n_corpus) * 2) AS BIGINT) AS t_bp
         FROM grid GROUP BY 1, 2 ORDER BY 1, 2""",
    // q292: one-scan replays of each datasheet metric; median doubled to
    // stay integer at even counts (quantile_cont is R-7 both engines)
    "q292_dataset_card" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS tok
           FROM documents),
         dgc AS (
           SELECT md5(lower(trim(text))) AS dg FROM documents),
         dup AS (
           SELECT coalesce(sum(c), 0) AS v FROM (
             SELECT dg, count(*) AS c FROM dgc GROUP BY 1
             HAVING count(*) > 1) x)
         SELECT * FROM (
           SELECT 'exact_dup_docs' AS metric, CAST(v AS BIGINT) AS value FROM dup
           UNION ALL SELECT 'median_doc_chars',
             CAST(quantile_cont(n_chars, 0.5) * 2 AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', CAST(sum(n_chars) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_docs', CAST(count(*) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT)
             FROM documents
           UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT)
             FROM documents
           UNION ALL SELECT 'n_tokens', CAST(count(*) AS BIGINT) FROM t
           UNION ALL SELECT 'vocab_size', CAST(count(DISTINCT tok) AS BIGINT)
             FROM t) u
         ORDER BY metric""",
    // q291: q36's sign buckets + xor perturbations, q35's rerank ordering
    "q291_multiprobe_lsh" ->
      """WITH bs AS (SELECT unnest(generate_series(0, 7)) AS b),
         bk AS (
           SELECT vec_id,
             CAST(sum(CASE WHEN embedding[2*b + 1] > embedding[2*b + 2]
               THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
           FROM embeddings CROSS JOIN bs GROUP BY 1),
         pr AS (
           SELECT vec_id AS query_id, bucket FROM bk WHERE vec_id % 100 = 0
           UNION ALL
           SELECT vec_id, xor(bucket, CAST(1 AS BIGINT) << j)
           FROM bk CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) js
           WHERE vec_id % 100 = 0),
         cand AS (
           SELECT p.query_id, c.vec_id AS neighbor_id
           FROM pr p JOIN bk c USING (bucket)
           WHERE c.vec_id <> p.query_id),
         scored AS (
           SELECT cd.query_id, cd.neighbor_id,
             list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[]))))
               AS cos
           FROM cand cd
           JOIN embeddings q ON q.vec_id = cd.query_id
           JOIN embeddings n ON n.vec_id = cd.neighbor_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS INT) AS rank
           FROM scored)
         SELECT query_id, neighbor_id, rank, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // q289: the q188 BPE chain aggregated per stratum
    "q289_tokenizer_eval" ->
      s"""WITH $ToksCte,
         $BpeV0Cte,
         ${bpeStepCte("v0", 1)},
         ${bpeStepCte("v1", 2)},
         ${bpeStepCte("v2", 3)},
         per AS (
           SELECT t.doc_id, count(*) AS n_words,
             CAST(sum(len(v.toks)) AS BIGINT) AS n_bpe
           FROM toks t JOIN v3 v ON t.tok = v.word
           WHERE t.tok <> '' GROUP BY 1)
         SELECT d.lang, d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(p.n_words) AS BIGINT) AS n_words,
           CAST(sum(p.n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(10000 * sum(d.n_chars) // sum(p.n_bpe) AS BIGINT)
             AS chars_per_token_bp,
           CAST(10000 * sum(p.n_bpe) // sum(p.n_words) AS BIGINT) AS fertility_bp
         FROM documents d JOIN per p USING (doc_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // q290: row_number replays the rank passes; ρ pieces exact
    "q290_spearman" ->
      s"""WITH $GramNoveltyCte,
         nv AS (
           SELECT d.doc_id, d.n_chars,
             CASE WHEN coalesce(p.n_distinct, 0) = 0 THEN 0
                  ELSE 10000 * p.n_novel // p.n_distinct END AS novelty_bp
           FROM documents d LEFT JOIN novstats p USING (doc_id)),
         rx AS (
           SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) AS rx
           FROM nv),
         ry AS (
           SELECT doc_id, row_number() OVER (ORDER BY novelty_bp, doc_id) AS ry
           FROM nv),
         m AS (
           SELECT count(*) AS n, sum((rx - ry) * (rx - ry)) AS sum_d2
           FROM rx JOIN ry USING (doc_id))
         SELECT CAST(n AS BIGINT) AS n, CAST(sum_d2 AS BIGINT) AS sum_d2,
           CAST(n * (n * n - 1) AS BIGINT) AS rho_den,
           CAST(10000 - (60000 * sum_d2) // (n * (n * n - 1)) AS BIGINT)
             AS rho_bp
         FROM m""",
    // q287: both chains replayed side by side; hit = truth ∩ candidates
    "q287_lsh_eval" ->
      s"""WITH $ShinglesCte,
         $LshCandChainCte,
         $JaccardChainCte,
         m AS (SELECT
           (SELECT count(*) FROM jpairs) AS n_truth,
           (SELECT count(*) FROM lshcand) AS n_candidates,
           (SELECT count(*) FROM jpairs t JOIN lshcand c
              ON t.id1 = c.id1 AND t.id2 = c.id2) AS n_hit)
         SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(CASE WHEN n_truth = 0 THEN 0
                ELSE 10000 * n_hit // n_truth END AS BIGINT) AS recall_bp,
           CAST(CASE WHEN n_candidates = 0 THEN 0
                ELSE 10000 * n_hit // n_candidates END AS BIGINT) AS precision_bp
         FROM m""",
    // q288: the q95 IVF chain kept as CTEs, joined against the exact
    // brute-force top-5 (q35's replay restricted to the query set)
    "q288_ann_recall_eval" -> {
      val chain = IvfRetrievalSql.take(
        IvfRetrievalSql.lastIndexOf("SELECT query_id, neighbor_id,"))
      s"""WITH $FullRefinedCentCte,
         $chain, ivf AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS rnk
             FROM rescored) t WHERE rnk <= 5),
         bf AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                 (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                  sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) DESC,
               b.vec_id) AS rnk
           FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
           WHERE a.vec_id % 100 = 0),
         exact AS (SELECT query_id, neighbor_id FROM bf WHERE rnk <= 5)
         SELECT e.query_id,
           CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_overlap,
           CAST(10000 * sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             // 5 AS BIGINT) AS recall_bp
         FROM exact e LEFT JOIN ivf i
           ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
         GROUP BY 1 ORDER BY 1"""
    },
    // q285: min_by over the same salted md5 keys; DuckDB's min_by ties
    // are impossible (distinct hash strings)
    "q285_deepwalk" ->
      """WITH adj AS (
           SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
           FROM events
           WHERE json_extract_string(props, '$.k') IS NOT NULL),
         h1 AS (
           SELECT user_id AS u0,
             min_by(item, md5('w:1:' || CAST(user_id AS VARCHAR) || ':'
               || CAST(item AS VARCHAR))) AS i1
           FROM adj GROUP BY 1),
         h2 AS (
           SELECT item AS i1,
             min_by(user_id, md5('w:2:' || CAST(item AS VARCHAR) || ':'
               || CAST(user_id AS VARCHAR))) AS u2
           FROM adj GROUP BY 1),
         h3 AS (
           SELECT user_id AS u2,
             min_by(item, md5('w:3:' || CAST(user_id AS VARCHAR) || ':'
               || CAST(item AS VARCHAR))) AS i3
           FROM adj GROUP BY 1)
         SELECT h1.u0, h1.i1, h2.u2, h3.i3
         FROM h1 JOIN h2 USING (i1) JOIN h3 USING (u2)
         ORDER BY h1.u0""",
    // q286: row_number over the per-epoch md5 order replays the
    // globalDenseRank permutation; 64-doc shards
    "q286_epoch_shuffle" ->
      """WITH r0 AS (
           SELECT doc_id, (row_number() OVER (ORDER BY
             md5('ep:0:' || CAST(doc_id AS VARCHAR))) - 1) // 64 AS shard_e0
           FROM documents),
         r1 AS (
           SELECT doc_id, (row_number() OVER (ORDER BY
             md5('ep:1:' || CAST(doc_id AS VARCHAR))) - 1) // 64 AS shard_e1
           FROM documents)
         SELECT CAST(shard_e0 AS BIGINT) AS shard_e0,
           CAST(shard_e1 AS BIGINT) AS shard_e1,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM r0 JOIN r1 USING (doc_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // q283: cut points are 1 + hv32 mod (n−1); PSM reassembly md5-gated
    "q283_fim_transform" ->
      s"""WITH base AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
         cuts AS (
           SELECT doc_id, toks, len(toks) AS n,
             1 + ${hv32Sql("fim1:", "CAST(doc_id AS VARCHAR)")}
               % (len(toks) - 1) AS c1,
             1 + ${hv32Sql("fim2:", "CAST(doc_id AS VARCHAR)")}
               % (len(toks) - 1) AS c2
           FROM base),
         spans AS (
           SELECT doc_id, toks, n,
             least(c1, c2) AS lo, greatest(c1, c2) AS hi
           FROM cuts)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(lo AS BIGINT) AS p_len,
           CAST(hi - lo AS BIGINT) AS m_len,
           CAST(n - hi AS BIGINT) AS s_len,
           md5(array_to_string(
             list_concat(list_concat(list_concat(list_concat(
               toks[1:lo], ['<SUF>']), toks[hi+1:n]), ['<MID>']),
               toks[lo+1:hi]), ' ')) AS psm_md5
         FROM spans ORDER BY doc_id""",
    // q284: the q235 chain re-queried for (dup, key, vector), ranks by
    // the same ordering, IR metrics in integer basis points
    // q298: same BM25 chain; graded gains + ideal ranks over the judged
    // set — exact integers only (ndcg_scaled is dropped on the Spark
    // side; the log quotient lives in the spec)
    "q298_ndcg" -> {
      val chain = Bm25LogIdfOracle
        .take(Bm25LogIdfOracle.lastIndexOf(
          "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_toks"))
        .replace("('hash', 'join', 'merge')", "('dup', 'key', 'vector')")
      s"""$chain, bm AS (
           SELECT doc_id,
             row_number() OVER (ORDER BY sum(contrib) DESC, doc_id) AS rnk
           FROM hits GROUP BY doc_id ORDER BY rnk LIMIT 20),
         gns AS (
           SELECT doc_id, count(DISTINCT tok) AS gain
           FROM tf WHERE tok IN ('dup', 'key', 'vector') GROUP BY 1),
         idl AS (
           SELECT row_number() OVER (ORDER BY -gain, doc_id) AS rnk,
             gain AS ideal_gain
           FROM gns)
         SELECT CAST(bm.rnk AS BIGINT) AS rnk, bm.doc_id,
           CAST(COALESCE(g.gain, 0) AS BIGINT) AS gain,
           CAST(COALESCE(i.ideal_gain, 0) AS BIGINT) AS ideal_gain
         FROM bm
         LEFT JOIN gns g USING (doc_id)
         LEFT JOIN idl i ON i.rnk = bm.rnk
         WHERE bm.rnk <= 10 ORDER BY rnk"""
    },
    "q284_retrieval_eval" -> {
      val chain = Bm25LogIdfOracle
        .take(Bm25LogIdfOracle.lastIndexOf(
          "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_toks"))
        .replace("('hash', 'join', 'merge')", "('dup', 'key', 'vector')")
      s"""$chain, bm AS (
           SELECT doc_id,
             row_number() OVER (ORDER BY sum(contrib) DESC, doc_id) AS rnk
           FROM hits GROUP BY doc_id ORDER BY rnk LIMIT 20),
         rel AS (
           SELECT doc_id FROM tf WHERE tok IN ('dup', 'key', 'vector')
           GROUP BY 1 HAVING count(DISTINCT tok) = 3),
         j AS (
           SELECT bm.doc_id, bm.rnk, r.doc_id IS NOT NULL AS relv
           FROM bm LEFT JOIN rel r USING (doc_id)),
         m AS (
           SELECT count(*) AS n_retrieved,
             sum(CASE WHEN rnk <= 10 AND relv THEN 1 ELSE 0 END) AS hits_at_10,
             sum(CASE WHEN relv THEN 1 ELSE 0 END) AS rel_retrieved,
             min(CASE WHEN relv THEN rnk END) AS first_rel
           FROM j)
         SELECT CAST(n_retrieved AS BIGINT) AS n_retrieved,
           CAST((SELECT count(*) FROM rel) AS BIGINT) AS n_relevant,
           CAST(hits_at_10 AS BIGINT) AS hits_at_10,
           CAST(rel_retrieved AS BIGINT) AS rel_retrieved,
           CAST(10000 * hits_at_10 // 10 AS BIGINT) AS prec10_bp,
           CAST(CASE WHEN (SELECT count(*) FROM rel) = 0 THEN 0
                ELSE 10000 * rel_retrieved // (SELECT count(*) FROM rel)
                END AS BIGINT) AS recall20_bp,
           CAST(coalesce(10000 // first_rel, 0) AS BIGINT) AS mrr_bp
         FROM m"""
    },
    // q281: a big class with one lang is k-anonymous yet NOT l-diverse
    "q281_l_diversity" ->
      """SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
           CAST(count(*) AS BIGINT) AS group_n,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           count(*) >= 5 AS k_anonymous,
           count(DISTINCT lang) >= 2 AS l_diverse
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    // q282: row_number over the md5 rank ≡ Spark's sorted-slice (hashes
    // are collision-free ties)
    "q282_negative_sampling" ->
      """WITH inter AS (
           SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
           FROM events
           WHERE json_extract_string(props, '$.k') IS NOT NULL),
         it AS (SELECT DISTINCT item FROM inter),
         u AS (SELECT DISTINCT user_id FROM inter),
         cand AS (
           SELECT u.user_id, it.item,
             md5('neg:' || CAST(u.user_id AS VARCHAR) || ':'
               || CAST(it.item AS VARCHAR)) AS h
           FROM u CROSS JOIN it
           LEFT JOIN inter s ON s.user_id = u.user_id AND s.item = it.item
           WHERE s.user_id IS NULL),
         r AS (
           SELECT user_id, item,
             row_number() OVER (PARTITION BY user_id ORDER BY h) AS rnk
           FROM cand)
         SELECT user_id, item AS neg_item, CAST(rnk AS BIGINT) AS rnk
         FROM r WHERE rnk <= 3 ORDER BY user_id, rnk""",
    // q278: the three tier replays joined into one decision — novelty
    // basis points, silence basis points, closed-form image orientation
    "q278_multimodal_curation" ->
      s"""WITH $GramNoveltyCte,
         $PcmSilenceCte,
         dims AS (
           SELECT doc_id,
             (4 + 2 * (doc_id % 14)) > (4 + 2 * ((doc_id * 7) % 14)) AS landscape
           FROM documents)
         SELECT d.doc_id,
           CAST(CASE WHEN coalesce(n.n_distinct, 0) = 0 THEN 0
                ELSE 10000 * n.n_novel // n.n_distinct END AS BIGINT) AS novelty_bp,
           CAST(10000 * s.silent_frames // s.frames AS BIGINT) AS silence_bp,
           dm.landscape,
           ((CASE WHEN coalesce(n.n_distinct, 0) = 0 THEN 0
                 ELSE 10000 * n.n_novel // n.n_distinct END) >= 5000
             AND (10000 * s.silent_frames // s.frames) <= 2500
             AND dm.landscape) AS keep
         FROM documents d
         LEFT JOIN novstats n USING (doc_id)
         JOIN silstats s USING (doc_id)
         JOIN dims dm USING (doc_id)
         ORDER BY d.doc_id""",
    // q275: positions dense after the ''-filter (q268 convention), so
    // adjacency is pos + 1; LM = even docs, scored = odd docs
    "q275_bigram_lm_score" ->
      s"""WITH $ToksCte,
         nn AS (SELECT doc_id, pos, tok FROM toks WHERE tok <> ''),
         bi AS (
           SELECT a.doc_id, a.tok AS w1, b.tok AS w2
           FROM nn a JOIN nn b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         lmbi AS (SELECT w1, w2 FROM bi WHERE doc_id % 2 = 0 GROUP BY 1, 2),
         lmuni AS (SELECT DISTINCT tok FROM nn WHERE doc_id % 2 = 0),
         j AS (
           SELECT sc.doc_id,
             CASE WHEN lb.w1 IS NOT NULL THEN 1 ELSE 0 END AS seen,
             CASE WHEN lb.w1 IS NULL AND lu.tok IS NOT NULL THEN 1 ELSE 0 END AS backoff,
             CASE WHEN lu.tok IS NULL THEN 1 ELSE 0 END AS oov
           FROM (SELECT * FROM bi WHERE doc_id % 2 = 1) sc
           LEFT JOIN lmbi lb ON sc.w1 = lb.w1 AND sc.w2 = lb.w2
           LEFT JOIN lmuni lu ON sc.w2 = lu.tok)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(seen) AS BIGINT) AS n_seen,
           CAST(sum(backoff) AS BIGINT) AS n_backoff,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           CAST(CASE WHEN count(*) = 0 THEN 0
                ELSE 10000 * sum(seen) // count(*) END AS BIGINT) AS seen_bp
         FROM j GROUP BY 1 ORDER BY 1""",
    // q276: turn t holds 3 + (id+t) mod 5 tokens (last partial); cost =
    // tokens + 2; keep the maximal suffix with total cost <= 32
    "q276_turn_truncate" ->
      s"""WITH $ToksCte,
         nt AS (
           SELECT doc_id, count(*) AS n_tokens
           FROM toks WHERE tok <> '' GROUP BY 1),
         tt AS (
           SELECT doc_id, n_tokens, unnest(generate_series(0, 63)) AS t
           FROM nt),
         lt AS (
           SELECT doc_id, n_tokens, t, 3 + (doc_id + t) % 5 AS len_t
           FROM tt),
         st AS (
           SELECT doc_id, n_tokens, t, len_t,
             coalesce(sum(len_t) OVER (PARTITION BY doc_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
           FROM lt),
         tu AS (
           SELECT doc_id, n_tokens, t,
             least(len_t, n_tokens - strt) AS turn_tokens
           FROM st WHERE strt < n_tokens),
         sc AS (
           SELECT doc_id, n_tokens, t, turn_tokens,
             sum(turn_tokens + 2) OVER (PARTITION BY doc_id ORDER BY t DESC)
               AS suffix_cost
           FROM tu)
         SELECT doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN suffix_cost <= 32 THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_turns,
           CAST(sum(CASE WHEN suffix_cost <= 32 THEN turn_tokens ELSE 0 END)
             AS BIGINT) AS kept_tokens,
           CAST(sum(CASE WHEN suffix_cost <= 32 THEN turn_tokens + 2 ELSE 0 END)
             AS BIGINT) AS kept_cost
         FROM sc GROUP BY 1 ORDER BY 1""",
    "q228_cooccurrence" ->
      s"""WITH $ToksCte,
         t AS (SELECT doc_id, pos, tok FROM toks WHERE tok <> ''),
         p AS (
           SELECT least(t1.tok, t2.tok) AS a, greatest(t1.tok, t2.tok) AS b
           FROM t t1 JOIN t t2
             ON t1.doc_id = t2.doc_id
             AND t2.pos - t1.pos BETWEEN 1 AND 3),
         cxy AS (SELECT a, b, count(*) AS c_xy FROM p GROUP BY 1, 2),
         cx AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
         n AS (
           SELECT (SELECT count(*) FROM t) AS n_toks,
             (SELECT count(*) FROM p) AS n_pairs)
         SELECT cxy.a, cxy.b, CAST(c_xy AS BIGINT) AS c_xy,
           CAST(ca.c AS BIGINT) AS c_a, CAST(cb.c AS BIGINT) AS c_b,
           CAST(c_xy AS DOUBLE) * n_toks / n_pairs * n_toks / ca.c / cb.c
             AS assoc_ratio
         FROM cxy
         JOIN cx ca ON cxy.a = ca.tok
         JOIN cx cb ON cxy.b = cb.tok
         CROSS JOIN n
         WHERE c_xy >= 5
         ORDER BY c_xy DESC, a, b LIMIT 50""",
    // Max-passage retrieval: q125's chunk CTE → re-tokenized passages →
    // q129's BM25 arithmetic keyed by passage_id → per-doc best of top-50.
    "q131_passage_search" ->
      s"""WITH $ToksCte,
         ids AS (
           SELECT doc_id, pos, tok,
             unnest(generate_series(
               CAST(greatest(0, pos - 64 + 48) // 48 AS BIGINT),
               CAST(pos // 48 AS BIGINT))) AS chunk_id
           FROM toks),
         chunks AS (
           SELECT doc_id * 100000 + chunk_id AS passage_id,
             string_agg(tok, ' ' ORDER BY pos) AS ctext
           FROM ids GROUP BY doc_id, chunk_id),
         t AS (
           SELECT passage_id,
             unnest(list_filter(string_split_regex(trim(ctext), '\\s+'),
               x -> x <> '')) AS tok
           FROM chunks),
         tf AS (
           SELECT passage_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY 1, 2),
         dl AS (
           SELECT passage_id, CAST(count(*) AS BIGINT) AS dl
           FROM t GROUP BY 1),
         dfq AS (
           SELECT tok, CAST(count(DISTINCT passage_id) AS BIGINT) AS df
           FROM t GROUP BY 1),
         n AS (
           SELECT CAST(count(DISTINCT passage_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_toks
           FROM t),
         hits AS (
           SELECT tf.passage_id,
             CAST(floor(
               (CAST(tf.tf AS DOUBLE) * 2.2 /
                 (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 +
                   0.75 * CAST(dl.dl AS DOUBLE) /
                     (CAST(n.n_toks AS DOUBLE) / CAST(n.n_docs AS DOUBLE)))))
               * ((CAST(n.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5) /
                  (CAST(dfq.df AS DOUBLE) + 0.5))
               * 1e9) AS BIGINT) AS contrib
           FROM tf JOIN dl USING (passage_id) JOIN dfq USING (tok) CROSS JOIN n
           WHERE tf.tok IN ('hash', 'join', 'merge')),
         top AS (
           SELECT passage_id, CAST(sum(contrib) AS BIGINT) AS score_scaled
           FROM hits GROUP BY 1
           ORDER BY score_scaled DESC, passage_id LIMIT 50)
         SELECT passage_id // 100000 AS doc_id,
           max(score_scaled) AS best_passage_score,
           CAST(count(*) AS BIGINT) AS n_passages_in_top
         FROM top GROUP BY 1
         ORDER BY best_passage_score DESC, doc_id""",
    // Triangles: same orientation rule (degree, id) and wedge-close joins
    // in plain SQL — exact integer counts.
    "q132_triangles" ->
      """WITH raw AS (
           SELECT CAST(user_id AS BIGINT) AS x,
             CAST(event_id % 97 AS BIGINT) AS y
           FROM events),
         und AS (
           SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
           FROM raw WHERE x <> y),
         deg AS (
           SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
             SELECT a AS n FROM und UNION ALL SELECT b FROM und)
           GROUP BY 1),
         oriented AS (
           SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                    THEN u.a ELSE u.b END AS u,
                  CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                    THEN u.b ELSE u.a END AS v
           FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
         wedges AS (
           SELECT e1.u AS w, e1.v AS p, e2.v AS q
           FROM oriented e1 JOIN oriented e2
             ON e1.u = e2.u AND e1.v < e2.v),
         tri AS (
           SELECT w, p, q FROM wedges
           JOIN und ON least(p, q) = a AND greatest(p, q) = b)
         SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
           SELECT w AS node FROM tri
           UNION ALL SELECT p FROM tri
           UNION ALL SELECT q FROM tri)
         GROUP BY 1 ORDER BY 1""",
    // Graph search: q130's init CTEs build the same k=4 graph (r0), then
    // entry seeding + two beam-8 hops + final top-4, every stage the
    // exact (cos DESC, node) ranking the Spark TopKPairs aggregate uses.
    "q133_graph_search" -> {
      val beamRound = (cands: String, out: String, n: Int) =>
        s"""s_$out AS (
             SELECT c.qid, c.node,
               list_dot_product(qv.qvec, nv.vec) / (qv.qnrm * nv.nrm) AS cos
             FROM $cands c
             JOIN n nv ON c.node = nv.id
             JOIN qsq qv ON c.qid = qv.qid
             WHERE c.qid <> c.node),
           $out AS MATERIALIZED (
             SELECT qid, node, cos, rank FROM (
               SELECT qid, node, cos,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, node) AS INT) AS rank
               FROM s_$out)
             WHERE rank <= $n)"""
      val hop = (prev: String, out: String) =>
        s"""c_$out AS (
             SELECT f.qid, r.nb AS node FROM $prev f JOIN r0 r ON f.node = r.q
             UNION SELECT qid, node FROM $prev)"""
      s"""WITH v AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         n AS MATERIALIZED (
           SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
         bk AS (
           SELECT id, CAST(sum(CASE WHEN vec[2*b + 1] > vec[2*b + 2]
             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS b
           FROM n CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bs
           GROUP BY 1),
         mkr AS (SELECT id, md5(CAST(id AS VARCHAR)) AS mk FROM n),
         ring AS (
           SELECT id, COALESCE(
               lead(id) OVER (ORDER BY mk, id),
               first_value(id) OVER (ORDER BY mk, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             AS succ
           FROM mkr),
         bkc AS (
           -- mirror nnDescent's maxBucket=4096 cap (keepSmallKeys): a
           -- bucket past the cap contributes NO init pairs
           SELECT id, b FROM bk
           QUALIFY count(*) OVER (PARTITION BY b) <= 4096),
         p0 AS (
           SELECT x.id AS q, y.id AS nb
           FROM bkc x JOIN bkc y ON x.b = y.b AND x.id <> y.id
           UNION SELECT id, succ FROM ring WHERE id <> succ
           UNION SELECT succ, id FROM ring WHERE id <> succ),
         s_r0 AS (
           SELECT p.q, p.nb,
             list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
           FROM p0 p JOIN n a ON p.q = a.id JOIN n b ON p.nb = b.id),
         r0 AS (
           SELECT q, nb FROM (
             SELECT q, nb,
               CAST(row_number() OVER (PARTITION BY q
                 ORDER BY cos DESC, nb) AS INT) AS rank
             FROM s_r0)
           WHERE rank <= 4),
         qsq AS (
           SELECT id AS qid, vec AS qvec, nrm AS qnrm FROM n WHERE id % 50 = 0),
         ent AS (
           SELECT id FROM mkr ORDER BY mk, id LIMIT 4),
         bent AS (
           SELECT b, id AS node FROM (
             SELECT bk.b, bk.id,
               CAST(row_number() OVER (PARTITION BY bk.b
                 ORDER BY m.mk, bk.id) AS INT) AS rn
             FROM bk JOIN mkr m ON bk.id = m.id)
           WHERE rn <= 4),
         qb AS (SELECT q.qid, bk.b FROM qsq q JOIN bk ON q.qid = bk.id),
         c_f0 AS (
           SELECT q.qid, e.id AS node FROM qsq q CROSS JOIN ent e
           UNION
           SELECT qb.qid, bent.node FROM qb JOIN bent USING (b)),
         ${beamRound("c_f0", "f0", 8)},
         ${hop("f0", "f1")},
         ${beamRound("c_f1", "f1", 8)},
         ${hop("f1", "f2")},
         ${beamRound("c_f2", "f2", 8)},
         c_fin AS (SELECT qid, node FROM f2),
         ${beamRound("c_fin", "fin", 4)}
         SELECT qid AS query_id, node AS neighbor_id, rank, cos
         FROM fin ORDER BY query_id, rank"""
    },
    // Label propagation: q133's init CTEs build the same k=4 graph;
    // two unrolled majority-vote rounds over the symmetric edge set,
    // (cnt DESC, label ASC) pick, seeds immutable.
    "q183_label_propagation" -> {
      val round = (prev: String, out: String) =>
        s"""v_$out AS (
             SELECT u.dst AS node, p.label, count(*) AS cnt
             FROM und u JOIN $prev p ON u.src = p.node GROUP BY 1, 2),
           b_$out AS (
             SELECT node, label FROM (
               SELECT node, label,
                 row_number() OVER (PARTITION BY node
                   ORDER BY cnt DESC, label ASC) AS rn
               FROM v_$out)
             WHERE rn = 1),
           $out AS (
             SELECT node, label FROM seedl
             UNION ALL
             SELECT b.node, b.label FROM b_$out b
             WHERE NOT EXISTS (SELECT 1 FROM seedl s WHERE s.node = b.node))"""
      s"""WITH v AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         n AS MATERIALIZED (
           SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
         bk AS (
           SELECT id, CAST(sum(CASE WHEN vec[2*b + 1] > vec[2*b + 2]
             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS b
           FROM n CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bs
           GROUP BY 1),
         mkr AS (SELECT id, md5(CAST(id AS VARCHAR)) AS mk FROM n),
         ring AS (
           SELECT id, COALESCE(
               lead(id) OVER (ORDER BY mk, id),
               first_value(id) OVER (ORDER BY mk, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             AS succ
           FROM mkr),
         bkc AS (
           SELECT id, b FROM bk
           QUALIFY count(*) OVER (PARTITION BY b) <= 4096),
         p0 AS (
           SELECT x.id AS q, y.id AS nb
           FROM bkc x JOIN bkc y ON x.b = y.b AND x.id <> y.id
           UNION SELECT id, succ FROM ring WHERE id <> succ
           UNION SELECT succ, id FROM ring WHERE id <> succ),
         s_r0 AS (
           SELECT p.q, p.nb,
             list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
           FROM p0 p JOIN n a ON p.q = a.id JOIN n b ON p.nb = b.id),
         r0 AS (
           SELECT q, nb FROM (
             SELECT q, nb,
               CAST(row_number() OVER (PARTITION BY q
                 ORDER BY cos DESC, nb) AS INT) AS rank
             FROM s_r0)
           WHERE rank <= 4),
         und AS (
           SELECT q AS src, nb AS dst FROM r0 WHERE q <> nb
           UNION
           SELECT nb, q FROM r0 WHERE q <> nb),
         seedl AS (
           SELECT vec_id AS node, CAST(label AS BIGINT) AS label
           FROM embeddings WHERE vec_id % 20 = 0),
         ${round("seedl", "l1")},
         ${round("l1", "l2")}
         SELECT node, label FROM l2 ORDER BY node"""
    },
    // Two-layer graph search: q133's init CTEs build the layer-0 graph;
    // the same CTEs restricted to the md5-level 1/16 subset build the
    // coarse graph; a beam-4 walk over it replaces the global+bucket
    // seeding, and its final nodes seed the layer-0 rounds.
    "q161_layered_search" -> {
      val beamRound = (cands: String, out: String, n: Int) =>
        s"""s_$out AS (
             SELECT c.qid, c.node,
               list_dot_product(qv.qvec, nv.vec) / (qv.qnrm * nv.nrm) AS cos
             FROM $cands c
             JOIN n nv ON c.node = nv.id
             JOIN qsq qv ON c.qid = qv.qid
             WHERE c.qid <> c.node),
           $out AS MATERIALIZED (
             SELECT qid, node, cos, rank FROM (
               SELECT qid, node, cos,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, node) AS INT) AS rank
               FROM s_$out)
             WHERE rank <= $n)"""
      val hop = (prev: String, out: String, graph: String) =>
        s"""c_$out AS MATERIALIZED (
             SELECT f.qid, r.nb AS node FROM $prev f JOIN $graph r ON f.node = r.q
             UNION SELECT qid, node FROM $prev)"""
      s"""WITH v AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         n AS MATERIALIZED (
           SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
         bk AS (
           SELECT id, CAST(sum(CASE WHEN vec[2*b + 1] > vec[2*b + 2]
             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS b
           FROM n CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bs
           GROUP BY 1),
         mkr AS (SELECT id, md5(CAST(id AS VARCHAR)) AS mk FROM n),
         ring AS (
           SELECT id, COALESCE(
               lead(id) OVER (ORDER BY mk, id),
               first_value(id) OVER (ORDER BY mk, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             AS succ
           FROM mkr),
         bkc AS (
           SELECT id, b FROM bk
           QUALIFY count(*) OVER (PARTITION BY b) <= 4096),
         p0 AS (
           SELECT x.id AS q, y.id AS nb
           FROM bkc x JOIN bkc y ON x.b = y.b AND x.id <> y.id
           UNION SELECT id, succ FROM ring WHERE id <> succ
           UNION SELECT succ, id FROM ring WHERE id <> succ),
         s_r0 AS (
           SELECT p.q, p.nb,
             list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
           FROM p0 p JOIN n a ON p.q = a.id JOIN n b ON p.nb = b.id),
         r0 AS (
           SELECT q, nb FROM (
             SELECT q, nb,
               CAST(row_number() OVER (PARTITION BY q
                 ORDER BY cos DESC, nb) AS INT) AS rank
             FROM s_r0)
           WHERE rank <= 4),
         l1 AS (
           SELECT id FROM n
           WHERE (${md5Ladder32("'lvl:' || CAST(id AS VARCHAR)")}) % 16 = 0),
         mk1 AS (SELECT m.id, m.mk FROM mkr m JOIN l1 USING (id)),
         ring1 AS (
           SELECT id, COALESCE(
               lead(id) OVER (ORDER BY mk, id),
               first_value(id) OVER (ORDER BY mk, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             AS succ
           FROM mk1),
         bkc1 AS (
           SELECT bk.id, bk.b FROM bk JOIN l1 USING (id)
           QUALIFY count(*) OVER (PARTITION BY b) <= 4096),
         p1 AS (
           SELECT x.id AS q, y.id AS nb
           FROM bkc1 x JOIN bkc1 y ON x.b = y.b AND x.id <> y.id
           UNION SELECT id, succ FROM ring1 WHERE id <> succ
           UNION SELECT succ, id FROM ring1 WHERE id <> succ),
         s_r1 AS (
           SELECT p.q, p.nb,
             list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
           FROM p1 p JOIN n a ON p.q = a.id JOIN n b ON p.nb = b.id),
         r1 AS (
           SELECT q, nb FROM (
             SELECT q, nb,
               CAST(row_number() OVER (PARTITION BY q
                 ORDER BY cos DESC, nb) AS INT) AS rank
             FROM s_r1)
           WHERE rank <= 4),
         qsq AS (
           SELECT id AS qid, vec AS qvec, nrm AS qnrm FROM n WHERE id % 50 = 0),
         ent1 AS (SELECT id FROM mk1 ORDER BY mk, id LIMIT 4),
         bent1 AS (
           SELECT b, id AS node FROM (
             SELECT bk.b, bk.id,
               CAST(row_number() OVER (PARTITION BY bk.b
                 ORDER BY m.mk, bk.id) AS INT) AS rn
             FROM bk JOIN l1 USING (id) JOIN mkr m ON bk.id = m.id)
           WHERE rn <= 4),
         qb AS (SELECT q.qid, bk.b FROM qsq q JOIN bk ON q.qid = bk.id),
         c_g0 AS (
           SELECT q.qid, e.id AS node FROM qsq q CROSS JOIN ent1 e
           UNION
           SELECT qb.qid, bent1.node FROM qb JOIN bent1 USING (b)),
         ${beamRound("c_g0", "g0", 4)},
         ${hop("g0", "g1", "r1")},
         ${beamRound("c_g1", "g1", 4)},
         ${hop("g1", "g2", "r1")},
         ${beamRound("c_g2", "g2", 4)},
         c_gfin AS (SELECT qid, node FROM g2),
         ${beamRound("c_gfin", "gfin", 4)},
         c_f0 AS (SELECT qid, node FROM gfin),
         ${beamRound("c_f0", "f0", 8)},
         ${hop("f0", "f1", "r0")},
         ${beamRound("c_f1", "f1", 8)},
         ${hop("f1", "f2", "r0")},
         ${beamRound("c_f2", "f2", 8)},
         c_fin AS (SELECT qid, node FROM f2),
         ${beamRound("c_fin", "fin", 4)}
         SELECT qid AS query_id, node AS neighbor_id, rank, cos
         FROM fin ORDER BY query_id, rank"""
    },
    // Incremental graph index: the fixed two-batch insert schedule
    // replayed as chained CTEs (the q133/q174 multi-pass pattern).
    // Per batch: nnDescent (init + 1 descent round) restricted to the
    // batch builds its internal edges; batch 2 then beam-searches the
    // batch-1 graph (the store's state at that point) for its top-4 old
    // neighbors, linked bidirectionally; retrieval runs the q133 beam
    // over the union edge set. Insertion-order semantics made
    // SQL-derivable BECAUSE the schedule is deterministic.
    "q194_graph_incremental" -> graphIncOracle(prune = false),
    // Degree compaction: the identical replay plus ONE prune CTE -
    // every node's out-edges cut to its top-4 by (cos DESC, dst) -
    // feeding the same final beam search over the pruned edge set.
    "q239_graph_compact" -> graphIncOracle(prune = true),
    // Layered incremental graph index: the q194 replay for the flat
    // layer, the SAME replay restricted to the coarse 1/16 members for
    // the layer-1 edge set, then the q161 two-layer walk (coarse beam-4
    // locates the basin, its best 4 seed the layer-0 beam-8 rounds)
    // over the two accumulated edge sets.
    "q234_layered_incremental" -> {
      val rankRound = (pairs: String, out: String, k: Int) =>
        s"""s_$out AS (
             SELECT p.q, p.nb,
               list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
             FROM $pairs p JOIN n a ON p.q = a.id JOIN n b ON p.nb = b.id),
           $out AS MATERIALIZED (
             SELECT q, nb FROM (
               SELECT q, nb,
                 CAST(row_number() OVER (PARTITION BY q
                   ORDER BY cos DESC, nb) AS INT) AS rank
               FROM s_$out)
             WHERE rank <= $k)"""
      val expand = (prev: String, out: String) =>
        s"""g_$out AS (
             SELECT q AS a, nb AS b FROM $prev
             UNION SELECT nb, q FROM $prev),
           h_$out AS (
             SELECT g1.a, g2.b FROM g_$out g1 JOIN g_$out g2 ON g1.b = g2.a),
           c_$out AS MATERIALIZED (
             SELECT DISTINCT a AS q, b AS nb FROM (
               SELECT * FROM g_$out UNION SELECT * FROM h_$out)
             WHERE a <> b)"""
      val beamRound = (cands: String, out: String, n: Int, qcte: String) =>
        s"""s_$out AS (
             SELECT c.qid, c.node,
               list_dot_product(qv.qvec, nv.vec) / (qv.qnrm * nv.nrm) AS cos
             FROM $cands c
             JOIN n nv ON c.node = nv.id
             JOIN $qcte qv ON c.qid = qv.qid
             WHERE c.qid <> c.node),
           $out AS MATERIALIZED (
             SELECT qid, node, cos, rank FROM (
               SELECT qid, node, cos,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, node) AS INT) AS rank
               FROM s_$out)
             WHERE rank <= $n)"""
      val hop = (prev: String, out: String, graph: String) =>
        s"""c_$out AS MATERIALIZED (
             SELECT f.qid, r.nb AS node FROM $prev f JOIN $graph r ON f.node = r.q
             UNION SELECT qid, node FROM $prev)"""
      val knnInternal = (s: String) =>
        s"""mk_$s AS (SELECT m.id, m.mk FROM mkr m JOIN $s USING (id)),
           ring_$s AS (
             SELECT id, COALESCE(
                 lead(id) OVER (ORDER BY mk, id),
                 first_value(id) OVER (ORDER BY mk, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
               AS succ
             FROM mk_$s),
           bkc_$s AS (
             SELECT bk.id, bk.b FROM bk JOIN $s USING (id)
             QUALIFY count(*) OVER (PARTITION BY b) <= 4096),
           p0_$s AS (
             SELECT x.id AS q, y.id AS nb
             FROM bkc_$s x JOIN bkc_$s y ON x.b = y.b AND x.id <> y.id
             UNION SELECT id, succ FROM ring_$s WHERE id <> succ
             UNION SELECT succ, id FROM ring_$s WHERE id <> succ),
           ${rankRound(s"p0_$s", s"r0_$s", 4)},
           ${expand(s"r0_$s", s"i1_$s")},
           ${rankRound(s"c_i1_$s", s"g_$s", 4)}"""
      // one batch's cross links: queries `qcte` beam-search the prior
      // store state (graph `graph`, entry/bucket lists from subset
      // `sub`) — beam 8 × 2 hops × final top-4, both directions kept
      val crossChain = (qcte: String, graph: String, sub: String, sfx: String) =>
        s"""ent_$sfx AS (SELECT id FROM mk_$sub ORDER BY mk, id LIMIT 4),
           bent_$sfx AS (
             SELECT b, id AS node FROM (
               SELECT bk.b, bk.id,
                 CAST(row_number() OVER (PARTITION BY bk.b
                   ORDER BY m.mk, bk.id) AS INT) AS rn
               FROM bk JOIN $sub USING (id) JOIN mkr m ON bk.id = m.id)
             WHERE rn <= 4),
           qb_$sfx AS (SELECT q.qid, bk.b FROM $qcte q JOIN bk ON q.qid = bk.id),
           c_${sfx}0 AS (
             SELECT q.qid, e.id AS node FROM $qcte q CROSS JOIN ent_$sfx e
             UNION
             SELECT qb_$sfx.qid, bent_$sfx.node
             FROM qb_$sfx JOIN bent_$sfx USING (b)),
           ${beamRound(s"c_${sfx}0", s"${sfx}0", 8, qcte)},
           ${hop(s"${sfx}0", s"${sfx}1", graph)},
           ${beamRound(s"c_${sfx}1", s"${sfx}1", 8, qcte)},
           ${hop(s"${sfx}1", s"${sfx}2", graph)},
           ${beamRound(s"c_${sfx}2", s"${sfx}2", 8, qcte)},
           c_${sfx}f AS (SELECT qid, node FROM ${sfx}2),
           ${beamRound(s"c_${sfx}f", s"${sfx}f", 4, qcte)},
           cr_$sfx AS (
             SELECT qid AS q, node AS nb FROM ${sfx}f
             UNION SELECT node, qid FROM ${sfx}f)"""
      s"""WITH v AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         n AS MATERIALIZED (
           SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
         bk AS (
           SELECT id, CAST(sum(CASE WHEN vec[2*b + 1] > vec[2*b + 2]
             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS b
           FROM n CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bs
           GROUP BY 1),
         mkr AS (SELECT id, md5(CAST(id AS VARCHAR)) AS mk FROM n),
         hvt AS (
           SELECT id, (${md5Ladder32("'gidx:' || CAST(id AS VARCHAR)")}) % 2
             AS h
           FROM n),
         b0 AS (SELECT id FROM hvt WHERE h = 0),
         b1 AS (SELECT id FROM hvt WHERE h = 1),
         lvl AS (
           SELECT id FROM n
           WHERE (${md5Ladder32("'lvl:' || CAST(id AS VARCHAR)")}) % 16 = 0),
         cb0 AS (SELECT id FROM b0 JOIN lvl USING (id)),
         cb1 AS (SELECT id FROM b1 JOIN lvl USING (id)),
         ${knnInternal("b0")},
         ${knnInternal("b1")},
         ${knnInternal("cb0")},
         ${knnInternal("cb1")},
         qs1 AS (
           SELECT nn.id AS qid, nn.vec AS qvec, nn.nrm AS qnrm
           FROM n nn JOIN b1 USING (id)),
         qsc AS (
           SELECT nn.id AS qid, nn.vec AS qvec, nn.nrm AS qnrm
           FROM n nn JOIN cb1 USING (id)),
         ${crossChain("qsc", "g_cb0", "cb0", "cx")},
         l1x AS (SELECT q AS id FROM g_cb0 UNION SELECT nb FROM g_cb0),
         mk_l1x AS (SELECT m.id, m.mk FROM mkr m JOIN l1x USING (id)),
         ent_dx AS (SELECT id FROM mk_l1x ORDER BY mk, id LIMIT 4),
         bent_dx AS (
           SELECT b, id AS node FROM (
             SELECT bk.b, bk.id,
               CAST(row_number() OVER (PARTITION BY bk.b
                 ORDER BY m.mk, bk.id) AS INT) AS rn
             FROM bk JOIN l1x USING (id) JOIN mkr m ON bk.id = m.id)
           WHERE rn <= 4),
         qb_dx AS (SELECT q.qid, bk.b FROM qs1 q JOIN bk ON q.qid = bk.id),
         c_dx0 AS (
           SELECT q.qid, e.id AS node FROM qs1 q CROSS JOIN ent_dx e
           UNION
           SELECT qb_dx.qid, bent_dx.node FROM qb_dx JOIN bent_dx USING (b)),
         ${beamRound("c_dx0", "dx0", 4, "qs1")},
         ${hop("dx0", "dx1", "g_cb0")},
         ${beamRound("c_dx1", "dx1", 4, "qs1")},
         c_x0 AS (SELECT qid, node FROM dx1),
         ${beamRound("c_x0", "x0", 8, "qs1")},
         ${hop("x0", "x1", "g_b0")},
         ${beamRound("c_x1", "x1", 8, "qs1")},
         ${hop("x1", "x2", "g_b0")},
         ${beamRound("c_x2", "x2", 8, "qs1")},
         c_xf AS (SELECT qid, node FROM x2),
         ${beamRound("c_xf", "xf", 4, "qs1")},
         cr_x AS (
           SELECT qid AS q, node AS nb FROM xf
           UNION SELECT node, qid FROM xf),
         eset0 AS MATERIALIZED (
           SELECT q, nb FROM g_b0
           UNION SELECT q, nb FROM g_b1
           UNION SELECT q, nb FROM cr_x),
         eset1 AS MATERIALIZED (
           SELECT q, nb FROM g_cb0
           UNION SELECT q, nb FROM g_cb1
           UNION SELECT q, nb FROM cr_cx),
         qsq AS (
           SELECT id AS qid, vec AS qvec, nrm AS qnrm FROM n
           WHERE id % 50 = 0),
         l1n AS (SELECT q AS id FROM eset1 UNION SELECT nb FROM eset1),
         ent1 AS (
           SELECT l.id FROM l1n l JOIN mkr m USING (id)
           ORDER BY m.mk, l.id LIMIT 4),
         bent1 AS (
           SELECT b, id AS node FROM (
             SELECT bk.b, bk.id,
               CAST(row_number() OVER (PARTITION BY bk.b
                 ORDER BY m.mk, bk.id) AS INT) AS rn
             FROM bk JOIN l1n USING (id) JOIN mkr m ON bk.id = m.id)
           WHERE rn <= 4),
         qb1 AS (SELECT q.qid, bk.b FROM qsq q JOIN bk ON q.qid = bk.id),
         c_w0 AS (
           SELECT q.qid, e.id AS node FROM qsq q CROSS JOIN ent1 e
           UNION
           SELECT qb1.qid, bent1.node FROM qb1 JOIN bent1 USING (b)),
         ${beamRound("c_w0", "w0", 4, "qsq")},
         ${hop("w0", "w1", "eset1")},
         ${beamRound("c_w1", "w1", 4, "qsq")},
         ${hop("w1", "w2", "eset1")},
         ${beamRound("c_w2", "w2", 4, "qsq")},
         c_wf AS (SELECT qid, node FROM w2),
         ${beamRound("c_wf", "wf", 4, "qsq")},
         c_f0 AS (SELECT qid, node FROM wf),
         ${beamRound("c_f0", "f0", 8, "qsq")},
         ${hop("f0", "f1", "eset0")},
         ${beamRound("c_f1", "f1", 8, "qsq")},
         ${hop("f1", "f2", "eset0")},
         ${beamRound("c_f2", "f2", 8, "qsq")},
         c_fin AS (SELECT qid, node FROM f2),
         ${beamRound("c_fin", "fin", 4, "qsq")}
         SELECT qid AS query_id, node AS neighbor_id, rank, cos
         FROM fin ORDER BY query_id, rank"""
    },
    // NN-Descent: deterministic 4-bit sign-bucket init, then two rounds
    // of (forward ∪ reverse) one-hop candidate expansion, exact cosine,
    // top-4 per node — the same set-valued fixpoint the Spark loop runs.
    "q130_nn_descent" -> {
      val rankRound = (pairs: String, out: String) =>
        s"""s_$out AS (
             SELECT p.q, p.nb,
               list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
             FROM $pairs p JOIN n a ON p.q = a.id JOIN n b ON p.nb = b.id),
           $out AS (
             SELECT q, nb, cos, rank FROM (
               SELECT q, nb, cos,
                 CAST(row_number() OVER (PARTITION BY q
                   ORDER BY cos DESC, nb) AS INT) AS rank
               FROM s_$out)
             WHERE rank <= 4)"""
      val expand = (prev: String, out: String) =>
        s"""g_$out AS (
             SELECT q AS a, nb AS b FROM $prev
             UNION SELECT nb, q FROM $prev),
           h_$out AS (
             SELECT g1.a, g2.b FROM g_$out g1 JOIN g_$out g2 ON g1.b = g2.a),
           c_$out AS MATERIALIZED (
             SELECT DISTINCT a AS q, b AS nb FROM (
               SELECT * FROM g_$out UNION SELECT * FROM h_$out)
             WHERE a <> b)"""
      s"""WITH v AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
         n AS MATERIALIZED (
           SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
         bk AS (
           SELECT id, CAST(sum(CASE WHEN vec[2*b + 1] > vec[2*b + 2]
             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS b
           FROM n CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bs
           GROUP BY 1),
         mkr AS (SELECT id, md5(CAST(id AS VARCHAR)) AS mk FROM n),
         ring AS (
           SELECT id, COALESCE(
               lead(id) OVER (ORDER BY mk, id),
               first_value(id) OVER (ORDER BY mk, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             AS succ
           FROM mkr),
         bkc AS (
           -- mirror nnDescent's maxBucket=4096 cap (keepSmallKeys): a
           -- bucket past the cap contributes NO init pairs
           SELECT id, b FROM bk
           QUALIFY count(*) OVER (PARTITION BY b) <= 4096),
         p0 AS (
           SELECT x.id AS q, y.id AS nb
           FROM bkc x JOIN bkc y ON x.b = y.b AND x.id <> y.id
           UNION SELECT id, succ FROM ring WHERE id <> succ
           UNION SELECT succ, id FROM ring WHERE id <> succ),
         ${rankRound("p0", "r0")},
         ${expand("r0", "i1")},
         ${rankRound("c_i1", "r1")},
         ${expand("r1", "i2")},
         ${rankRound("c_i2", "r2")}
         SELECT q AS query_id, nb AS neighbor_id, rank, cos
         FROM r2 ORDER BY query_id, rank"""
    },
    // Chunking: token pos p → chunk ids [max(0,⌈(p−64+1)/48⌉) .. ⌊p/48⌋];
    // the numerator is clamped non-negative BEFORE dividing so floor/trunc
    // agree in both engines.
    "q125_chunking" ->
      s"""WITH $ToksCte,
         ids AS (
           SELECT doc_id, pos, tok,
             unnest(generate_series(
               CAST(greatest(0, pos - 64 + 48) // 48 AS BIGINT),
               CAST(pos // 48 AS BIGINT))) AS chunk_id
           FROM toks)
         SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
           string_agg(tok, ' ' ORDER BY pos) AS chunk_text
         FROM ids GROUP BY 1, 2 ORDER BY 1, 2""",
    // PageRank, 3 unrolled damped iterations in the exact integer op
    // order of Graph.pageRank: teleport = (1e12//100)*15//N, inflow =
    // Σ rank//outdeg over distinct edges, rank' = teleport+inflow*85//100.
    "q126_pagerank" -> {
      val iter = (prev: String, out: String) =>
        s"""c_$out AS (
             SELECT e.dst AS node, sum(r.rank // o.outdeg) AS inflow
             FROM $prev r JOIN outdeg o ON r.node = o.src
               JOIN edges e ON e.src = o.src
             GROUP BY 1),
           $out AS (
             SELECT n.node,
               (1000000000000 // 100) * 15 // (SELECT n FROM nn) +
                 (COALESCE(c.inflow, 0) * 85) // 100 AS rank
             FROM nodes n LEFT JOIN c_$out c ON n.node = c.node)"""
      s"""WITH edges AS (
           SELECT DISTINCT CAST(user_id AS BIGINT) AS src,
             CAST(event_id % 97 AS BIGINT) AS dst
           FROM events),
         nodes AS (
           SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         nn AS (SELECT count(*) AS n FROM nodes),
         outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         r0 AS (
           SELECT node, 1000000000000 // (SELECT n FROM nn) AS rank
           FROM nodes),
         ${iter("r0", "r1")},
         ${iter("r1", "r2")},
         ${iter("r2", "r3")}
         SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY node"""
    },
    // CMS: both the sketch (per-row bucket counts) and every min-of-d
    // estimate replayed with the shared md5 ladder — overestimates from
    // the forced w=16 collisions must match exactly.
    "q119_cms_heavy_hitters" -> {
      val hLadder = md5Ladder52("CAST(r.rw AS VARCHAR) || ':' || t.tok")
      val kLadder = md5Ladder52("CAST(r.rw AS VARCHAR) || ':' || k.tok")
      s"""WITH t AS (
           SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
             x -> x <> '')) AS tok
           FROM documents),
         h AS (
           SELECT t.tok, r.rw,
             CAST($hLadder AS BIGINT) % 16 AS bucket
           FROM t CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS rw) r),
         sk AS (
           SELECT rw, bucket, CAST(count(*) AS BIGINT) AS cnt
           FROM h GROUP BY 1, 2),
         keys AS (SELECT DISTINCT tok FROM t),
         kh AS (
           SELECT k.tok, r.rw,
             CAST($kLadder AS BIGINT) % 16 AS bucket
           FROM keys k CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS rw) r),
         est AS (
           SELECT kh.tok, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_count
           FROM kh LEFT JOIN sk USING (rw, bucket) GROUP BY 1),
         ex AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
           FROM t GROUP BY 1)
         SELECT ex.tok, ex.exact_count, est.est_count
         FROM ex JOIN est USING (tok) ORDER BY tok"""
    },
    // q98's bloom prefilter is invisible to the result: the confirm join
    // makes the output equal the exact n-gram overlap, so the oracle IS
    // q63's shape on the %13 split.
    "q98_bloom_decontaminate" -> decontaminationOracle(mod = 13, minOverlap = 1),
    // Incremental IVF-PQ retrieves IDENTICALLY to the fresh single-pass
    // build (sidecar round-trips are bit-exact; write-time bucket/code
    // equal whole-corpus assignment), so the oracle IS q97's retrieval.
    "q99_ivfpq_incremental" -> IvfPqRetrievalOracle,
    "q100_ivfpq_residual" -> IvfPqResidualOracle,
    // Full-corpus PQ training: md5-ordered k seeds per subspace, ONE
    // fixed-point Lloyd pass over every corpus vector (q92's
    // floor(x·2²⁴+0.5) BIGINT sums — deterministic under any
    // partitioning), codes re-derived with the refined books. Mirrors
    // pqCodebooksRefinedFull / pqCellMeans.
    "q101_pq_codes_full" ->
      """WITH fsd AS (
           SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
               CAST(vec_id AS VARCHAR)) - 1 AS INT) AS i,
             CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings
           ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR)
           LIMIT 256),
         fss AS (SELECT unnest(generate_series(0, 7)) AS s),
         fsseeds AS (
           SELECT fss.s, fsd.i, fsd.emb[1 + 8*fss.s : 8 + 8*fss.s] AS emb
           FROM fsd CROSS JOIN fss),
         fcode0 AS (
           SELECT e.vec_id, c.s, c.i FROM embeddings e CROSS JOIN fsseeds c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY
             list_dot_product(CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]), c.emb) /
               (sqrt(list_dot_product(CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]),
                                      CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]))) *
                sqrt(list_dot_product(c.emb, c.emb))) DESC, c.i DESC) = 1),
         fdims AS (SELECT unnest(generate_series(0, 7)) AS dim),
         fqx AS (
           SELECT k.s, k.i, d.dim,
             CAST(floor(CAST(e.embedding[1 + 8*k.s + d.dim] AS DOUBLE)
               * 16777216.0 + 0.5) AS BIGINT) AS q
           FROM fcode0 k JOIN embeddings e USING (vec_id) CROSS JOIN fdims d),
         fdm AS (
           SELECT s, i, dim,
             CAST(CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*)
               / 16777216.0 AS REAL) AS mr
           FROM fqx GROUP BY 1, 2, 3),
         fmean AS (
           SELECT s, i, list(CAST(mr AS DOUBLE) ORDER BY dim) AS emb
           FROM fdm GROUP BY 1, 2),
         fcent AS (
           SELECT c.s, c.i, coalesce(f.emb, c.emb) AS emb
           FROM fsseeds c LEFT JOIN fmean f ON f.s = c.s AND f.i = c.i),
         fcode1 AS (
           SELECT e.vec_id, c.s, c.i FROM embeddings e CROSS JOIN fcent c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY
             list_dot_product(CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]), c.emb) /
               (sqrt(list_dot_product(CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]),
                                      CAST(e.embedding[1 + 8*c.s : 8 + 8*c.s] AS DOUBLE[]))) *
                sqrt(list_dot_product(c.emb, c.emb))) DESC, c.i DESC) = 1)
         SELECT vec_id,
           array_to_string(list(CAST(i AS SMALLINT) ORDER BY s), ',')
             AS pq_code_csv
         FROM fcode1 GROUP BY 1 ORDER BY 1""",
    "q66_knn_label" ->
      """WITH seed AS (
           SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 3 = 0),
         scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label,
             list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
               AS cos
           FROM embeddings a JOIN seed b ON a.vec_id <> b.vec_id),
         ranked AS (
           SELECT query_id, label,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored),
         votes AS (
           SELECT query_id, label, count(*) AS votes
           FROM ranked WHERE rank <= 5 GROUP BY 1, 2),
         best AS (
           SELECT query_id, label, votes,
             row_number() OVER (PARTITION BY query_id
               ORDER BY votes DESC, label ASC) AS rn
           FROM votes)
         SELECT query_id AS vec_id, label AS predicted_label, votes
         FROM best WHERE rn = 1 ORDER BY 1""",
    "q64_source_mixture" ->
      """WITH per AS (
           SELECT source,
             count(*) AS n_docs,
             CAST(sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT)
               AS n_tokens
           FROM documents GROUP BY 1),
         tot AS (SELECT sum(n_docs) AS td, sum(n_tokens) AS tt FROM per)
         SELECT source, n_docs, n_tokens,
           CAST(n_docs AS DOUBLE) / td AS doc_share,
           CAST(n_tokens AS DOUBLE) / tt AS token_share,
           sqrt(CAST(n_tokens AS DOUBLE)) AS alpha05_weight
         FROM per CROSS JOIN tot
         ORDER BY source""",
    "q65_stratified_sample" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source,
             (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 268435456
           + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16777216
           + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 1048576
           + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 65536
           + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 8, 1)) - 1) AS hv
           FROM documents)
         WHERE CAST(hv % 1000000 AS DOUBLE) < 1000000.0 * (CASE source
           WHEN 'src2' THEN 0.0 WHEN 'src1' THEN 0.5 WHEN 'src0' THEN 1.0
           ELSE 0.25 END)
         ORDER BY doc_id""",
    "q73_minhash_est" ->
      s"""WITH $ShinglesCte,
         sig AS (
           SELECT doc_id,
             min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
             min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
             min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
             min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
           FROM sh GROUP BY 1),
         buckets AS (
           SELECT doc_id, 0 AS band, md5(h0 || h1) AS key FROM sig
           UNION ALL SELECT doc_id, 1, md5(h2 || h3) FROM sig
           UNION ALL SELECT doc_id, 2, md5(h4 || h5) FROM sig
           UNION ALL SELECT doc_id, 3, md5(h6 || h7) FROM sig),
         bsz AS (SELECT band, key FROM buckets GROUP BY 1, 2 HAVING count(*) <= 50),
         capped AS (
           SELECT b.* FROM buckets b JOIN bsz s ON b.band = s.band AND b.key = s.key),
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM capped a JOIN capped b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         est AS (
           SELECT p.id1, p.id2,
             CAST((CASE WHEN x.h0 = y.h0 THEN 1 ELSE 0 END)
                + (CASE WHEN x.h1 = y.h1 THEN 1 ELSE 0 END)
                + (CASE WHEN x.h2 = y.h2 THEN 1 ELSE 0 END)
                + (CASE WHEN x.h3 = y.h3 THEN 1 ELSE 0 END)
                + (CASE WHEN x.h4 = y.h4 THEN 1 ELSE 0 END)
                + (CASE WHEN x.h5 = y.h5 THEN 1 ELSE 0 END)
                + (CASE WHEN x.h6 = y.h6 THEN 1 ELSE 0 END)
                + (CASE WHEN x.h7 = y.h7 THEN 1 ELSE 0 END) AS BIGINT) AS n_match
           FROM pairs p
           JOIN sig x ON x.doc_id = p.id1
           JOIN sig y ON y.doc_id = p.id2)
         SELECT id1, id2, n_match,
           CAST(n_match AS DOUBLE) / 8 AS est_jaccard
         FROM est ORDER BY 1, 2""",
    "q74_dsir_weights" ->
      s"""WITH $ToksCte,
         f AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT)
               % 64 AS b
           FROM toks),
         tgt AS (SELECT b, count(*) AS ct FROM f WHERE doc_id % 17 = 0 GROUP BY 1),
         rw AS (SELECT b, count(*) AS cr FROM f WHERE doc_id % 17 <> 0 GROUP BY 1),
         tots AS (
           SELECT (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgt) AS nt,
                  (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM rw) AS nr),
         model AS (
           SELECT d.b,
             CAST(coalesce(ct, 0) + 1 AS DOUBLE) / (CAST(nt AS DOUBLE) + 64) AS pt,
             CAST(coalesce(cr, 0) + 1 AS DOUBLE) / (CAST(nr AS DOUBLE) + 64) AS pr
           FROM (SELECT unnest(generate_series(0, 63)) AS b) d
           LEFT JOIN tgt USING (b) LEFT JOIN rw USING (b) CROSS JOIN tots),
         dc AS (
           SELECT doc_id, b, count(*) AS c
           FROM f WHERE doc_id % 17 <> 0 GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(b := b, c := c, p := pt) ORDER BY b),
                 x -> x.c * x.p)), (a, y) -> a + y) AS sum_pt,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(b := b, c := c, p := pr) ORDER BY b),
                 x -> x.c * x.p)), (a, y) -> a + y) AS sum_pr
           FROM dc JOIN model USING (b) GROUP BY 1)
         SELECT doc_id, n_feats, sum_pt, sum_pr FROM agg ORDER BY doc_id""",
    "q75_dup_spans" ->
      s"""WITH $DupSpansCte,
         cnt AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_tokens
           FROM cov GROUP BY 1)
         SELECT t.doc_id, t.n_tokens,
           coalesce(c.n_dup_tokens, 0) AS n_dup_tokens,
           CAST(coalesce(c.n_dup_tokens, 0) AS DOUBLE) / t.n_tokens AS dup_frac,
           CAST(coalesce(c.n_dup_tokens, 0) AS DOUBLE) / t.n_tokens >= 0.5
             AS flag_dup
         FROM tot t LEFT JOIN cnt c USING (doc_id) ORDER BY doc_id""",
    "q79_dup_span_removal" ->
      s"""WITH $DupSpansCte,
         tok AS (
           SELECT doc_id, unnest(generate_series(1, len(toks))) - 1 AS pos, toks
           FROM base),
         kept AS (
           SELECT t.doc_id, t.pos, t.toks[t.pos + 1] AS tok
           FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cp = t.pos
           WHERE c.doc_id IS NULL),
         rebuilt AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text
           FROM kept GROUP BY 1)
         SELECT t.doc_id, t.n_tokens,
           coalesce(r.n_kept, 0) AS n_kept,
           coalesce(r.clean_text, '') AS clean_text
         FROM tot t LEFT JOIN rebuilt r USING (doc_id) ORDER BY doc_id""",
    "q76_hash_split" ->
      """SELECT doc_id,
           CASE WHEN hv < 1000000.0 * 0.9 THEN 'train'
                WHEN hv < 1000000.0 * (0.9 + 0.05) THEN 'val'
                ELSE 'test' END AS split
         FROM (
           SELECT doc_id, CAST((
             (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 268435456
           + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16777216
           + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 1048576
           + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 65536
           + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 8, 1)) - 1)
             ) % 1000000 AS DOUBLE) AS hv
           FROM documents)
         ORDER BY doc_id""",
    "q77_pq_codes" ->
      s"""WITH $PqCodesCte
         SELECT vec_id,
           CAST(sum(i * (CAST(1 AS BIGINT) << (2 * s))) AS BIGINT) AS pq_code
         FROM codes GROUP BY 1 ORDER BY 1""",
    "q89_pq_codes64" ->
      s"""WITH ${pqCodesCte(256, 8192)}
         SELECT vec_id,
           array_to_string(list(CAST(i AS SMALLINT) ORDER BY s), ',')
             AS pq_code_csv
         FROM codes GROUP BY 1 ORDER BY 1""",
    "q90_adc_topk64" ->
      s"""WITH ${pqCodesCte(256, 8192)},
         $AdcRetrievalSql""",
    "q107_sq_codes" ->
      s"""WITH $SqCte
         SELECT vec_id, array_to_string(sq_code, ',') AS sq_code_csv
         FROM scodes ORDER BY vec_id""",
    // Range search: exact cosine (the AdcTailSql rerank arithmetic) with
    // a threshold instead of a rank cut; zero-norm guards mirror the
    // Spark side (NaN orders GREATEST in both engines, so an unguarded
    // NaN would pass the threshold).
    "q109_range_search" ->
      """WITH qs AS (
           SELECT vec_id, embedding,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
               CAST(embedding AS DOUBLE[]))) AS qn
           FROM embeddings WHERE vec_id % 100 = 0),
         cs AS (
           SELECT vec_id, embedding,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
               CAST(embedding AS DOUBLE[]))) AS cn
           FROM embeddings)
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_dot_product(CAST(q.embedding AS DOUBLE[]),
             CAST(c.embedding AS DOUBLE[])) / (q.qn * c.cn) AS cos
         FROM qs q JOIN cs c ON q.vec_id <> c.vec_id
         WHERE q.qn > 0 AND c.cn > 0
           AND list_dot_product(CAST(q.embedding AS DOUBLE[]),
             CAST(c.embedding AS DOUBLE[])) / (q.qn * c.cn) >= 0.25
         ORDER BY query_id, neighbor_id""",
    "q110_bq_codes" ->
      s"""WITH $BqCte
         SELECT vec_id, array_to_string(bq, ',') AS bq_code_csv
         FROM bq ORDER BY vec_id""",
    // IVF × SQ: the q97 probe gate (icand) feeds the q108 SQ estimate,
    // then the shared shortlist/rerank tail.
    "q112_ivfsq_topk" -> IvfSqRetrievalOracle,
    // Stored IVF-SQ index: write-time bucket + uint8 codes replayed from
    // sidecars must change NOTHING about the answer — the oracle is the
    // fresh q112 chain verbatim.
    "q117_ivfsq_stored" -> IvfSqRetrievalOracle,
    // BQ retrieval: integer Hamming-agreement estimate (64 − popcount of
    // the XOR'd sign words — exact on both engines), then the shared
    // shortlist-50 → exact-rerank → rank≤5 tail.
    "q111_bq_topk" ->
      s"""WITH $BqCte,
         qs AS (
           SELECT vec_id AS query_id, embedding,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
               CAST(embedding AS DOUBLE[]))) AS qn
           FROM embeddings WHERE vec_id % 100 = 0),
         este AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(64 - (bit_count(xor(qb.bq[1], c.bq[1]))
                      + bit_count(xor(qb.bq[2], c.bq[2]))) AS DOUBLE)
               AS est_cos
           FROM qs q
           JOIN bq qb ON qb.vec_id = q.query_id
           CROSS JOIN bq c
           WHERE q.qn > 0 AND q.query_id <> c.vec_id),
         $RerankTailSql""",
    // IVF × BQ: the q97 probe gate feeds the q111 Hamming-agreement
    // estimate over probed candidates only, then the shared tail.
    "q115_ivfbq_topk" ->
      s"""WITH $BqCte,
         $IvfPqGateCte,
         qs AS (
           SELECT vec_id AS query_id, embedding,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
               CAST(embedding AS DOUBLE[]))) AS qn
           FROM embeddings WHERE vec_id % 100 = 0),
         este AS (
           SELECT i.query_id, i.neighbor_id,
             CAST(64 - (bit_count(xor(qb.bq[1], c.bq[1]))
                      + bit_count(xor(qb.bq[2], c.bq[2]))) AS DOUBLE)
               AS est_cos
           FROM icand i
           JOIN qs q ON q.query_id = i.query_id
           JOIN bq qb ON qb.vec_id = i.query_id
           JOIN bq c ON c.vec_id = i.neighbor_id
           WHERE q.qn > 0),
         $RerankTailSql""",
    // SQ retrieval: decode the stored codes back to v̂ (per-dim affine),
    // estimate cos(q, v̂) with the same double fold as the Spark side,
    // then EXACTLY the shared ADC tail (shortlist 50 → exact rerank →
    // rank ≤ 5).
    "q108_sq_topk" ->
      s"""WITH $SqCte,
         sdec AS (
           SELECT s.vec_id,
             list(p.mn + CAST(s.sq_code[p.dim + 1] AS DOUBLE)
                 * ((p.mx - p.mn) / 255.0) ORDER BY p.dim) AS dv
           FROM scodes s CROSS JOIN sqp p
           GROUP BY 1),
         qs AS (
           SELECT vec_id AS query_id, embedding,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
               CAST(embedding AS DOUBLE[]))) AS qn
           FROM embeddings WHERE vec_id % 100 = 0),
         est AS (
           SELECT q.query_id, d.vec_id AS neighbor_id,
             list_dot_product(CAST(q.embedding AS DOUBLE[]), d.dv) AS sdot,
             list_dot_product(d.dv, d.dv) AS scn2
           FROM qs q CROSS JOIN sdec d),
         $AdcTailSql""",
    // OPQ: per-dim fixed-point variances (exact integers — n·Σq² − (Σq)²
    // with q = floor(x·4096 + 0.5) BIGINT, mirroring opqPermutation),
    // variance-rank snake allocation to subspaces, then EXACTLY q90's
    // PQ + ADC chain over the permuted vectors (\bembeddings\b → pemb —
    // zero drift from the audited chain).
    "q103_opq_adc_topk" ->
      s"""WITH $OpqPermCte,
         ${(pqCodesCte(256, 8192) + ",\n         " + AdcRetrievalSql)
            .replaceAll("\\bembeddings\\b", "pemb")}""",
    // Stored OPQ index ≡ fresh build: the permutation/centroid/codebook
    // sidecars round-trip exactly and write-time OPQ-space buckets/codes
    // equal whole-corpus assignment, so the oracle is the fresh
    // OPQ × IVF-PQ retrieval (q97's chain over the permuted corpus).
    "q160_opq_ivfpq_stored" ->
      s"""WITH $OpqPermCte,
         ${IvfPqRetrievalOracle.stripPrefix("WITH ")
            .replaceAll("\\bembeddings\\b", "pemb")}""",
    // IVF-PQ: same PQ chain and ADC tail as q90, but the estimate reads
    // only the IVF-probed candidate pairs — the icand gate replaces the
    // full corpus scan (distance table additionally keyed by query).
    "q97_ivfpq_topk" -> IvfPqRetrievalOracle,
    "q78_adc_topk" ->
      s"""WITH $PqCodesCte,
         $AdcRetrievalSql""",
    "q67_repetition" ->
      """WITH base AS (
           SELECT doc_id,
             COALESCE(list_filter(string_split_regex(trim(text), '\s+'),
               t -> t <> ''), []) AS toks,
             COALESCE(list_filter(list_transform(string_split(text, chr(10)),
               l -> trim(l)), l -> l <> ''), []) AS lines
           FROM documents),
         tok AS (
           SELECT doc_id, toks, lines,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
               AS tok_chars
           FROM base),
         lc AS (
           SELECT doc_id, l, count(*) AS c
           FROM (SELECT doc_id, unnest(lines) AS l FROM tok) GROUP BY 1, 2),
         ls AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
             1.0 - CAST(count(*) AS DOUBLE) / sum(c) AS dup_line_frac,
             CASE WHEN sum(c * length(l)) > 0 THEN
               CAST(sum((c - 1) * length(l)) AS DOUBLE) / sum(c * length(l))
             END AS dup_line_char_frac
           FROM lc GROUP BY 1),
         bc AS (
           SELECT doc_id, g, count(*) AS c FROM (
             SELECT doc_id, unnest(CASE WHEN n_tokens >= 2 THEN
               list_transform(range(1, CAST(n_tokens AS INTEGER)),
                 i -> toks[i] || ' ' || toks[i + 1]) ELSE [] END) AS g
             FROM tok) GROUP BY 1, 2),
         btop AS (
           SELECT doc_id, g, c, row_number() OVER (PARTITION BY doc_id
             ORDER BY c DESC, g DESC) AS rn FROM bc),
         tc AS (
           SELECT doc_id, g, count(*) AS c FROM (
             SELECT doc_id, unnest(CASE WHEN n_tokens >= 3 THEN
               list_transform(range(1, CAST(n_tokens AS INTEGER) - 1),
                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
               ELSE [] END) AS g
             FROM tok) GROUP BY 1, 2),
         ttop AS (
           SELECT doc_id, g, c, row_number() OVER (PARTITION BY doc_id
             ORDER BY c DESC, g DESC) AS rn FROM tc),
         fc AS (
           SELECT doc_id, g, count(*) AS c FROM (
             SELECT doc_id, unnest(CASE WHEN n_tokens >= 5 THEN
               list_transform(range(1, CAST(n_tokens AS INTEGER) - 3),
                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                   || ' ' || toks[i + 3] || ' ' || toks[i + 4])
               ELSE [] END) AS g
             FROM tok) GROUP BY 1, 2),
         fs AS (
           SELECT doc_id, sum(CASE WHEN c > 1 THEN c * (length(g) - 4)
             ELSE 0 END) AS dup5
           FROM fc GROUP BY 1)
         SELECT t.doc_id, ls.n_lines, ls.dup_line_frac, ls.dup_line_char_frac,
           t.n_tokens, btop.g AS top_bigram,
           CASE WHEN t.tok_chars > 0 THEN
             CAST(btop.c * (length(btop.g) - 1) AS DOUBLE) / t.tok_chars
           END AS top_bigram_frac,
           CASE WHEN t.tok_chars > 0 THEN
             CAST(ttop.c * (length(ttop.g) - 2) AS DOUBLE) / t.tok_chars
           END AS top_trigram_frac,
           CASE WHEN t.tok_chars > 0 THEN
             CAST(COALESCE(fs.dup5, 0) AS DOUBLE) / t.tok_chars
           END AS dup_5gram_frac
         FROM tok t
         LEFT JOIN ls ON t.doc_id = ls.doc_id
         LEFT JOIN btop ON t.doc_id = btop.doc_id AND btop.rn = 1
         LEFT JOIN ttop ON t.doc_id = ttop.doc_id AND ttop.rn = 1
         LEFT JOIN fs ON t.doc_id = fs.doc_id
         ORDER BY 1""",
    "q68_boilerplate" ->
      """WITH corpus AS (
           SELECT doc_id, concat_ws(chr(10), 'shared header banner', text,
             'shared footer banner') AS text
           FROM documents),
         lines AS (
           SELECT doc_id, pos, l FROM (
             SELECT doc_id,
               unnest(generate_series(0,
                 len(string_split(text, chr(10))) - 1)) AS pos,
               unnest(list_transform(string_split(text, chr(10)),
                 x -> trim(x))) AS l
             FROM corpus) WHERE l <> ''),
         cnt AS (
           SELECT l, count(DISTINCT doc_id) AS ndocs FROM lines GROUP BY 1),
         agg AS (
           SELECT doc_id, count(*) AS n_lines,
             CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boilerplate,
             string_agg(CASE WHEN ndocs < 2 THEN l END, chr(10)
               ORDER BY pos) AS clean_text
           FROM lines JOIN cnt USING (l) GROUP BY doc_id)
         SELECT d.doc_id, coalesce(n_lines, 0) AS n_lines,
           coalesce(n_boilerplate, 0) AS n_boilerplate,
           coalesce(clean_text, '') AS clean_text
         FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""",
    // First-occurrence line dedup: keeper = arg-min (doc, pos) per
    // trimmed line (QUALIFY row_number mirrors Spark's struct-min — both
    // are the lexicographic minimum).
    "q114_line_dedup" ->
      """WITH corpus AS (
           SELECT d.doc_id,
             concat_ws(chr(10), coalesce(b.text, d.text), d.text) AS text
           FROM documents d
           LEFT JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 2)),
         lines AS (
           SELECT doc_id, pos, l FROM (
             SELECT doc_id,
               unnest(generate_series(0,
                 len(string_split(text, chr(10))) - 1)) AS pos,
               unnest(list_transform(string_split(text, chr(10)),
                 x -> trim(x))) AS l
             FROM corpus) WHERE l <> ''),
         firsts AS (
           SELECT l, doc_id AS fd, pos AS fp FROM lines
           QUALIFY row_number() OVER (PARTITION BY l
             ORDER BY doc_id, pos) = 1),
         tot AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
           FROM lines GROUP BY 1),
         ka AS (
           SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(x.l, chr(10) ORDER BY x.pos) AS clean_text
           FROM lines x JOIN firsts f
             ON f.l = x.l AND f.fd = x.doc_id AND f.fp = x.pos
           GROUP BY 1)
         SELECT d.doc_id,
           coalesce(t.n_lines, 0) AS n_lines,
           coalesce(t.n_lines, 0) - coalesce(k.n_kept, 0) AS n_dropped,
           coalesce(k.clean_text, '') AS clean_text
         FROM documents d
         LEFT JOIN tot t USING (doc_id) LEFT JOIN ka k USING (doc_id)
         ORDER BY doc_id""",
    "q69_pii_redact" ->
      """WITH pii AS (
           SELECT doc_id, concat_ws(' ', text,
             CASE WHEN doc_id % 3 = 0 THEN
               'contact user' || doc_id || '@example.com' END,
             CASE WHEN doc_id % 5 = 0 THEN
               'from 10.0.' || (doc_id % 256) || '.1' END,
             CASE WHEN doc_id % 7 = 0 THEN
               'call +1 555 01' || doc_id END) AS text
           FROM documents),
         s1 AS (
           SELECT doc_id,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '[EMAIL]', 'g') AS t1
           FROM pii),
         s2 AS (
           SELECT doc_id, n_emails,
             len(regexp_extract_all(t1,
               '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
             regexp_replace(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b',
               '[IP]', 'g') AS t2
           FROM s1)
         SELECT doc_id, n_emails, n_ipv4,
           len(regexp_extract_all(t2, '\+?\d[\d -]{7,}\d')) AS n_phones,
           regexp_replace(t2, '\+?\d[\d -]{7,}\d', '[PHONE]', 'g') AS redacted
         FROM s2 ORDER BY doc_id""",
    "q70_seq_pack" ->
      """WITH t AS (
           SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS tok_offset
           FROM t)
         SELECT doc_id, shard, n_tokens, tok_offset,
           tok_offset // 512 AS seq_index, tok_offset % 512 AS seq_offset
         FROM c ORDER BY doc_id""",
    // Pipeline capstone: the q70 token arithmetic gates quality, the
    // q114 arg-min keeper dedups (single-line docs → text-level), and the
    // q70 window packs the SURVIVORS — offsets shift with every dedup.
    "q116_pipeline_pack" ->
      """WITH corpus AS (
           SELECT d.doc_id,
             CASE WHEN d.doc_id % 10 = 0 THEN 'tiny doc'
                  WHEN d.doc_id % 7 = 3 THEN coalesce(b.text, d.text)
                  ELSE d.text END AS text
           FROM documents d
           LEFT JOIN documents b ON b.doc_id = d.doc_id - 1),
         t AS (
           SELECT doc_id, trim(text) AS l,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS BIGINT) AS n_tokens
           FROM corpus),
         q AS (SELECT * FROM t WHERE n_tokens >= 3),
         f AS (
           SELECT doc_id, n_tokens FROM q WHERE l <> ''
           QUALIFY row_number() OVER (PARTITION BY l ORDER BY doc_id) = 1),
         s AS (SELECT doc_id, doc_id % 4 AS shard, n_tokens FROM f),
         c AS (
           SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS tok_offset
           FROM s)
         SELECT doc_id, shard, n_tokens, tok_offset,
           tok_offset // 256 AS seq_index, tok_offset % 256 AS seq_offset
         FROM c ORDER BY doc_id""",
    "q71_lm_score" ->
      """WITH norm AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z]+', ' ',
             'g')) AS s FROM documents),
         tri AS (
           SELECT doc_id, substring(s, i, 3) AS tri FROM (
             SELECT doc_id, s,
               unnest(generate_series(1, greatest(length(s) - 2, 0))) AS i
             FROM norm)),
         c3 AS (SELECT tri, count(*) AS c3 FROM tri GROUP BY 1),
         c2 AS (SELECT substring(tri, 1, 2) AS pre, sum(c3) AS c2
                FROM c3 GROUP BY 1),
         model AS (
           SELECT tri, CAST(c3 + 1 AS DOUBLE) / (CAST(c2 AS DOUBLE) + 27)
             AS p
           FROM c3 JOIN c2 ON substring(c3.tri, 1, 2) = c2.pre),
         dt AS (SELECT doc_id, tri, count(*) AS c FROM tri GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(
                 list(struct_pack(tri := tri, c := c, p := p) ORDER BY tri),
                 x -> x.c * x.p)), (a, b) -> a + b) AS sum_p
           FROM dt JOIN model USING (tri) GROUP BY 1)
         SELECT d.doc_id, coalesce(n_trigrams, 0) AS n_trigrams, sum_p,
           CASE WHEN n_trigrams > 0 THEN sum_p / n_trigrams END AS mean_p
         FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""",
    // Hard negatives: q36's bucket-pair scoring at 4 bits, band filter,
    // both orientations, (cos DESC, id) row_number <= 5.
    "q134_hard_negatives" ->
      """WITH bs AS (SELECT unnest(generate_series(0, 3)) AS b),
         bk AS (
           SELECT vec_id,
             CAST(sum(CASE WHEN embedding[2*b + 1] > embedding[2*b + 2]
               THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
           FROM embeddings CROSS JOIN bs GROUP BY 1),
         pairs AS (
           SELECT x.vec_id AS id1, y.vec_id AS id2
           FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
         scored AS (
           SELECT p.id1, p.id2,
             list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
               AS cos
           FROM pairs p
           JOIN embeddings a ON a.vec_id = p.id1
           JOIN embeddings b ON b.vec_id = p.id2),
         band AS (SELECT * FROM scored WHERE cos >= 0.05 AND cos < 0.30),
         sym AS (
           SELECT id1 AS anchor_id, id2 AS negative_id, cos FROM band
           UNION ALL SELECT id2, id1, cos FROM band)
         SELECT anchor_id, negative_id, rank, cos FROM (
           SELECT anchor_id, negative_id, cos,
             CAST(row_number() OVER (PARTITION BY anchor_id
               ORDER BY cos DESC, negative_id) AS INT) AS rank
           FROM sym)
         WHERE rank <= 5 ORDER BY anchor_id, rank""",
    // Fluency buckets: q71's char-LM CTEs + per-language ntile terciles.
    "q135_perplexity_filter" ->
      s"""WITH ${charLmTercilesCte("documents")}""",
    "q307_charlm_incremental" ->
      s"""WITH ${charLmTercilesCte("documents")}""",
    // q315: block-distinct token sets, adjacent overlap counts, strict
    // interior local minima
    "q315_texttiling" ->
      """WITH dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
           FROM documents),
         tk AS (
           SELECT doc_id, (i - 1) // 10 AS blk, toks[i] AS tok
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks))) AS i FROM dbase)
           WHERE toks[i] <> ''),
         blocks AS (SELECT DISTINCT doc_id, blk, tok FROM tk),
         sizes AS (
           SELECT doc_id, blk, count(*) AS n FROM blocks GROUP BY 1, 2),
         ov AS (
           SELECT a.doc_id, a.blk AS boundary, count(*) AS overlap
           FROM blocks a JOIN blocks b
             ON b.doc_id = a.doc_id AND b.blk = a.blk + 1
               AND b.tok = a.tok
           GROUP BY 1, 2),
         allb AS (
           SELECT l.doc_id, l.blk AS boundary,
             CAST(l.n AS BIGINT) AS left_toks,
             CAST(r.n AS BIGINT) AS right_toks,
             CAST(COALESCE(ov.overlap, 0) AS BIGINT) AS overlap
           FROM sizes l
           JOIN sizes r ON r.doc_id = l.doc_id AND r.blk = l.blk + 1
           LEFT JOIN ov ON ov.doc_id = l.doc_id AND ov.boundary = l.blk)
         SELECT doc_id, CAST(boundary AS BIGINT) AS boundary, left_toks,
           right_toks, overlap,
           COALESCE(lag(overlap) OVER w IS NOT NULL
             AND lead(overlap) OVER w IS NOT NULL
             AND overlap < lag(overlap) OVER w
             AND overlap < lead(overlap) OVER w, FALSE) AS is_boundary
         FROM allb
         WINDOW w AS (PARTITION BY doc_id ORDER BY boundary)
         ORDER BY doc_id, boundary""",
    // q316: the q311 fingerprint chain + doc-freq-capped hash join
    "q316_winnow_pairs" -> {
      s"""WITH dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
         grams AS (
           SELECT doc_id, i - 1 AS pos,
             (${hv32Sql("", "array_to_string(toks[i:i+3], ' ')")}) AS h
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i
             FROM dbase)
           WHERE len(list_filter(toks[i:i+3], x -> x = '')) = 0),
         wins AS (
           SELECT doc_id, pos AS t,
             min(h) OVER dwin AS mh,
             max(pos) OVER dwin AS last
           FROM grams
           WINDOW dwin AS (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
         fullw AS (SELECT doc_id, t, mh FROM wins WHERE last = t + 4),
         hs AS (SELECT DISTINCT doc_id, mh AS h FROM fullw),
         dfq AS (
           SELECT h FROM hs GROUP BY 1 HAVING count(*) <= 50),
         kept AS (SELECT hs.doc_id, hs.h FROM hs JOIN dfq USING (h)),
         pr AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared_fp
           FROM kept a JOIN kept b
             ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id1, id2, CAST(shared_fp AS BIGINT) AS shared_fp
         FROM pr WHERE shared_fp >= 2 ORDER BY id1, id2"""
    },
    // q322: full MOSS replay — q311's gram/window CTEs, q316's df-capped
    // pair tier, exact gram-set Jaccard at 1/4 in integers, recursive
    // min-label reach over the verified edges (the q61/q113 CC oracle)
    "q322_winnow_keepers" -> {
      s"""WITH RECURSIVE dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
         grams AS (
           SELECT doc_id, i - 1 AS pos,
             (${hv32Sql("", "array_to_string(toks[i:i+3], ' ')")}) AS h
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i
             FROM dbase)
           WHERE len(list_filter(toks[i:i+3], x -> x = '')) = 0),
         wins AS (
           SELECT doc_id, pos AS t,
             min(h) OVER dwin AS mh,
             max(pos) OVER dwin AS last
           FROM grams
           WINDOW dwin AS (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
         fullw AS (SELECT doc_id, t, mh FROM wins WHERE last = t + 4),
         hs AS (SELECT DISTINCT doc_id, mh AS h FROM fullw),
         dfq AS (SELECT h FROM hs GROUP BY 1 HAVING count(*) <= 50),
         kept AS (SELECT hs.doc_id, hs.h FROM hs JOIN dfq USING (h)),
         pr AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM kept a JOIN kept b
             ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 2),
         gs AS (SELECT DISTINCT doc_id, h FROM grams),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                FROM gs GROUP BY 1),
         iv AS (
           SELECT p.id1, p.id2, CAST(count(*) AS BIGINT) AS i
           FROM pr p
           JOIN gs a ON a.doc_id = p.id1
           JOIN gs b ON b.doc_id = p.id2 AND b.h = a.h
           GROUP BY 1, 2),
         ver AS (
           SELECT iv.id1, iv.id2
           FROM iv
           JOIN sz s1 ON s1.doc_id = iv.id1
           JOIN sz s2 ON s2.doc_id = iv.id2
           WHERE iv.i * 4 >= 1 * (s1.n + s2.n - iv.i)),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM ver
           UNION SELECT id2, id1 FROM ver),
         reach AS (
           SELECT doc_id AS id, doc_id AS label FROM documents
           UNION
           SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id)
         SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS keeper,
           CASE WHEN min(label) = id THEN 'kept' ELSE 'dup' END AS fate
         FROM reach GROUP BY id ORDER BY doc_id"""
    },
    // q325: schedule replay — batch-1 pairs from split-0 fingerprints
    // under split-0 caps; batch-2 pairs over the CUMULATIVE membership
    // of every hash batch 2 touches, cap recomputed over that state
    // (the q175 per-probe convention), ≥1 side from batch 2
    "q325_winnow_incremental" -> {
      val splitLadder = md5Ladder32("'wnb:' || CAST(doc_id AS VARCHAR)")
      s"""WITH dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
         grams AS (
           SELECT doc_id, i - 1 AS pos,
             (${hv32Sql("", "array_to_string(toks[i:i+3], ' ')")}) AS h
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i
             FROM dbase)
           WHERE len(list_filter(toks[i:i+3], x -> x = '')) = 0),
         wins AS (
           SELECT doc_id, pos AS t,
             min(h) OVER dwin AS mh,
             max(pos) OVER dwin AS last
           FROM grams
           WINDOW dwin AS (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
         fullw AS (SELECT doc_id, t, mh FROM wins WHERE last = t + 4),
         hs AS (SELECT DISTINCT doc_id, mh AS h FROM fullw),
         spl AS (
           SELECT doc_id, CAST(($splitLadder) % 2 AS BIGINT) AS split
           FROM documents),
         hsx AS (
           SELECT h.doc_id, h.h, s.split FROM hs h JOIN spl s USING (doc_id)),
         c1sz AS (
           SELECT h FROM hsx WHERE split = 0
           GROUP BY 1 HAVING count(*) <= 50),
         c1m AS (SELECT hsx.* FROM hsx JOIN c1sz USING (h) WHERE split = 0),
         p1 AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM c1m a JOIN c1m b ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 2),
         k2 AS (SELECT DISTINCT h FROM hsx WHERE split = 1),
         c2all AS (SELECT hsx.* FROM hsx JOIN k2 USING (h)),
         c2sz AS (SELECT h FROM c2all GROUP BY 1 HAVING count(*) <= 50),
         c2m AS (SELECT c2all.* FROM c2all JOIN c2sz USING (h)),
         p2 AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM c2m a JOIN c2m b ON a.h = b.h AND a.doc_id < b.doc_id
           WHERE a.split = 1 OR b.split = 1
           GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT DISTINCT id1, id2
         FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
         ORDER BY id1, id2"""
    },
    // q327: full funnel replay — q322's winnow/verify/reach keeper chain,
    // the tag scope as its semantic equivalent (source <> 'src2' on the
    // kept set), and the q188-form BPE count join on the survivors
    "q327_funnel_r16" -> {
      s"""WITH RECURSIVE dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
         grams AS (
           SELECT doc_id, i - 1 AS pos,
             (${hv32Sql("", "array_to_string(toks[i:i+3], ' ')")}) AS h
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i
             FROM dbase)
           WHERE len(list_filter(toks[i:i+3], x -> x = '')) = 0),
         wins AS (
           SELECT doc_id, pos AS t,
             min(h) OVER dwin AS mh,
             max(pos) OVER dwin AS last
           FROM grams
           WINDOW dwin AS (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
         fullw AS (SELECT doc_id, t, mh FROM wins WHERE last = t + 4),
         hs AS (SELECT DISTINCT doc_id, mh AS h FROM fullw),
         dfq AS (SELECT h FROM hs GROUP BY 1 HAVING count(*) <= 50),
         keptfp AS (SELECT hs.doc_id, hs.h FROM hs JOIN dfq USING (h)),
         pr AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM keptfp a JOIN keptfp b
             ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 2),
         gs AS (SELECT DISTINCT doc_id, h FROM grams),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                FROM gs GROUP BY 1),
         iv AS (
           SELECT p.id1, p.id2, CAST(count(*) AS BIGINT) AS i
           FROM pr p
           JOIN gs a ON a.doc_id = p.id1
           JOIN gs b ON b.doc_id = p.id2 AND b.h = a.h
           GROUP BY 1, 2),
         ver AS (
           SELECT iv.id1, iv.id2
           FROM iv
           JOIN sz s1 ON s1.doc_id = iv.id1
           JOIN sz s2 ON s2.doc_id = iv.id2
           WHERE iv.i * 4 >= 1 * (s1.n + s2.n - iv.i)),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM ver
           UNION SELECT id2, id1 FROM ver),
         reach AS (
           SELECT doc_id AS id, doc_id AS label FROM documents
           UNION
           SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         keepdocs AS (
           SELECT id AS doc_id FROM reach GROUP BY id HAVING min(label) = id),
         scoped AS (
           SELECT d.doc_id, d.text FROM documents d
           JOIN keepdocs USING (doc_id) WHERE d.source <> 'src2'),
         toks AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
           FROM scoped),
         $BpeV0Cte,
         ${bpeStepCte("v0", 1)},
         ${bpeStepCte("v1", 2)},
         ${bpeStepCte("v2", 3)},
         enc AS (
           SELECT CAST(count(DISTINCT t.doc_id) AS BIGINT) AS nd,
             CAST(count(*) AS BIGINT) AS nw,
             CAST(sum(len(v.toks)) AS BIGINT) AS np
           FROM toks t JOIN v3 v ON t.tok = v.word WHERE t.tok <> '')
         SELECT '0_raw' AS stage,
           (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
           CAST(0 AS BIGINT) AS n_words, CAST(0 AS BIGINT) AS n_pieces
         UNION ALL SELECT '1_kept',
           (SELECT CAST(count(*) AS BIGINT) FROM keepdocs),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         UNION ALL SELECT '2_tagged',
           (SELECT CAST(count(*) AS BIGINT) FROM scoped),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         UNION ALL SELECT '3_encoded', nd, nw, np FROM enc
         ORDER BY stage"""
    },
    // q332: the q177 schedule-replay shape on winnow candidates — q325's
    // capped pair tier per probe, KMV verify over gram TEXT (52-bit md5
    // minima), recursive reach per batch state
    "q332_winnow_dup_incremental" -> {
      val splitLadder = md5Ladder32("'wnb:' || CAST(doc_id AS VARCHAR)")
      val skLadder = md5Ladder52("gram")
      val verify = (pairsCte: String, out: String) =>
        s"""$out AS (
             SELECT id1, id2 FROM (
               SELECT p.id1, p.id2,
                 list_sort(list_distinct(list_concat(a.minima, b.minima)))[1:256]
                   AS x,
                 a.minima AS ma, b.minima AS mb
               FROM $pairsCte p
               JOIN skl a ON a.doc_id = p.id1
               JOIN skl b ON b.doc_id = p.id2)
             WHERE len(x) > 0
               AND CAST(len(list_intersect(list_intersect(x, ma), mb))
                 AS DOUBLE) / len(x) >= 0.25)"""
      s"""WITH RECURSIVE dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
         gocc AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+3], ' ') AS g
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i
             FROM dbase)
           WHERE len(list_filter(toks[i:i+3], x -> x = '')) = 0),
         grams AS (
           SELECT doc_id, pos, (${hv32Sql("", "g")}) AS h FROM gocc),
         wins AS (
           SELECT doc_id, pos AS t,
             min(h) OVER dwin AS mh,
             max(pos) OVER dwin AS last
           FROM grams
           WINDOW dwin AS (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
         fullw AS (SELECT doc_id, t, mh FROM wins WHERE last = t + 4),
         hs AS (SELECT DISTINCT doc_id, mh AS h FROM fullw),
         spl AS (
           SELECT doc_id, CAST(($splitLadder) % 2 AS BIGINT) AS split
           FROM documents),
         hsx AS (
           SELECT h.doc_id, h.h, s.split FROM hs h JOIN spl s USING (doc_id)),
         c1sz AS (
           SELECT h FROM hsx WHERE split = 0
           GROUP BY 1 HAVING count(*) <= 50),
         c1m AS (SELECT hsx.* FROM hsx JOIN c1sz USING (h) WHERE split = 0),
         p1 AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM c1m a JOIN c1m b ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 2),
         k2 AS (SELECT DISTINCT h FROM hsx WHERE split = 1),
         c2all AS (SELECT hsx.* FROM hsx JOIN k2 USING (h)),
         c2sz AS (SELECT h FROM c2all GROUP BY 1 HAVING count(*) <= 50),
         c2m AS (SELECT c2all.* FROM c2all JOIN c2sz USING (h)),
         p2 AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM c2m a JOIN c2m b ON a.h = b.h AND a.doc_id < b.doc_id
           WHERE a.split = 1 OR b.split = 1
           GROUP BY 1, 2 HAVING count(*) >= 2),
         dh AS (
           SELECT DISTINCT doc_id, CAST($skLadder AS BIGINT) AS h
           FROM (SELECT DISTINCT doc_id, g AS gram FROM gocc)),
         mkv AS (
           SELECT doc_id, h FROM dh
           QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h) <= 256),
         skl AS (
           SELECT doc_id, list(h ORDER BY h) AS minima FROM mkv GROUP BY 1),
         ${verify("p1", "v1")},
         ${verify("p2", "v2")},
         edges1 AS (
           SELECT id1 AS src, id2 AS dst FROM v1
           UNION ALL SELECT id2, id1 FROM v1),
         reach1 AS (
           SELECT doc_id AS id, doc_id AS label FROM documents
           UNION
           SELECT e.dst AS id, r.label FROM reach1 r JOIN edges1 e ON e.src = r.id),
         kp1 AS (SELECT id AS doc_id, min(label) AS keeper FROM reach1 GROUP BY 1),
         edges2 AS (
           SELECT id1 AS src, id2 AS dst FROM v1
           UNION ALL SELECT id2, id1 FROM v1
           UNION ALL SELECT id1, id2 FROM v2
           UNION ALL SELECT id2, id1 FROM v2),
         reach2 AS (
           SELECT doc_id AS id, doc_id AS label FROM documents
           UNION
           SELECT e.dst AS id, r.label FROM reach2 r JOIN edges2 e ON e.src = r.id),
         kp2 AS (SELECT id AS doc_id, min(label) AS keeper FROM reach2 GROUP BY 1)
         SELECT doc_id, batch, keeper FROM (
           SELECT s.doc_id, CAST(0 AS BIGINT) AS batch, kp1.keeper
           FROM spl s JOIN kp1 USING (doc_id) WHERE s.split = 0
           UNION ALL
           SELECT s.doc_id, CAST(1 AS BIGINT) AS batch, kp2.keeper
           FROM spl s JOIN kp2 USING (doc_id) WHERE s.split = 1)
         ORDER BY doc_id, batch"""
    },
    // q331: two-stage schedule replay — batch-1 ranks admit to quota,
    // batch-2 ranks admit to quota − batch-1 admissions (the md5 cap
    // CTE mirrors the gate's replay slice; it binds only above sf0.01)
    "q331_stream_quota" -> {
      val spl = md5Ladder32("'sq:' || CAST(doc_id AS VARCHAR)")
      val quota = """CASE source WHEN 'src0' THEN 15 WHEN 'src1' THEN 8
               WHEN 'src2' THEN 20 WHEN 'src3' THEN 1000 ELSE 0 END"""
      s"""WITH slice AS (
           SELECT doc_id, source FROM documents
           ORDER BY md5('sqcap:' || CAST(doc_id AS VARCHAR)), doc_id
           LIMIT 2048),
         spl AS (
           SELECT doc_id, source, CAST(($spl) % 2 AS BIGINT) AS s
           FROM slice),
         r1 AS (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5('qh:' || CAST(doc_id AS VARCHAR)), doc_id) AS r
           FROM spl WHERE s = 0),
         a1 AS (SELECT doc_id, source FROM r1 WHERE r <= $quota),
         c1 AS (SELECT source, count(*) AS adm FROM a1 GROUP BY 1),
         r2 AS (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5('qh:' || CAST(doc_id AS VARCHAR)), doc_id) AS r
           FROM spl WHERE s = 1),
         a2 AS (
           SELECT r2.doc_id, r2.source FROM r2
           LEFT JOIN c1 USING (source)
           WHERE r2.r + coalesce(c1.adm, 0) <= $quota)
         SELECT doc_id, source
         FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
         ORDER BY doc_id"""
    },
    // q333: row_number over (freq DESC, tok) = the dense rank on
    // distinct keys; floor(log2(rank)) is boundary-safe (powers of two
    // are exact doubles, non-powers are ≥1e-8 from an integer)
    "q334_canonical_dedup" ->
      """WITH canon AS (
           SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS canon_digest
           FROM documents)
         SELECT doc_id, canon_digest,
           CAST(min(doc_id) OVER (PARTITION BY canon_digest) AS BIGINT)
             AS keeper,
           CAST(count(*) OVER (PARTITION BY canon_digest) AS BIGINT)
             AS copies,
           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canon_digest)
             THEN 'kept' ELSE 'dup' END AS fate
         FROM canon ORDER BY doc_id""",
    // Incremental canonical dedup: batch-2 keepers resolve to batch-1's
    // where the CANONICAL digest was already seen — storage is
    // answer-invisible (the q142 convention), the oracle recomputes pure
    // two-batch semantics over the same mangled-copy corpus.
    "q336_canonical_incremental" -> {
      val split = md5Ladder32("'cinc:' || CAST(doc_id AS VARCHAR)")
      s"""WITH corpus AS (
           SELECT d.doc_id,
             CASE WHEN d.doc_id % 7 = 3 AND s.text IS NOT NULL
               THEN '** ' || replace(s.text, ' ', '  ') || ' !!'
               ELSE d.text END AS text
           FROM documents d LEFT JOIN documents s ON s.doc_id = d.doc_id - 3),
         sp AS (
           SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS digest,
             CAST(($split) % 2 AS BIGINT) AS split
           FROM corpus),
         b1 AS (
           SELECT digest, CAST(min(doc_id) AS BIGINT) AS keeper
           FROM sp WHERE split = 0 GROUP BY 1),
         b2 AS (
           SELECT digest, CAST(min(doc_id) AS BIGINT) AS keeper2,
             CAST(count(*) AS BIGINT) AS batch_copies
           FROM sp WHERE split = 1 GROUP BY 1)
         SELECT b2.digest, b2.batch_copies,
           coalesce(b1.keeper, b2.keeper2) AS keeper
         FROM b2 LEFT JOIN b1 USING (digest) ORDER BY digest"""
    },
    "q333_zipf_buckets" ->
      s"""WITH $ToksCte,
         fr AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS freq
           FROM toks WHERE tok <> '' GROUP BY 1),
         rk AS (
           SELECT tok, freq,
             row_number() OVER (ORDER BY freq DESC, tok) AS r
           FROM fr)
         SELECT CAST(floor(log2(r)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(freq) AS BIGINT) AS sum_freq,
           CAST(min(r) AS BIGINT) AS min_rank,
           CAST(max(r) AS BIGINT) AS max_rank
         FROM rk GROUP BY 1 ORDER BY 1""",
    // q330: HRW argmax replayed as row_number over (h DESC, s DESC) —
    // the same tie-break as Spark's struct array_max
    "q330_rendezvous_shards" -> {
      def hrw(sExpr: String) = md5Ladder32(
        s"'hrw:' || CAST(doc_id AS VARCHAR) || ':' || CAST($sExpr AS VARCHAR)")
      s"""WITH s8 AS (
           SELECT doc_id, s AS shard8 FROM (
             SELECT doc_id, u.s, (${hrw("u.s")}) AS h
             FROM documents CROSS JOIN
               (SELECT unnest(generate_series(0, 7)) AS s) u)
           QUALIFY row_number() OVER (PARTITION BY doc_id
             ORDER BY h DESC, s DESC) = 1),
         s9 AS (
           SELECT doc_id, s AS shard9 FROM (
             SELECT doc_id, u.s, (${hrw("u.s")}) AS h
             FROM documents CROSS JOIN
               (SELECT unnest(generate_series(0, 8)) AS s) u)
           QUALIFY row_number() OVER (PARTITION BY doc_id
             ORDER BY h DESC, s DESC) = 1)
         SELECT CAST(shard8 AS BIGINT) AS shard8,
           CAST(shard9 AS BIGINT) AS shard9,
           CAST(count(*) AS BIGINT) AS n
         FROM s8 JOIN s9 USING (doc_id)
         GROUP BY 1, 2 ORDER BY 1, 2"""
    },
    // q328: member-half model, per-doc bottom-quota fold ordered by
    // (p, tri) — take_i = min(c_i, max(quota − cumprev_i, 0)) equals the
    // Spark remaining-quota accumulator; ordered list_reduce sums the
    // identical term sequence
    "q328_mink_membership" ->
      """WITH norm AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z]+', ' ',
             'g')) AS s FROM documents),
         tri AS (
           SELECT doc_id, substring(s, i, 3) AS tri FROM (
             SELECT doc_id, s,
               unnest(generate_series(1, greatest(length(s) - 2, 0))) AS i
             FROM norm)),
         c3 AS (SELECT tri, count(*) AS c3 FROM tri
                WHERE doc_id % 2 = 0 GROUP BY 1),
         c2 AS (SELECT substring(tri, 1, 2) AS pre, sum(c3) AS c2
                FROM c3 GROUP BY 1),
         model AS (
           SELECT tri, CAST(c3 + 1 AS DOUBLE) / (CAST(c2 AS DOUBLE) + 27)
             AS p
           FROM c3 JOIN c2 ON substring(c3.tri, 1, 2) = c2.pre),
         dt AS (SELECT doc_id, tri, count(*) AS c FROM tri GROUP BY 1, 2),
         j AS (SELECT dt.doc_id, dt.tri, dt.c, m.p
               FROM dt JOIN model m USING (tri)),
         q AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_covered,
             greatest(1, (CAST(sum(c) AS BIGINT) * 2000) // 10000)
               AS n_scored
           FROM j GROUP BY 1),
         w AS (
           SELECT j.doc_id, j.tri, j.c, j.p,
             sum(j.c) OVER (PARTITION BY j.doc_id ORDER BY j.p, j.tri
               ROWS UNBOUNDED PRECEDING) - j.c AS cumprev
           FROM j),
         contrib AS (
           SELECT w.doc_id, w.p, w.tri,
             least(w.c, greatest(q.n_scored - w.cumprev, 0)) AS take
           FROM w JOIN q USING (doc_id)),
         agg AS (
           SELECT doc_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(
                 list(struct_pack(p := p, tri := tri, take := take)
                   ORDER BY p, tri),
                 x -> x.take * x.p)), (a, b) -> a + b) AS sum_p_mink
           FROM contrib GROUP BY 1)
         SELECT d.doc_id,
           coalesce(q.n_covered, 0) AS n_covered,
           CAST(coalesce(q.n_scored, 0) AS BIGINT) AS n_scored,
           coalesce(a.sum_p_mink, 0.0) AS sum_p_mink,
           CASE WHEN coalesce(q.n_scored, 0) > 0
             THEN a.sum_p_mink / q.n_scored END AS mean_p_mink,
           (d.doc_id % 2 = 0) AS member
         FROM documents d
         LEFT JOIN q USING (doc_id)
         LEFT JOIN agg a USING (doc_id)
         ORDER BY d.doc_id""",
    // q326: confusion matrix + κ = (N·Σdiag − Σ r_k·c_k)/(N² − Σ r_k·c_k)
    // in HUGEINT; sign-split magnitude // matches Spark's trunc DIV
    "q326_annotator_kappa" -> {
      val flip = md5Ladder32("'ann:' || CAST(vec_id AS VARCHAR)")
      s"""WITH ab AS (
           SELECT CAST(label AS BIGINT) AS a,
             CASE WHEN ($flip) % 7 = 0
               THEN (CAST(label AS BIGINT) + 1) % 10
               ELSE CAST(label AS BIGINT) END AS b
           FROM embeddings),
         cm AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
                FROM ab GROUP BY 1, 2),
         rk AS (SELECT a, sum(n) AS r FROM cm GROUP BY 1),
         ck AS (SELECT b, sum(n) AS c FROM cm GROUP BY 1),
         pe AS (SELECT coalesce(sum(rk.r * ck.c), 0) AS pe_num
                FROM rk JOIN ck ON rk.a = ck.b),
         sc AS (
           SELECT nt, agr,
             (nt * agr - pe_num) AS knum, (nt * nt - pe_num) AS kden
           FROM (SELECT sum(n) AS nt,
                   sum(CASE WHEN a = b THEN n ELSE 0 END) AS agr
                 FROM cm) CROSS JOIN pe)
         SELECT cm.a, cm.b, cm.n,
           CAST(sc.nt AS BIGINT) AS n_total,
           CAST(sc.agr AS BIGINT) AS n_agree,
           CAST(CASE WHEN sc.kden = 0 THEN 0
                WHEN sc.knum >= 0 THEN (1000000000 * sc.knum) // sc.kden
                ELSE -((1000000000 * -sc.knum) // sc.kden) END AS BIGINT)
             AS kappa_scaled
         FROM cm CROSS JOIN sc ORDER BY cm.a, cm.b"""
    },
    // q317: per-source md5 row_number against floor-quotas of the total
    "q317_quota_sample" ->
      """WITH tot AS (SELECT count(*) AS n FROM documents),
         q AS (
           SELECT * FROM (VALUES ('src0', 400), ('src1', 200),
             ('src2', 100), ('src3', 800)) AS t(source, bp)),
         qq AS (
           SELECT source, CAST((tot.n * bp) // 10000 AS BIGINT) AS quota
           FROM q CROSS JOIN tot),
         r AS (
           SELECT d.doc_id, d.source,
             CAST(row_number() OVER (PARTITION BY d.source
               ORDER BY md5('quota:' || CAST(d.doc_id AS VARCHAR)),
                 d.doc_id) AS BIGINT) AS rank_in_group
           FROM documents d JOIN qq ON qq.source = d.source)
         SELECT r.doc_id, r.source, r.rank_in_group, qq.quota
         FROM r JOIN qq USING (source)
         WHERE r.rank_in_group <= qq.quota
         ORDER BY r.doc_id""",
    // q318: the q314 mods replayed into per-doc fates — dup beats
    // contaminated (a non-keeper never reaches the decontam stage)
    "q318_drop_ledger" ->
      """WITH mods AS (
           SELECT d.doc_id,
             CASE WHEN d.doc_id % 30 = 1 THEN 'é ' || d.text
                  WHEN d.doc_id % 30 = 16 AND b.text IS NOT NULL
                    THEN 'é ' || b.text
                  WHEN d.doc_id % 20 = 3 AND c.text IS NOT NULL
                    THEN c.text
                  ELSE d.text END AS text
           FROM documents d
           LEFT JOIN documents b ON b.doc_id = d.doc_id - 15
           LEFT JOIN documents c ON c.doc_id = d.doc_id + 2
           WHERE d.doc_id % 5 <> 0),
         normed AS (
           SELECT doc_id,
             md5(lower(trim(nfc_normalize(text)))) AS dg
           FROM mods),
         keepers AS (
           SELECT dg, min(doc_id) AS keeper FROM normed GROUP BY 1),
         ev AS (
           SELECT DISTINCT md5(lower(trim(nfc_normalize(text)))) AS dg
           FROM documents WHERE doc_id % 5 = 0)
         SELECT n.doc_id,
           CASE WHEN n.doc_id <> k.keeper THEN 'dup'
                WHEN e.dg IS NOT NULL THEN 'contaminated'
                ELSE 'kept' END AS fate
         FROM normed n
         JOIN keepers k USING (dg)
         LEFT JOIN ev e USING (dg)
         ORDER BY n.doc_id""",
    // q314: full replay — nfc_normalize unifies the planted
    // decomposed/precomposed pair, dedup keeps min id, decontam drops
    // planted eval texts, export == survivors
    "q314_funnel_r15" ->
      """WITH mods AS (
           SELECT d.doc_id,
             CASE WHEN d.doc_id % 30 = 1 THEN 'é ' || d.text
                  WHEN d.doc_id % 30 = 16 AND b.text IS NOT NULL
                    THEN 'é ' || b.text
                  WHEN d.doc_id % 20 = 3 AND c.text IS NOT NULL
                    THEN c.text
                  ELSE d.text END AS text
           FROM documents d
           LEFT JOIN documents b ON b.doc_id = d.doc_id - 15
           LEFT JOIN documents c ON c.doc_id = d.doc_id + 2
           WHERE d.doc_id % 5 <> 0),
         normed AS (
           SELECT doc_id, nfc_normalize(text) AS text,
             md5(lower(trim(nfc_normalize(text)))) AS dg
           FROM mods),
         kept AS (
           SELECT n.doc_id, n.text, n.dg FROM normed n
           JOIN (SELECT dg, min(doc_id) AS doc_id FROM normed GROUP BY 1) k
             ON k.dg = n.dg AND k.doc_id = n.doc_id),
         ev AS (
           SELECT DISTINCT md5(lower(trim(nfc_normalize(text)))) AS dg
           FROM documents WHERE doc_id % 5 = 0),
         clean AS (
           SELECT doc_id, text FROM kept
           WHERE dg NOT IN (SELECT dg FROM ev)),
         tk AS (
           SELECT 'a_raw' AS stage, count(*) AS n_docs,
             sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x <> ''))) AS n_tokens
           FROM mods
           UNION ALL
           SELECT 'b_dedup', count(*),
             sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x <> '')))
           FROM kept
           UNION ALL
           SELECT 'c_decontam', count(*),
             sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x <> '')))
           FROM clean
           UNION ALL
           SELECT 'd_export', count(*),
             sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x <> '')))
           FROM clean)
         SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens
         FROM tk ORDER BY stage""",
    // q319: vocab = distinct tokens of the first two md5 batches; the
    // third batch's occurrences/types split by membership
    "q319_oov_incremental" -> {
      val split = md5Ladder32("'oov:' || CAST(doc_id AS VARCHAR)")
      s"""WITH sp AS (
           SELECT doc_id, text, CAST(($split) % 3 AS BIGINT) AS h
           FROM documents),
         vt AS (
           SELECT DISTINCT toks[i] AS tok
           FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks,
             unnest(generate_series(1,
               len(regexp_split_to_array(trim(text), '\\s+')))) AS i
             FROM sp WHERE h < 2)
           WHERE toks[i] <> ''),
         p3 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
               THEN text || ' nv' || CAST(doc_id AS VARCHAR)
               ELSE text END AS text
           FROM sp WHERE h = 2),
         pr AS (
           SELECT toks[i] AS tok, count(*) AS cnt
           FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks,
             unnest(generate_series(1,
               len(regexp_split_to_array(trim(text), '\\s+')))) AS i
             FROM p3)
           WHERE toks[i] <> ''
           GROUP BY 1)
         SELECT CAST(sum(cnt) AS BIGINT) AS n_occ,
           CAST(sum(CASE WHEN v.tok IS NULL THEN cnt ELSE 0 END) AS BIGINT)
             AS n_oov_occ,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov_types,
           CAST(10000 * sum(CASE WHEN v.tok IS NULL THEN cnt ELSE 0 END)
             // sum(cnt) AS BIGINT) AS oov_bp
         FROM pr LEFT JOIN vt v USING (tok)"""
    },
    // q313: rank types by (cnt DESC, tok), coverage per cap
    "q313_oov_coverage" ->
      s"""WITH $ToksCte,
         cnt AS (
           SELECT tok, count(*) AS cnt FROM toks WHERE tok <> ''
           GROUP BY 1),
         rk AS (
           SELECT tok, cnt,
             row_number() OVER (ORDER BY -cnt, tok) AS rnk
           FROM cnt),
         tot AS (
           SELECT CAST(sum(cnt) AS BIGINT) AS total_occ,
             CAST(count(*) AS BIGINT) AS n_types
           FROM cnt),
         caps AS (SELECT unnest([64, 256, 1024]) AS vocab_cap),
         cov AS (
           SELECT c.vocab_cap,
             CAST(count(r.tok) AS BIGINT) AS vocab_used,
             CAST(COALESCE(sum(r.cnt), 0) AS BIGINT) AS covered
           FROM caps c LEFT JOIN rk r ON r.rnk <= c.vocab_cap
           GROUP BY 1)
         SELECT CAST(vocab_cap AS BIGINT) AS vocab_cap, vocab_used, covered,
           total_occ, n_types,
           CAST(10000 * (total_occ - covered) // total_occ AS BIGINT)
             AS oov_bp
         FROM cov CROSS JOIN tot ORDER BY vocab_cap""",
    // q312: q136's logit chain + fixed-width clamped bins; identical
    // doubles make floor() agree at every bin edge
    "q312_calibration_bins" ->
      s"""WITH $ToksCte,
         f AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT)
               % 64 AS b
           FROM toks WHERE tok <> ''),
         dc AS (SELECT doc_id, b, count(*) AS c FROM f GROUP BY 1, 2),
         model AS (
           SELECT b, CAST((b * 37) % 21 - 10 AS DOUBLE) / 10.0 AS w
           FROM (SELECT unnest(generate_series(0, 63)) AS b)),
         agg AS (
           SELECT doc_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(b := b, c := c, w := w) ORDER BY b),
                 x -> x.c * x.w)), (a, y) -> a + y) + (-0.55) AS logit
           FROM dc JOIN model USING (b) GROUP BY 1),
         lbl AS (
           SELECT a.doc_id, a.logit,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
           FROM agg a JOIN documents d USING (doc_id)),
         binned AS (
           SELECT least(greatest(CAST(floor((logit - (-5.0)) / 1.0)
               AS BIGINT), 0), 9) AS bin,
             y, logit
           FROM lbl)
         SELECT bin, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(CAST(floor(logit * 16777216.0 + 0.5) AS BIGINT))
             AS BIGINT) AS score_fp_sum
         FROM binned GROUP BY 1 ORDER BY bin""",
    // q311: same gram/window/rightmost-min chain — the full-window test
    // (max pos over w rows == pos + w - 1) also excises windows crossing
    // empty-token gaps, in both engines
    "q311_winnowing" -> {
      s"""WITH dbase AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
         grams AS (
           SELECT doc_id, i - 1 AS pos,
             (${hv32Sql("", "array_to_string(toks[i:i+3], ' ')")}) AS h
           FROM (SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i
             FROM dbase)
           WHERE len(list_filter(toks[i:i+3], x -> x = '')) = 0),
         wins AS (
           SELECT doc_id, pos AS t,
             min(h) OVER dwin AS mh,
             max(pos) OVER dwin AS last
           FROM grams
           WINDOW dwin AS (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
         fullw AS (SELECT doc_id, t, mh FROM wins WHERE last = t + 4),
         res AS (
           SELECT w.doc_id, w.t, max(g.pos) AS pos, max(g.h) AS h
           FROM fullw w JOIN grams g
             ON g.doc_id = w.doc_id
             AND g.pos BETWEEN w.t AND w.t + 4 AND g.h = w.mh
           GROUP BY 1, 2)
         SELECT DISTINCT doc_id, CAST(h AS BIGINT) AS h,
           CAST(pos AS BIGINT) AS pos
         FROM res ORDER BY doc_id, pos, h"""
    },
    // q310: the manifest re-derived outside Spark — same explicit line
    // construction and the 32-bit md5-prefix sum (strpos ladder)
    "q310_jsonl_export" -> {
      s"""WITH l AS (
           SELECT doc_id,
             '{"doc_id":' || CAST(doc_id AS VARCHAR) || ',"text":"' ||
               replace(replace(text, '\\', '\\\\'), '"', '\\"') || '"}'
               AS line,
             (${hv32Sql("shard:", "CAST(doc_id AS VARCHAR)")}) % 8 AS shard,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               x -> x <> '')) AS BIGINT) AS t,
             CAST(length(text) AS BIGINT) AS c
           FROM documents)
         SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(t) AS BIGINT) AS n_tokens,
           CAST(sum(c) AS BIGINT) AS n_chars,
           CAST(sum(${hv32Sql("", "line")}) AS BIGINT) AS fp32_sum
         FROM l GROUP BY 1 ORDER BY shard"""
    },
    // q309: within-bucket row_number replays rankWithinGroup; waste =
    // integer basis points of pad-to-max
    "q309_length_batching" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x <> '')) AS BIGINT) AS l
           FROM documents),
         b AS (
           SELECT doc_id, l, ((l + 15) // 16) * 16 AS bucket,
             md5('lbb:' || CAST(doc_id AS VARCHAR)) AS mk
           FROM d),
         r AS (
           SELECT bucket, l,
             (row_number() OVER (PARTITION BY bucket ORDER BY mk, doc_id)
               - 1) // 16 AS batch_idx
           FROM b),
         g AS (
           SELECT bucket, batch_idx, count(*) AS n_docs, max(l) AS max_len,
             sum(l) AS sum_len
           FROM r GROUP BY 1, 2)
         SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(batch_idx AS BIGINT) AS batch_idx,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(max_len AS BIGINT) AS max_len,
           CAST(sum_len AS BIGINT) AS sum_len,
           CAST(CASE WHEN max_len = 0 THEN 0
             ELSE 10000 * (n_docs * max_len - sum_len)
               // (n_docs * max_len) END AS BIGINT) AS pad_waste_bp
         FROM g ORDER BY bucket, batch_idx""",
    // q308: the capped replay slice is the corpus — counts, cuts and
    // buckets all derive from it
    "q308_charlm_stream" ->
      s"""WITH lmcap AS (
           SELECT doc_id, text, lang FROM documents
           ORDER BY md5('lmcap:' || CAST(doc_id AS VARCHAR)), doc_id
           LIMIT 2048),
         ${charLmTercilesCte("lmcap")}""",

    // Linear classifier: q74's bucket ladder, synthetic weight formula
    // inlined, bucket-ordered fold + bias, logit-space keep flag.
    "q136_classifier_filter" ->
      s"""WITH $ToksCte,
         f AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT)
               % 64 AS b
           FROM toks WHERE tok <> ''),
         dc AS (SELECT doc_id, b, count(*) AS c FROM f GROUP BY 1, 2),
         model AS (
           SELECT b, CAST((b * 37) % 21 - 10 AS DOUBLE) / 10.0 AS w
           FROM (SELECT unnest(generate_series(0, 63)) AS b)),
         agg AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list(struct_pack(b := b, c := c, w := w) ORDER BY b),
                 x -> x.c * x.w)), (a, y) -> a + y) + (-0.55) AS logit
           FROM dc JOIN model USING (b) GROUP BY 1)
         SELECT doc_id, n_feats, logit, logit > 0 AS keep
         FROM agg ORDER BY doc_id""",
    // Matryoshka: prefix-16 cosine shortlist (row_number <= 50), full-dim
    // exact rerank, final top-5 — both stages the exact (cos DESC, id)
    // ranking of the Spark aggregates.
    "q137_matryoshka_topk" ->
      """WITH n AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec,
             CAST(embedding[1:16] AS DOUBLE[]) AS pv
           FROM embeddings),
         nn AS (
           SELECT id, vec, pv, sqrt(list_dot_product(vec, vec)) AS nrm,
             sqrt(list_dot_product(pv, pv)) AS pnrm
           FROM n),
         qs AS (SELECT * FROM nn WHERE id % 50 = 0),
         s1 AS (
           SELECT q.id AS query_id, c.id AS neighbor_id,
             list_dot_product(q.pv, c.pv) / (q.pnrm * c.pnrm) AS pcos
           FROM qs q JOIN nn c ON q.id <> c.id),
         short AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY pcos DESC, neighbor_id) AS rn
             FROM s1)
           WHERE rn <= 50),
         s2 AS (
           SELECT s.query_id, s.neighbor_id,
             list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cos
           FROM short s JOIN nn q ON s.query_id = q.id
             JOIN nn c ON s.neighbor_id = c.id)
         SELECT query_id, neighbor_id, rank, cos FROM (
           SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS INT) AS rank
           FROM s2)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // Capstone: q136's classifier CTEs + q71's LM CTEs + ntile keep +
    // q125's chunk fan-out, aggregated per source.
    "q141_curation_capstone" ->
      s"""WITH $ToksCte,
         f AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT)
               % 64 AS b
           FROM toks WHERE tok <> ''),
         wdc AS (SELECT doc_id, b, count(*) AS c FROM f GROUP BY 1, 2),
         wmodel AS (
           SELECT b, CAST((b * 37) % 21 - 10 AS DOUBLE) / 10.0 AS w
           FROM (SELECT unnest(generate_series(0, 63)) AS b)),
         cls AS (
           SELECT doc_id FROM (
             SELECT doc_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(list(struct_pack(b := b, c := c, w := w) ORDER BY b),
                   x -> x.c * x.w)), (a, y) -> a + y) + (-0.55) AS logit
             FROM wdc JOIN wmodel USING (b) GROUP BY doc_id)
           WHERE logit > 0),
         norm AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z]+', ' ',
             'g')) AS s FROM documents),
         tri AS (
           SELECT doc_id, substring(s, i, 3) AS tri FROM (
             SELECT doc_id, s,
               unnest(generate_series(1, greatest(length(s) - 2, 0))) AS i
             FROM norm)),
         c3 AS (SELECT tri, count(*) AS c3 FROM tri GROUP BY 1),
         c2 AS (SELECT substring(tri, 1, 2) AS pre, sum(c3) AS c2
                FROM c3 GROUP BY 1),
         pmodel AS (
           SELECT tri, CAST(c3 + 1 AS DOUBLE) / (CAST(c2 AS DOUBLE) + 27) AS p
           FROM c3 JOIN c2 ON substring(c3.tri, 1, 2) = c2.pre),
         dt AS (SELECT doc_id, tri, count(*) AS c FROM tri GROUP BY 1, 2),
         lmagg AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(
                 list(struct_pack(tri := tri, c := c, p := p) ORDER BY tri),
                 x -> x.c * x.p)), (a, b) -> a + b) AS sum_p
           FROM dt JOIN pmodel USING (tri) GROUP BY 1),
         scored AS (
           SELECT d.doc_id, d.lang, d.source, lmagg.sum_p / lmagg.n_trigrams AS mean_p
           FROM documents d JOIN lmagg USING (doc_id) JOIN cls USING (doc_id)
           WHERE lmagg.n_trigrams > 0),
         cuts AS (
           SELECT lang, quantile_cont(mean_p, CAST(1 AS DOUBLE) / 3) AS c13
           FROM scored GROUP BY 1),
         keep AS (
           SELECT doc_id, source FROM scored JOIN cuts USING (lang)
           WHERE mean_p >= c13),
         ids AS (
           SELECT t.doc_id, t.pos,
             unnest(generate_series(
               CAST(greatest(0, t.pos - 64 + 48) // 48 AS BIGINT),
               CAST(t.pos // 48 AS BIGINT))) AS chunk_id
           FROM toks t JOIN keep USING (doc_id)),
         ch AS (
           SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n
           FROM ids GROUP BY 1, 2)
         SELECT k.source, CAST(count(DISTINCT ch.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(ch.n) AS BIGINT) AS n_tokens
         FROM ch JOIN keep k USING (doc_id)
         GROUP BY 1 ORDER BY 1""",
    // Incremental dedup: batch-2 keepers resolve to batch-1's where the
    // digest was already seen — storage is answer-invisible, the oracle
    // recomputes pure two-batch semantics.
    "q142_incremental_dedup" -> {
      val split = md5Ladder32("'inc:' || CAST(doc_id AS VARCHAR)")
      s"""WITH corpus AS (
           SELECT d.doc_id,
             CASE WHEN d.doc_id % 7 = 3 AND s.text IS NOT NULL
               THEN s.text ELSE d.text END AS text
           FROM documents d LEFT JOIN documents s ON s.doc_id = d.doc_id - 3),
         sp AS (
           SELECT doc_id, text, CAST(($split) % 2 AS BIGINT) AS split
           FROM corpus),
         b1 AS (
           SELECT md5(lower(trim(text))) AS digest,
             CAST(min(doc_id) AS BIGINT) AS keeper
           FROM sp WHERE split = 0 GROUP BY 1),
         b2 AS (
           SELECT md5(lower(trim(text))) AS digest,
             CAST(min(doc_id) AS BIGINT) AS keeper2,
             CAST(count(*) AS BIGINT) AS batch_copies
           FROM sp WHERE split = 1 GROUP BY 1)
         SELECT b2.digest, b2.batch_copies,
           coalesce(b1.keeper, b2.keeper2) AS keeper
         FROM b2 LEFT JOIN b1 USING (digest) ORDER BY digest"""
    },
    // Token-budget fill: running sums over the md5 admission order.
    "q143_token_budget" -> {
      val mk = "md5('budget:' || CAST(doc_id AS VARCHAR))"
      s"""WITH d AS (
           SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_toks,
             $mk AS mk
           FROM documents),
         c AS (
           SELECT doc_id, source, n_toks,
             CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY mk, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
           FROM d)
         SELECT doc_id, source, n_toks, cum_toks
         FROM c WHERE cum_toks - n_toks < 800 ORDER BY doc_id"""
    },
    // Containment: per-doc min-64 sketches over the quote-injected
    // corpus, per-pair union-X estimator in the exact Spark op order.
    "q147_containment" -> {
      val ladder = md5Ladder52("shingle")
      s"""WITH corpus AS (
           SELECT d.doc_id, CASE WHEN d.doc_id % 4 = 1 AND p.text IS NOT NULL
             THEN p.text || ' ' || d.text ELSE d.text END AS text
           FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1),
         toks AS (
           SELECT doc_id,
             unnest(generate_series(0, len(regexp_split_to_array(trim(text), '\\s+')) - 1)) AS pos,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
           FROM corpus),
         led AS (
           SELECT doc_id, tok,
             lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
             lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
           FROM toks),
         sh AS (
           SELECT DISTINCT doc_id, tok || ' ' || t2 || ' ' || t3 AS shingle
           FROM led WHERE t3 IS NOT NULL),
         hv AS (SELECT DISTINCT doc_id, CAST($ladder AS BIGINT) AS h FROM sh),
         mins AS (
           SELECT doc_id, h FROM hv
           QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h) <= 64),
         pairs AS (
           SELECT d.doc_id AS id1, d.doc_id + 1 AS id2
           FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 1
           WHERE d.doc_id % 4 = 0),
         xa AS (SELECT p.id1, p.id2, m.h FROM pairs p JOIN mins m ON m.doc_id = p.id1),
         xb AS (SELECT p.id1, p.id2, m.h FROM pairs p JOIN mins m ON m.doc_id = p.id2),
         ux AS (SELECT DISTINCT id1, id2, h FROM
           (SELECT * FROM xa UNION ALL SELECT * FROM xb)),
         x AS (SELECT id1, id2, h FROM ux
           QUALIFY row_number() OVER (PARTITION BY id1, id2 ORDER BY h) <= 64),
         yc AS (
           SELECT x.id1, x.id2, CAST(count(*) AS BIGINT) AS y FROM x
           JOIN xa ON xa.id1 = x.id1 AND xa.id2 = x.id2 AND xa.h = x.h
           JOIN xb ON xb.id1 = x.id1 AND xb.id2 = x.id2 AND xb.h = x.h
           GROUP BY 1, 2),
         sa AS (SELECT id1, id2, CAST(count(*) AS BIGINT) AS n_a, max(h) AS ka
                FROM xa GROUP BY 1, 2),
         sb AS (SELECT DISTINCT id1, id2 FROM xb),
         sx AS (SELECT id1, id2, CAST(count(*) AS BIGINT) AS kx, max(h) AS kxh
                FROM x GROUP BY 1, 2)
         SELECT sa.id1, sa.id2, sa.n_a, sx.kx,
           CAST(coalesce(yc.y, 0) AS BIGINT) AS y,
           CASE WHEN sa.n_a < 64 THEN CAST(sa.n_a AS DOUBLE)
             ELSE CAST(63 AS DOUBLE) * 4503599627370496.0 / CAST(sa.ka AS DOUBLE)
             END AS est_a,
           CASE WHEN sx.kx < 64 THEN CAST(sx.kx AS DOUBLE)
             ELSE CAST(63 AS DOUBLE) * 4503599627370496.0 / CAST(sx.kxh AS DOUBLE)
             END AS est_union,
           CAST(coalesce(yc.y, 0) AS DOUBLE) / CAST(sx.kx AS DOUBLE) AS jaccard_est,
           (CAST(coalesce(yc.y, 0) AS DOUBLE) / CAST(sx.kx AS DOUBLE)) *
             (CASE WHEN sx.kx < 64 THEN CAST(sx.kx AS DOUBLE)
               ELSE CAST(63 AS DOUBLE) * 4503599627370496.0 / CAST(sx.kxh AS DOUBLE)
               END) /
             (CASE WHEN sa.n_a < 64 THEN CAST(sa.n_a AS DOUBLE)
               ELSE CAST(63 AS DOUBLE) * 4503599627370496.0 / CAST(sa.ka AS DOUBLE)
               END) AS containment_est
         FROM sa JOIN sx USING (id1, id2) JOIN sb USING (id1, id2)
         LEFT JOIN yc USING (id1, id2) ORDER BY id1"""
    },
    "q148_blocklist" ->
      s"""WITH $ToksCte
         SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN lower(tok) IN ('slow', 'big', 'merge')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
           sum(CASE WHEN lower(tok) IN ('slow', 'big', 'merge')
             THEN 1 ELSE 0 END) > 0 AS blocked
         FROM toks GROUP BY 1 ORDER BY 1""",
    // PPR: 3 unrolled rounds, teleport pinned to the seed set in the
    // exact integer op order of Graph.pageRankPersonalized.
    "q158_ppr" -> {
      val iter = (prev: String, out: String) =>
        s"""c_$out AS (
             SELECT e.dst AS node, sum(r.rank // o.outdeg) AS inflow
             FROM $prev r JOIN outdeg o ON r.node = o.src
               JOIN edges e ON e.src = o.src
             GROUP BY 1),
           $out AS (
             SELECT n.node,
               (CASE WHEN n.node IN (0, 7, 21)
                 THEN (1000000000000 // 100) * 15 // 3 ELSE 0 END) +
                 (COALESCE(c.inflow, 0) * 85) // 100 AS rank
             FROM nodes n LEFT JOIN c_$out c ON n.node = c.node)"""
      s"""WITH edges AS (
           SELECT DISTINCT CAST(user_id AS BIGINT) AS src,
             CAST(event_id % 97 AS BIGINT) AS dst
           FROM events),
         nodes AS (
           SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         r0 AS (
           SELECT node, CASE WHEN node IN (0, 7, 21)
             THEN 1000000000000 // 3 ELSE 0 END AS rank
           FROM nodes),
         ${iter("r0", "r1")},
         ${iter("r1", "r2")},
         ${iter("r2", "r3")}
         SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY node"""
    },
    // Windowed KMV: q81's ladder and estimate formula, partitioned by the
    // hour bucket.
    "q159_window_distinct" -> {
      val ladder = md5Ladder52("u")
      s"""WITH ev AS (
           SELECT (epoch_ns(ts)//1000000000) -
               ((epoch_ns(ts)//1000000000) % 3600) AS hr,
             CAST(user_id AS VARCHAR) AS u
           FROM events),
         hv AS (
           SELECT DISTINCT hr, CAST($ladder AS BIGINT) AS h FROM ev),
         mins AS (
           SELECT hr, h FROM hv
           QUALIFY row_number() OVER (PARTITION BY hr ORDER BY h) <= 64),
         agg AS (
           SELECT hr, CAST(count(*) AS BIGINT) AS n_minima, max(h) AS kth
           FROM mins GROUP BY 1),
         ex AS (
           SELECT hr, CAST(count(DISTINCT u) AS BIGINT) AS exact_distinct
           FROM ev GROUP BY 1)
         SELECT agg.hr, agg.n_minima,
           CASE WHEN agg.n_minima < 64 THEN CAST(agg.n_minima AS DOUBLE)
             ELSE CAST(63 AS DOUBLE) * 4503599627370496.0 / CAST(agg.kth AS DOUBLE)
             END AS est_distinct,
           ex.exact_distinct
         FROM agg JOIN ex USING (hr) ORDER BY hr"""
    },
    // KMV overlap: min-256 sketches per side, union-X Jaccard estimator,
    // the exact double arithmetic of kmvOverlapEstimate.
    // Mixture capstone: q88's rate CTEs sample, q143's per-source cum
    // admits, q70's shard window packs — composed verbatim.
    "q184_mixture_capstone" -> {
      val ladder = md5Ladder32("'smp:' || CAST(doc_id AS VARCHAR)")
      s"""WITH counts AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
         w AS (
           SELECT source, n_docs,
             sqrt(sqrt(CAST(n_docs AS DOUBLE))) AS weight
           FROM counts),
         tot AS (
           SELECT
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(weight ORDER BY source NULLS FIRST)),
               (a, b) -> a + b) AS sum_w,
             CAST(sum(n_docs) AS BIGINT) AS n_total
           FROM w),
         rates AS (
           SELECT source,
             least(1.0, weight / sum_w * CAST(n_total AS DOUBLE)
               / CAST(n_docs AS DOUBLE)) AS rate
           FROM w CROSS JOIN tot),
         smp AS (
           SELECT doc_id, d.source AS source FROM (
             SELECT doc_id, source,
               CAST($ladder AS BIGINT) AS hv
             FROM documents) d
           JOIN rates r ON d.source IS NOT DISTINCT FROM r.source
           WHERE CAST(d.hv % 1000000 AS DOUBLE) < 1000000.0 * r.rate),
         bd AS (
           SELECT s.doc_id, s.source,
             CAST(len(regexp_split_to_array(trim(doc.text), '\\s+')) AS BIGINT)
               AS n_toks,
             md5('budget:' || CAST(s.doc_id AS VARCHAR)) AS mk
           FROM smp s JOIN documents doc USING (doc_id)),
         cum AS (
           SELECT doc_id, n_toks,
             CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY mk, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
           FROM bd),
         adm AS (SELECT doc_id FROM cum WHERE cum_toks - n_toks < 600),
         t AS (
           SELECT d.doc_id, d.doc_id % 8 AS shard,
             CAST(len(list_filter(string_split_regex(trim(d.text), '\\s+'),
               x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents d JOIN adm USING (doc_id)),
         c AS (
           SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS tok_offset
           FROM t)
         SELECT shard, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(max(tok_offset // 512) + 1 AS BIGINT) AS n_bins
         FROM c GROUP BY 1 ORDER BY 1"""
    },
    // BPE training: three unrolled merge steps, each = pair-count argmax
    // over the evolving vocab + the run-parity greedy merge windows the
    // Spark op runs (greedy left-to-right ≡ take-every-second within an
    // occurrence run; non-equal pairs never overlap).
    "q187_bpe_train" ->
      s"""WITH $ToksCte,
         $BpeV0Cte,
         ${bpeStepCte("v0", 1)},
         ${bpeStepCte("v1", 2)},
         ${bpeStepCte("v2", 3)}
         SELECT step, l AS "left", r AS "right", cnt AS pair_freq FROM (
           SELECT CAST(1 AS INT) AS step, l, r, cnt FROM m1
           UNION ALL SELECT 2, l, r, cnt FROM m2
           UNION ALL SELECT 3, l, r, cnt FROM m3)
         ORDER BY step""",
    // q268: per-doc adjacency, three aggregates, integer KN pieces.
    "q268_bigram_kn" ->
      s"""WITH $ToksCte,
         nn AS (SELECT doc_id, pos, tok FROM toks WHERE tok <> ''),
         bi AS (
           -- positions are dense after the ''-filter (the regex split of
           -- trimmed text never yields interior empties), so the
           -- successor is pos + 1 — same adjacency Spark's lead() sees
           SELECT a.tok AS w1, b.tok AS w2
           FROM nn a JOIN nn b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         cts AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
                 FROM bi GROUP BY 1, 2),
         cr AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont_right
                FROM cts GROUP BY 1),
         cl AS (SELECT w1, CAST(count(*) AS BIGINT) AS cont_left
                FROM cts GROUP BY 1),
         top AS (SELECT * FROM cts ORDER BY c DESC, w1, w2 LIMIT 50)
         SELECT t.w1, t.w2, t.c, cl.cont_left, cr.cont_right,
           greatest(t.c * 4 - 3, 0) AS disc_num4
         FROM top t JOIN cr USING (w2) JOIN cl USING (w1)
         ORDER BY t.c DESC, t.w1, t.w2""",
    // q267: one md5-minimal span per 20-token block, clipped at block
    // and doc end; counts + integer basis points.
    "q267_span_corruption" ->
      s"""WITH $ToksCte,
         mk AS (
           SELECT doc_id, pos,
             md5('mask:' || CAST(doc_id AS VARCHAR) || ':' ||
               CAST(pos AS VARCHAR)) AS mkh,
             pos // 20 AS blk
           FROM toks WHERE tok <> ''),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
                FROM mk GROUP BY 1),
         st AS (
           SELECT doc_id, blk, min(mkh) AS mkh FROM mk GROUP BY 1, 2),
         sp AS (
           SELECT m.doc_id, m.blk, m.pos, s2.n_tokens
           FROM st JOIN mk m ON st.doc_id = m.doc_id AND st.blk = m.blk
             AND st.mkh = m.mkh
           JOIN sz s2 ON s2.doc_id = m.doc_id),
         msk AS (
           SELECT doc_id, blk,
             unnest(generate_series(pos,
               least(pos + 2, (blk + 1) * 20 - 1, n_tokens - 1))) AS mp
           FROM sp),
         agg AS (
           SELECT doc_id, CAST(count(DISTINCT blk) AS BIGINT) AS n_spans,
             CAST(count(*) AS BIGINT) AS n_masked
           FROM msk GROUP BY 1)
         SELECT s.doc_id, s.n_tokens,
           CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(a.n_masked, 0) AS BIGINT) AS n_masked,
           (COALESCE(a.n_masked, 0) * 10000) // s.n_tokens AS mask_bp
         FROM sz s LEFT JOIN agg a USING (doc_id)
         ORDER BY s.doc_id""",
    // q266: global cumsum in doc order, integer-div sequence indices.
    "q266_pack_sequences" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_toks
           FROM documents),
         nz AS (SELECT * FROM d WHERE n_toks > 0),
         c AS (
           SELECT doc_id, n_toks,
             CAST(COALESCE(sum(n_toks) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
           FROM nz)
         SELECT doc_id, n_toks, cum_before,
           cum_before // 512 AS start_seq,
           (cum_before + n_toks - 1) // 512 AS end_seq,
           ((cum_before + n_toks - 1) // 512) > (cum_before // 512) AS crosses
         FROM c ORDER BY doc_id""",
    // q265: the closed-form merge table of the crafted corpus (word_i =
    // letter_i × 4, freq_i = 100 − i): rounds 1-2 merge every (x, x) at
    // 3·freq descending, rounds 3-4 merge every (xx, xx) at freq
    // descending — which is also exactly what sequential greedy emits.
    "q265_bpe_batched" ->
      """WITH l AS (
           SELECT i, chr(CAST(97 + i AS INT)) AS ch
           FROM (SELECT unnest(generate_series(0, 15)) AS i))
         SELECT step, lft AS "left", rgt AS "right", pair_freq FROM (
           SELECT CAST(i + 1 AS INT) AS step, ch AS lft, ch AS rgt,
             CAST(3 * (100 - i) AS BIGINT) AS pair_freq FROM l
           UNION ALL
           SELECT CAST(i + 17 AS INT), ch || ch, ch || ch,
             CAST(100 - i AS BIGINT) FROM l)
         ORDER BY step""",
    // BPE encode: the q187 chain's FINAL vocab joined back to corpus
    // tokens — per-doc word and piece counts.
    // q323: train chain on the even-doc vocab emits m1..m3; the apply
    // chain replays them over the FULL-corpus vocab (a0 → v11 → v12 →
    // v13); OOV = corpus words absent from the train token set
    "q323_bpe_apply" ->
      s"""WITH mods AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 1
               THEN text || ' oovword' || CAST(doc_id AS VARCHAR)
               ELSE text END AS text
           FROM documents),
         toks AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
           FROM mods),
         ttoks AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
         tv0 AS (
           SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq,
             list_transform(generate_series(1, length(tok)),
               i -> substring(tok, i, 1)) AS toks
           FROM ttoks WHERE tok <> '' GROUP BY 1),
         ${bpeStepCte("tv0", 1)},
         ${bpeStepCte("v1", 2)},
         ${bpeStepCte("v2", 3)},
         a0 AS (
           SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq,
             list_transform(generate_series(1, length(tok)),
               i -> substring(tok, i, 1)) AS toks
           FROM toks WHERE tok <> '' GROUP BY 1),
         ${bpeApplyStepCte("a0", "m1", 11)},
         ${bpeApplyStepCte("v11", "m2", 12)},
         ${bpeApplyStepCte("v12", "m3", 13)},
         tw AS (SELECT DISTINCT tok FROM ttoks WHERE tok <> '')
         SELECT t.doc_id, count(*) AS n_words,
           CAST(sum(len(v.toks)) AS BIGINT) AS n_pieces,
           CAST(sum(CASE WHEN tw.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov_words
         FROM toks t
         JOIN v13 v ON t.tok = v.word
         LEFT JOIN tw ON t.tok = tw.tok
         WHERE t.tok <> ''
         GROUP BY 1 ORDER BY 1""",
    "q188_bpe_tokens" ->
      s"""WITH $ToksCte,
         $BpeV0Cte,
         ${bpeStepCte("v0", 1)},
         ${bpeStepCte("v1", 2)},
         ${bpeStepCte("v2", 3)}
         SELECT t.doc_id, count(*) AS n_words,
           CAST(sum(len(v.toks)) AS BIGINT) AS n_bpe_tokens
         FROM toks t JOIN v3 v ON t.tok = v.word
         WHERE t.tok <> ''
         GROUP BY 1 ORDER BY 1""",
    // Median + MAD via two quantile_cont passes, then the 3-MAD count.
    "q180_robust_outliers" ->
      """WITH med AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             quantile_cont(n_chars, 0.5) AS med
           FROM documents GROUP BY 1),
         mad AS (
           SELECT d.source,
             quantile_cont(abs(CAST(d.n_chars AS DOUBLE) - m.med), 0.5) AS mad
           FROM documents d JOIN med m USING (source) GROUP BY 1)
         SELECT d.source, m.n_docs, m.med, a.mad,
           CAST(sum(CASE WHEN abs(CAST(d.n_chars AS DOUBLE) - m.med)
             > 3.0 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM documents d JOIN med m USING (source) JOIN mad a ON d.source = a.source
         GROUP BY 1, 2, 3, 4 ORDER BY d.source""",
    // Interval union via lag/cummax: same window chain, exact longs.
    "q181_interval_coverage" ->
      """WITH iv AS (
           SELECT user_id, (epoch_ns(ts)//1000000000) AS lo,
             (epoch_ns(ts)//1000000000) + 900 AS hi
           FROM events),
         mk AS (
           SELECT user_id, lo, hi,
             max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
           FROM iv),
         grp AS (
           SELECT user_id, lo, hi,
             sum(CASE WHEN pmax IS NULL OR lo > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY lo, hi
                 ROWS UNBOUNDED PRECEDING) AS g
           FROM mk),
         m AS (
           SELECT user_id, g, min(lo) AS m_lo, max(hi) AS m_hi
           FROM grp GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_intervals,
           CAST(sum(m_hi - m_lo) AS BIGINT) AS covered_sec
         FROM m GROUP BY 1 ORDER BY 1""",
    // ROLLUP grouping sets with fixed-point micro sums.
    "q182_rollup_sets" ->
      """SELECT event_type, user_id % 10 AS user_mod,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_micro
         FROM events
         GROUP BY ROLLUP (event_type, user_mod)
         ORDER BY event_type NULLS FIRST, user_mod NULLS FIRST""",
    // CDC boundaries: salted 32-bit ladder % 16 == 0 AFTER a token ends
    // its chunk; chunk id = boundary count over strictly-earlier
    // positions; digest over the in-order rejoined tokens.
    "q178_cdc_chunks" -> {
      val ladder = md5Ladder32("'cdc:' || tok")
      s"""WITH $ToksCte,
         tk AS (
           SELECT doc_id, pos, tok,
             CASE WHEN ($ladder) % 16 = 0 THEN 1 ELSE 0 END AS b
           FROM toks WHERE tok <> ''),
         ck AS (
           SELECT doc_id, pos, tok,
             COALESCE(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk_id
           FROM tk),
         ch AS (
           SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             count(*) AS n_toks,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_digest
           FROM ck GROUP BY 1, 2),
         cp AS (
           SELECT chunk_digest, count(*) AS n_copies FROM ch GROUP BY 1)
         SELECT doc_id, chunk_id, n_toks, ch.chunk_digest, n_copies
         FROM ch JOIN cp USING (chunk_digest)
         ORDER BY doc_id, chunk_id"""
    },
    // Per-source min-k sketches in SQL (PARTITION BY source row_number),
    // then q144's estimate arithmetic per pair over list-valued sketches.
    "q170_source_overlap" -> {
      val ladder = md5Ladder52("tok")
      s"""WITH $ToksCte,
         dh AS (
           SELECT DISTINCT source, CAST($ladder AS BIGINT) AS h
           FROM toks JOIN documents USING (doc_id)
           WHERE tok <> ''),
         mk AS (
           SELECT source, h FROM dh
           QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 256),
         sk AS (
           SELECT source, list(h ORDER BY h) AS minima FROM mk GROUP BY 1),
         p AS (
           SELECT a.source AS source_a, b.source AS source_b,
             a.minima AS ma, b.minima AS mb
           FROM sk a JOIN sk b ON a.source < b.source),
         c AS (
           SELECT source_a, source_b,
             CAST(len(ma) AS BIGINT) AS n_a, CAST(len(mb) AS BIGINT) AS n_b,
             list_sort(list_distinct(list_concat(ma, mb)))[1:256] AS x,
             ma, mb
           FROM p),
         e AS (
           SELECT source_a, source_b, n_a, n_b,
             CAST(len(x) AS BIGINT) AS kx,
             CAST(len(list_intersect(list_intersect(x, ma), mb)) AS BIGINT) AS y,
             CASE WHEN len(x) < 256 THEN CAST(len(x) AS DOUBLE)
               ELSE CAST(255 AS DOUBLE) * 4503599627370496.0 /
                 CAST(x[256] AS DOUBLE) END AS union_est
           FROM c)
         SELECT source_a, source_b, n_a, n_b, kx, y, union_est,
           CASE WHEN kx > 0 THEN CAST(y AS DOUBLE) / CAST(kx AS DOUBLE) END
             AS jaccard_est,
           (CASE WHEN kx > 0 THEN CAST(y AS DOUBLE) / CAST(kx AS DOUBLE) END)
             * union_est AS inter_est
         FROM e ORDER BY source_a, source_b"""
    },
    "q144_sketch_overlap" -> {
      val ladder = md5Ladder52("shingle")
      s"""WITH $ShinglesCte,
         ha AS (
           SELECT DISTINCT CAST($ladder AS BIGINT) AS h
           FROM sh WHERE doc_id % 3 <> 0),
         hb AS (
           SELECT DISTINCT CAST($ladder AS BIGINT) AS h
           FROM sh WHERE doc_id % 2 = 0),
         ma AS (SELECT h FROM ha QUALIFY row_number() OVER (ORDER BY h) <= 256),
         mb AS (SELECT h FROM hb QUALIFY row_number() OVER (ORDER BY h) <= 256),
         ux AS (SELECT DISTINCT h FROM (SELECT h FROM ma UNION ALL SELECT h FROM mb)),
         x AS (SELECT h FROM ux QUALIFY row_number() OVER (ORDER BY h) <= 256),
         c AS (
           SELECT
             (SELECT CAST(count(*) AS BIGINT) FROM ma) AS n_a,
             (SELECT CAST(count(*) AS BIGINT) FROM mb) AS n_b,
             (SELECT CAST(count(*) AS BIGINT) FROM x) AS kx,
             (SELECT CAST(count(*) AS BIGINT) FROM x
               WHERE h IN (SELECT h FROM ma) AND h IN (SELECT h FROM mb)) AS y,
             (SELECT max(h) FROM x) AS kth)
         SELECT n_a, n_b, kx, y,
           CAST(y AS DOUBLE) / CAST(kx AS DOUBLE) AS jaccard_est,
           CASE WHEN kx < 256 THEN CAST(kx AS DOUBLE)
             ELSE CAST(255 AS DOUBLE) * 4503599627370496.0 / CAST(kth AS DOUBLE)
             END AS union_est,
           (CAST(y AS DOUBLE) / CAST(kx AS DOUBLE)) *
             (CASE WHEN kx < 256 THEN CAST(kx AS DOUBLE)
               ELSE CAST(255 AS DOUBLE) * 4503599627370496.0 / CAST(kth AS DOUBLE)
               END) AS inter_est
         FROM c"""
    },
    "q30_quality" ->
      s"""WITH $ToksCte
         SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN tok IN ('the','a','an','of','to','and','in','is','it','for')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
           CAST(sum(length(tok)) AS DOUBLE) / count(*) AS avg_token_len,
           CAST(sum(CASE WHEN tok IN ('the','a','an','of','to','and','in','is','it','for')
             THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS stopword_ratio
         FROM toks GROUP BY 1 ORDER BY 1""",
    "q31_langid" ->
      s"""WITH $ToksCte,
         hits AS (
           SELECT doc_id,
             sum(CASE WHEN tok IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS n_en,
             sum(CASE WHEN tok IN ('el','la','de','que','y','los') THEN 1 ELSE 0 END) AS n_es
           FROM toks GROUP BY 1)
         SELECT doc_id,
           CASE WHEN n_en >= n_es AND n_en > 0 THEN 'en'
                WHEN n_es > 0 THEN 'es' ELSE 'und' END AS lang_pred
         FROM hits ORDER BY 1""",
    "q32_token_hist" ->
      s"""WITH $ToksCte
         SELECT tok, count(*) AS freq FROM toks GROUP BY 1
         ORDER BY freq DESC, tok LIMIT 50""",
    "q33_doc_fingerprint" ->
      s"""WITH $ToksCte
         SELECT doc_id,
           CAST(sum((pos + 1) * (ascii(tok) * 31 + length(tok))) AS BIGINT) AS fingerprint
         FROM toks GROUP BY 1 ORDER BY 1""",
    "q34_ann_buckets" ->
      """SELECT vec_id, label,
           CAST(sum(CASE WHEN embedding[2*b + 1] > embedding[2*b + 2]
             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
         FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) bs
         GROUP BY 1, 2 ORDER BY 1""",
    // Float-exact cosine: elements cast float→double (exact), products exact
    // (24+24-bit mantissas), sequential in-order accumulation — verified
    // bit-identical between DuckDB list_dot_product and a sequential fold.
    "q35_ann_topk" ->
      """WITH scored AS (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
               AS cos
           FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS INT) AS rank
           FROM scored)
         SELECT query_id, neighbor_id, rank, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "q36_bucketed_neighbors" ->
      """WITH bs AS (SELECT unnest(generate_series(0, 7)) AS b),
         bk AS (
           SELECT vec_id,
             CAST(sum(CASE WHEN embedding[2*b + 1] > embedding[2*b + 2]
               THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
           FROM embeddings CROSS JOIN bs GROUP BY 1),
         pairs AS (
           SELECT x.bucket, x.vec_id AS id1, y.vec_id AS id2
           FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
         scored AS (
           SELECT p.bucket, p.id1, p.id2,
             list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
               AS cos
           FROM pairs p
           JOIN embeddings a ON a.vec_id = p.id1
           JOIN embeddings b ON b.vec_id = p.id2)
         SELECT bucket, id1, id2, cos FROM scored
         WHERE cos >= 0.2 ORDER BY bucket, id1, id2""",
    "q37_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest,
           hex(encode(substr(text, 1, 4))) AS magic
         FROM documents ORDER BY doc_id""",
    "q41_regex_tokens" ->
      """WITH toks AS (
           SELECT unnest(regexp_extract_all(props, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS tok
           FROM events)
         SELECT tok, count(*) AS freq FROM toks GROUP BY 1
         ORDER BY freq DESC, tok LIMIT 30""",
    "q42_corpus_filter" ->
      s"""WITH $ToksCte,
         q AS (
           SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN tok IN ('the','a','an','of','to','and','in','is','it','for')
               THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS stopword_ratio
           FROM toks GROUP BY 1),
         l AS (
           SELECT doc_id,
             sum(CASE WHEN tok IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS n_en,
             sum(CASE WHEN tok IN ('el','la','de','que','y','los') THEN 1 ELSE 0 END) AS n_es
           FROM toks GROUP BY 1),
         keepers AS (
           SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(lower(trim(text))))
         SELECT q.doc_id, q.n_tokens
         FROM q
         JOIN l ON l.doc_id = q.doc_id
         JOIN keepers k ON k.doc_id = q.doc_id
         WHERE q.n_tokens >= 30 AND q.stopword_ratio <= 0.4
           AND l.n_en >= l.n_es AND l.n_en > 0
         ORDER BY q.doc_id""",
    // q38: the Spark side synthesizes real PNG/JPEG/GIF/AVI containers from
    // (doc_id, n_chars) and parses dimensions back with the real
    // header parser (Multimodal.parseMedia). The oracle recomputes the
    // fixture dimensions arithmetically (Multimodal.mediaFixture scaladoc),
    // so the gate proves parse ∘ synthesize = identity: a wrong offset or
    // endianness in the parser hash-mismatches. Ground-truth byte anchoring
    // (a genuine 1×1 PNG etc.) lives in MultimodalSpec.
    "q38_multimodal_decode" ->
      """WITH dims AS (
           SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 1 + n_chars % 1000
               WHEN 1 THEN 1 + n_chars % 1000
               WHEN 2 THEN 1 + n_chars % 500
               ELSE 16 + n_chars % 1920 END AS w,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 1 + (doc_id * 7) % 1000
               WHEN 1 THEN 1 + (doc_id * 7) % 1000
               WHEN 2 THEN 1 + (doc_id * 3) % 500
               ELSE 16 + (doc_id * 5) % 1080 END AS h
           FROM documents),
         scaled AS (
           SELECT doc_id, w, h,
             least(CAST(1.0 AS DOUBLE), CAST(256.0 AS DOUBLE) / greatest(w, h)) AS scale
           FROM dims)
         SELECT doc_id AS id,
           greatest(1, CAST(trunc(w * scale) AS INT)) AS thumb_w,
           greatest(1, CAST(trunc(h * scale) AS INT)) AS thumb_h
         FROM scaled ORDER BY id""",
    // q118: the WAV fixture derives every field from (doc_id, n_chars),
    // so the oracle recomputes them arithmetically — the Spark side must
    // read the SAME numbers back out of real chunk bytes.
    "q118_wav_decode" ->
      """SELECT doc_id AS id, 'wav' AS format,
           CAST(8000 + (n_chars % 8) * 1000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(1 + doc_id % 480 AS INT) AS frames
         FROM documents ORDER BY id""",
    // q127: the oracle recomputes the fixture arithmetic (srIdx→rate
    // table, parity→mode, frame count); the parser recovered them from
    // real MPEG header bytes + frame-length hops.
    "q192_webp_decode" ->
      """SELECT doc_id AS id, 'webp' AS format,
           CAST(1 + n_chars % 4096 AS INT) AS width,
           CAST(1 + (doc_id * 17) % 2160 AS INT) AS height
         FROM documents ORDER BY id""",
    "q214_ogg_decode" ->
      """SELECT doc_id AS id, 'ogg' AS format,
           CAST(8000 + (n_chars % 6) * 6000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(200 + (doc_id * 31) % 90000 AS INT) AS total_samples
         FROM documents ORDER BY id""",
    "q231_aiff_decode" ->
      """SELECT doc_id AS id, 'aiff' AS format,
           CAST(11025 * (1 + n_chars % 4) AS INT) AS sample_rate,
           CAST(1 + doc_id % 6 AS INT) AS channels,
           CAST(100 + (doc_id * 17) % 5000 AS INT) AS n_frames
         FROM documents ORDER BY id""",
    "q179_mp4_decode" ->
      """SELECT doc_id AS id, 'mp4' AS format,
           CAST(16 + n_chars % 1920 AS INT) AS width,
           CAST(16 + (doc_id * 9) % 1080 AS INT) AS height,
           CAST(1 + doc_id % 240 AS INT) AS duration_ts
         FROM documents ORDER BY id""",
    "q127_mp3_decode" ->
      """SELECT doc_id AS id, 'mp3' AS format,
           CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
             ELSE 32000 END AS INT) AS sample_rate,
           CAST(CASE WHEN n_chars % 2 = 0 THEN 2 ELSE 1 END AS INT) AS channels,
           CAST(1 + doc_id % 24 AS INT) AS frames
         FROM documents ORDER BY id""",
    "q128_bmp_decode" ->
      """SELECT doc_id AS id, 'bmp' AS format,
           CAST(1 + n_chars % 2000 AS INT) AS width,
           CAST(1 + (doc_id * 11) % 1200 AS INT) AS height,
           CAST(1 AS INT) AS frames
         FROM documents ORDER BY id""",
    "q139_flac_decode" ->
      """SELECT doc_id AS id, 'flac' AS format,
           CAST(16000 + (n_chars % 5) * 8000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 8 AS INT) AS channels,
           CAST(100 + doc_id % 1000 AS INT) AS total_samples
         FROM documents ORDER BY id""",
    "q140_tiff_decode" ->
      """SELECT doc_id AS id, 'tiff' AS format,
           CAST(1 + n_chars % 4000 AS INT) AS width,
           CAST(1 + (doc_id * 13) % 3000 AS INT) AS height,
           CAST(1 AS INT) AS frames
         FROM documents ORDER BY id""",
    // q60: frame counts come from the AVI avih dwTotalFrames field the
    // fixture wrote (doc_id%4==3); still images decode to 1 frame.
    "q60_frame_sample" ->
      """WITH fr AS (
           SELECT doc_id,
             CASE WHEN doc_id % 4 = 3 THEN CAST(1 + doc_id % 120 AS INT)
                  ELSE 1 END AS frames
           FROM documents)
         SELECT doc_id AS id, frames,
           CAST(len(generate_series(0, frames - 1, 4)) AS INT) AS n_sampled,
           array_to_string(generate_series(0, frames - 1, 4), ',') AS idx_str
         FROM fr ORDER BY id""",
    "q51_ann_gaussian" -> gaussianOracle,
    // true component labels via transitive closure (UNION-deduped
    // recursive CTE) — the fixpoint is iteration-order independent, so it
    // equals the Spark min-label loop's result exactly.
    "q61_neardup_components" ->
      s"""WITH $NearDupReachCte
         SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS keeper
         FROM reach GROUP BY 1 ORDER BY 1""",
    // star contraction computes the SAME component minima as the
    // min-label fixpoint — one transitive-closure oracle gates both
    "q113_components_star" ->
      s"""WITH $NearDupReachCte
         SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS keeper
         FROM reach GROUP BY 1 ORDER BY 1""",
    "q86_cluster_rep" ->
      s"""WITH $NearDupReachCte,
         comp AS (
           SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS keeper
           FROM reach GROUP BY 1),
         rep AS (
           SELECT c.keeper, d.doc_id AS rep_id
           FROM comp c JOIN documents d USING (doc_id)
           QUALIFY row_number() OVER (PARTITION BY c.keeper
             ORDER BY d.n_chars DESC, d.doc_id) = 1)
         SELECT c.doc_id, c.keeper, r.rep_id
         FROM comp c JOIN rep r USING (keeper) ORDER BY c.doc_id""",
    "q58_langid_multi" ->
      s"""WITH $ToksCte,
         counts AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN tok IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
             CAST(sum(CASE WHEN tok IN ('el','la','de','que','y','los') THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
             CAST(sum(CASE WHEN tok IN ('le','la','les','et','des','une') THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
             CAST(sum(CASE WHEN tok IN ('der','die','und','das','nicht','ist') THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
             CAST(sum(CASE WHEN tok IN ('il','di','che','la','per','gli') THEN 1 ELSE 0 END) AS BIGINT) AS n_it,
             CAST(sum(CASE WHEN tok IN ('o','a','de','que','e','dos') THEN 1 ELSE 0 END) AS BIGINT) AS n_pt
           FROM toks GROUP BY 1)
         SELECT d.doc_id,
           CASE WHEN greatest(n_en,n_es,n_fr,n_de,n_it,n_pt) = 0 THEN 'und'
                WHEN n_en = greatest(n_en,n_es,n_fr,n_de,n_it,n_pt) THEN 'en'
                WHEN n_es = greatest(n_en,n_es,n_fr,n_de,n_it,n_pt) THEN 'es'
                WHEN n_fr = greatest(n_en,n_es,n_fr,n_de,n_it,n_pt) THEN 'fr'
                WHEN n_de = greatest(n_en,n_es,n_fr,n_de,n_it,n_pt) THEN 'de'
                WHEN n_it = greatest(n_en,n_es,n_fr,n_de,n_it,n_pt) THEN 'it'
                WHEN n_pt = greatest(n_en,n_es,n_fr,n_de,n_it,n_pt) THEN 'pt'
                ELSE 'und' END AS lang_pred
         FROM documents d LEFT JOIN counts USING (doc_id)
         ORDER BY d.doc_id""",
    "q59_gopher_quality" ->
      s"""WITH $ToksCte,
         tokstats AS (
           SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(length(tok)) AS DOUBLE)/count(*) AS avg_token_len,
             CAST(sum(CASE WHEN regexp_matches(tok, '[A-Za-z]') THEN 1 ELSE 0 END)
               AS DOUBLE)/count(*) AS frac_alpha_tokens
           FROM toks GROUP BY 1),
         toptok AS (
           SELECT doc_id, max(n) AS maxn FROM (
             SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY 1, 2)
           GROUP BY 1),
         charstats AS (
           SELECT doc_id, length(text) AS len,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits,
             length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS symbols,
             length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS uppers
           FROM documents)
         SELECT c.doc_id, t.n_tokens, t.avg_token_len, t.frac_alpha_tokens,
           CAST(digits AS DOUBLE)/len AS digit_ratio,
           CAST(symbols AS DOUBLE)/len AS symbol_ratio,
           CAST(uppers AS DOUBLE)/len AS uppercase_ratio,
           CAST(maxn AS DOUBLE)/t.n_tokens AS top_token_ratio,
           coalesce(t.n_tokens >= 20 AND t.n_tokens <= 100000
            AND t.avg_token_len >= 2.0 AND t.avg_token_len <= 12.0
            AND t.frac_alpha_tokens >= 0.7
            AND CAST(maxn AS DOUBLE)/t.n_tokens <= 0.2, FALSE) AS passes_gopher
         FROM charstats c
         LEFT JOIN tokstats t USING (doc_id)
         LEFT JOIN toptok USING (doc_id)
         ORDER BY c.doc_id""",
    // hashed-BoW embedding rebuilt in SQL (md5-byte buckets, dense 16-dim
    // count lists), then the same hyperplane-bucketed join + keeper fold.
    "q57_embedding_neardup" ->
      s"""WITH $ToksCte,
         counts AS (
           SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT)
               % 16 AS b,
             count(*) AS n
           FROM toks GROUP BY 1, 2),
         emb AS (
           SELECT d.doc_id, list(CAST(coalesce(c.n, 0) AS DOUBLE) ORDER BY s.i) AS v
           FROM documents d
           CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) s
           LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.b = s.i
           GROUP BY d.doc_id),
         bk AS (
           SELECT doc_id, v,
             CAST((CASE WHEN v[1] > v[2] THEN 1 ELSE 0 END)
               + (CASE WHEN v[3] > v[4] THEN 2 ELSE 0 END)
               + (CASE WHEN v[5] > v[6] THEN 4 ELSE 0 END)
               + (CASE WHEN v[7] > v[8] THEN 8 ELSE 0 END) AS BIGINT) AS bucket,
             sqrt(list_dot_product(v, v)) AS nrm
           FROM emb),
         sz AS (SELECT bucket FROM bk GROUP BY 1 HAVING count(*) <= 100),
         capped AS (SELECT bk.* FROM bk JOIN sz USING (bucket)),
         pairs AS (
           SELECT x.doc_id AS id1, y.doc_id AS id2,
             list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cos
           FROM capped x JOIN capped y
             ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
         mn AS (
           SELECT id2 AS doc_id, min(id1) AS mn FROM pairs
           WHERE cos >= 0.98 GROUP BY 1)
         SELECT d.doc_id, coalesce(m.mn, d.doc_id) AS keeper
         FROM documents d LEFT JOIN mn m USING (doc_id)
         ORDER BY d.doc_id""",
    // IVF assignment: deterministic md5-ordered seeds + ONE Lloyd pass
    // (assign sample → per-cell per-dim mean in id order → REAL-rounded),
    // then the same argmax-with-higher-index-tiebreak as the Spark
    // expression — mirrors Similarity.ivfCentroidsRefined bit for bit.
    "q56_ann_ivf" ->
      s"""WITH $RefinedCentCte,
         scored AS (
           SELECT e.vec_id, c.i,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), c.embedding) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(c.embedding, c.embedding)))
               AS cos
           FROM embeddings e CROSS JOIN cent c)
         SELECT vec_id, i AS bucket FROM scored
         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, i DESC) = 1
         ORDER BY vec_id""",
    // Two unrolled GD iterations, mirroring linearProbeTrain exactly:
    // err = list_dot_product(x̃, w) − y (the in-order fold dotHof runs),
    // per-(row, dim) contributions floor(err·x·2^24 + 0.5) BIGINT-summed,
    // g = sum/2^24/n, w ← w − g/256. Iteration 1's w is the zero list so
    // even its dot product runs through the same code path.
    "q174_linear_probe" -> {
      val grad = (errCte: String, out: String) =>
        s"""$out AS (
             SELECT d.j,
               CAST(CAST(sum(CAST(floor(e.err * e.xa[d.j + 1] * 16777216.0
                 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 16777216.0
                 / (SELECT n FROM nn) AS g
             FROM $errCte e CROSS JOIN dims d GROUP BY 1)"""
      s"""WITH pbase AS (
           SELECT vec_id,
             CAST(embedding AS DOUBLE[]) || [CAST(1 AS DOUBLE)] AS xa,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
           FROM embeddings),
         dims AS (SELECT unnest(generate_series(0, 64)) AS j),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pbase),
         w0l AS (
           SELECT list(CAST(0 AS DOUBLE) ORDER BY j) AS wl FROM dims),
         pe1 AS (
           SELECT vec_id, xa,
             list_dot_product(xa, (SELECT wl FROM w0l)) - y AS err
           FROM pbase),
         ${grad("pe1", "pg1")},
         pw1 AS (SELECT j, 0.0 - g / 256.0 AS w FROM pg1),
         w1l AS (SELECT list(w ORDER BY j) AS wl FROM pw1),
         pe2 AS (
           SELECT vec_id, xa,
             list_dot_product(xa, (SELECT wl FROM w1l)) - y AS err
           FROM pbase),
         ${grad("pe2", "pg2")}
         SELECT CAST(pw1.j AS BIGINT) AS j, pw1.w - pg2.g / 256.0 AS w
         FROM pw1 JOIN pg2 ON pw1.j = pg2.j ORDER BY j"""
    },
    // Cell × label purity over q56's assignment; majority tie-break
    // (n DESC, label ASC) mirrors the Spark struct-max on (n, -label).
    // CTE names p-prefixed: RefinedCentCte already defines `asg`.
    "q172_cluster_purity" ->
      s"""WITH $RefinedCentCte,
         pscored AS (
           SELECT e.vec_id, e.label, c.i,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), c.embedding) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(c.embedding, c.embedding)))
               AS cos
           FROM embeddings e CROSS JOIN cent c),
         pasg AS (
           SELECT vec_id, label, i AS bucket FROM pscored
           QUALIFY row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, i DESC) = 1),
         pcl AS (
           SELECT bucket, label, count(*) AS n FROM pasg GROUP BY 1, 2),
         pper AS (
           SELECT bucket, label, n,
             CAST(sum(n) OVER (PARTITION BY bucket) AS BIGINT) AS n_vecs,
             row_number() OVER (PARTITION BY bucket
               ORDER BY n DESC, label ASC) AS rn
           FROM pcl)
         SELECT bucket, n_vecs, CAST(n AS BIGINT) AS majority_n,
           CAST(label AS BIGINT) AS majority_label,
           CAST(n AS DOUBLE) / n_vecs AS purity
         FROM pper WHERE rn = 1 ORDER BY bucket""",
    // Per-(label, dim) fixed-point mean: q106's frdm arithmetic —
    // floor(x·2^24 + 0.5) BIGINT sums, one double division by count,
    // one exact division by 2^24.
    "q173_label_centroids" ->
      """WITH xs AS (
           SELECT label, d.dim,
             CAST(floor(CAST(embedding AS DOUBLE[])[d.dim + 1] * 16777216.0
               + 0.5) AS BIGINT) AS q
           FROM embeddings
           CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d)
         SELECT CAST(label AS BIGINT) AS label, dim,
           count(*) AS n_vecs,
           CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*) / 16777216.0
             AS mean_x
         FROM xs GROUP BY 1, 2 ORDER BY 1, 2""",
    // IVF retrieval: refined centroids, 2-of-8 cell probe per query,
    // exact cosine rerank, (cos DESC, neighbor ASC) top-5 — mirrors
    // Similarity.ivfTopK including the probe tie-break (cos DESC, i DESC).
    "q83_ivf_topk" ->
      s"""WITH $RefinedCentCte,
         $IvfRetrievalSql""",
    // Same retrieval over the FULL-corpus fixed-point Lloyd centroids
    // (q92's arithmetic feeding the index) — mirrors ivfCentroidsRefinedFull.
    "q95_ivf_topk_full" ->
      s"""WITH $FullRefinedCentCte,
         $IvfRetrievalSql""",
    // Two chained full-corpus Lloyd passes, then the same retrieval —
    // mirrors ivfCentroidsIteratedFull(nIter=2) pass for pass (Float
    // rounding between passes included).
    "q102_ivf_topk_lloyd2" ->
      s"""WITH $TwoPassCentCte,
         $IvfRetrievalSql""",
    // Streaming late-batch replay converges to the one-shot batch
    // aggregate (keyed upsert; arrival order invisible), so the oracle IS
    // the batch computation over all events.
    // Streaming funnel = q156's chained-min over the capped slice.
    "q193_streaming_funnel" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             (epoch_ns(ts)//1000000000) AS sec, event_type
           FROM events
           WHERE event_type IN ('view', 'click', 'purchase')),
         capped AS (
           SELECT user_id, sec, event_type FROM ev
           ORDER BY md5('fun:' || CAST(event_id AS VARCHAR)), event_id
           LIMIT 4096),
         v AS (
           SELECT user_id, min(sec) AS v_ts FROM capped
           WHERE event_type = 'view' GROUP BY 1),
         c AS (
           SELECT e.user_id, min(e.sec) AS c_ts
           FROM capped e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.sec >= v.v_ts GROUP BY 1),
         p AS (
           SELECT e.user_id, min(e.sec) AS p_ts
           FROM capped e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.sec >= c.c_ts GROUP BY 1)
         SELECT p.user_id, v.v_ts, c.c_ts, p.p_ts
         FROM p JOIN c USING (user_id) JOIN v USING (user_id)
         ORDER BY user_id""",
    // Streaming index sink ≡ fresh single-pass build over the capped
    // slice: q97's retrieval chain with embeddings → the md5 top-4096.
    "q191_streaming_index" ->
      s"""WITH ecap AS (
           SELECT vec_id, embedding FROM embeddings
           ORDER BY md5('sidx:' || CAST(vec_id AS VARCHAR)), vec_id
           LIMIT 4096),
         ${IvfPqRetrievalOracle.stripPrefix("WITH ")
            .replaceAll("\\bembeddings\\b", "ecap")}""",
    // Streaming dedup = the batch two-call schedule: batch-1 digests
    // keep their min id; only genuinely-new digests land from batch 2.
    // Streaming CUSUM ≡ the batch closed form over the same capped,
    // calibrated slice.
    "q230_streaming_cusum" ->
      s"""WITH capped AS (
           SELECT * FROM events
           ORDER BY md5('csmcap:' || CAST(event_id AS VARCHAR)), event_id
           LIMIT 4096),
         ev AS (
           SELECT user_id, event_id, (epoch_ns(ts)//1000000000) AS sec,
             CAST(floor(value * 100) AS BIGINT) AS cents
           FROM capped),
         med AS (
           SELECT user_id,
             CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
           FROM ev WHERE sec < 1705361400 GROUP BY 1),
         yv AS (
           SELECT e.user_id, e.sec * 10000000 + e.event_id AS ord,
             2 * cents - med2 - 50 AS y
           FROM ev e JOIN med USING (user_id)
           WHERE sec >= 1705361400),
         c AS (
           SELECT user_id, ord, sum(y) OVER w AS cum FROM yv
           WINDOW w AS (PARTITION BY user_id ORDER BY ord
             ROWS UNBOUNDED PRECEDING)),
         st AS (
           SELECT user_id, ord, cum - least(0, min(cum) OVER w) AS cusum
           FROM c
           WINDOW w AS (PARTITION BY user_id ORDER BY ord
             ROWS UNBOUNDED PRECEDING))
         SELECT user_id, count(*) AS n_alarms,
           min(ord) AS first_alarm_ord,
           CAST(max(cusum) AS BIGINT) AS max_cusum
         FROM st WHERE cusum > 2000 GROUP BY 1 ORDER BY 1""",
    // The streamed store equals the batch sketch of the capped slice —
    // the q211 bucketization replayed over the same md5-capped rows.
    "q218_streaming_sketch" ->
      """WITH sl AS (
           SELECT source, greatest(n_chars, 0) AS v
           FROM (SELECT source, n_chars, doc_id FROM documents
                 ORDER BY md5('skscap:' || CAST(doc_id AS VARCHAR)), doc_id
                 LIMIT 2048)),
         b AS (
           SELECT source,
             greatest(length(bin(v)) - 1 - 5, 0) * 32
               + (v >> greatest(length(bin(v)) - 1 - 5, 0)) AS bucket,
             count(*) AS cnt
           FROM sl GROUP BY 1, 2),
         c AS (
           SELECT source, bucket, cnt,
             sum(cnt) OVER (PARTITION BY source ORDER BY bucket) AS cum,
             sum(cnt) OVER (PARTITION BY source) AS total
           FROM b),
         q AS (
           SELECT source, CAST(max(total) AS BIGINT) AS n,
             min(CASE WHEN cum >= ceil(0.5 * total) THEN bucket END) AS b50,
             min(CASE WHEN cum >= ceil(0.9 * total) THEN bucket END) AS b90,
             min(CASE WHEN cum >= ceil(0.99 * total) THEN bucket END) AS b99
           FROM c GROUP BY 1)
         SELECT source, n,
           (b50 - greatest(b50 // 32 - 1, 0) * 32)
             << greatest(b50 // 32 - 1, 0) AS p50_lo,
           ((b50 - greatest(b50 // 32 - 1, 0) * 32)
             << greatest(b50 // 32 - 1, 0))
             + (CAST(1 AS BIGINT) << greatest(b50 // 32 - 1, 0)) - 1 AS p50_hi,
           (b90 - greatest(b90 // 32 - 1, 0) * 32)
             << greatest(b90 // 32 - 1, 0) AS p90_lo,
           ((b90 - greatest(b90 // 32 - 1, 0) * 32)
             << greatest(b90 // 32 - 1, 0))
             + (CAST(1 AS BIGINT) << greatest(b90 // 32 - 1, 0)) - 1 AS p90_hi,
           (b99 - greatest(b99 // 32 - 1, 0) * 32)
             << greatest(b99 // 32 - 1, 0) AS p99_lo,
           ((b99 - greatest(b99 // 32 - 1, 0) * 32)
             << greatest(b99 // 32 - 1, 0))
             + (CAST(1 AS BIGINT) << greatest(b99 // 32 - 1, 0)) - 1 AS p99_hi
         FROM q ORDER BY source""",
    "q190_streaming_dedup" -> {
      val splitLadder = md5Ladder32("'sdd:' || CAST(doc_id AS VARCHAR)")
      s"""WITH capped AS (
           SELECT doc_id, text FROM documents
           ORDER BY md5('sddcap:' || CAST(doc_id AS VARCHAR)), doc_id
           LIMIT 2048),
         d AS (
           SELECT doc_id, text,
             CAST(($splitLadder) % 2 AS BIGINT) AS split
           FROM capped),
         b1 AS (
           SELECT md5(lower(trim(text))) AS digest, min(doc_id) AS keeper
           FROM d WHERE split = 0 GROUP BY 1),
         b2 AS (
           SELECT md5(lower(trim(text))) AS digest, min(doc_id) AS keeper
           FROM d WHERE split = 1 GROUP BY 1)
         SELECT digest, keeper FROM b1
         UNION ALL
         SELECT digest, keeper FROM b2
         WHERE digest NOT IN (SELECT digest FROM b1)
         ORDER BY digest"""
    },
    // Batch interval join over the same md5-capped view/click slices.
    "q189_stream_interval_join" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             (epoch_ns(ts)//1000000000) AS sec, event_type
           FROM events),
         v AS (
           SELECT event_id AS view_id, user_id, sec AS v_sec FROM ev
           WHERE event_type = 'view'
           ORDER BY md5('sij_v:' || CAST(event_id AS VARCHAR)), event_id
           LIMIT 4096),
         c AS (
           SELECT event_id AS click_id, user_id, sec AS c_sec FROM ev
           WHERE event_type = 'click'
           ORDER BY md5('sij_c:' || CAST(event_id AS VARCHAR)), event_id
           LIMIT 4096)
         SELECT view_id, click_id, v_sec, c_sec
         FROM v JOIN c USING (user_id)
         WHERE c_sec >= v_sec AND c_sec <= v_sec + 7200
         ORDER BY view_id, click_id""",
    // Batch equivalence for the streaming as-of join: DuckDB's native
    // ASOF LEFT JOIN (an independent algorithm, the q122/q138
    // convention) over the same md5-capped slice, tolerance-masked.
    "q237_stream_asof" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             (epoch_ns(ts)//1000000000) AS sec, event_type
           FROM events),
         base AS (
           SELECT event_id, user_id, sec, event_type FROM ev
           ORDER BY md5('saj:' || CAST(event_id AS VARCHAR)), event_id
           LIMIT 4096),
         hourly AS (
           SELECT user_id, (sec//3600)*3600 + 3600 AS avail_sec,
             count(*) AS hr_events
           FROM base GROUP BY 1, 2),
         lefts AS (
           SELECT user_id, event_id, sec FROM base
           WHERE event_type = 'click'),
         j AS (
           SELECT l.user_id, l.event_id, l.sec, h.avail_sec, h.hr_events
           FROM lefts l ASOF LEFT JOIN hourly h
             ON l.user_id = h.user_id AND l.sec >= h.avail_sec)
         SELECT user_id AS entity_id, event_id AS l_ord, sec AS l_ts,
           CASE WHEN avail_sec IS NOT NULL AND sec - avail_sec <= 7200
             THEN avail_sec END AS asof_ts,
           CASE WHEN avail_sec IS NOT NULL AND sec - avail_sec <= 7200
             THEN hr_events END AS r_val
         FROM j ORDER BY entity_id, l_ts, l_ord""",
    // Batch-reprocessing equivalence for the streaming windowed rollup:
    // per-(entity, hour-end) fixed-point sums over the same capped slice.
    "q171_streaming_rollup" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             (epoch_ns(ts)//1000000000) AS sec, value
           FROM events),
         capped AS (
           SELECT user_id, sec,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS micro
           FROM ev
           ORDER BY md5('roll:' || CAST(event_id AS VARCHAR)), event_id
           LIMIT 4096)
         SELECT user_id AS entity_id,
           (sec//3600)*3600 + 3600 AS "timestamp",
           CAST(sum(micro) AS BIGINT) AS power
         FROM capped GROUP BY 1, 2 ORDER BY 1, 2""",
    // Batch-reprocessing equivalence for the streaming sessionizer: the
    // q45 window composition over the same md5-capped event slice.
    // Duplicate (user, sec) rows are indistinguishable, so lag/cumsum
    // tie order cannot change the per-session aggregates.
    "q176_streaming_sessions" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             (epoch_ns(ts)//1000000000) AS sec
           FROM events),
         capped AS (
           SELECT user_id, sec FROM ev
           ORDER BY md5('sess:' || CAST(event_id AS VARCHAR)), event_id
           LIMIT 4096),
         ord AS (
           SELECT user_id, sec,
             lag(sec) OVER (PARTITION BY user_id ORDER BY sec) AS prev
           FROM capped),
         marked AS (
           SELECT user_id, sec,
             CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS ns
           FROM ord),
         sess AS (
           SELECT user_id, sec,
             sum(ns) OVER (PARTITION BY user_id ORDER BY sec
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked)
         SELECT user_id, min(sec) AS session_start, max(sec) AS session_end,
           count(*) AS n_events
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    // batch-reprocessing equivalence over the SAME md5-capped slice the
    // harness replays: the cap binds at sf0.01 (10k base rows), so the
    // deterministic top-N is part of what the oracle checks
    "q104_streaming_late" ->
      """WITH base AS (
           SELECT user_id AS entity_id,
             (epoch_ns(ts)//1000000000) AS "timestamp",
             CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS power
           FROM events GROUP BY 1, 2),
         capped AS (
           SELECT entity_id, "timestamp", power FROM base
           ORDER BY md5('late:' || CAST(entity_id AS VARCHAR) || ':'
               || CAST("timestamp" AS VARCHAR)),
             entity_id, "timestamp"
           LIMIT 4096)
         SELECT entity_id, "timestamp", power FROM capped ORDER BY 1, 2""",
    // Incremental index (q96) retrieves IDENTICALLY to a fresh single-pass
    // build: sidecar round-trip is bit-exact and write-time buckets equal
    // whole-corpus reassignment, so the oracle IS q83's retrieval.
    "q96_ivf_incremental" ->
      s"""WITH $RefinedCentCte,
         $IvfRetrievalSql""",
    // Partition-pruned stored retrieval answers exactly like the fresh
    // whole-corpus retrieval (pruning is IO elision), so the oracle IS
    // q83's.
    "q105_ivf_pruned" ->
      s"""WITH $RefinedCentCte,
         $IvfRetrievalSql""",
    // Pruned stored IVF-PQ answers exactly like the fresh q97 chain
    // (pruning is IO elision), so the oracle IS q97's.
    "q186_ivfpq_pruned" -> IvfPqRetrievalOracle,
    // Full-corpus residual training: rcent seeds (the q100 chain) + ONE
    // fixed-point pass over every corpus residual (q92/q101 arithmetic),
    // codes re-derived with the refined books — mirrors
    // pqCodebooksResidualFull / ivfPqEncodeResidual.
    "q106_residual_codes_full" ->
      s"""WITH $IvfPqGateCte,
         $ResidualSeedCte,
         $CorpusResidualCte,
         f0 AS (
           SELECT r.vec_id, c.s, c.i,
             r.emb[1 + 8*c.s : 8 + 8*c.s] AS semb
           FROM crres r CROSS JOIN rcent c
           QUALIFY row_number() OVER (PARTITION BY r.vec_id, c.s ORDER BY
             list_dot_product(r.emb[1 + 8*c.s : 8 + 8*c.s], c.emb) /
               (sqrt(list_dot_product(r.emb[1 + 8*c.s : 8 + 8*c.s],
                                      r.emb[1 + 8*c.s : 8 + 8*c.s])) *
                sqrt(list_dot_product(c.emb, c.emb))) DESC, c.i DESC) = 1),
         frdims AS (SELECT unnest(generate_series(0, 7)) AS dim),
         frqx AS (
           SELECT f.s, f.i, d.dim,
             CAST(floor(f.semb[d.dim + 1] * 16777216.0 + 0.5) AS BIGINT) AS q
           FROM f0 f CROSS JOIN frdims d),
         frdm AS (
           SELECT s, i, dim,
             CAST(CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*)
               / 16777216.0 AS REAL) AS mr
           FROM frqx GROUP BY 1, 2, 3),
         frmeans AS (
           SELECT s, i, list(CAST(mr AS DOUBLE) ORDER BY dim) AS emb
           FROM frdm GROUP BY 1, 2),
         frcent AS (
           SELECT c.s, c.i, coalesce(f.emb, c.emb) AS emb
           FROM rcent c LEFT JOIN frmeans f ON f.s = c.s AND f.i = c.i),
         fcodes AS (
           SELECT r.vec_id, r.bucket, c.s, c.i
           FROM crres r CROSS JOIN frcent c
           QUALIFY row_number() OVER (PARTITION BY r.vec_id, c.s ORDER BY
             list_dot_product(r.emb[1 + 8*c.s : 8 + 8*c.s], c.emb) /
               (sqrt(list_dot_product(r.emb[1 + 8*c.s : 8 + 8*c.s],
                                      r.emb[1 + 8*c.s : 8 + 8*c.s])) *
                sqrt(list_dot_product(c.emb, c.emb))) DESC, c.i DESC) = 1)
         SELECT vec_id, bucket,
           array_to_string(list(CAST(i AS SMALLINT) ORDER BY s), ',')
             AS pq_code_csv
         FROM fcodes GROUP BY 1, 2 ORDER BY 1"""
  )
}
