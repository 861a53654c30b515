package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stored-index BM25: append-append-query must be byte-identical to the
  * one-shot full-corpus search (stats reconstruct at query time), the
  * postings scan must partition-prune to the query tokens' crc32 cells,
  * and re-appending a document must be idempotent. */
class Bm25StoredSpec extends SparkSpec {
  private lazy val si = spark.implicits
  import si._

  private def corpus = Seq(
    (1L, "hash join merge sort hash"),
    (2L, "merge scan filter"),
    (3L, "hash hash hash probe"),
    (4L, "window order group"),
    (5L, "join join merge hash scan")
  ).toDF("doc_id", "text")

  private def stores(tag: String) = {
    val p = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"target/tmp/bm25_$tag/post", 64L,
        keyCols = Seq("tok", "doc_id")))
    val d = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"target/tmp/bm25_$tag/docs", 64L,
        keyCols = Seq("doc_id")))
    p.deletePart("postings"); d.deletePart("doclen")
    (p, d)
  }

  test("incremental appends == one-shot search; scan carries pindex filter") {
    val (p, d) = stores("inc")
    TextAnalysis.bm25IndexAppend(p, d,
      corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text", 1L)
    TextAnalysis.bm25IndexAppend(p, d,
      corpus.filter(col("doc_id") % 2 === 1), "doc_id", "text", 2L)
    val stored = TextAnalysis.bm25SearchStored(p, d, Seq("hash", "merge"), 10)
    val fresh = TextAnalysis.bm25Search(corpus, "doc_id", "text",
      Seq("hash", "merge"), 10)
    assert(stored.collect().map(_.toSeq).toSeq ==
      fresh.collect().map(_.toSeq).toSeq)
    val scanLine = stored.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("pindex"), s"no pindex partition filter: $scanLine")
  }

  test("re-appending a document is idempotent (upsert by key)") {
    val (p, d) = stores("idem")
    TextAnalysis.bm25IndexAppend(p, d, corpus, "doc_id", "text", 1L)
    val once = TextAnalysis.bm25SearchStored(p, d, Seq("hash", "merge"), 10)
      .collect().map(_.toSeq).toSeq
    TextAnalysis.bm25IndexAppend(p, d,
      corpus.filter(col("doc_id") === 3), "doc_id", "text", 2L)
    val twice = TextAnalysis.bm25SearchStored(p, d, Seq("hash", "merge"), 10)
      .collect().map(_.toSeq).toSeq
    assert(once == twice)
  }

  test("log-idf ranking is textbook BM25 where the raw ratio is not") {
    // crafted flip: doc 0 holds one ultra-rare term (df=1, ratio 6.33),
    // docs 1..5 hold three moderately-common terms (df=5, ratio 1.0 each).
    // All dl equal => tf_norm = 1.0 exactly. Raw-ratio scoring puts doc 0
    // first (6.33 > 3.0); textbook summed log idf puts the multi-match
    // docs first (3·ln 2 = 2.079 > ln 7.33 = 1.992) — the Robertson
    // rare-term exaggeration the log variant corrects.
    val corpus = (Seq((0L, "x f0 f0 f0")) ++
      (1L to 5L).map(i => (i, "y1 y2 y3 f0")) ++
      (6L to 9L).map(i => (i, "f0 f0 f0 f0"))).toDF("doc_id", "text")
    val q = Seq("x", "y1", "y2", "y3")
    val raw = TextAnalysis.bm25Search(corpus, "doc_id", "text", q, 10)
      .select("doc_id").as[Long].collect().toSeq
    val log = TextAnalysis.bm25SearchLog(corpus, "doc_id", "text", q, 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(raw.head == 0L, s"raw ratio should rank the rare-term doc first: $raw")
    assert(log.take(5) == Seq(1L, 2L, 3L, 4L, 5L) && log(5) == 0L,
      s"textbook order should rank the 3-term docs first: $log")
  }

  test("stored log-idf search == fresh bm25SearchLog after appends") {
    val (p, d) = stores("log")
    TextAnalysis.bm25IndexAppend(p, d,
      corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text", 1L)
    TextAnalysis.bm25IndexAppend(p, d,
      corpus.filter(col("doc_id") % 2 === 1), "doc_id", "text", 2L)
    val stored = TextAnalysis.bm25SearchStoredLog(p, d, Seq("hash", "merge"), 10)
    val fresh = TextAnalysis.bm25SearchLog(corpus, "doc_id", "text",
      Seq("hash", "merge"), 10)
    assert(stored.collect().map(_.toSeq).toSeq ==
      fresh.collect().map(_.toSeq).toSeq)
  }

  test("content update purges the old version's dropped-token postings") {
    val (p, d) = stores("upd")
    TextAnalysis.bm25IndexAppend(p, d, corpus, "doc_id", "text", 1L)
    // doc 3 loses every 'hash' and gains 'merge' — without the purge the
    // stale (hash, 3) posting would keep scoring doc 3 on 'hash' queries
    val v2 = Seq((3L, "merge probe probe")).toDF("doc_id", "text")
    TextAnalysis.bm25IndexAppend(p, d, v2, "doc_id", "text", 2L)
    val updatedCorpus = corpus.filter(col("doc_id") =!= 3).unionByName(v2)
    val stored = TextAnalysis.bm25SearchStored(p, d, Seq("hash", "merge"), 10)
      .collect().map(_.toSeq).toSeq
    val fresh = TextAnalysis.bm25Search(updatedCorpus, "doc_id", "text",
      Seq("hash", "merge"), 10).collect().map(_.toSeq).toSeq
    assert(stored == fresh)
    // and the store holds no postings at all for doc 3's dropped tokens
    val doc3Toks = p.readPart("postings").get
      .filter(col("doc_id") === 3).select("tok").as[String].collect().toSet
    assert(doc3Toks == Set("merge", "probe"))
  }

  test("bm25IndexPurge: purged index == fresh index on survivors; " +
      "stats forget the deleted docs") {
    val (p, d) = stores("purge")
    TextAnalysis.bm25IndexAppend(p, d, corpus, "doc_id", "text", 1L)
    val n = TextAnalysis.bm25IndexPurge(p, d,
      Seq(1L, 3L).toDF("doc_id"), "doc_id")
    assert(n == 2L)
    val survivors = corpus.filter(!col("doc_id").isin(1L, 3L))
    val stored = TextAnalysis.bm25SearchStoredLog(p, d, Seq("hash", "merge"), 10)
      .collect().map(_.toSeq).toSeq
    val fresh = TextAnalysis.bm25SearchLog(survivors, "doc_id", "text",
      Seq("hash", "merge"), 10).collect().map(_.toSeq).toSeq
    assert(stored == fresh)
    // physically gone, not filtered: no postings or doclen rows remain
    assert(p.readPart("postings").get
      .filter(col("doc_id").isin(1L, 3L)).isEmpty)
    assert(d.readPart("doclen").get
      .filter(col("doc_id").isin(1L, 3L)).isEmpty)
    // purging ids that are not on store is a no-op reporting 0
    assert(TextAnalysis.bm25IndexPurge(p, d,
      Seq(99L).toDF("doc_id"), "doc_id") == 0L)
    assert(TextAnalysis.bm25SearchStoredLog(p, d, Seq("hash", "merge"), 10)
      .collect().map(_.toSeq).toSeq == stored)
  }

  test("ndcgAtK: exact gain/ideal columns; log2 quotient matches the " +
      "closed form; perfect ranking scores 1e9") {
    import spark.implicits._
    val ranked = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rnk")
    // d4 is judged but unretrieved — it still shapes the ideal ranking
    val gains = Seq((1L, 0L), (2L, 3L), (3L, 1L), (4L, 2L)).toDF("doc_id", "gain")
    val out = TextAnalysis.ndcgAtK(ranked, gains, "doc_id", k = 3)
      .orderBy("rnk").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq((1L, 1L, 0L, 3L), (2L, 2L, 3L, 2L), (3L, 3L, 1L, 1L)))
    // identical libm calls reproduce the fixed-point quotient exactly
    def l2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = 0.0 / l2(2) + 3.0 / l2(3) + 1.0 / l2(4)
    val idcg = 3.0 / l2(2) + 2.0 / l2(3) + 1.0 / l2(4)
    assert(out.head.getLong(4) == math.floor(dcg / idcg * 1e9).toLong)
    // perfect ranking (retrieved order == ideal order) scores exactly 1
    val perfect = TextAnalysis.ndcgAtK(
      Seq((2L, 1L), (4L, 2L), (3L, 3L)).toDF("doc_id", "rnk"),
      gains, "doc_id", k = 3).head()
    assert(perfect.getLong(4) == 1000000000L)
    // zero-gain judgments degrade to 0, not NaN
    val zero = TextAnalysis.ndcgAtK(ranked,
      Seq((9L, 0L)).toDF("doc_id", "gain"), "doc_id", k = 3).head()
    assert(zero.getLong(4) == 0L)
  }
}
