package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Corpus-scoring/shaping operator specs: boilerplate line removal
  * (cross-doc counting, order-preserving reassembly, null/empty docs), PII
  * redaction (sequential passes), sequence packing (straddling docs,
  * per-shard windows — plan-asserted partitioned, never global), and the
  * `TextAnalysis.charLmScore` trigram LM (score ordering, partitioning
  * invariance, broadcast + ReusedExchange plan). */
class CorpusCleanSpec extends SparkSpec {
  import spark.implicits._

  test("blocklistFilter: case-insensitive word hits, clean docs unflagged") {
    val df = Seq(
      (1L, "the BAD word"), (2L, "all clean here"), (3L, "bad bad notbad")
    ).toDF("doc_id", "text")
    val out = CorpusClean.blocklistFilter(df, "doc_id", "text", Seq("bad"))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_blocked", "blocked")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 1L, true),   // case-insensitive match
      (2L, 3L, 0L, false),
      (3L, 3L, 2L, true)))  // 'notbad' is NOT a hit: word-level, not substring
    intercept[IllegalArgumentException] {
      CorpusClean.blocklistFilter(df, "doc_id", "text", Seq.empty)
    }
  }

  import spark.implicits._

  test("boilerplate lines flagged across docs, body reassembled in order") {
    val df = Seq(
      (1L, "HEADER\nunique one\nmiddle one\nFOOTER"),
      (2L, "HEADER\nunique two\nFOOTER"),
      (3L, "HEADER\n  FOOTER  \nunique three"),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CorpusClean.boilerplateLines(df, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 4L, 2L, "unique one\nmiddle one"))
    assert(out(1) == Row(2L, 3L, 2L, "unique two"))
    // trimmed-line matching: "  FOOTER  " counts as FOOTER; order preserved
    assert(out(2) == Row(3L, 3L, 2L, "unique three"))
    // empty and NULL docs still get rows
    assert(out(3) == Row(4L, 0L, 0L, ""))
    assert(out(4) == Row(5L, 0L, 0L, ""))
  }

  test("a line repeated within ONE doc is not boilerplate") {
    val df = Seq((1L, "same\nsame\nsame"), (2L, "other")).toDF("doc_id", "text")
    val out = CorpusClean.boilerplateLines(df, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 3L, 0L, "same\nsame\nsame"))
  }

  test("boilerplate plan has no Window operator") {
    val df = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = CorpusClean.boilerplateLines(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }

  test("first-occurrence line dedup: one copy survives at the smallest (doc, pos)") {
    val df = Seq(
      (1L, "alpha\nshared\nalpha"),   // within-doc dup: pos-2 alpha drops
      (2L, "shared\nbeta"),           // cross-doc dup: doc 1 owns 'shared'
      (3L, "  shared \ngamma"),       // trimmed match still drops
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CorpusClean.dedupLinesFirstOccurrence(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 3L, 1L, "alpha\nshared"))
    assert(out(1) == Row(2L, 2L, 1L, "beta"))
    assert(out(2) == Row(3L, 2L, 1L, "gamma"))
    assert(out(3) == Row(4L, 0L, 0L, ""))
    assert(out(4) == Row(5L, 0L, 0L, ""))
    // no Window anywhere: the keeper is a struct-min aggregate
    val plan = CorpusClean.dedupLinesFirstOccurrence(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }

  test("pii passes run sequentially and count what they scanned") {
    val df = Seq(
      (1L, "mail a.b-c@test.org and 10.0.0.1 then call +1 555 0100 99"),
      // digits inside the email must NOT count as a phone after redaction
      (2L, "id 12345678901@example.com only"),
      (3L, "clean text"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CorpusClean.piiRedact(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 1, 1, 1, "mail [EMAIL] and [IP] then call [PHONE]"))
    assert(out(1) == Row(2L, 1, 0, 0, "id [EMAIL] only"))
    assert(out(2) == Row(3L, 0, 0, 0, "clean text"))
    assert(out(3) == Row(4L, null, null, null, null))
  }

  test("sequence packing: running offsets per shard, straddling doc keeps its start bin") {
    // one shard (shards=1) with budget 5: docs of 3,4,2 tokens →
    // offsets 0,3,7; the 4-token doc straddles bins 0/1 but indexes at 0
    val df = Seq((0L, "a b c"), (8L, "d e f g"), (16L, "h i"))
      .toDF("doc_id", "text")
    val out = CorpusClean.packSequences(df, "doc_id", "text", budget = 5, shards = 1)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(0L, 0L, 3L, 0L, 0L, 0L))
    assert(out(1) == Row(8L, 0L, 4L, 3L, 0L, 3L))
    assert(out(2) == Row(16L, 0L, 2L, 7L, 1L, 2L))
  }

  test("packing window is partitioned by shard, never global") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val plan = CorpusClean.packSequences(df, "doc_id", "text", 512, 8)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty)
    assert(windowLines.forall(_.contains("shard")),
      s"window not keyed by shard:\n$plan")
  }
  test("char LM score: repetitive text scores more probable than gibberish") {
    val df = (Seq((1L, "the cat sat on the mat " * 20),
      (2L, "zq xv jk wp qz vx kj pw " * 20)) ++
      (3L to 30L).map(i => (i, "the cat sat on the mat and the dog ran")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charLmScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val meanP = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ppl = out.map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(meanP(1L) > meanP(2L))
    assert(ppl(1L) < ppl(2L))
  }

  test("char LM score is invariant to partitioning (ordered fold)") {
    val df = (1L to 40L)
      .map(i => (i, s"doc number $i with some shared text payload " * 3))
      .toDF("doc_id", "text")
    val a = TextAnalysis.charLmScore(df.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = TextAnalysis.charLmScore(df.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("char LM model join is broadcast; empty/null docs get zero rows back") {
    val df = Seq((1L, "abc def"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.charLmScore(df, "doc_id", "text")
    val rows0 = out.collect() // run first: final AQE plan, not the initial one
    assert(rows0.length == 4)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast in:\n$plan")
    // the (id, tri) aggregate subtree feeds both the model build and the
    // scoring join through ONE shuffle
    assert(plan.contains("ReusedExchange"), s"no exchange reuse in:\n$plan")
    val rows = out.orderBy("doc_id").collect()
    assert(rows.length == 4)
    assert(rows(1).getLong(1) == 0L && rows(1).isNullAt(3))
    assert(rows(2).getLong(1) == 0L)
    assert(rows(3).getLong(1) == 0L) // 2 letters -> no trigram
  }

  test("exportJsonlShards: escaping survives a real JSON parse; manifest " +
      "matches the files") {
    import spark.implicits._
    val d = Seq(
      (1L, "plain words"),
      (2L, "has \"quotes\" inside"),
      (3L, "back\\slash and \"both\\\" mixed"),
      (4L, "")).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
    val manifest = CorpusClean.exportJsonlShards(d, "doc_id", "text",
        s"$out/x", nShards = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest.values.map(_._1).sum == 4L)
    // the written lines are REAL JSON: Spark's parser reproduces the
    // originals byte for byte, including quotes and backslashes
    val back = spark.read.json(s"$out/x")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == want, s"round-trip mismatch: $back")
    // file-level counts agree with the manifest
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    manifest.foreach { case (shard, (nDocs, _)) =>
      val lines = spark.read.text(s"$out/x/shard=$shard").count()
      assert(lines == nDocs, s"shard $shard: $lines lines vs $nDocs manifest")
    }
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$out/x/shard=2")))
  }
}
