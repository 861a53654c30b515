package graft.streaming

import graft.SparkSpec
import graft.operators.TriggerRule
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming path (SURVEY I1-I6): windowed rollup with watermark
  * (allowed lateness = the reference's reprocessing window) and the
  * streaming trigger/notification path. */
class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming rollup aggregates tumbling windows and absorbs late rows") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
    val rolled = StreamingRollup.rollup(
      stream, "user_id", "ts", granSeconds = 3600, latenessSeconds = 7200,
      Seq(count(lit(1)).as("samples"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value")))
    val q = rolled.writeStream.format("memory").queryName("rollup_sink")
      .outputMode("update").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((1L, t("2024-01-01 10:05:00"), 1.0), (1L, t("2024-01-01 10:50:00"), 2.0))
    q.processAllAvailable()
    mem.addData((1L, t("2024-01-01 10:20:00"), 4.0)) // late, within watermark
    q.processAllAvailable()
    val rows = spark.table("rollup_sink")
      .groupBy("entity_id", "timestamp") // update mode re-emits; take latest
      .agg(max("samples").as("samples"), max("sum_value").as("sum_value"))
      .collect()
    q.stop()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("timestamp") % 3600 == 0) // window-end label on the grid
    assert(r.getAs[Long]("samples") == 3L)
    assert(r.getAs[Double]("sum_value") == 7.0)
  }

  test("stateful sessionization closes sessions on gap and on event-time timeout") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("user_id", "ts")
    val sessions = StreamingRollup.sessionize(
      stream, "user_id", "ts", gapSeconds = 1800, latenessSeconds = 600)
    val q = sessions.toDF().writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two events 10 min apart (one session), then a 2h gap → new one
    mem.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData((1L, t("2024-01-01 12:30:00"))) // gap > 30m → closes session 1
    q.processAllAvailable()
    // advance the watermark far enough to time out the open session
    mem.addData((2L, t("2024-01-01 16:00:00")))
    q.processAllAvailable()
    mem.addData((2L, t("2024-01-01 17:00:00"))) // another advance to flush
    q.processAllAvailable()
    val rows = spark.table("sess_sink").sort("entity_id", "session_start").collect()
    q.stop()
    val u1 = rows.filter(_.getAs[Long]("entity_id") == 1L)
    assert(u1.length == 2)
    assert(u1(0).getAs[Long]("n_events") == 2L)
    assert(u1(0).getAs[Long]("session_end") - u1(0).getAs[Long]("session_start") == 600L)
    assert(u1(1).getAs[Long]("n_events") == 1L) // closed by event-time timeout
  }

  test("streaming cusumDetect carries O(1) state across batches == batch closed form") {
    implicit val sc = spark.sqlContext
    // y = 3, -12, 8, -10, 18 → sequential S = 3, 0, 8, 0, 18; thr 7 →
    // alarms at ord 3 (S=8) and ord 5 (S=18)
    val rows = Seq((1L, 1L, 3L), (1L, 2L, -12L), (1L, 3L, 8L),
      (1L, 4L, -10L), (1L, 5L, 18L))
    val mem = MemoryStream[(Long, Long, Long)]
    val alarms = StreamingRollup.cusumDetect(
      mem.toDF().toDF("user_id", "ord", "y"), "user_id", "ord", "y",
      threshold = 7L)
    val q = alarms.writeStream.format("memory").queryName("cusum_sink")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(3): _*) // state (cum, minCum) must survive
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cusum_sink")
      .orderBy("ord").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 8L), (5L, 18L)))
  }

  test("streamAsofJoin == asofJoinNative over a time-ordered replay") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    // two keys, rights and lefts interleaved; gaps straddle the
    // tolerance; one left precedes any right (null); one left lands
    // exactly on a right's ts (equality-inclusive match)
    val rights = Seq((1L, 100L, 10L), (1L, 300L, 30L), (1L, 900L, 90L),
      (2L, 200L, 20L), (2L, 800L, 80L))
    val lefts = Seq((1L, 50L, 1L), (1L, 100L, 2L), (1L, 350L, 3L),
      (1L, 950L, 4L), (2L, 250L, 5L), (2L, 790L, 6L), (2L, 1600L, 7L))
    val tol = Some(500L)
    val tagged = lefts.map { case (k, t, id) => (k, t, 1L, id) } ++
      rights.map { case (k, t, v) => (k, t, 0L, v) }
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val joined = StreamingRollup.streamAsofJoinTagged(mem.toDS(), tol)
    val q = joined.toDF().writeStream.format("memory")
      .queryName("saj_sink").outputMode("append").start()
    try {
      mem.addData(tagged.filter(_._2 < 500L): _*) // state crosses batches
      q.processAllAvailable()
      mem.addData(tagged.filter(_._2 >= 500L): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("saj_sink")
      .orderBy("entity_id", "l_ts", "l_ord")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.TemporalOps.asofJoinNative(
        lefts.toDF("entity_id", "l_ts", "l_ord"),
        rights.toDF("entity_id", "r_ts", "r_val"),
        Seq("entity_id"), "l_ts", "r_ts", tolerance = tol)
      .select("entity_id", "l_ord", "l_ts", "asof_ts", "r_val")
      .orderBy("entity_id", "l_ts", "l_ord")
      .collect().map(_.toSeq).toSeq
    assert(got == batch)
    // spot-check the fixture exercises all three outcomes
    val byOrd = spark.table("saj_sink").collect()
      .map(r => r.getLong(1) -> Option(r.get(3))).toMap
    assert(byOrd(1L).isEmpty)   // left before any right
    assert(byOrd(2L).contains(100L)) // simultaneous right visible
    assert(byOrd(7L).isEmpty)   // latest right outside tolerance
  }

  test("streaming trend sink merges micro-batches through the staged store") {
    implicit val sc = spark.sqlContext
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val base = "target/tmp/streaming_sink"
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(base, partitionSizeSeconds = 86400))
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val stream = mem.toDF().toDF("entity_id", "timestamp", "power", "modified")
    val q = StreamingRollup.trendSink(stream, ps, "p", nowSec = () => 42L)
    mem.addData((1L, 1000L, 1.0, 10L), (2L, 90000L, 2.0, 10L))
    q.processAllAvailable()
    // second micro-batch UPSERTS entity 1 (newer modified wins) + new row
    mem.addData((1L, 1000L, 5.0, 20L), (3L, 1000L, 3.0, 10L))
    q.processAllAvailable()
    q.stop()
    val back = ps.readPart("p").get.sort("entity_id")
      .select("entity_id", "power").collect()
    assert(back.map(r => r.getLong(0) -> r.getDouble(1)).toSeq ==
      Seq(1L -> 5.0, 2L -> 2.0, 3L -> 3.0))
    // each micro-batch marked its timestamps in the modified log
    val log = spark.read.parquet(s"$base/_modified_log")
    assert(log.filter(col("modified") === 42L).count() >= 2)
  }

  test("streaming notifications fire on threshold breach") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF().toDF("user_id", "sec", "value")
    val notif = StreamingRollup.notifications(
      stream,
      TriggerRule("hv", Map("max_value" -> 40.0), "value > max_value",
        "CASE WHEN value > 48 THEN 10 ELSE 1 END",
        concat(lit("v="), col("value"))),
      "user_id", "sec")
    val q = notif.writeStream.format("memory").queryName("notif_sink")
      .outputMode("append").start()
    mem.addData((1L, 100L, 50.0), (2L, 100L, 10.0), (3L, 101L, 41.0))
    q.processAllAvailable()
    val rows = spark.table("notif_sink").sort("entity_id").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("weight") == 10L)
    assert(rows(1).getAs[Long]("weight") == 1L)
  }
  test("streaming exact dedup drops replayed docs within the watermark horizon") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDF().toDF("doc_id", "ts", "text")
    val deduped = StreamingRollup.dedupExact(stream, "text", "ts",
      latenessSeconds = 3600)
    val q = deduped.writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), "alpha doc"),
      (2L, t("2024-01-01 10:01:00"), "  ALPHA DOC  "), // same after normalization
      (3L, t("2024-01-01 10:02:00"), "beta doc"))
    q.processAllAvailable()
    mem.addData((4L, t("2024-01-01 10:30:00"), "alpha doc")) // replay, in horizon
    q.processAllAvailable()
    val ids = spark.table("dedup_sink").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 3L), s"got $ids")
  }

  test("stateless curation ops (hashSplit, stratifiedSample) run on streams") {
    // hash-based splits/samples are pure projections/filters with no RNG
    // state, so the SAME operators serve batch backfill and the streaming
    // ingest path — and a doc's assignment agrees across both
    implicit val sc = spark.sqlContext
    import graft.functions.TextAnalysis
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "source")
    val out = TextAnalysis.stratifiedSample(
      TextAnalysis.hashSplit(stream, "doc_id",
        Seq("train" -> 0.9, "val" -> 0.1)),
      "doc_id", "source", rates = Map("drop" -> 0.0), defaultRate = 1.0)
    val q = out.writeStream.format("memory").queryName("split_sink")
      .outputMode("append").start()
    mem.addData((0L until 50L).map(i =>
      (i, if (i % 5 == 0) "drop" else "keep")): _*)
    q.processAllAvailable()
    val rows = spark.table("split_sink").collect()
    q.stop()
    assert(rows.nonEmpty && rows.forall(_.getString(1) == "keep"))
    // streaming assignment == batch assignment, row for row
    val batch = TextAnalysis.hashSplit(
      (0L until 50L).filter(_ % 5 != 0).map(i => (i, "keep")).toDF("doc_id", "source"),
      "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(r => batch(r.getLong(0)) == r.getString(2)))
  }

  test("streaming dedupSink shares the persisted-digest contract with batch") {
    import graft.functions.Dedup
    implicit val sc = spark.sqlContext
    val base = "target/tmp/stream_dedup"
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 1L << 55, keyCols = Seq("digest")))
    ps.deletePart("d")
    // a BATCH job seeds the store — the stream must dedup against it
    Dedup.exactIncremental(ps, "d",
      Seq((10L, "alpha"), (11L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text").count()
    val mem = MemoryStream[(Long, String)]
    val q = StreamingRollup.dedupSink(mem.toDF().toDF("doc_id", "text"),
      ps, "d", "doc_id", "text")
    mem.addData((1L, "alpha"), (2L, "gamma"))
    q.processAllAvailable()
    mem.addData((3L, "gamma"), (4L, "delta"))
    q.processAllAvailable()
    q.stop()
    val state = ps.readPart("d").get.select("digest", "keeper")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dg = (s: String) => // md5(lower(trim(s)))
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.toLowerCase.trim.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(state.size === 4)
    assert(state(dg("alpha")) === 10L) // batch seed wins over stream's id 1
    assert(state(dg("gamma")) === 2L)  // first micro-batch wins over the second
    assert(state(dg("delta")) === 4L)
  }

  test("streaming decontamSink stamps verdicts against the eval store; replay idempotent") {
    implicit val sc = spark.sqlContext
    val base = "target/tmp/stream_decontam"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val es = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"$base/ev", 1L << 55,
        keyCols = Seq("digest")))
    es.store("ev", Seq("held out", "secret eval")
      .toDF("text")
      .select(graft.functions.Dedup.digest(col("text")).as("digest"))
      .withColumn("entity_id",
        conv(substring(col("digest"), 1, 15), 16, 10).cast("long"))
      .withColumn("timestamp", col("entity_id"))
      .withColumn("modified", lit(1L)))
    val os = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"$base/out", 500,
        keyCols = Seq("entity_id")))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingRollup.decontamSink(mem.toDF().toDF("doc_id", "text"),
      es, "ev", os, "out", "doc_id", "text")
    mem.addData((1L, "clean doc"), (2L, "Held Out")) // digest normalizes case
    q.processAllAvailable()
    mem.addData((3L, "secret eval"), (2L, "Held Out")) // doc 2 REPLAYED
    q.processAllAvailable()
    q.stop()
    val state = os.readPart("out").get
      .select("entity_id", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state === Map(1L -> 0L, 2L -> 1L, 3L -> 1L)) // no dup row for 2
    assert(os.readPart("out").get.count() === 3L)
  }

  test("streaming noveltySink: registry after stream == batch appends; replay idempotent") {
    import graft.functions.TextAnalysis
    implicit val sc = spark.sqlContext
    val base = s"target/tmp/stream_nov_${System.nanoTime()}"
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 64L, keyCols = Seq("digest")))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingRollup.noveltySink(mem.toDF().toDF("doc_id", "text"),
      ps, "reg", "doc_id", "text", n = 2)
    mem.addData((1L, "a b c"), (2L, "a b x"))
    q.processAllAvailable()
    mem.addData((3L, "a b c"), (4L, "p q"))
    q.processAllAvailable()
    q.stop()
    // grams: batch 0 registers "a b","b c","b x"; batch 1 adds only "p q"
    val reg = ps.readPart("reg").get.select("first_doc", "modified")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(reg.length == 4)
    assert(reg.count(_._2 == 0L) == 3 && reg.count(_._2 == 1L) == 1)
    assert(!reg.map(_._1).contains(3L), "doc 3's grams were already owned")
    // the SAME registry a batch caller builds (shared write contract)
    val base2 = s"target/tmp/batch_nov_${System.nanoTime()}"
    val ps2 = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base2, 64L, keyCols = Seq("digest")))
    TextAnalysis.gramNoveltyAppend(ps2, "reg",
      Seq((1L, "a b c"), (2L, "a b x")).toDF("doc_id", "text"),
      "doc_id", "text", n = 2, modified = 0L).count()
    TextAnalysis.gramNoveltyAppend(ps2, "reg",
      Seq((3L, "a b c"), (4L, "p q")).toDF("doc_id", "text"),
      "doc_id", "text", n = 2, modified = 1L).count()
    val reg2 = ps2.readPart("reg").get.select("digest", "first_doc")
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val reg1 = ps.readPart("reg").get.select("digest", "first_doc")
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    assert(reg1.sameElements(reg2))
  }

  test("streaming cmsSink: store after a batch-job seed + two micro-batches == one-shot grid") {
    import graft.functions.CountMin
    implicit val sc = spark.sqlContext
    val base = "target/tmp/stream_cms"
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 64L, keyCols = Seq("r", "bucket")))
    val all = ((1 to 40).map(i => s"tok${i % 7}") ++ (1 to 20).map(i => s"rare$i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // a BATCH job seeds the store; the stream appends to the same grid —
    // the shared write contract of the sink families
    CountMin.incrementalAppend(ps, "cms",
      all.filter(_._1 % 3 == 0).toDF("id", "tok"), "tok", modified = 0L)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingRollup.cmsSink(
      mem.toDF().toDF("id", "tok").select("tok"), ps, "cms", "tok")
    try {
      mem.addData(all.filter(_._1 % 3 == 1): _*)
      q.processAllAvailable()
      mem.addData(all.filter(_._1 % 3 == 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val stored = ps.readPart("cms").get.select("r", "bucket", "cnt")
      .orderBy("r", "bucket").collect().toSeq
    val fresh = CountMin.sketch(all.toDF("id", "tok"), "tok", None)
      .orderBy("r", "bucket").collect().toSeq
    assert(stored == fresh)
    val est = CountMin.estimateStored(ps, "cms",
      Seq(("tok1", 6L)).toDF("tok", "exact_cnt"), "tok").head
    assert(est.getAs[Long]("est") >= 6L)
  }

  test("streaming indexSink grows the IVF-PQ index batch by batch; retrieval matches fresh") {
    import graft.functions.Similarity
    implicit val sc = spark.sqlContext
    val dim = 16
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val corpus = (0 until 80).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroidsRefined(corpus, "vec_id", "embedding", 4)
    val cbs = Similarity.pqCodebooksRefined(
      corpus, "vec_id", "embedding", m = 4, k = 4, dim = dim)
    val base = "target/tmp/stream_index"
    Similarity.saveCentroids(spark, s"$base/centroids", cents)
    Similarity.savePqCodebooks(spark, s"$base/codebooks", cbs)
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 86400))
    ps.deletePart("emb")
    val mem = MemoryStream[(Long, Seq[Float])]
    val ckpt = s"$base/_checkpoint_${System.nanoTime()}"
    val q = StreamingRollup.indexSink(
      mem.toDF().toDF("vec_id", "embedding"), ps, "emb",
      s"$base/centroids", s"$base/codebooks", "vec_id", "embedding",
      nowSec = () => 42L, checkpointLocation = Some(ckpt))
    val rows = corpus.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    mem.addData(rows.filter(_._1 % 2 == 0).toSeq: _*)
    q.processAllAvailable()
    mem.addData(rows.filter(_._1 % 2 == 1).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val stored = ps.readPart("emb").get.select(
      col("entity_id").as("vec_id"), col("embedding"),
      col("bucket"), col("pq_code"))
    assert(stored.count() == 80)
    val queries = corpus.filter(col("vec_id") < 8)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    // the streamed two-batch index answers exactly like a fresh
    // whole-corpus build — write-time bucket/code == single-pass assignment
    val viaStream = res(Similarity.ivfPqTopKStored(queries, stored, corpus,
      "vec_id", "embedding", "bucket", "pq_code", cents, cbs,
      k = 3, nProbe = 2, shortlist = 10))
    val fresh = res(Similarity.ivfPqTopK(queries,
      Similarity.pqEncodeArray(corpus, "vec_id", "embedding", cbs), corpus,
      "vec_id", "embedding", cents, cbs, k = 3, nProbe = 2, shortlist = 10))
    assert(viaStream == fresh)
  }

}
