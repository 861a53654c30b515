package graft.operators

import graft.SparkSpec
import graft.model.InstanceModel
import org.apache.spark.sql.functions._

class CompilerSkewSpec extends SparkSpec {
  import spark.implicits._

  private val store = InstanceModel.parseTrendStore(
    """title: t
      |data_source: hub
      |entity_type: node
      |granularity: 15m
      |partition_size: 1d
      |parts:
      |  - name: p
      |    trends:
      |      - name: drops
      |        data_type: smallint
      |      - name: ccr
      |        data_type: double precision
      |        time_aggregation: avg
      |        entity_aggregation: avg
      |""".stripMargin)

  test("compiled time aggregation: metadata fns, samples injection, widening") {
    val df = Seq(
      (1L, 100L, 5, 0.5), (1L, 200L, 7, 0.7), (1L, 4000L, 1, 0.1)
    ).toDF("entity_id", "timestamp", "drops", "ccr")
    val rollup = AggregationCompiler.timeAggregation(store.parts.head, 3600L)(df)
      .sort("timestamp").collect()
    assert(rollup.length == 2)
    val r0 = rollup(0)
    assert(r0.getAs[Long]("samples") == 2)
    assert(r0.getAs[Long]("drops") == 12L)       // smallint sum → bigint (D4)
    assert(r0.getAs[Double]("ccr") == 0.6)       // avg double → double
  }

  test("compiled entity aggregation uses entity_aggregation fns") {
    val df = Seq((1L, 3600L, 5, 0.5), (2L, 3600L, 7, 0.7))
      .toDF("entity_id", "timestamp", "drops", "ccr")
    val rel = Seq((1L, 10L), (2L, 10L)).toDF("source_id", "target_id")
    val up = AggregationCompiler.entityAggregation(store.parts.head, rel)(df).collect()
    assert(up.length == 1)
    assert(up.head.getAs[Long]("entity_id") == 10L)
    assert(up.head.getAs[Long]("drops") == 12L)
    assert(up.head.getAs[Double]("ccr") == 0.6)
  }

  test("salted aggregate equals direct aggregate") {
    val df = (1 to 1000).map(i => (i % 3L, i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
      .sort("k").collect()
    val salted = SkewOps.saltedAggregate(df, Seq("k"), salts = 8,
      partials = Seq(sum("v").as("v_sum"), count(lit(1)).as("n")),
      finals = Seq(sum("v_sum").as("v_sum"), sum("n").cast("long").as("n")))
      .sort("k").collect()
    assert(direct.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("bucket capping drops only oversized buckets") {
    val b = (Seq.fill(20)(1L) ++ Seq(2L, 2L, 3L)).zipWithIndex
      .map { case (bk, i) => (bk, i.toLong) }.toDF("bucket", "id")
    val (kept, dropped) = SkewOps.capBuckets(b, "bucket", maxSize = 5)
    assert(dropped.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(kept.select("bucket").distinct().collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("timestamp mappings keep aligned end-labels fixed ((start, end] convention)") {
    // the hourly label 24:00 is the END of day 1's last hour — it belongs
    // to the day ending 24:00, NOT day 2 (truncate+step would misattribute
    // the last source window of every target window)
    val m = TimestampMappings.resolve("trend.mapping_1h->1d")
    val out = Seq(86400L, 86401L, 82800L, 1L).toDF("ts")
      .select(col("ts"), m(col("ts")).as("m")).sort("ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(86400L) == 86400L) // aligned end-label stays
    assert(out(86401L) == 172800L)
    assert(out(82800L) == 86400L)
    assert(out(1L) == 86400L)
    val mw = TimestampMappings.resolve("mapping_1d->1w")
    // 1970-01-12 00:00 (345600 + 604800) is Monday-aligned — stays
    val w = Seq(950400L, 950401L).toDF("ts").select(mw(col("ts"))).collect()
    assert(w(0).getLong(0) == 950400L && w(1).getLong(0) == 1555200L)
  }

  test("lshCandidates maxBucket bounds a degenerate bucket's pair blowup") {
    import graft.functions.Dedup
    // one hot (band,key) shared by 50 docs (uncapped: 50*49/2 = 1225 pairs)
    // plus one healthy bucket of 3 docs (3 pairs)
    val hot = (1L to 50L).map(id => (id, 0, "deadbeef"))
    val ok = Seq((100L, 1, "cafe"), (101L, 1, "cafe"), (102L, 1, "cafe"))
    val buckets = (hot ++ ok).toDF("doc_id", "band", "key")
    val uncapped = Dedup.lshCandidates(buckets, "doc_id").count()
    val capped = Dedup.lshCandidates(buckets, "doc_id", maxBucket = 10).count()
    assert(uncapped == 1225 + 3)
    assert(capped == 3) // hot bucket dropped entirely, healthy one intact
  }

  test("bucket caps plan with no Window on the capped key (hot-bucket safety)") {
    import graft.functions.Dedup
    // A count-over-window cap would hash-partition ALL rows of the hottest
    // bucket onto one task — the exact degenerate key the cap exists to
    // kill. The aggregate+join cap must leave no Window in the plan.
    val hot = (1L to 50L).map(id => (id, 0, "deadbeef"))
    val ok = Seq((100L, 1, "cafe"), (101L, 1, "cafe"), (102L, 1, "cafe"))
    val buckets = (hot ++ ok).toDF("doc_id", "band", "key")
    val capped = SkewOps.keepSmallKeys(buckets, Seq("band", "key"), 10)
    assert(capped.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(100L, 101L, 102L))
    assert(!capped.queryExecution.executedPlan.toString.contains("Window"))
    val pairs = Dedup.lshCandidates(buckets, "doc_id", maxBucket = 10)
    assert(!pairs.queryExecution.executedPlan.toString.contains("Window"))
    val sh = (1L to 30L).map(id => (id, "common")).toDF("doc_id", "shingle")
    val jac = Dedup.jaccardPairs(sh, "doc_id", 0.0, maxDocFreq = 10)
    assert(!jac.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("keepSmallKeys shuffles df ONCE: size agg reuses the probe exchange") {
    val hot = (1L to 50L).map(id => (id, 0, "deadbeef"))
    val ok = Seq((100L, 1, "cafe"), (101L, 1, "cafe"), (102L, 1, "cafe"))
    val buckets = (hot ++ ok).toDF("doc_id", "band", "key")
    val capped = SkewOps.keepSmallKeys(buckets, Seq("band", "key"), 10)
    capped.collect() // let AQE finalize the plan before inspecting it
    // inspect only the AQE final plan (the dump repeats the pre-reuse
    // initial plan below it)
    val plan = capped.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the size-aggregate branch must read the probe branch's shuffle, not
    // re-shuffle (and re-compute the upstream of) df a second time
    assert(plan.contains("ReusedExchange"), s"no ReusedExchange in:\n$plan")
    val freshShuffles = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
      .size
    assert(freshShuffles == 1, s"expected exactly one fresh shuffle of df:\n$plan")
  }

  test("keepSmallKeys drops NULL-key rows explicitly (documented contract)") {
    val rows = Seq((1L, Some("a")), (2L, Some("a")), (3L, None: Option[String]))
      .toDF("doc_id", "key")
    val kept = SkewOps.keepSmallKeys(rows, Seq("key"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("contamination flags eval n-gram overlap via a BROADCAST join") {
    import graft.functions.Dedup
    val train = Seq(
      (1L, "a b c"), (1L, "b c d"), (1L, "x y z"), // doc 1: 2 eval hits
      (2L, "p q r"), (2L, "q r s"),                 // doc 2: 1 hit
      (3L, "m n o")                                  // doc 3: clean
    ).toDF("doc_id", "shingle")
    val eval = Seq((100L, "a b c"), (100L, "b c d"), (101L, "q r s"))
      .toDF("doc_id", "shingle")
    val out = Dedup.contamination(train, eval, "doc_id", minOverlap = 2)
    val rows = out.sort("doc_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq == Seq((1L, 3L, 2L, true), (2L, 2L, 1L, false), (3L, 1L, 0L, false)))
    // the corpus side must meet the eval set in a broadcast join — the
    // 100 TB side never shuffles for the membership check
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("contaminationBloom equals the exact path; bloom really prunes") {
    import graft.functions.Dedup
    // larger corpus so the prefilter's selectivity is observable
    val train = (1L to 400L).flatMap { d =>
      Seq((d, s"uniq $d a"), (d, s"uniq $d b"), (d, s"shared ${d % 7}"))
    }.toDF("doc_id", "shingle")
    val eval = Seq((900L, "shared 0"), (900L, "shared 1"), (901L, "absent x"))
      .toDF("doc_id", "shingle")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.sort("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // tier-2 confirm kills bloom false positives → bit-identical output
    assert(rows(Dedup.contaminationBloom(train, eval, "doc_id", minOverlap = 1)) ==
      rows(Dedup.contamination(train, eval, "doc_id", minOverlap = 1)))
    // the prefilter is the codegen'd BloomFilterMightContain expression
    // sitting as a Filter BEFORE the confirm join — not a UDF. Checked on
    // the ANALYZED plan: over a LocalRelation the optimizer evaluates the
    // filter eagerly (ConvertToLocalRelation), so it leaves the physical
    // plan; a file-backed corpus keeps it at the scan
    val plan = Dedup.contaminationBloom(train, eval, "doc_id", minOverlap = 1)
      .queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), plan)
    // empty eval set: empty sketch → nothing contaminated, no NPE
    val none = Dedup.contaminationBloom(train,
      eval.filter(col("doc_id") < 0), "doc_id", minOverlap = 1)
    assert(none.filter(col("contaminated")).count() == 0)
    assert(none.count() == 400)
    // caller-sized sketch (expectedEvalNgrams > 0 skips the count job)
    // produces identical results
    assert(rows(Dedup.contaminationBloom(train, eval, "doc_id",
      minOverlap = 1, expectedEvalNgrams = 1000L)) ==
      rows(Dedup.contamination(train, eval, "doc_id", minOverlap = 1)))
  }

  test("stratifiedSample is deterministic, rate-faithful and shuffle-free") {
    import graft.functions.TextAnalysis
    val docs = (1L to 2000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5)
    val a = TextAnalysis.stratifiedSample(docs, "doc_id", "source", rates, 0.25)
    val b = TextAnalysis.stratifiedSample(
      docs.repartition(7), "doc_id", "source", rates, 0.25)
    val idsA = a.select("doc_id").collect().map(_.getLong(0)).toSet
    // identical across partition layouts (seedless hash coin, not RNG)
    assert(idsA == b.select("doc_id").collect().map(_.getLong(0)).toSet)
    val bySrc = a.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 500L)        // rate 1.0 keeps all
    assert(!bySrc.contains("src1"))      // rate 0.0 keeps none
    assert(math.abs(bySrc("src2") - 250L) < 75) // ~0.5 of 500
    assert(math.abs(bySrc("src3") - 125L) < 60) // default 0.25 of 500
    // pure filter: no exchange in the plan
    assert(!a.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
  }

  test("jaccardPairs maxDocFreq drops boilerplate shingles consistently") {
    import graft.functions.Dedup
    // shingle "common" appears in all 30 docs (f² = 435 join rows, zero
    // signal); docs 1/2 also share a discriminative shingle.
    val boiler = (1L to 30L).map(id => (id, "common"))
    val real = Seq((1L, "rare pair x"), (2L, "rare pair x"))
    val sh = (boiler ++ real).toDF("doc_id", "shingle")
    val capped = Dedup.jaccardPairs(sh, "doc_id", 0.0, maxDocFreq = 10)
      .collect()
    // only (1,2) survives, with counts computed on the FILTERED universe:
    // each has 1 shingle post-filter, intersection 1 → jaccard = 1.0
    assert(capped.length == 1)
    val r = capped.head
    assert(r.getAs[Long]("id1") == 1L && r.getAs[Long]("id2") == 2L)
    assert(r.getAs[Double]("jaccard") == 1.0)
  }
  test("keepSmallKeys tolerates MapType payload columns (anchored by size)") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"))
      .toDF("k", "v").withColumn("props", map(lit("x"), col("v")))
    val out = SkewOps.keepSmallKeys(df, Seq("k"), maxSize = 1)
    assert(out.select("k").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

}
