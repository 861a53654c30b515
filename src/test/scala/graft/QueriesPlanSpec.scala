package graft

/** Plan-shape gates for inventory queries whose scale story depends on
  * the ABSENCE of specific physical operators (the CorpusCleanSpec
  * no-Window convention, applied at the query level): a regression that
  * re-introduces a size-unbounded Window (one partition sorting a whole
  * language/source) would still be hash-green at sf0.01 — only the plan
  * reveals it. */
class QueriesPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Windows whose partition key bounds the frame to a constant are
    * fine; a SIZE-UNBOUNDED window (partition = a whole language /
    * source / the corpus) is the scale-killer. These queries must plan
    * with NO Window at all. */
  private val noWindowQueries = Seq(
    "q135_perplexity_filter", // tercile cutoffs are a broadcast agg
    "q141_curation_capstone", // same cutoff shape + map-side chunking
    "q195_weighted_sample",   // A-ES top-n via the bounded TopKPairs agg
    "q196_rrf_hybrid",        // both tiers + the fused cut are bounded aggs
    "q197_mmr_diversify",     // greedy rounds are max/argmax aggregates
    "q198_split_leakage",     // pair tier × split: joins only
    "q199_source_drift",      // one token pass + |groups|·64-row folds
    "q200_curation_select",   // capstone: all component shapes, no window
    "q201_setsim_join",       // prefix-filter joins + bounded per-doc arrays
    "q202_setsim_incremental", // same shapes against persisted stores
    "q203_tpch_q2",           // correlated-min → agg + equality join-back
    "q204_tpch_q11",          // scalar threshold → broadcast cross-join
    "q205_tpch_q12",          // CASE'd counts, one fact⋈fact join
    "q206_tpch_q15",          // max-revenue scalar → broadcast cross-join
    "q207_tpch_q16",          // distinct pairs + broadcast dims
    "q208_tpch_q20",          // share predicate via agg joins, no rank
    "q209_tpch_q21",          // EXISTS/NOT EXISTS → semi/anti self-joins
    "q215_winsorized",        // R-7 cutoff broadcast + exact components
    "q219_record_linkage",    // blocking passes are equi-joins only
    "q222_m4_downsample",     // one min_by/max_by aggregate, no window
    "q223_k_anonymity",       // one grouped count
    "q225_quarantine",        // single-pass audited read + two aggregates
    "q228_cooccurrence",      // offset-expand equi-join, no range window
    "q232_trend_slope",       // one map-side moment aggregate
    "q235_bm25_logidf",       // aggregates + TakeOrdered, no rank window
    "q236_bm25_logidf_stored", // same shapes over the pruned store scan
    "q240_pivot_wide",        // pivot = ONE CASE-projection aggregate
    "q241_unpivot_long",      // unpivot = map-side explode, no shuffle
    "q242_cube_report",       // cube expands grouping sets BEFORE the shuffle
    "q245_zonemap_scan",      // pruned read + one aggregate
    "q248_dq_audit",          // one scan for all row rules + keyed agg + anti-join
    "q249_snapshot_diff",     // one full-outer key join, then projections
    "q252_robust_outliers",   // three keyed aggregates, no rank/row_number
    "q253_boolean_search",    // postings intersection = grouped count + anti-join
    "q254_phrase_search",     // positional equi-join on (doc, pos+1)
    "q255_table_stats",       // one Expand aggregate + 1-row restack
    "q256_staleness_chain",   // store loop: semi-joins + aggregates only
    "q258_proximity_search",  // banded positional equi-join
    "q264_suffix_dedup",      // rank-attach rounds; the per-doc (≤cap-row)
                              // lead windows sit before localCheckpoints,
                              // so the final plan is checkpoint scans +
                              // joins + aggregates (the q268 convention)
    "q267_span_corruption",   // block aggregate + md5-key join-back
    "q270_wav_loudness",      // narrow per-blob decode, zero shuffles
    "q271_wav_silence",       // narrow per-blob decode, zero shuffles
    "q272_bmp_pixels",        // narrow per-blob decode, zero shuffles
    "q280_audio_fingerprint", // narrow envelope + fp-keyed aggregate
    "q281_l_diversity",       // one grouped count + distinct count
    "q282_negative_sampling", // broadcast catalog + sorted-slice agg, no rank
    "q283_fim_transform",     // pure per-row expressions
    "q284_retrieval_eval",    // zipWithIndex ranks + aggregates
    "q285_deepwalk",          // min_by hops, message-passing joins
    "q286_epoch_shuffle",     // zipWithIndex permutation, grouped counts
    "q298_ndcg",              // zipWithIndex ideal ranks + bounded joins
    "q300_ngram_precision",   // per-n gram bags: equi-joins + grouped sums
    "q301_curriculum_interleave") // two zipWithIndex ranks + broadcast offsets

  /** The remaining TPC-H shapes: dims must broadcast (a fact-side
    * SortMergeJoin against a 100-row dim means the 100 TB fact shuffled
    * for nothing); the self-joins in q209 are the only legitimate
    * fact⋈fact SMJs in the seven new gates. */
  test("q203/q204/q206/q208 join dims by broadcast, never by fact shuffle") {
    for (q <- Seq("q203_tpch_q2", "q204_tpch_q11", "q206_tpch_q15",
        "q208_tpch_q20")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$q: dim join fell back to SMJ:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q: cartesian product:\n$plan")
    }
  }

  for (q <- noWindowQueries)
    test(s"$q plans with no Window operator") {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    }

  /** Windows that DO exist must be keyed (per-doc / per-entity ordered
    * scans — bounded by one key's row count), never global. */
  private val keyedWindowQueries = Seq(
    "q178_cdc_chunks" -> "doc_id",        // per-doc boundary prefix sum
    "q181_interval_coverage" -> "user_id", // per-user interval merge
    "q211_hdr_quantiles" -> "source",     // cumsum over SKETCH rows (≤64·2^p/group)
    "q216_hdr_incremental" -> "source",   // same extraction over the stored sketch
    "q220_transitions" -> "user_id",      // per-user bigram lead
    "q221_cusum" -> "user_id",            // per-user prefix scans
    "q224_locf_gapfill" -> "user_id",     // per-user LOCF over 120 buckets
    "q227_time_weighted_avg" -> "user_id", // per-user interval lead
    "q233_funnel_latency" -> "stage",      // cumsum over sketch rows
    "q238_live_monitor" -> "entity_id",    // notification PK dedup window
    "q250_attr_asof" -> "user_id",         // SCD-2 validity windows per entity
    "q257_lag_features" -> "user_id",      // multi-horizon RANGE frames per entity
    "q259_top_paths" -> "user_id",         // sessionize windows per entity
    "q266_pack_sequences" -> "__pid",      // cumsum keyed by PHYSICAL partition
    "q274_gram_novelty" -> "doc_id",       // per-doc gram lead
    "q275_bigram_lm_score" -> "doc_id",    // per-doc adjacency lead
    "q276_turn_truncate" -> "doc_id",      // per-doc prefix/suffix cumsums
    "q297_suffix_incremental" -> "doc_id", // per-doc dup-run islands
    "q299_contamination_spans" -> "doc_id") // per-eval-doc run islands
    // (q268's doc-keyed adjacency window sits BEFORE its counts
    // localCheckpoint, so the final plan shows no Window to assert on)

  for ((q, key) <- keyedWindowQueries)
    test(s"$q windows are keyed by $key, never global") {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
      assert(windowLines.nonEmpty, s"expected a keyed window in:\n$plan")
      assert(windowLines.forall(_.contains(key)),
        s"window not keyed by $key:\n$plan")
    }

  test("q311 winnowing resolver is join-free (single struct-min window pass)") {
    // history: the r15 resolver joined wins to grams on doc_id ALONE with
    // the position range as a post-filter — |wins|·|grams| ≈ L² pairs
    // inside one doc's task, quadratic in doc LENGTH and invisible to the
    // sf ladder (which scales doc count). r16 fixed the join's keys; r17
    // removed the join entirely: min(struct(h, -pos)) over the winnowing
    // window yields the min AND its rightmost position in one WindowExec
    // pass. Guard: the fingerprint plan must contain NO join at all (a
    // join reappearing means the resolver regressed to a shape that can
    // lose its keys) and its window must be keyed by doc_id.
    val df = SparkEntry.queries("q311_winnowing")(spark, dir)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    val joins = plan.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin") ||
        l.contains("BroadcastNestedLoopJoin") ||
        l.contains("CartesianProduct")).toSeq
    assert(joins.isEmpty, s"winnowing resolver must be join-free:\n$plan")
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("doc_id")),
      s"expected doc_id-keyed windows:\n$plan")
  }

  test("winnowPairs candidate self-join carries the fingerprint hash h " +
      "in its equi-keys (guards q316/q322/q325 — one shared code path)") {
    // the candidate tier must stay hash-bucketed: a join that loses `h`
    // from its keys (e.g. doc-only with an h post-filter) would enumerate
    // cross products inside a task — the q311-class bug, pair flavor.
    // q325's incremental probe routes through this same function, so the
    // guard covers the stored tier too (its gate plan hides behind the
    // eager snapshot checkpoints).
    import spark.implicits._
    val fps = Seq((1L, 10L, 0L), (2L, 10L, 1L), (3L, 11L, 2L))
      .toDF("doc_id", "h", "pos")
    val df = graft.functions.Dedup.winnowPairs(fps, minShared = 1,
      maxDocFreq = 50)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    val selfJoins = plan.linesIterator.filter(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("doc_id")).toSeq
    assert(selfJoins.nonEmpty, s"expected the candidate self-join in:\n$plan")
    assert(selfJoins.forall(l => l.contains("h#")),
      s"candidate join keys missing h:\n$plan")
  }

  test("q185 bucketed join shuffles NEITHER fact side when broadcast is off") {
    // at gate SF Catalyst (correctly) broadcasts the small side, which
    // hides what bucketing buys; disabling auto-broadcast simulates the
    // at-scale condition — two facts too big to broadcast — where the
    // bucketed SMJ must read pre-bucketed, pre-sorted parquet with NO
    // exchange and NO sort on either input
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q185_bucketed_join")(spark, dir)
      df.collect() // finalize the AQE plan before reading it
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a bucketed SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      // the groupBy/orderBy exchanges remain; a join-KEY exchange means
      // bucketing was ignored and the 100 TB fact⋈fact join pays the
      // full network cost
      for (key <- Seq("o_orderkey", "l_orderkey"))
        assert(!plan.linesIterator.exists(l =>
            l.contains("Exchange") && l.contains(key)),
          s"fact side shuffled on $key:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
