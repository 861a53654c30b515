package graft

import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core operator inventory (SURVEY §2 A-I): each entry is a named query over
  * the driver's fixture tables plus DuckDB oracle SQL with byte-identical
  * results.
  *
  * Cross-engine determinism rules used throughout:
  *  - timestamps are BIGINT epoch values (fixtures are TIMESTAMP(NANOS) →
  *    Spark reads nanos longs; DuckDB side uses epoch_ns()//1e9)
  *  - double aggregation goes through DECIMAL (exact) and casts the final
  *    value back to double (exact decimal→double, identical in both)
  *  - ratio outputs are exact-int divisions in double
  *  - string aggregation is always explicitly ordered
  */
object QueriesCore {
  import Tables.load

  // epoch-seconds SQL fragments
  private val tsSec = "(ts div 1000000000)" // Spark
  private def events(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events").withColumn("ts_sec", expr(tsSec))

  /** q219/q247 shared linkage fixture: the master side (customer +
    * derived blocking keys) and the deterministically dirtied CRM copy
    * (typo'd names, one-off nations, floored balances, supplier noise). */
  private def linkageFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val c = load(s, dir, "customer")
    val leftDf = c.select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long").as("nk"), col("c_acctbal"),
        pmod(col("c_custkey"), lit(100)).as("tail"))
      .withColumn("nk_tail",
        concat_ws("|", col("nk"), col("tail")))
      .withColumn("digits",
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long"))
    val crm = c.select(
        (col("c_custkey") + 5000000L).as("acct_id"),
        when(pmod(col("c_custkey"), lit(3)) === 0,
          regexp_replace(col("c_name"), "Customer", "Custmer"))
          .when(pmod(col("c_custkey"), lit(3)) === 1, upper(col("c_name")))
          .otherwise(col("c_name")).as("acct_name"),
        when(pmod(col("c_custkey"), lit(17)) === 0,
          pmod(col("c_nationkey") + 1, lit(25)))
          .otherwise(col("c_nationkey")).cast("long").as("acct_nation"),
        floor(col("c_acctbal")).as("acct_bal"),
        pmod(col("c_custkey"), lit(100)).as("acct_tail"))
      .unionByName(load(s, dir, "supplier").select(
        (col("s_suppkey") + 6000000L).as("acct_id"),
        col("s_name").as("acct_name"),
        col("s_nationkey").cast("long").as("acct_nation"),
        floor(col("s_acctbal")).as("acct_bal"),
        pmod(col("s_suppkey"), lit(100)).as("acct_tail")))
      .withColumn("acct_nk_tail",
        concat_ws("|", col("acct_nation"), col("acct_tail")))
      .withColumn("acct_digits",
        regexp_extract(col("acct_name"), "([0-9]+)", 1).cast("long"))
    (leftDf, crm)
  }

  /** Blocked + Fellegi–Sunter-scored linkage matches (score ≥ 12):
    * (c_custkey, acct_id, score). The selective composite blocking keys
    * are the point — see q219's PLANS.md entry. */
  private def linkageMatches(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.RecordLinkage
    val (leftDf, crm) = linkageFrames(s, dir)
    val pairs = RecordLinkage.blockedPairs(leftDf, crm,
      "c_custkey", "acct_id",
      Seq("nk_tail" -> "acct_nk_tail", "digits" -> "acct_digits"))
    pairs
      .join(leftDf, "c_custkey").join(crm, "acct_id")
      .withColumn("score",
        (when(levenshtein(lower(col("c_name")), lower(col("acct_name"))) <= 2,
          8).otherwise(0)
        + when(col("digits") === col("acct_digits"), 4).otherwise(0)
        + when(col("c_acctbal") - col("acct_bal") >= 0 &&
            col("c_acctbal") - col("acct_bal") < 1, 2).otherwise(0)
        + when(col("nk") === col("acct_nation"), 1).otherwise(0))
          .cast("long"))
      .filter(col("score") >= 12)
      .select("c_custkey", "acct_id", "score")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- D1/D3: time aggregation with per-trend agg fns + samples ----
    "q01_time_agg" -> { (s, dir) =>
      TimeAggregation.rollup(
        events(s, dir), "user_id", "ts_sec", 3600L,
        Seq(
          TimeAggregation.samples,
          TrendAgg("value", "sum", "sum_value").exact(2),
          TrendAgg("value", "max", "max_value").exact(2),
          TrendAgg("value", "min", "min_value").exact(2)
        )
      ).orderBy("entity_id", "timestamp")
    },
    // ---- C1/D2: entity aggregation over a relation ----
    "q02_entity_agg" -> { (s, dir) =>
      val li = load(s, dir, "lineitem")
      val rel = load(s, dir, "supplier")
        .select(col("s_suppkey").as("source_id"), col("s_nationkey").cast("long").as("target_id"))
      EntityAggregation.aggregate(
        li.withColumn("one_ts", lit(0L)), rel, "l_suppkey", "one_ts",
        Seq(TimeAggregation.samples, TrendAgg("l_quantity", "sum", "sum_qty").exact(2))
      ).drop("timestamp").orderBy("entity_id")
    },
    // ---- D1→D2 chain: rollup then entity rollup (materialization chain) ----
    "q03_rollup_chain" -> { (s, dir) =>
      val hourly = TimeAggregation.rollup(
        events(s, dir), "user_id", "ts_sec", 3600L,
        Seq(TimeAggregation.samples, TrendAgg("value", "sum", "sum_value").exact(2)))
      val rel = hourly.select(col("entity_id").as("source_id"))
        .distinct().withColumn("target_id", pmod(col("source_id"), lit(10L)))
      EntityAggregation.aggregate(
        hourly, rel, "entity_id", "timestamp",
        Seq(sum(col("samples")).as("samples"),
          sum(col("sum_value").cast("decimal(30,2)")).cast("double").as("sum_value"))
      ).orderBy("entity_id", "timestamp")
    },
    // ---- D6: package merge (column union + last-wins per column) ----
    "q04_merge_packages" -> { (s, dir) =>
      val e = events(s, dir)
      val hr = (col("ts_sec") - pmod(col("ts_sec"), lit(3600L))).as("hr")
      val pkg1 = e.filter(col("event_type") === "click")
        .select(col("user_id"), hr, col("value").as("counter_a"), col("event_id"))
      val pkg2 = e.filter(col("event_type") === "error")
        .select(col("user_id"), hr, col("value").as("counter_b"), col("event_id"))
      PackageOps.mergePackages(Seq(pkg1, pkg2), Seq("user_id", "hr"), "event_id")
        .orderBy("user_id", "hr")
    },
    // ---- D9/E1: latest-per-entity (curr-ptr) ----
    "q05_current_ptr" -> { (s, dir) =>
      val o = load(s, dir, "orders")
      AttributeOps.currentPtr(o, "o_custkey", Seq("o_orderdate", "o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          Tables.secCol(o, "o_orderdate").as("order_sec"))
        .orderBy("o_custkey")
    },
    // ---- D10/E2: compaction (drop rows equal to previous) ----
    "q06_compact" -> { (s, dir) =>
      AttributeOps.compact(events(s, dir), "user_id",
          Seq("ts", "event_id"), Seq("event_type"))
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id", "event_id")
    },
    // ---- SCD-2 history with validity ranges ----
    "q07_scd2" -> { (s, dir) =>
      // µs precision: DuckDB truncates the fixtures' nano timestamps to
      // micros at read, so cross-checkable outputs are µs.
      AttributeOps.scd2(events(s, dir), "user_id", "ts", Seq("event_id"), Seq("event_type"))
        .select(col("user_id"), col("event_type"),
          expr("valid_from div 1000").as("valid_from_us"),
          expr("valid_to div 1000").as("valid_to_us"))
        .orderBy("user_id", "valid_from_us")
    },
    // ---- A6/A7/A8: MERGE upsert (batch wins, greatest(modified), created kept) ----
    "q08_upsert" -> { (s, dir) =>
      val o0 = load(s, dir, "orders")
      val o = o0.withColumn("sec", Tables.secCol(o0, "o_orderdate"))
      val target = o.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"), col("sec").as("modified"),
          col("sec").as("created"))
      val batch = o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"),
          (col("sec") + 100).as("modified"), (col("sec") + 100).as("created"))
      Upsert.merge(target, batch, Seq("o_orderkey"), "modified", Some("created"))
        .orderBy("o_orderkey")
    },
    // ---- C2: entity resolution with deterministic id allocation ----
    "q09_entity_resolution" -> { (s, dir) =>
      val dim = load(s, dir, "supplier").select(col("s_name").as("name"), col("s_suppkey").as("id"))
      val incoming = load(s, dir, "supplier").filter(col("s_suppkey") <= 50)
        .select(col("s_name").as("name"))
        .union(load(s, dir, "part").select(col("p_brand").as("name")))
      EntityResolution.resolveRank(incoming, dim).orderBy("name")
    },
    // ---- C3/A12: anti-join (insert-missing / virtual entities) ----
    "q10_anti_join" -> { (s, dir) =>
      // "insert-missing" shape: customers with no recent order
      val recent = load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(946684800L * Tables.NanosPerSecond))
      load(s, dir, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    // ---- B5: predicate AST surface (and/or/in/between/comparison) ----
    "q11_predicates" -> { (s, dir) =>
      load(s, dir, "lineitem")
        .filter((col("l_returnflag") === "R" || col("l_linestatus") === "F") &&
          col("l_quantity") >= 30 && col("l_discount").between(0.02, 0.08) &&
          col("l_shipdate") > lit(820454400L * Tables.NanosPerSecond))
        .filter(col("l_linenumber").isin(1, 2, 3, 4))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // ---- H10/B1: generated trends (expression columns) + projection ----
    "q12_generated_trend" -> { (s, dir) =>
      load(s, dir, "lineitem")
        .withColumn("net_price",
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double"))
        .withColumn("qty_class",
          when(col("l_quantity") >= 40, "high").when(col("l_quantity") >= 20, "mid")
            .otherwise("low"))
        .select("l_orderkey", "l_linenumber", "net_price", "qty_class")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // ---- D7/I1: modified log fold + fingerprint aggregate ----
    "q13_fingerprint" -> { (s, dir) =>
      val state = Materialization.modifiedState(
        load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        Seq("user_id", "event_type"), "ts_us")
      Materialization.fingerprint(state, "user_id", "event_type", "last_modified")
        .orderBy("user_id")
    },
    // ---- B6/I2: staleness selection by fingerprint mismatch ----
    "q14_stale_chunks" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("hr", (col("ts_sec") - pmod(col("ts_sec"), lit(3600L))).cast("long"))
        .withColumn("ts_us", expr("ts div 1000"))
      def fp(df: DataFrame) = Materialization.fingerprint(
        Materialization.modifiedState(df, Seq("hr", "event_type"), "ts_us"),
        "hr", "event_type", "last_modified")
      val src = fp(e)
      val processed = fp(e.filter(col("ts_sec") < 1705276800L)) // < 2024-01-15
      Materialization.staleChunks(src, processed, "hr")
        .select("hr", "max_modified").orderBy("hr")
    },
    // ---- C6/H7: generate_series expansion + left join ----
    "q15_series_join" -> { (s, dir) =>
      val hours = s.range(1).select(explode(
        sequence(lit(1704067200L), lit(1706655600L), lit(3600L))).as("hr"))
      val counts = events(s, dir)
        .groupBy((col("ts_sec") - pmod(col("ts_sec"), lit(3600L))).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      hours.join(counts, Seq("hr"), "left")
        .select(col("hr"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("hr")
    },
    // ---- D5: report aggregates ----
    "q16_report" -> { (s, dir) =>
      load(s, dir, "events").agg(
        count(lit(1)).as("row_count"),
        countDistinct(col("user_id")).as("entity_count"),
        max(expr("ts div 1000")).as("max_ts_us"),
        min(expr("ts div 1000")).as("min_ts_us"))
    },
    // ---- F1/F2: order-by + limit (top-k) ----
    "q17_topk" -> { (s, dir) =>
      load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    },
    // ---- H14: calendar-month granularity rollup ----
    "q18_month_rollup" -> { (s, dir) =>
      load(s, dir, "orders")
        .groupBy(unix_timestamp(date_trunc("month",
          timestamp_micros(expr("o_orderdate div 1000")))).as("month_start"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_total"))
        .orderBy("month_start")
    },
    // ---- H8/partitioning: partition index assignment ----
    "q19_partition_index" -> { (s, dir) =>
      val li = load(s, dir, "lineitem")
      val sec = Tables.secCol(li, "l_shipdate")
      li.groupBy((sec - pmod(sec, lit(345600L))).divide(345600).cast("long").as("pindex"))
        .agg(count(lit(1)).as("n"), min(sec).as("min_sec"), max(sec).as("max_sec"))
        .orderBy("pindex")
    },
    // ---- H13 granularity parser, driver-gated (was spec-only): the
    // reference's spellings (granularity.py:97-152 — bare seconds, short
    // and verbose units) through parse → canonical name + truncate/next
    // of the corpus' max event second, UTC. The instant is data-derived
    // so the gate exercises parser AND calendar arithmetic against the
    // oracle's date_trunc/interval replay, not a frozen literal. ----
    "q335_granularity_parse" -> { (s, dir) =>
      import s.implicits._
      val maxSec = events(s, dir).agg(max(col("ts_sec"))).head.getLong(0)
      val zone = java.time.ZoneId.of("UTC")
      val t = java.time.Instant.ofEpochSecond(maxSec)
      Seq("900", "900 seconds", "15m", "30 min", "1h", "4 hours",
          "1d", "2 days", "1w", "1 month", "3 months", "1y")
        .map { g =>
          val gr = graft.core.Granularity.parse(g)
          val tr = gr.truncate(t, zone)
          (g, gr.name, tr.getEpochSecond, gr.next(tr, zone).getEpochSecond)
        }
        .toDF("gran", "gname", "trunc_sec", "next_sec")
        .orderBy("gran")
    },
    // ---- A13 sample-data generator, driver-gated (was spec-only): a
    // 3-node/2-trend template rendered over 24 fixed hourly intervals
    // (generate_sample_data.py:61-110's render loop with a pinned `now`),
    // ingested back through the CSV trend source, aggregated per
    // interval. Values are md5-derived (SampleDataGen's engine-exact
    // convention) so the oracle REGENERATES them in SQL — the gate proves
    // generate AND ingest, not just row counts. Milli-scaling keeps the
    // compared sums integral (the repo's exact-aggregation convention). ----
    "q337_sample_data_gen" -> { (s, dir) =>
      import graft.core.MinervaType
      import graft.sources.{CsvSourceConfig, CsvTrendSource, SampleDataGen}
      val work = java.nio.file.Files.createTempDirectory("graft_q337_").toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$work/sample.csv"),
        "node,timestamp,power,temp\n" +
          "n1,{{ timestamp }},{{ power[0] }},{{ temp[0] }}\n" +
          "n2,{{ timestamp }},{{ power[1] }},{{ temp[1] }}\n" +
          "n3,{{ timestamp }},{{ power[2] }},{{ temp[2] }}\n")
      // 24 hourly intervals ending 2024-01-16T00:00:00Z — the reference's
      // end = truncate(now) walk-back with `now` pinned for determinism
      val tss = (0 until 24).map(i => 1705276800L + 3600L * i)
      SampleDataGen.generate(s"$work/sample.csv", s"$work/out", tss)
      val cfg = CsvSourceConfig("node", Some("timestamp"))
      val schema = Seq(
        "node" -> MinervaType.MText, "timestamp" -> MinervaType.MTimestamp,
        "power" -> MinervaType.MDouble, "temp" -> MinervaType.MDouble)
      CsvTrendSource.read(s, s"$work/out", cfg, schema)
        .groupBy(col("timestamp").as("ts_sec"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("entity")).as("n_nodes"),
          sum(round(col("power") * 1000).cast("long")).as("power_milli"),
          sum(round(col("temp") * 1000).cast("long")).as("temp_milli"),
          max(round(col("power") * 1000).cast("long")).as("max_power_milli"))
        .orderBy("ts_sec")
    },
    // ---- H14 zoned calendar truncation, driver-gated (q335 covers UTC):
    // truncate/next in Europe/Amsterdam across BOTH 2024 DST transitions.
    // The instants are fixed on purpose — they must straddle the
    // 2024-03-31 02:00→03:00 spring-forward gap and the 2024-10-27
    // 03:00→02:00 fall-back overlap (including one second in EACH pass of
    // the ambiguous hour); span_sec pins the 23 h spring day (82800) and
    // 25 h fall day (90000) that a fixed-86400 step would get wrong.
    // Seconds-based 1h is the zone-independent contrast row. Oracle
    // replays via DuckDB's icu timezone()/date_trunc. ----
    "q338_granularity_dst" -> { (s, dir) =>
      import s.implicits._
      val zone = java.time.ZoneId.of("Europe/Amsterdam")
      val secs = Seq(
        1711800000L, // 2024-03-30 12:00 UTC — day before spring-forward
        1711845000L, // 2024-03-31 00:30 UTC = 01:30 CET, pre-gap
        1711848600L, // 2024-03-31 01:30 UTC = 03:30 CEST, post-gap
        1729944000L, // 2024-10-26 12:00 UTC — day before fall-back
        1729989000L, // 2024-10-27 00:30 UTC = 02:30 CEST (1st pass, ambiguous)
        1729992600L) // 2024-10-27 01:30 UTC = 02:30 CET (2nd pass)
      val grans = Seq("1h", "1d", "1w", "1month")
      secs.flatMap { sec =>
        val t = java.time.Instant.ofEpochSecond(sec)
        grans.map { g =>
          val gr = graft.core.Granularity.parse(g)
          val tr = gr.truncate(t, zone).getEpochSecond
          val nx = gr.next(java.time.Instant.ofEpochSecond(tr), zone).getEpochSecond
          (sec, g, tr, nx, nx - tr)
        }
      }.toDF("sec", "gran", "trunc_sec", "next_sec", "span_sec")
        .orderBy("sec", "gran")
    },
    // ---- I6/H1/H11: trigger rule → notifications ----
    "q20_trigger" -> { (s, dir) =>
      val kpi = events(s, dir).select(
        col("user_id").as("entity_id"), col("ts_sec").as("timestamp"),
        col("value"), col("event_type"))
      TriggerOps.createNotifications(kpi, TriggerRule(
        name = "user/1h/highvalue",
        thresholds = Map("max_value" -> 40.0),
        condition = "event_type = 'error' AND value > max_value",
        weight = "CASE WHEN value > 48 THEN 10 WHEN value > 44 THEN 5 ELSE 1 END",
        details = concat(lit("HighValue: user "), col("entity_id").cast("string"),
          lit(" value "), col("value").cast("decimal(18,2)").cast("string"))
      )).orderBy("entity_id", "timestamp")
    },
    // ---- G: union-by-name with missing columns ----
    "q21_union_by_name" -> { (s, dir) =>
      val a = load(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("ekey"), col("n_name").as("name"),
          col("n_regionkey").as("regionkey"))
      val b = load(s, dir, "region")
        .select((col("r_regionkey") + 1000).cast("long").as("ekey"), col("r_name").as("name"))
      a.unionByName(b, allowMissingColumns = true).orderBy("ekey")
    },
    // ---- I7: retention window ----
    "q22_retention" -> { (s, dir) =>
      Materialization.retain(events(s, dir), "ts_sec", 1705276800L) // keep >= 2024-01-15
        .groupBy((col("ts_sec") - pmod(col("ts_sec"), lit(86400L))).as("day"))
        .agg(count(lit(1)).as("n"))
        .orderBy("day")
    },
    // ---- H6: JSON payload extraction ----
    "q23_json_props" -> { (s, dir) =>
      load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")
    },
    // ---- B5/G: array columns — build, sort, membership, length ----
    // Checked output is the ','-joined string form: the driver's compare
    // harness sorts columns with pandas, which cannot hash raw arrays.
    "q39_array_ops" -> { (s, dir) =>
      load(s, dir, "events")
        .groupBy("user_id")
        .agg(sort_array(collect_set(col("event_type"))).as("types_arr"))
        .select(col("user_id"),
          array_join(col("types_arr"), ",").as("types"),
          size(col("types_arr")).as("n_types"),
          array_contains(col("types_arr"), "error").as("has_error"))
        .orderBy("user_id")
    },
    // ---- Relation cardinality contract validation ----
    "q40_relation_cardinality" -> { (s, dir) =>
      val rel = load(s, dir, "orders")
        .select(col("o_custkey").as("source_id"), col("o_orderkey").as("target_id"))
      RelationOps.violations(rel, RelationOps.ManyToOne)
        .orderBy("violated_key")
    },
    // ---- Sessionization: gap-based session windows (lag + running sum) ----
    "q45_sessionize" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapped = e.withColumn("prev_sec", lag(col("ts_sec"), 1).over(wOrd))
        .withColumn("new_session",
          when(col("prev_sec").isNull || (col("ts_sec") - col("prev_sec")) > 1800, 1L)
            .otherwise(0L))
      gapped.withColumn("session_id",
          sum(col("new_session")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_sec")).as("session_start"),
          max(col("ts_sec")).as("session_end"))
        .orderBy("user_id", "session_id")
    },
    // ---- A1/A4/A5/B2/B4 + job log: full ingest round-trip ----
    // A deterministic CSV drop is derived from the events fixture, then
    // driven through the REAL ingest path: schema deduction (A4) → CSV
    // source normalize (A1) → existing-trend filter (B4) → split by part
    // (B2) → job-stamped PartStore writes (A5, I1) → read-back + join.
    // The oracle recomputes the expected end state straight from events.
    // ---- naive `timestamp` ≠ `timestamp with time zone` (datatype.py:
    // 207-275 vs 137-204): a naive-ts CSV keeps its wall-clock values
    // VERBATIM whatever session timezone the loader runs under. The same
    // file is deduced + loaded under UTC and under America/New_York; the
    // TIMESTAMP_NTZ column must be bit-identical in both (tz_invariant),
    // and the values hash-match DuckDB's (ntz) TIMESTAMP ----
    "q296_ntz_csv" -> { (s, dir) =>
      import graft.core.MinervaType
      import graft.sources.{CsvSourceConfig, CsvTrendSource}
      val work = java.nio.file.Files.createTempDirectory("graft_q296_").toString
      load(s, dir, "documents").select(
          col("doc_id").cast("string").as("entity"),
          concat(lit("2024-0"),
            (pmod(col("doc_id"), lit(9)) + 1).cast("string"), lit("-"),
            lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
            lit(" "),
            lpad(pmod(col("doc_id"), lit(24)).cast("string"), 2, "0"), lit(":"),
            lpad(pmod(col("doc_id") * 7, lit(60)).cast("string"), 2, "0"),
            lit(":00")).as("seen_at"),
          col("n_chars").cast("string").as("n_chars"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(s"$work/drop")
      val cfg = CsvSourceConfig("entity", None, fixedTimestampSec = Some(0L))
      def loadUnder(tz: String): DataFrame = {
        val old = s.conf.get("spark.sql.session.timeZone")
        s.conf.set("spark.sql.session.timeZone", tz)
        try {
          val schema = CsvTrendSource.deduceSchemaDistributed(
            s, s"$work/drop", cfg)
          // deduction must classify the naive column as the NTZ type —
          // the lattice carries only the naive form, like TYPE_ORDER
          require(schema.toMap.apply("seen_at") == MinervaType.MTimestampNtz,
            s"seen_at deduced ${schema.toMap.apply("seen_at")}, not ntz")
          // materialize UNDER this session tz: a lazy plan would execute
          // after the zone is restored and prove nothing
          CsvTrendSource.read(s, s"$work/drop", cfg, schema).localCheckpoint()
        } finally s.conf.set("spark.sql.session.timeZone", old)
      }
      val utc = loadUnder("UTC")
        .select(col("entity").cast("long").as("doc_id"), col("seen_at"))
      val nyc = loadUnder("America/New_York")
        .select(col("entity").cast("long").as("doc_id"),
          col("seen_at").as("seen_at_nyc"))
      utc.join(nyc, "doc_id")
        .select(col("doc_id"), col("seen_at"),
          (col("seen_at") <=> col("seen_at_nyc")).as("tz_invariant"))
        .orderBy("doc_id")
    },
    // ---- A2-attribute (plugin_api_attribute.py:1-37): the attribute-side
    // harvest plugin API end-to-end — a register()ed AttributeSource
    // resolves through the registry and the `harvest-attributes` CLI verb,
    // lands in the AttributeStore via the job-logged staged transfer, and
    // the curr-ptr view over the harvested history matches the oracle.
    // ServiceLoader drop-in discovery for the same contract is spec-covered
    // (AttributeSourceSpec — test-resources META-INF/services can't reach
    // the Verify classpath) ----
    "q320_attr_plugin" -> { (s, dir) =>
      import graft.sources.{AttributeSources, CsvAttributeSource, CsvSourceConfig}
      val work = java.nio.file.Files.createTempDirectory("graft_q320_").toString
      events(s, dir).filter(pmod(col("event_id"), lit(5)) === 0).select(
          col("user_id").as("node"),
          date_format(timestamp_seconds(col("ts_sec")), "yyyy-MM-dd HH:mm:ss").as("ts"),
          // uid rides along as a data column so the gate's output keys on
          // a value DuckDB can reproduce (entity_id is the resolver hash)
          col("user_id").as("uid"), col("event_id"), col("event_type"))
        .coalesce(4)
        .write.mode("overwrite").option("header", "true").csv(s"$work/drop")
      AttributeSources.register(CsvAttributeSource.plugin(
        CsvSourceConfig("node", Some("ts"),
          timestampFormat = "yyyy-MM-dd HH:mm:ss"), "csv_node_q320"))
      val devNull = new java.io.PrintStream(java.io.OutputStream.nullOutputStream())
      Console.withOut(devNull) {
        graft.cli.Main.run(List("harvest-attributes", "csv_node_q320",
          s"$work/drop", s"$work/store", "node_attrs"))
      }
      val hist = new graft.storage.AttributeStore(
        s, s"$work/store/node_attrs").history.get
      AttributeOps.currentPtr(hist, "entity_id", Seq("timestamp", "event_id"))
        .select(col("uid").cast("long").as("uid"),
          col("timestamp").as("ts_sec"),
          col("event_id").cast("long").as("event_id"), col("event_type"))
        .orderBy("uid")
    },
    // ---- Entity tags / tag groups (directory/tag.py:1-6, taggroup.py:1-5,
    // attribute/tag.py tag_attributes/flush_tag_links): idempotent
    // case-insensitive link insert (the replay must add 0 links), flush of
    // one tag, then a TAG-SCOPED entity aggregation — the reference's
    // "run this rollup over the tagged entity set". The scope is a
    // broadcast semi-join, so tagging adds no shuffle to the rollup ----
    "q321_entity_tags" -> { (s, dir) =>
      val work = java.nio.file.Files.createTempDirectory("graft_q321_").toString
      val tags = new graft.storage.TagDirectory(s, work)
      val c = load(s, dir, "customer")
      val segLinks = c.select(lit("segment").as("tag_group"),
        col("c_mktsegment").as("tag"), col("c_custkey").as("entity_id"))
      val vipLinks = c.filter(col("c_acctbal") > 9000).select(
        lit("value").as("tag_group"), lit("VIP").as("tag"),
        col("c_custkey").as("entity_id"))
      tags.tagEntities(segLinks.unionByName(vipLinks))
      val replay = tags.tagEntities(segLinks) // idempotent: adds nothing
      require(replay == 0L, s"tag replay added $replay links")
      tags.flushTag("MACHINERY")
      require(tags.entitiesWithTag("machinery").isEmpty,
        "flushTag left machinery links behind")
      val o = load(s, dir, "orders")
      val scoped = tags.scope(
        o.withColumn("bucket",
          expr("((o_orderdate div 1000000000) div 86400) div 1024")),
        "building", "o_custkey")
      val rel = c.select(col("c_custkey").as("source_id"),
        col("c_nationkey").cast("long").as("target_id"))
      EntityAggregation.aggregate(scoped, rel, "o_custkey", "bucket",
          Seq(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents")))
        .select(col("entity_id").as("nation_id"),
          col("timestamp").as("bucket"), col("n_orders"), col("sum_cents"))
        .orderBy("nation_id", "bucket")
    },
    // ---- COMPLEMENTARY tag groups (taggroup.py `complementary`): within
    // such a group an entity holds at most one tag — retagging REPLACES.
    // All customers tag by segment, negative-balance ones then move to
    // 'dormant'; the replay adds 0 changes, per-entity uniqueness is
    // asserted in-plan, and the per-tag census is oracle-replayed ----
    "q324_complementary_tags" -> { (s, dir) =>
      val work = java.nio.file.Files.createTempDirectory("graft_q324_").toString
      val tags = new graft.storage.TagDirectory(s, work)
      val c = load(s, dir, "customer")
      tags.tagEntities(c.select(lit("segment").as("tag_group"),
        col("c_mktsegment").as("tag"), col("c_custkey").as("entity_id")))
      val dormant = c.filter(col("c_acctbal") < 0).select(
        lit("segment").as("tag_group"), lit("dormant").as("tag"),
        col("c_custkey").as("entity_id"))
      val moved = tags.retagComplementary(dormant)
      val replay = tags.retagComplementary(dormant) // idempotent
      require(replay == 0L, s"complementary retag replay changed $replay")
      require(moved > 0L, "fixture has no negative balances — gate degenerate")
      // complementarity holds store-wide: at most one segment tag/entity
      require(tags.links.filter(col("tag_group") === "segment")
        .groupBy("entity_id").agg(count(lit(1)).as("__c"))
        .filter(col("__c") > 1).head(1).isEmpty,
        "entity with two tags in a complementary group")
      tags.links.filter(col("tag_group") === "segment")
        .join(c, col("entity_id") === col("c_custkey"))
        .groupBy("tag")
        .agg(count(lit(1)).as("n_entities"),
          sum(floor(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
        .orderBy("tag")
    },
    // ---- ATTRIBUTE-definition tags (attribute/tag.py:11-77 — the
    // attribute_tag_link table keys on attribute ids, i.e. COLUMN
    // definitions, not entities): tag two defs 'kpi', flush the 'meta'
    // tag, then the tag-scoped attribute report = curr-ptr projected to
    // exactly the tagged columns (how reference users scope reports) ----
    "q329_attribute_tags" -> { (s, dir) =>
      import s.implicits._
      val work = java.nio.file.Files.createTempDirectory("graft_q329_").toString
      val tags = new graft.storage.TagDirectory(s, work)
      tags.tagNames(Seq(("KPI", "value_cents"), ("kpi", "event_id"),
        ("meta", "event_type"), ("meta", "props")).toDF("tag", "name"))
      val replay = tags.tagNames(Seq(("kpi", "value_cents")).toDF("tag", "name"))
      require(replay == 0L, s"name-tag replay added $replay") // case-insensitive idempotent
      tags.flushNameTag("META")
      require(tags.namesWithTag("meta").isEmpty, "flushNameTag left links")
      val kpiCols = tags.namesWithTag("kpi") // bounded catalog read
      require(kpiCols == Seq("event_id", "value_cents"), kpiCols.toString)
      val e = events(s, dir)
        .withColumn("value_cents", floor(col("value") * 100).cast("long"))
      AttributeOps.currentPtr(e, "user_id", Seq("ts_sec", "event_id"))
        .select((col("user_id") +: kpiCols.map(col)): _*)
        .orderBy("user_id")
    },
    "q46_csv_ingest" -> { (s, dir) =>
      import graft.core.MinervaType
      import graft.sources.{CsvSourceConfig, CsvTrendSource}
      import graft.storage.{JobLog, PartStore, PartStoreConfig}
      val work = java.nio.file.Files.createTempDirectory("graft_q46_").toString
      // deterministic 25% subset: the round-trip proof doesn't need every
      // row, and the bench measures ingest cost, not fixture size
      events(s, dir).filter(pmod(col("event_id"), lit(4)) === 0).select(
          col("user_id").as("node"),
          date_format(timestamp_seconds(col("ts_sec")), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("event_id"), col("value"), col("event_type"), col("props"))
        .coalesce(4)
        .write.mode("overwrite").option("header", "true").csv(s"$work/drop")
      val cfg = CsvSourceConfig("node", Some("ts"),
        timestampFormat = "yyyy-MM-dd HH:mm:ss")
      // Declared schema: q46 measures the WRITE path (package → split →
      // staged partition swap), so it doesn't pay a full deduction pass
      // over a CSV it just wrote — that distributed-deduction path is
      // covered by q52 (and the driver-sample variant by spec).
      val schema = Seq(
        "node" -> MinervaType.MBigInt, "ts" -> MinervaType.MTimestamp,
        "event_id" -> MinervaType.MBigInt, "value" -> MinervaType.MDouble,
        "event_type" -> MinervaType.MText, "props" -> MinervaType.MText)
      val pkg = CsvTrendSource.read(s, s"$work/drop", cfg, schema)
      val jobLog = new JobLog(s, s"$work/store")
      val jobId = jobLog.startJob("q46 ingest", 0L)
      val keys = Seq("entity_id", "timestamp", "event_id", "modified", "job_id")
      val batch = pkg.select(
          col("entity").cast("long").as("entity_id"), col("timestamp"),
          col("event_id").cast("long").as("event_id"),
          col("value"), col("event_type"), col("props"))
        .withColumn("modified", lit(0L)).withColumn("job_id", lit(jobId))
      val known = PackageOps.restrictToStore(batch, keys,
        Set("value", "event_type")) // props is unknown to the store → dropped
        .persist() // one CSV parse feeds BOTH part writes (B2 split)
      val parts = PackageOps.splitByPart(known, keys,
        Map("ev_values" -> Seq("value"), "ev_types" -> Seq("event_type")))
      val ps = new PartStore(s, PartStoreConfig(s"$work/store", 86400L))
      parts.toSeq.sortBy(_._1).foreach { case (p, df) => ps.store(p, df) }
      known.unpersist()
      jobLog.endJob(jobId, 1L)
      val values = ps.readPart("ev_values").get
        .select("entity_id", "timestamp", "event_id", "value", "job_id")
      val types = ps.readPart("ev_types").get
        .select("entity_id", "timestamp", "event_id", "event_type")
      values
        .join(types, Seq("entity_id", "timestamp", "event_id"))
        .join(jobLog.jobs.select("job_id"), Seq("job_id")) // stamped id is logged
        .select(col("entity_id"), col("timestamp").as("ts_sec"),
          col("event_id"), col("value"), col("event_type"), col("job_id"))
        .orderBy("event_id")
    },
    // ---- A4-array/B3: `T[]` end-to-end — COPY-form array column through
    // CSV read, PartStore, and an element-fold aggregate ----
    "q48_array_ingest" -> { (s, dir) =>
      import graft.core.MinervaType
      import graft.sources.{CsvSourceConfig, CsvTrendSource}
      import graft.storage.{PartStore, PartStoreConfig}
      val work = java.nio.file.Files.createTempDirectory("graft_q48_").toString
      events(s, dir).select(
          col("event_id").as("node"),
          date_format(timestamp_seconds(col("ts_sec")), "yyyy-MM-dd HH:mm:ss").as("ts"),
          concat(lit("{"), col("user_id"), lit(","), col("user_id") * 2, lit("}"))
            .as("vals"))
        .coalesce(4)
        .write.mode("overwrite").option("header", "true").csv(s"$work/drop")
      val cfg = CsvSourceConfig("node", Some("ts"),
        timestampFormat = "yyyy-MM-dd HH:mm:ss")
      val schema = Seq("node" -> MinervaType.MText,
        "ts" -> MinervaType.MTimestamp,
        "vals" -> MinervaType.MArray(MinervaType.MBigInt))
      val pkg = CsvTrendSource.read(s, s"$work/drop", cfg, schema)
      val batch = pkg.select(col("entity").cast("long").as("entity_id"),
          col("timestamp"), col("vals"))
        .withColumn("modified", lit(0L))
      val ps = new PartStore(s, PartStoreConfig(s"$work/store", 86400L))
      ps.store("arr", batch)
      ps.readPart("arr").get.select(
          col("entity_id"), col("timestamp").as("ts_sec"),
          size(col("vals")).as("n_vals"),
          aggregate(col("vals"), lit(0L), (acc, x) => acc + x).as("sum_vals"),
          array_join(col("vals"), ",").as("vals_str"))
        .orderBy("entity_id")
    },
    // ---- J2/I4 end-to-end: aggregation-YAML → runnable 15m→1h→1d chain ----
    // Both hops are compiled purely from YAML definitions (target store,
    // widened types, samples injection, mapping functions) and executed
    // back-to-back — the reference's `minerva aggregation compile` flow.
    "q49_yaml_agg_chain" -> { (s, dir) =>
      import graft.model.InstanceModel
      val src = InstanceModel.parseTrendStore(
        """title: Raw events
          |data_source: hub
          |entity_type: user
          |granularity: 15m
          |partition_size: 1d
          |parts:
          |  - name: hub_user_main_15m
          |    trends:
          |      - name: value_i
          |        data_type: integer
          |""".stripMargin)
      val def1h = InstanceModel.parseAggregation(
        """time_aggregation:
          |  source: hub_user_main_15m
          |  name: hub_user_main_1h
          |  granularity: 1h
          |  mapping_function: trend.mapping_15m->1h
          |  parts:
          |    - name: hub_user_main_1h
          |      source: hub_user_main_15m
          |""".stripMargin).timeAggregation.get
      val c1 = AggregationCompiler.compileTimeAggregation(src, def1h)
      val def1d = InstanceModel.parseAggregation(
        """time_aggregation:
          |  source: hub_user_main_1h
          |  name: hub_user_main_1d
          |  granularity: 1d
          |  mapping_function: trend.mapping_1h->1d
          |  parts:
          |    - name: hub_user_main_1d
          |      source: hub_user_main_1h
          |""".stripMargin).timeAggregation.get
      val c2 = AggregationCompiler.compileTimeAggregation(c1.targetStore, def1d)
      val df15 = events(s, dir).select(
        col("user_id").as("entity_id"), col("ts_sec").as("timestamp"),
        floor(col("value")).cast("int").as("value_i"))
      val daily = c2.units.head.compute(c1.units.head.compute(df15))
      // The compiler widens sum(bigint) to DECIMAL(38,18) internally; cast the
      // terminal column to double like every other gate query (raw decimals
      // hash differently in some canonicalizations even when values match).
      daily.withColumn("value_i", col("value_i").cast("double"))
        .orderBy("entity_id", "timestamp")
    },
    // ---- Entity-aggregation YAML compile over a named relation ----
    "q50_yaml_entity_agg" -> { (s, dir) =>
      import graft.model.InstanceModel
      val src = InstanceModel.parseTrendStore(
        """title: Hourly user counters
          |data_source: hub
          |entity_type: user
          |granularity: 1h
          |partition_size: 4d
          |parts:
          |  - name: hub_user_main_1h
          |    trends:
          |      - name: value_i
          |        data_type: bigint
          |""".stripMargin)
      val ea = InstanceModel.parseAggregation(
        """entity_aggregation:
          |  source: hub_user_main_1h
          |  name: hub_group_main_1h
          |  entity_type: group
          |  relation: user->group
          |  aggregation_type: VIEW_MATERIALIZATION
          |  parts:
          |    - name: hub_group_main_1h
          |      source: hub_user_main_1h
          |""".stripMargin).entityAggregation.get
      val hourly = TimeAggregation.rollup(
        events(s, dir), "user_id", "ts_sec", 3600L,
        Seq(TimeAggregation.samples,
          sum(floor(col("value")).cast("int")).cast("bigint").as("value_i")))
      val rel = hourly.select(col("entity_id").as("source_id")).distinct()
        .withColumn("target_id", pmod(col("source_id"), lit(10L)))
      val c = AggregationCompiler.compileEntityAggregation(src, ea, rel)
      c.units.head.compute(hourly)
        .withColumn("value_i", col("value_i").cast("double"))
        .orderBy("entity_id", "timestamp")
    },
    // ---- A9/attribute harvest: CSV → DN-resolved attribute package →
    // AttributeStore staging transfer → curr-ptr view ----
    "q52_attr_ingest" -> { (s, dir) =>
      import graft.core.{DistinguishedName => DN, MinervaType}
      import graft.sources.{CsvSourceConfig, CsvTrendSource}
      import graft.storage.AttributeStore
      val work = java.nio.file.Files.createTempDirectory("graft_q52_").toString
      events(s, dir).filter(pmod(col("event_id"), lit(4)) === 0).select(
          concat(lit("user="), col("user_id")).as("dn"),
          date_format(timestamp_seconds(col("ts_sec")), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("event_id"), col("event_type"))
        .coalesce(4)
        .write.mode("overwrite").option("header", "true").csv(s"$work/drop")
      val cfg = CsvSourceConfig("dn", Some("ts"),
        timestampFormat = "yyyy-MM-dd HH:mm:ss")
      val schema = CsvTrendSource.deduceSchemaDistributed(s, s"$work/drop", cfg).map {
        case ("ts", _) => "ts" -> MinervaType.MTimestamp
        case (c, t)    => c -> t
      }
      val pkg = CsvTrendSource.read(s, s"$work/drop", cfg, schema)
      // entity ref from the DN (attribute packages key on dn/alias —
      // datapackage.py:19-38 alias_type='dn')
      val batch = pkg.select(
        DN.entityNameCol(col("entity")).cast("long").as("entity_id"),
        col("timestamp"), col("event_id").cast("long").as("event_id"),
        col("event_type"))
      val store = new AttributeStore(s, s"$work/attr")
      store.transferStaged(batch, nowSec = 0L)
      AttributeOps.currentPtr(store.history.get, "entity_id",
          Seq("timestamp", "event_id"))
        .select(col("entity_id"), col("timestamp").as("ts_sec"),
          col("event_id"), col("event_type"))
        .orderBy("entity_id")
    },
    // ---- I6 + notification data payload (trigger.py `data` expression) ----
    "q53_trigger_payload" -> { (s, dir) =>
      val kpi = events(s, dir).select(
        col("user_id").as("entity_id"), col("ts_sec").as("timestamp"),
        col("value"), col("event_type"))
      TriggerOps.createNotifications(kpi, TriggerRule(
        name = "user/1h/payload",
        thresholds = Map("max_value" -> 40.0),
        condition = "event_type = 'error' AND value > max_value",
        weight = "1",
        details = lit("high value"),
        data = Some(concat(
          lit("{\"entity_id\":"), col("entity_id").cast("string"),
          lit(",\"event_type\":\""), col("event_type"), lit("\"}")))
      )).orderBy("entity_id", "timestamp")
    },
    // ---- A11 + H12: relation materialized from a DN hierarchy ----
    // Entities: per-customer leaf DNs plus per-segment parent DNs; the
    // relation derives each child's parent edge from its dn. Segment ids
    // are deterministic (first letters of TPC-H segments are unique).
    "q54_dn_hierarchy" -> { (s, dir) =>
      val cust = load(s, dir, "customer")
      val leaves = cust.select(
        col("c_custkey").cast("long").as("id"),
        concat(lit("segment="), lower(col("c_mktsegment")),
          lit(",customer="), col("c_custkey").cast("string")).as("dn"))
      val segs = cust.select(lower(col("c_mktsegment")).as("seg")).distinct()
        .select((lit(100000L) + ascii(col("seg"))).as("id"),
          concat(lit("segment="), col("seg")).as("dn"))
      val rel = RelationOps.fromDnHierarchy(leaves.unionByName(segs))
      rel.orderBy("source_id")
    },
    // ---- SkewOps.saltedAggregate: two-stage hot-key rollup (gate-checked
    // against the one-stage oracle; decimal partials keep sums exact) ----
    "q72_salted_rollup" -> { (s, dir) =>
      val ev = events(s, dir).select(col("user_id"),
        (col("ts_sec") - pmod(col("ts_sec"), lit(3600L)) + 3600L).as("timestamp"),
        col("value"))
      SkewOps.saltedAggregate(ev, Seq("user_id", "timestamp"), salts = 8,
          partials = Seq(
            count(lit(1)).as("__n"),
            sum(col("value").cast("decimal(30,2)")).as("__s"),
            min(col("value")).as("__mn"),
            max(col("value")).as("__mx")),
          finals = Seq(
            sum("__n").as("samples"),
            sum("__s").cast("double").as("sum_value"),
            min("__mn").as("min_value"),
            max("__mx").as("max_value")))
        .orderBy("user_id", "timestamp")
    },
    // ---- I3: stability/processing delays + reprocessing window ----
    // A chunk materializes only once its sources settled (max_modified +
    // stability delay <= now) and inside the retention window.
    "q55_stable_chunks" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("hr", (col("ts_sec") - pmod(col("ts_sec"), lit(3600L))))
      val state = Materialization.modifiedState(e, Seq("hr", "event_type"), "ts_sec")
      val chunks = Materialization.fingerprint(state, "hr", "event_type", "last_modified")
      Materialization.stableChunks(chunks, "hr", "max_modified",
          nowSec = 1705708800L, stabilityDelaySec = 1800L,
          retentionSec = 7L * 86400)
        .select("hr", "max_modified")
        .orderBy("hr")
    },
    // ---- A10 typed notification store: PG assignment casts on write ----
    // Trigger output stored through a YAML-typed store: declared integer
    // narrows the bigint weight (checked), declared smallint ROUNDS the
    // double snapshot (PG numeric→int rounds where a plain Spark cast
    // truncates), and a declared-but-absent column lands as a typed NULL.
    "q62_typed_notifications" -> { (s, dir) =>
      import graft.model.AttributeDef
      import graft.core.MinervaType
      val kpi = events(s, dir).select(
        col("event_id").as("entity_id"), col("ts_sec").as("timestamp"),
        col("value"), col("event_type"))
      val notifs = TriggerOps.createNotifications(kpi, TriggerRule(
        name = "event/typed",
        thresholds = Map("max_value" -> 40.0),
        condition = "event_type = 'error' AND value > max_value",
        weight = "CASE WHEN value > 48 THEN 1000 ELSE 10 END",
        details = concat(lit("typed "), col("entity_id").cast("string"))),
        extras = Seq(col("value").as("value_snap")))
      val attrs = Seq(
        AttributeDef("weight", MinervaType.MInteger),
        AttributeDef("details", MinervaType.MText),
        AttributeDef("value_snap", MinervaType.MSmallInt),
        AttributeDef("score", MinervaType.MDouble))
      val base = java.nio.file.Files.createTempDirectory("graft_q62").toString
      val ns = new graft.storage.NotificationStore(s, s"$base/store", attrs)
      ns.store(notifs, nowSec = 12345L)
      ns.read().get
        .select(col("entity_id"), col("timestamp"), col("rule"), col("weight"),
          col("details"), col("value_snap"), col("score"), col("created"))
        .orderBy("entity_id", "timestamp")
    },
    // ---- H12: escape-aware DN explode/implode/split round-trip ----
    // DNs built with an ESCAPED comma inside the first name part, so the
    // split must honour `\,` (reference distinguishedname.py:23-33).
    "q43_dn_roundtrip" -> { (s, dir) =>
      import graft.core.{DistinguishedName => DN}
      val dn = concat(
        lit("segment="), DN.escapeCol(concat(col("c_mktsegment"), lit(","), col("c_name"))),
        lit(",customer="), col("c_custkey").cast("string"))
      load(s, dir, "customer")
        .withColumn("dn", dn)
        .select(
          col("dn"),
          size(DN.splitPartsCol(col("dn"))).as("n_parts"),
          DN.entityTypeNameCol(col("dn")).as("etype"),
          DN.entityNameCol(col("dn")).cast("long").as("ename"),
          element_at(DN.partNamesCol(col("dn")), 1).as("seg_name"),
          DN.parentDnCol(col("dn")).as("parent_dn"))
        .orderBy("ename")
    },
    // ---- C2 alias variant: namespace-scoped alias → entity id ----
    "q44_alias_resolve" -> { (s, dir) =>
      val sup = load(s, dir, "supplier")
      val aliasDim = sup.select(lit("vendor").as("namespace"),
          concat(lit("V-"), col("s_suppkey").cast("string")).as("alias"),
          col("s_suppkey").cast("long").as("entity_id"))
        .unionByName(sup.select(lit("node").as("namespace"),
          concat(lit("V-"), col("s_suppkey").cast("string")).as("alias"),
          (col("s_suppkey") + 1000000).cast("long").as("entity_id")))
      val incoming = load(s, dir, "customer")
        .select(concat(lit("V-"), col("c_custkey").cast("string")).as("alias"))
      EntityResolution.resolveAliases(incoming, aliasDim, "vendor")
        .orderBy("alias")
    },
    // ---- C2 hash path: contract audit (id = xxhash64(type, name)) ----
    // xxhash64 is not in DuckDB, so the oracle checks the CONTRACT: every
    // distinct name gets exactly one nonneg id and no two names collide.
    "q47_hash_id_audit" -> { (s, dir) =>
      import s.implicits._
      val dim = Seq.empty[(String, Long)].toDF("name", "id") // allocate fresh
      val incoming = load(s, dir, "supplier").select(col("s_name").as("name"))
        .union(load(s, dir, "part").select(col("p_brand").as("name")))
      val resolved = EntityResolution.resolveHash(incoming, dim, "vendor")
      resolved.agg(
        count(lit(1)).cast("long").as("n_names"),
        countDistinct(col("id")).as("n_distinct_ids"),
        sum(when(col("id") < 0, 1L).otherwise(0L)).cast("long").as("n_negative"))
    },
    // ---- H4/H5/H12: regexp extraction + dn-style parsing ----
    "q24_dn_parse" -> { (s, dir) =>
      load(s, dir, "customer")
        .withColumn("dn", concat(lit("segment="), lower(col("c_mktsegment")),
          lit(",customer="), col("c_custkey").cast("string")))
        .withColumn("seg", regexp_extract(col("dn"), "segment=([a-z]+)", 1))
        .withColumn("cust", regexp_extract(col("dn"), "customer=([0-9]+)", 1).cast("long"))
        .select("dn", "seg", "cust")
        .orderBy("cust")
    },
    // ---- Temporal joins (TemporalOps): as-of feature attachment ----
    // Leakage-free feature join: each event picks up the stats of the most
    // recent CLOSED hour (available at hour end), none older than 2 h.
    "q122_asof_join" -> { (s, dir) =>
      val e = events(s, dir)
      val hourly = e.groupBy(col("user_id"),
          (col("ts_sec") - pmod(col("ts_sec"), lit(3600L)) + 3600L).as("avail_sec"))
        .agg(count(lit(1)).as("prev_hr_events"),
          max(floor(col("value") * 100).cast("long")).as("prev_hr_max_cents"))
      TemporalOps.asofJoin(
          e.select(col("user_id"), col("event_id"), col("ts_sec").as("sec")),
          hourly, Seq("user_id"), "sec", "avail_sec", tolerance = Some(7200L))
        .orderBy("user_id", "sec", "event_id")
    },
    // ---- Temporal joins: interval-overlap via grid bucketing ----
    // User sessions (gap 1800, half-open [start, end+1800)) overlapped
    // with sparse "incident" windows [sec-300, sec+900) — the equi-join
    // shape never materializes the |sessions|·|incidents| cartesian a
    // naive inequality join compiles to.
    "q123_range_join" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
      val wOrd = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
      val gapped = e.withColumn("prev_sec", lag(col("ts_sec"), 1).over(wOrd))
        .withColumn("new_session",
          when(col("prev_sec").isNull || (col("ts_sec") - col("prev_sec")) > 1800, 1L)
            .otherwise(0L))
      val sessions = gapped.withColumn("session_id",
          sum(col("new_session")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(min(col("ts_sec")).as("s_lo"), (max(col("ts_sec")) + lit(1800L)).as("s_hi"))
      val incidents = e
        .filter(col("event_type") === "error" && pmod(col("event_id"), lit(7)) === 0)
        .select(col("event_id").as("incident_id"),
          (col("ts_sec") - 300L).as("i_lo"), (col("ts_sec") + 900L).as("i_hi"))
      TemporalOps.intervalOverlapJoin(sessions, "s_lo", "s_hi",
          incidents, "i_lo", "i_hi", bucketWidth = 3600L)
        .groupBy("incident_id")
        .agg(count(lit(1)).as("n_sessions"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("incident_id")
    },
    // ---- As-of join via the NATIVE physical operator (custom
    // LogicalPlan + Strategy + streaming-merge SparkPlan): q122's exact
    // semantics, third implementation against the same ASOF oracle ----
    "q138_asof_native" -> { (s, dir) =>
      val e = events(s, dir)
      val hourly = e.groupBy(col("user_id"),
          (col("ts_sec") - pmod(col("ts_sec"), lit(3600L)) + 3600L).as("avail_sec"))
        .agg(count(lit(1)).as("prev_hr_events"),
          max(floor(col("value") * 100).cast("long")).as("prev_hr_max_cents"))
      TemporalOps.asofJoinNative(
          e.select(col("user_id"), col("event_id"), col("ts_sec").as("sec")),
          hourly, Seq("user_id"), "sec", "avail_sec", tolerance = Some(7200L))
        .orderBy("user_id", "sec", "event_id")
    },
    // ---- As-of join, FORWARD direction: each event attaches the
    // nearest FUTURE closed-hour stats within 2h (scheduling lookahead;
    // oracle = DuckDB ASOF with the <= comparator — direction flows
    // from the inequality) ----
    "q145_asof_forward" -> { (s, dir) =>
      val e = events(s, dir)
      val hourly = e.groupBy(col("user_id"),
          (col("ts_sec") - pmod(col("ts_sec"), lit(3600L)) + 3600L).as("avail_sec"))
        .agg(count(lit(1)).as("hr_events"))
      TemporalOps.asofJoinNative(
          e.select(col("user_id"), col("event_id"), col("ts_sec").as("sec")),
          hourly, Seq("user_id"), "sec", "avail_sec",
          tolerance = Some(7200L), direction = "forward")
        .orderBy("user_id", "sec", "event_id")
    },
    // ---- Point-in-interval range join: events falling inside sparse
    // incident windows (grid-bucketed equi-join; every point maps to ONE
    // cell so no dedup stage exists at all) ----
    "q146_point_in_interval" -> { (s, dir) =>
      val e = events(s, dir)
      val incidents = e
        .filter(col("event_type") === "error" && pmod(col("event_id"), lit(7)) === 0)
        .select(col("event_id").as("incident_id"),
          (col("ts_sec") - 300L).as("i_lo"), (col("ts_sec") + 900L).as("i_hi"))
      TemporalOps.pointInIntervalJoin(
          e.select(col("event_id"), col("ts_sec").as("sec")), "sec",
          incidents, "i_lo", "i_hi", bucketWidth = 900L)
        .groupBy("incident_id")
        .agg(count(lit(1)).as("n_events"), min(col("sec")).as("first_sec"),
          max(col("sec")).as("last_sec"))
        .orderBy("incident_id")
    },
    // ---- Classic TPC-H on the fixture tables: general-OLAP gates with
    // decimal-exact money arithmetic (sum in DECIMAL, avgs as double
    // division of the exact sums — the q01 convention) ----
    "q149_tpch_q1" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      load(s, dir, "lineitem")
        .withColumn("ship_sec", expr("l_shipdate div 1000000000"))
        .filter(col("ship_sec") <= 950000000L)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) *
            (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    "q150_tpch_q3" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val c = load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = load(s, dir, "orders")
        .withColumn("order_sec", expr("o_orderdate div 1000000000"))
        .filter(col("order_sec") < 850000000L)
      val l = load(s, dir, "lineitem")
        .withColumn("ship_sec", expr("l_shipdate div 1000000000"))
        .filter(col("ship_sec") > 850000000L)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "order_sec", "o_orderpriority")
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    "q151_tpch_q5" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val o = load(s, dir, "orders")
        .withColumn("order_sec", expr("o_orderdate div 1000000000"))
        .filter(col("order_sec") >= 800000000L && col("order_sec") < 900000000L)
      load(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(load(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey")) // LOCAL suppliers only
        .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    "q152_tpch_q6" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      load(s, dir, "lineitem")
        .withColumn("ship_sec", expr("l_shipdate div 1000000000"))
        .filter(col("ship_sec") >= 800000000L && col("ship_sec") < 900000000L)
        .filter(dec(col("l_discount")).between(
          lit(0.05).cast("decimal(12,2)"), lit(0.07).cast("decimal(12,2)")))
        .filter(col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    "q153_tpch_q18" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val l = load(s, dir, "lineitem")
      val bigOrders = l.groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("order_qty"))
        .filter(col("order_qty") > 180)
      load(s, dir, "customer")
        .join(load(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          expr("o_orderdate div 1000000000").as("order_sec"),
          col("o_totalprice"), col("order_qty").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    "q154_tpch_q10" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val o = load(s, dir, "orders")
        .withColumn("order_sec", expr("o_orderdate div 1000000000"))
        .filter(col("order_sec") >= 850000000L && col("order_sec") < 950000000L)
      load(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(load(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    "q155_tpch_q14" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val l = load(s, dir, "lineitem")
        .withColumn("ship_sec", expr("l_shipdate div 1000000000"))
        .filter(col("ship_sec") >= 850000000L && col("ship_sec") < 900000000L)
      val disc = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
      l.join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "ECONOMY", disc)
            .otherwise(lit(0).cast("decimal(12,2)"))).cast("double").as("promo_revenue"),
          sum(disc).cast("double").as("total_revenue"))
        .withColumn("promo_pct",
          lit(100.0) * col("promo_revenue") / col("total_revenue"))
    },
    // ---- TPC-H Q4 shape (order priority checking): the fixture has no
    // commit/receipt dates, so "late lineitem exists" = shipped after
    // the order date — the same EXISTS-semi-join plan shape ----
    "q162_tpch_q4" -> { (s, dir) =>
      val o = load(s, dir, "orders")
        .withColumn("order_sec", expr("o_orderdate div 1000000000"))
        .filter(col("order_sec") >= 850000000L && col("order_sec") < 950000000L)
      val l = load(s, dir, "lineitem")
        .withColumn("ship_sec", expr("l_shipdate div 1000000000"))
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
            col("ship_sec") > col("order_sec"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    // ---- TPC-H Q7 (volume shipping): revenue between a nation pair in
    // both directions, by year bucket (31536000-second years — exact
    // integer bucketing, identical cross-engine, no TZ calendar) ----
    "q163_tpch_q7" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val l = load(s, dir, "lineitem")
        .withColumn("ship_yr", expr("l_shipdate div 1000000000 div 31536000"))
      val sn = load(s, dir, "supplier")
        .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cn = load(s, dir, "customer")
        .join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      l.join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy("supp_nation", "cust_nation", "ship_yr")
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_yr")
    },
    // ---- TPC-H Q8 (national market share): NATION_2's share of ECONOMY
    // part revenue sold into the ASIA region, per order-year bucket ----
    "q164_tpch_q8" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val asiaNations = load(s, dir, "nation")
        .join(load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey").as("asia_key"))
      val sn = load(s, dir, "supplier")
        .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val vol = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
      load(s, dir, "lineitem")
        .join(broadcast(load(s, dir, "part").filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("asia_key"), "left_semi")
        .withColumn("order_yr", expr("o_orderdate div 1000000000 div 31536000"))
        .groupBy("order_yr")
        .agg(
          sum(when(col("supp_nation") === "NATION_2", vol)
            .otherwise(lit(0).cast("decimal(12,2)"))).cast("double").as("nation_volume"),
          sum(vol).cast("double").as("total_volume"))
        .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
        .orderBy("order_yr")
    },
    // ---- TPC-H Q9 shape (product-type profit): the fixture has no
    // partsupp/supplycost, so profit = discounted revenue of 'red'-named
    // parts, by supplier nation × ship-year ----
    "q165_tpch_q9" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val sn = load(s, dir, "supplier")
        .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      load(s, dir, "lineitem")
        .join(broadcast(load(s, dir, "part").filter(col("p_name").contains("red"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .withColumn("ship_yr", expr("l_shipdate div 1000000000 div 31536000"))
        .groupBy("nation", "ship_yr")
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("ship_yr").desc)
    },
    // ---- TPC-H Q13 (customer order distribution): per-customer order
    // counts through a LEFT join (zero-order customers must appear),
    // then the histogram of customers per count ----
    "q166_tpch_q13" -> { (s, dir) =>
      val o = load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      val perCust = load(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    // ---- TPC-H Q17 (small-quantity-order revenue): lineitems below
    // 20% of their part's average quantity, one brand — the per-part
    // aggregate join replaces the correlated subquery ----
    "q167_tpch_q17" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val l = load(s, dir, "lineitem")
      // exact decimal sum / exact count → one double division per part
      val partAvg = l.groupBy(col("l_partkey").as("pk"))
        .agg((sum(dec(col("l_quantity"))).cast("double") /
          count(lit(1))).as("avg_qty"))
      l.join(broadcast(load(s, dir, "part").filter(col("p_brand") === "Brand#11")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(partAvg, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"),
          count(lit(1)).as("n_items"))
    },
    // ---- TPC-H Q19 shape (discounted revenue, OR'd brand/size/quantity
    // bands — no p_container in the fixture, p_size bands instead): one
    // broadcast join, the disjunction evaluated post-join ----
    "q168_tpch_q19" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val band1 = col("p_brand") === "Brand#11" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)
      val band2 = col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)
      val band3 = col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30)
      load(s, dir, "lineitem")
        .join(broadcast(load(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(band1 || band2 || band3)
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    // ---- TPC-H Q22 shape (global sales opportunity): customers with
    // above-average positive balance and no URGENT orders, per nation —
    // scalar decimal-exact average + anti-join (the fixture's every
    // customer has SOME order, so the classic no-orders-at-all predicate
    // would make the gate vacuously empty) ----
    "q169_tpch_q22" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val c = load(s, dir, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") /
          count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(load(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy("c_nationkey")
    },
    // ---- TPC-H Q2 shape (minimum-cost supplier): the fixture has no
    // partsupp, so supply cost = the cheapest observed sale of the part
    // by that supplier (min over lineitem, decimal-exact). The correlated
    // min subquery becomes a per-part min aggregate + equality join-back —
    // the same plan shape Catalyst produces for the classic query. Dims
    // (region-filtered suppliers, size-band parts) broadcast; only the
    // lineitem scan and its (part,supp) aggregate shuffle ----
    "q203_tpch_q2" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val euroSupp = load(s, dir, "supplier")
        .join(broadcast(load(s, dir, "nation")
            .join(load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
            .filter(col("r_name") === "EUROPE")
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val parts = load(s, dir, "part")
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select("p_partkey", "p_name")
      val cost = load(s, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(euroSupp.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(dec(col("l_extendedprice"))).as("supply_cost"))
      val minCost = cost.groupBy(col("l_partkey").as("mpk"))
        .agg(min(col("supply_cost")).as("min_cost"))
      cost.join(minCost,
          col("l_partkey") === col("mpk") && col("supply_cost") === col("min_cost"))
        .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_name"), col("supply_cost").cast("double").as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    // ---- TPC-H Q11 shape (important stock): per-part sale value for one
    // nation's suppliers, kept where value > 0.1% of the nation total.
    // The scalar subquery is a broadcast cross-join; the threshold compare
    // stays in DECIMAL (value*1000 > total — integer-exact, no float) ----
    "q204_tpch_q11" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val supN = load(s, dir, "supplier")
        .join(broadcast(load(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select("s_suppkey")
      val v = load(s, dir, "lineitem")
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice"))).as("value_dec"))
      val tot = v.agg(sum(col("value_dec")).as("tot"))
      v.crossJoin(broadcast(tot))
        .filter(col("value_dec") * 1000 > col("tot"))
        .select(col("l_partkey"), col("value_dec").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },
    // ---- TPC-H Q12 shape (shipping priority classes): no l_shipmode in
    // the fixture, so the mode split becomes a ship-delay split (>60 days
    // = "late"); the CASE'd priority counts keep Q12's exact shape ----
    "q205_tpch_q12" -> { (s, dir) =>
      val o = load(s, dir, "orders")
        .withColumn("order_sec", expr("o_orderdate div 1000000000"))
      val l = load(s, dir, "lineitem")
        .withColumn("ship_sec", expr("l_shipdate div 1000000000"))
        .filter(col("ship_sec") >= 800000000L && col("ship_sec") < 950000000L)
      val isHigh = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("ship_class",
          when(col("ship_sec") - col("order_sec") > 86400L * 60, lit("late"))
            .otherwise(lit("ontime")))
        .groupBy("ship_class")
        .agg(count(when(isHigh, lit(1))).as("high_line_count"),
          count(when(!isHigh, lit(1))).as("low_line_count"))
        .orderBy("ship_class")
    },
    // ---- TPC-H Q15 (top supplier): windowed per-supplier revenue, max
    // selected by exact-decimal equality against the broadcast scalar —
    // float never enters the comparison so ties are exact ----
    "q206_tpch_q15" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      val rev = load(s, dir, "lineitem")
        .withColumn("ship_sec", expr("l_shipdate div 1000000000"))
        .filter(col("ship_sec") >= 850000000L && col("ship_sec") < 900000000L)
        .groupBy("l_suppkey")
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .as("rev"))
      val maxRev = rev.agg(max(col("rev")).as("max_rev"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("rev") === col("max_rev"))
        .join(broadcast(load(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },
    // ---- TPC-H Q16 shape (parts/supplier relationship): distinct
    // supplier counts per (brand,type,size) from the lineitem-derived
    // part↔supplier pairs; the complaint exclusion becomes negative
    // account balance (no s_comment in the fixture) ----
    "q207_tpch_q16" -> { (s, dir) =>
      val goodSupp = load(s, dir, "supplier")
        .filter(col("s_acctbal") >= 0).select("s_suppkey")
      val p = load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#11" &&
          !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      load(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(goodSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    // ---- TPC-H Q20 shape (potential part promotion): suppliers shipping
    // >25% of a red part's windowed volume (availqty has no fixture
    // analogue, so the excess-stock predicate compares the supplier's
    // shipped share against the part total — 4*ps_qty > part_qty stays
    // decimal-exact), restricted to European suppliers ----
    "q208_tpch_q20" -> { (s, dir) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val redParts = load(s, dir, "part")
        .filter(col("p_name").startsWith("red")).select("p_partkey")
      val ps = load(s, dir, "lineitem")
        .withColumn("ship_sec", expr("l_shipdate div 1000000000"))
        .filter(col("ship_sec") >= 850000000L && col("ship_sec") < 900000000L)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(dec(col("l_quantity"))).as("ps_qty"))
      val tot = ps.groupBy(col("l_partkey").as("tpk"))
        .agg(sum(col("ps_qty")).as("part_qty"))
      val qualifying = ps.join(tot, col("l_partkey") === col("tpk"))
        .filter(col("ps_qty") * 4 > col("part_qty"))
        .select("l_suppkey").distinct()
      load(s, dir, "supplier")
        .join(broadcast(load(s, dir, "nation")
            .join(load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
            .filter(col("r_name") === "EUROPE").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    },
    // ---- TPC-H Q21 shape (suppliers who kept orders waiting): no
    // commit/receipt dates, so "waiting" = the supplier was the SOLE last
    // shipper of a multi-supplier finished order — EXISTS (another
    // supplier in the order) + NOT EXISTS (another supplier shipped
    // later), expressed as a semi- + anti-self-join on the order key (one
    // shuffle partitioning serves both). Raw nanosecond shipdates compare
    // on both engines so same-second ties never diverge ----
    "q209_tpch_q21" -> { (s, dir) =>
      val l = load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val fOrders = load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val l1 = l.join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      val l2 = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = l.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("ship3"))
      l1.join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3") &&
          col("ship3") > col("l_shipdate"), "left_anti")
        .join(broadcast(load(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    // ---- A1/A2/A4 for the SECOND in-tree harvest format: a JSON-lines
    // drop driven through the plugin REGISTRY (register → get → read),
    // full distributed schema deduction, and the normalized package
    // contract. Money is pre-scaled to integer cents in the drop so the
    // deduced lattice types stay integer-exact end to end (the float
    // deduction path is spec-covered; oracles never compare floats that
    // crossed a serialization boundary) ----
    "q210_json_ingest" -> { (s, dir) =>
      import graft.sources.{JsonSourceConfig, JsonTrendSource, TrendSources}
      val work = java.nio.file.Files.createTempDirectory("graft_q210_").toString
      events(s, dir).filter(pmod(col("event_id"), lit(3)) === 0).select(
          col("user_id").as("node"),
          date_format(timestamp_seconds(col("ts_sec")), "yyyy-MM-dd'T'HH:mm:ss").as("ts"),
          col("event_id"),
          floor(col("value") * 100).cast("long").as("value_cents"),
          col("event_type"))
        .coalesce(4)
        .write.mode("overwrite").json(s"$work/drop")
      TrendSources.register(JsonTrendSource.plugin(
        JsonSourceConfig("node", Some("ts"),
          timestampFormat = "yyyy-MM-dd'T'HH:mm:ss"), "json_events"))
      val pkg = TrendSources.get("json_events").get.read(s, s"$work/drop")
      pkg.groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("entity")).as("n_entities"),
          min(col("timestamp")).as("min_ts"),
          max(col("timestamp")).as("max_ts"),
          sum(col("value_cents")).cast("long").as("sum_cents"),
          max(col("event_id")).cast("long").as("max_event_id"))
        .orderBy("event_type")
    },
    // ---- Layout-invariant approximate quantiles (HdrHistogram log-linear
    // sketch): per-source document-length p50/p90/p99 as exact integer
    // bucket ranges with a hard 2^-5 relative-error bound. The sketch is
    // ONE map-side-combined aggregate; the oracle replays the identical
    // integer bucketization — no float ever enters ----
    "q211_hdr_quantiles" -> { (s, dir) =>
      graft.functions.HdrQuantiles.quantiles(
          load(s, dir, "documents").select(col("source"), col("n_chars")),
          Seq("source"), "n_chars",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99), p = 5)
        .orderBy("source")
    },
    // ---- k-core peeling over the q126-style derived link graph:
    // synchronous rounds (order-free, partition-invariant), peel_round
    // NULL = still in core after 4 capped rounds. The oracle unrolls the
    // same four synchronous rounds as chained CTEs ----
    "q212_kcore" -> { (s, dir) =>
      val e = events(s, dir)
      graft.functions.Graph.kCorePeel(
          e.select(col("user_id").as("src"),
            pmod(col("event_id"), lit(97)).cast("long").as("dst")),
          "src", "dst", k = 60, rounds = 4)
        .orderBy("node")
    },
    // ---- HITS hubs/authorities over the same derived directed graph:
    // two mutual-reinforcement iterations, integer max-normalization per
    // half-step (bit-exact under any layout); oracle unrolls the four
    // half-steps ----
    "q213_hits" -> { (s, dir) =>
      val e = events(s, dir)
      graft.functions.Graph.hits(
          e.select(col("user_id").as("src"),
            pmod(col("event_id"), lit(97)).cast("long").as("dst")),
          "src", "dst", iterations = 2)
        .orderBy("node")
    },
    // ---- Winsorized robust mean per source: exact R-7 [p10, p90]
    // cutoffs (q85's machinery), then the clamped mean assembled from
    // EXACT integer components (mid-range sum + clamp counts) so no
    // order-dependent float sum exists — one broadcast join, two
    // aggregates ----
    "q215_winsorized" -> { (s, dir) =>
      val d = load(s, dir, "documents")
      val cuts = graft.functions.TextAnalysis.groupQuantiles(
          d, Seq("source"), "n_chars", Seq("p10" -> 0.1, "p90" -> 0.9))
        .select(col("source"), col("p10"), col("p90"))
      d.join(broadcast(cuts), "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          first(col("p10")).as("p10"), first(col("p90")).as("p90"),
          sum(when(col("n_chars") >= col("p10") && col("n_chars") <= col("p90"),
            col("n_chars")).otherwise(0L)).cast("long").as("sum_mid"),
          count(when(col("n_chars") < col("p10"), lit(1))).as("n_lo"),
          count(when(col("n_chars") > col("p90"), lit(1))).as("n_hi"))
        .withColumn("winsorized_mean",
          (col("sum_mid") + col("n_lo") * col("p10") + col("n_hi") * col("p90"))
            / col("n_docs"))
        .orderBy("source")
    },
    // ---- Incremental persisted HdrHistogram sketch: batch-1 sketch
    // stored, batch-2 merged in by bucket addition and upserted, then
    // quantiles answered from the STORE — byte-identical to the q211
    // full-corpus answer (same oracle SQL), with per-append cost ∝ batch
    // sketch, never corpus ----
    "q216_hdr_incremental" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      import graft.functions.HdrQuantiles
      val work = java.nio.file.Files.createTempDirectory("graft_q216_").toString
      val d = load(s, dir, "documents")
        .select(col("source"), col("n_chars"), col("doc_id"))
      val ps = new PartStore(s, PartStoreConfig(s"$work/sketch", 64L,
        keyCols = Seq("source", "bucket")))
      def skOf(df: DataFrame) =
        HdrQuantiles.sketch(df, Seq("source"), "n_chars")
      // sketches are bounded (|sources|·buckets rows) — pin them so the
      // corpus scan + sketch shuffle runs once per append, not twice
      // (store() executes its input for the pindex collect AND the write)
      val b1 = skOf(d.filter(pmod(col("doc_id"), lit(2)) === 0))
        .withColumn("timestamp", col("bucket"))
        .withColumn("modified", lit(1L))
        .localCheckpoint()
      ps.store("hdr", b1)
      val b2 = skOf(d.filter(pmod(col("doc_id"), lit(2)) === 1))
      val persisted = ps.readPart("hdr").get.select("source", "bucket", "cnt")
      val merged = HdrQuantiles.merge(Seq("source"), persisted, b2)
        .withColumn("timestamp", col("bucket"))
        .withColumn("modified", lit(2L))
        .localCheckpoint()
      ps.store("hdr", merged)
      HdrQuantiles.quantilesFromSketch(
          ps.readPart("hdr").get.select("source", "bucket", "cnt"),
          Seq("source"),
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99), p = 5)
        .orderBy("source")
    },
    // ---- Dyadic EWMA trend smoothing: α=1/2 truncated at 8 lags, pure
    // integer weights (units of 1/256) — the deterministic form of
    // exponential smoothing; per-user keyed window, frame bounded by the
    // depth ----
    "q217_ewma" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      TemporalOps.dyadicEwma(
          e.select("user_id", "event_id", "ts_sec", "cents"),
          Seq("user_id"), Seq("ts_sec", "event_id"), "cents", depth = 8)
        .orderBy("user_id", "ts_sec", "event_id")
    },
    // ---- Record linkage (Fellegi–Sunter shape): a deterministically
    // dirtied CRM copy of customers (typo'd names, one-off nations,
    // floored balances, supplier noise) linked back by TWO blocking
    // passes — composite (nation|id-tail) and numeric digit-id; the
    // second recovers pairs the first's perturbed nation loses.
    // Blocking keys are chosen SELECTIVE (composite / id-derived) so
    // block sizes stay O(n / key-cardinality): a bare nation key made
    // every block 1/25th of the corpus and the candidate set quadratic —
    // the hot-block smell the operator doc warns about (measured 13.7 s
    // at sf0.1; 0.6 s with these keys). Scores: edit-distance ≤ 2 on
    // names (8), numeric digit-id equality (4, leading-zero robust),
    // balance proximity (2), nation equality (1); threshold 12 forces
    // name+id agreement so near-id neighbors never false-match ----
    "q219_record_linkage" -> { (s, dir) =>
      linkageMatches(s, dir).orderBy("c_custkey", "acct_id")
    },
    // ---- Markov transition matrix of user journeys: per-user ordered
    // event-type bigrams (keyed window), counts + exact-ratio transition
    // probabilities ----
    "q220_transitions" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
      val t = e.select(col("user_id"), col("ts_sec"), col("event_id"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      val cnt = t.groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy(col("event_type").as("ft"))
        .agg(sum(col("n")).as("row_total"))
      cnt.join(tot, col("event_type") === col("ft"))
        .select(col("event_type"), col("next_type"), col("n"),
          (col("n").cast("double") / col("row_total")).as("p"))
        .orderBy("event_type", "next_type")
    },
    // ---- CUSUM change detection on the cents stream: per-user exact
    // median target (doubled units keep the half-step integral), the
    // sequential max-recurrence via its prefix-sum/running-min closed
    // form — two keyed windows, no iteration ----
    "q221_cusum" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      val med = e.groupBy("user_id")
        .agg((expr("percentile(cents, 0.5)") * 2).cast("long").as("med2"))
      val j = e.join(med, "user_id")
        .withColumn("c2", col("cents") * 2)
      TemporalOps.cusum(
          j.select("user_id", "event_id", "ts_sec", "c2", "med2"),
          Seq("user_id"), Seq("ts_sec", "event_id"),
          "c2", "med2", slack = 50L, threshold = 2000L)
        .filter(col("alarm"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_alarms"),
          min(col("ts_sec")).as("first_alarm_sec"),
          max(col("cusum")).as("max_cusum"))
        .orderBy("user_id")
    },
    // ---- M4 time-series downsampling (Jugel et al. 2014, public): per
    // (series, bucket) the first/last/min/max points — the
    // error-free-at-pixel-width visualization reduction, ONE map-side
    // combined aggregate (min_by/max_by on a unique order key; no
    // window, no join-back) ----
    "q222_m4_downsample" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
        .withColumn("hour", expr("ts_sec div 3600"))
        // unique per-user order key; event_id < 10^7 at every fixture sf
        .withColumn("okey", col("ts_sec") * 10000000L + col("event_id"))
      e.groupBy("user_id", "hour")
        .agg(count(lit(1)).as("n_points"),
          min(col("cents")).as("min_c"), max(col("cents")).as("max_c"),
          expr("min_by(cents, okey)").as("first_c"),
          expr("max_by(cents, okey)").as("last_c"))
        .orderBy("user_id", "hour")
    },
    // ---- k-anonymity audit over quasi-identifiers (Sweeney 2002,
    // public): equivalence-class sizes for (nation, segment,
    // balance-band); classes below k are the re-identification risk a
    // release must suppress or generalize ----
    "q223_k_anonymity" -> { (s, dir) =>
      load(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("class_size"))
        .withColumn("suppress", (col("class_size") < 5).cast("boolean"))
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    },
    // ---- LOCF gap-filling over a dense series grid: the C6 series
    // expansion (q15) composed with last-observation-carried-forward —
    // per-entity keyed window, grid = entities × 120 six-hour buckets;
    // leading gaps before the first observation stay NULL (is_gap only
    // counts fillable holes) ----
    "q224_locf_gapfill" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir).withColumn("bkt", expr("ts_sec div 21600"))
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      val obs = e.groupBy("user_id", "bkt")
        .agg(sum(col("cents")).as("cents"))
      val grid = e.select("user_id").distinct()
        .crossJoin(broadcast(s.range(1).select(explode(
          sequence(lit(78892L), lit(79011L), lit(1L))).as("bkt"))))
      val w = Window.partitionBy("user_id").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "bkt"), "left")
        .withColumn("filled", last(col("cents"), ignoreNulls = true).over(w))
        .withColumn("is_gap",
          (col("cents").isNull && col("filled").isNotNull).cast("boolean"))
        .orderBy("user_id", "bkt")
    },
    // ---- Harvest quarantine path: a CSV drop with deterministically
    // corrupted cells (bad values at id%11, bad timestamps at id%13)
    // driven through readAudited — malformed rows divert with their
    // per-column reasons instead of killing the load (the row-level form
    // of harvest/error.py's ParseError), clean rows aggregate normally;
    // ONE pass computes both ----
    "q225_quarantine" -> { (s, dir) =>
      import graft.core.MinervaType
      import graft.sources.{CsvSourceConfig, CsvTrendSource}
      val work = java.nio.file.Files.createTempDirectory("graft_q225_").toString
      events(s, dir).select(
          col("user_id").as("node"),
          when(pmod(col("event_id"), lit(13)) === 0, lit("not-a-time"))
            .otherwise(date_format(timestamp_seconds(col("ts_sec")),
              "yyyy-MM-dd HH:mm:ss")).as("ts"),
          col("event_id"),
          when(pmod(col("event_id"), lit(11)) === 0, lit("oops"))
            .otherwise(col("value").cast("string")).as("value"))
        .coalesce(4)
        .write.mode("overwrite").option("header", "true").csv(s"$work/drop")
      val cfg = CsvSourceConfig("node", Some("ts"),
        timestampFormat = "yyyy-MM-dd HH:mm:ss")
      val schema = Seq(
        "node" -> MinervaType.MBigInt, "ts" -> MinervaType.MTimestamp,
        "event_id" -> MinervaType.MBigInt, "value" -> MinervaType.MDouble)
      val audited = CsvTrendSource.readAudited(s, s"$work/drop", cfg, schema)
      val quarantined = audited.filter(size(col("parse_errors")) > 0)
        .groupBy(array_join(col("parse_errors"), ",").as("reasons"))
        .agg(count(lit(1)).as("n_rows"))
      val clean = audited.filter(size(col("parse_errors")) === 0)
        .agg(lit("__clean__").as("reasons"), count(lit(1)).as("n_rows"))
      quarantined.unionByName(clean).orderBy("reasons")
    },
    // ---- Time-weighted average (the telemetry statistic for unevenly
    // sampled series): per-user integral of the LOCF value over time —
    // Σ cents_i · (t_{i+1} − t_i) — divided by the covered span, all
    // integer until the single final division; one keyed lead window ----
    "q227_time_weighted_avg" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
      e.select(col("user_id"), col("ts_sec"), col("event_id"), col("cents"))
        .withColumn("next_ts", lead(col("ts_sec"), 1).over(w))
        .filter(col("next_ts").isNotNull) // last sample holds no interval
        .withColumn("dur", col("next_ts") - col("ts_sec"))
        .groupBy("user_id")
        .agg(sum(col("cents") * col("dur")).as("weighted_sum"),
          sum(col("dur")).as("span_sec"),
          count(lit(1)).as("n_intervals"))
        .filter(col("span_sec") > 0)
        .withColumn("twa_cents",
          col("weighted_sum").cast("double") / col("span_sec"))
        .orderBy("user_id")
    },
    // ---- Per-entity OLS trend slope + Pearson correlation from EXACT
    // integer sums: slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) as one double
    // division of exact values; r adds two IEEE sqrts — both bit-stable
    // cross-engine. Per-row products x·y (≤ ~2.6e12 at the fixture
    // span) stay in LONG; the Σ and n·Σ accumulations go through
    // DECIMAL(38,0) (the q92/q173 fixed-point convention; HUGEINT on
    // the DuckDB side) so an entity with millions of events can never
    // wrap 2^63. The minerva trend direction statistic, one map-side
    // aggregate ----
    "q232_trend_slope" -> { (s, dir) =>
      val dec = "decimal(38,0)"
      val e = events(s, dir)
        .withColumn("x", col("ts_sec") - 1704067200L)
        .withColumn("y", floor(col("value") * 100).cast("long"))
      e.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"))
        .withColumn("num",
          (col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).cast(dec))
        .withColumn("denx",
          (col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).cast(dec))
        .withColumn("deny",
          (col("n").cast(dec) * col("syy") - col("sy") * col("sy")).cast(dec))
        .filter(col("denx") > 0 && col("deny") > 0)
        .withColumn("slope_cents_per_sec",
          col("num").cast("double") / col("denx"))
        .withColumn("pearson_r",
          col("num").cast("double") /
            (sqrt(col("denx").cast("double")) * sqrt(col("deny").cast("double"))))
        // exact DECIMAL internally; the emitted columns are one
        // round-to-nearest DOUBLE cast each (bit-identical cross-engine),
        // per the q173 convention — the gate guard rejects DECIMAL outputs
        .select(col("user_id"), col("n"),
          col("num").cast("double").as("num"),
          col("denx").cast("double").as("denx"),
          col("deny").cast("double").as("deny"),
          col("slope_cents_per_sec"), col("pearson_r"))
        .orderBy("user_id")
    },
    // ---- Funnel latency quantiles: q156's stage chains composed with
    // the q211 sketch — per-transition conversion-delay p50/p90 as exact
    // bucket ranges; the composition a product team actually asks for
    // ("how long from view to click?") in one sketch aggregate ----
    "q233_funnel_latency" -> { (s, dir) =>
      val e = events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_sec")).as("v_ts"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts_sec") >= col("v_ts"))
        .groupBy("user_id").agg(min(col("ts_sec")).as("c_ts"),
          first(col("v_ts")).as("v_ts2"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts_sec") >= col("c_ts"))
        .groupBy("user_id").agg(min(col("ts_sec")).as("p_ts"),
          first(col("c_ts")).as("c_ts2"))
      val delays = c.select(lit("view_to_click").as("stage"),
          (col("c_ts") - col("v_ts2")).as("delay"))
        .unionByName(p.select(lit("click_to_purchase").as("stage"),
          (col("p_ts") - col("c_ts2")).as("delay")))
      graft.functions.HdrQuantiles.quantiles(delays, Seq("stage"), "delay",
          Seq("p50" -> 0.5, "p90" -> 0.9), p = 5)
        .orderBy("stage")
    },
    // ---- I1-I6 CAPSTONE: the live-monitor loop end-to-end, twice —
    // ingest batch → trend store (staged swap) → modified log →
    // fingerprint staleness → materialize ONLY stale hours → trigger →
    // typed notification store (PK dedup, last created wins). Mirrors
    // the reference's poll loop (live_monitor.py:40-45 process modified
    // log → materialize; trigger/trigger.py:158-172 notifications).
    // Round 2 adds the tail of the timeline PLUS a sparse late trickle
    // into already-materialized hours, so staleness selection really
    // decides what re-materializes; a round-1 notification whose hour
    // never goes stale again survives with created=1 (notifications are
    // events, they don't retract), a re-fired hour upserts to created=2.
    // Oracle replays the two-round chain as set algebra ----
    "q238_live_monitor" -> { (s, dir) =>
      import graft.model.AttributeDef
      import graft.core.MinervaType
      import graft.storage.{NotificationStore, PartStore, PartStoreConfig}
      val base = java.nio.file.Files.createTempDirectory("graft_q238").toString
      val e = events(s, dir).select(
          col("user_id").as("entity_id"), col("ts_sec"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("hr", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
      val isRound2 = col("ts_sec") >= 1705276800L ||
        pmod(col("event_id"), lit(97)) === 0
      val raw = new PartStore(s,
        PartStoreConfig(s"$base/raw", 86400L, keyCols = Seq("event_id")))
      val ns = new NotificationStore(s, s"$base/notif", Seq(
        AttributeDef("weight", MinervaType.MInteger),
        AttributeDef("details", MinervaType.MText),
        AttributeDef("samples", MinervaType.MInteger)))
      var processedFp: DataFrame = null
      def monitorRound(batch: DataFrame, round: Long): Unit = {
        // 1. ingest: staged-swap keyed merge + modified-log entries
        raw.store("t", batch.select(col("event_id"), col("entity_id"),
          col("ts_sec").as("timestamp"), col("cents"))
          .withColumn("modified", lit(round)))
        raw.markModified("t",
          batch.select(col("hr").as("timestamp")).distinct(), nowSec = round)
        // 2. staleness: fingerprint the folded log, diff vs processed
        val state = Materialization.modifiedState(
          raw.readModifiedLog().get, Seq("timestamp", "part"), "modified")
        val srcFp = Materialization
          .fingerprint(state, "timestamp", "part", "last_modified")
          .localCheckpoint()
        val stale =
          if (processedFp == null) srcFp
          else Materialization.staleChunks(srcFp, processedFp, "timestamp")
        // 3. materialize ONLY stale hours from the accumulated store
        val agg = raw.readPart("t").get
          .withColumn("hr", col("timestamp") - pmod(col("timestamp"), lit(3600L)))
          .join(stale.select(col("timestamp").as("hr")), Seq("hr"), "left_semi")
          .groupBy("entity_id", "hr")
          .agg(count(lit(1)).as("samples"), max(col("cents")).as("max_cents"))
        // 4. trigger over the fresh materialization, into the typed store
        val notifs = TriggerOps.createNotifications(
          agg.select(col("entity_id"), col("hr").as("timestamp"),
            col("samples"), col("max_cents")),
          TriggerRule(
            name = "user/1h/highmax",
            thresholds = Map("max_thr" -> 4500.0),
            condition = "max_cents > max_thr",
            weight = "CASE WHEN max_cents > 4800 THEN 10 " +
              "WHEN max_cents > 4650 THEN 5 ELSE 1 END",
            details = concat(lit("HighMax: user "),
              col("entity_id").cast("string"),
              lit(" cents "), col("max_cents").cast("string"))),
          extras = Seq(col("samples")))
        ns.store(notifs, nowSec = round)
        processedFp = srcFp // everything stale was materialized
      }
      monitorRound(e.filter(!isRound2), 1L)
      monitorRound(e.filter(isRound2), 2L)
      ns.read().get
        .select(col("entity_id"), col("timestamp"), col("rule"),
          col("weight"), col("details"), col("samples"), col("created"))
        .orderBy("entity_id", "timestamp")
    },
    // ---- bucketed co-located join: both fact tables written
    // bucketBy(8, orderkey) + sortBy into the session catalog, so the
    // orders⋈lineitem SortMergeJoin reads pre-bucketed, pre-sorted
    // parquet with NO shuffle on either side (plan-asserted in
    // QueriesPlanSpec) — the big-fact⋈big-fact technique when broadcast
    // is impossible: at 100 TB the join pays zero network ----
    "q185_bucketed_join" -> { (s, dir) =>
      val work = QueriesLLM.tempWorkDir("graft_q185_")
      load(s, dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$work/orders_b").saveAsTable("graft_q185_orders")
      load(s, dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$work/lineitem_b").saveAsTable("graft_q185_lineitem")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      val one = lit(1).cast("decimal(12,2)")
      s.table("graft_q185_orders")
        .join(s.table("graft_q185_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },
    // ---- Funnel analysis: per-user ordered view → click → purchase
    // progression (each stage's first event must FOLLOW the previous
    // stage's), aggregated to stage-conversion counts ----
    "q156_funnel" -> { (s, dir) =>
      val e = events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_sec")).as("v_ts"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts_sec") >= col("v_ts"))
        .groupBy("user_id").agg(min(col("ts_sec")).as("c_ts"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts_sec") >= col("c_ts"))
        .groupBy("user_id").agg(min(col("ts_sec")).as("p_ts"))
      val users = e.select(countDistinct(col("user_id")).as("n_users"))
      users
        .crossJoin(v.agg(count(lit(1)).as("n_viewed")))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased_after_click")))
    },
    // ---- Cohort retention: users bucketed by first-seen week, activity
    // counted per (cohort_week, weeks_since) cell ----
    "q157_cohort_retention" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("week", expr("ts_sec div 604800"))
      val cohort = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      e.select("user_id", "week").distinct()
        .join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "weeks_since")
    },
    // ---- Rolling window stats (fixed-point cents keep sums exact) ----
    "q124_rolling_stats" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      TemporalOps.rollingStats(
          e.select("user_id", "event_id", "ts_sec", "cents"),
          Seq("user_id"), Seq("ts_sec", "event_id"), "cents", window = 5)
        .orderBy("user_id", "ts_sec", "event_id")
    },
    // ---- Pivot long→wide: the trend-store layout itself — harvested
    // (entity, ts, metric, value) rows become one wide row per (entity,
    // hour) with a column pair per metric (the reference's wide trend
    // tables, storage.py's column-per-counter model). Pivot with
    // EXPLICIT values compiles to ONE HashAggregate of CASE projections:
    // one shuffle on the group key, no per-pivot-value pass, and adding
    // a metric adds a projection, not a scan ----
    "q240_pivot_wide" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("hr", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      e.groupBy(col("user_id").as("entity_id"), col("hr"))
        .pivot("event_type", Seq("view", "click", "purchase"))
        .agg(sum(lit(1L)).as("cnt"), sum(col("cents")).as("cents"))
        .orderBy("entity_id", "hr")
    },
    // ---- Unpivot wide→long, the inverse lossless round-trip (export a
    // wide trend table back to harvest-shaped rows). `unpivot` is a
    // zero-shuffle map-side explode; null cells (metric absent for the
    // hour) drop, so long(wide(x)) == x ----
    "q241_unpivot_long" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("hr", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
      val wide = e.groupBy(col("user_id").as("entity_id"), col("hr"))
        .pivot("event_type", Seq("view", "click", "purchase"))
        .agg(sum(lit(1L)).as("cnt"))
      wide.unpivot(
          Array(col("entity_id"), col("hr")),
          Array(col("view"), col("click"), col("purchase")),
          "metric", "cnt")
        .filter(col("cnt").isNotNull)
        .orderBy("entity_id", "hr", "metric")
    },
    // ---- CUBE report: all four (returnflag × linestatus) grouping
    // combinations in ONE aggregate pass (Spark expands the grouping
    // sets before the shuffle — map-side partials still apply; the
    // alternative is 4 scans + union). grouping() flags disambiguate
    // "NULL because grouped away" from data nulls ----
    "q242_cube_report" -> { (s, dir) =>
      load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"),
          sum(col("l_quantity").cast("decimal(30,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(30,2)")).cast("double").as("sum_price"))
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n",
          "sum_qty", "sum_price")
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
    },
    // ---- Zone-map pruned scan: events ingested into a day-partitioned
    // PartStore with `_zones.tsv` min/max kept for event_id (a column
    // that CORRELATES with time without being derivable from it — ids,
    // sequence numbers). A mid-range id predicate then reads only the
    // partition directories whose zone intersects: plan-time directory
    // pruning, no footer reads (Moerkotte SMA / Netezza zone maps; see
    // ZoneSidecar). Two half-ingests exercise the widen-only sidecar
    // merge; ZoneMapSpec asserts the skip actually happens ----
    "q245_zonemap_scan" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      val work = java.nio.file.Files.createTempDirectory("graft_q245_").toString
      val e = events(s, dir).select(
          col("event_id"), col("user_id").as("entity_id"),
          col("ts_sec").as("timestamp"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("modified", lit(1L))
      val ps = new PartStore(s, PartStoreConfig(s"$work/t", 86400L,
        keyCols = Seq("event_id"), zoneCols = Seq("event_id")))
      ps.store("ev", e.filter(pmod(col("event_id"), lit(2)) === 0))
      ps.store("ev", e.filter(pmod(col("event_id"), lit(2)) === 1))
      // bounded driver read: one max() row picks a sf-relative id range
      val maxId = e.agg(max(col("event_id"))).collect()(0).getLong(0)
      val (lo, hi) = (maxId / 4, maxId / 2)
      ps.readPartZonePruned("ev", "event_id", lo, hi).get
        .groupBy((col("timestamp") - pmod(col("timestamp"), lit(86400L))).as("day"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("sum_cents"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .orderBy("day")
    },
    // ---- Golden-record capstone: q219's scored matches → connected
    // components (large-star/small-star, O(log n) rounds) → one
    // consolidated record per entity cluster. Survivorship rules are
    // deterministic aggregates: golden_name = min_by (priority, id) —
    // master records outrank CRM copies — max balance, nation spread.
    // The match→cluster→merge chain IS the MDM pipeline (Fellegi–Sunter
    // matching, transitive closure, rule-based survivorship) ----
    "q247_golden_record" -> { (s, dir) =>
      import graft.functions.Dedup
      val (leftDf, crm) = linkageFrames(s, dir)
      val members = leftDf.select(col("c_custkey").as("id"),
          col("c_name").as("name"), col("nk").as("nation"),
          floor(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          lit(0L).as("priority"))
        .unionByName(crm.select(col("acct_id").as("id"),
          col("acct_name").as("name"), col("acct_nation").as("nation"),
          (col("acct_bal") * 100).cast("long").as("bal_cents"),
          lit(1L).as("priority")))
      val matches = linkageMatches(s, dir)
        .select(col("c_custkey").as("id1"), col("acct_id").as("id2"))
      val cc = Dedup.connectedKeepersStar(members, "id", matches)
      members.join(cc, "id")
        .groupBy(col("keeper").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("priority") === 0L, 1L).otherwise(0L)).cast("long")
            .as("n_masters"),
          min_by(col("name"), struct(col("priority"), col("id")))
            .as("golden_name"),
          max(col("bal_cents")).as("max_bal_cents"),
          countDistinct(col("nation")).as("n_nations"))
        .orderBy("cluster_id")
    },
    // ---- Declarative data-quality audit: all row rules in ONE
    // aggregate pass (adding a rule adds a projection, never a scan),
    // uniqueness as its own keyed aggregate, referential integrity as a
    // left-anti join — the quarantine ingest's field checks (q225)
    // lifted to table-level contracts ----
    "q248_dq_audit" -> { (s, dir) =>
      import graft.operators.DataQuality
      val e = events(s, dir)
      DataQuality.audit(e,
        rowRules = Seq(
          "user_id_not_null" -> col("user_id").isNull,
          "value_in_range" -> !(col("value") >= 0.0 && col("value") < 990.0),
          "known_event_type" -> !col("event_type").isin(
            "view", "click", "purchase", "signup", "error"),
          "props_present" -> (col("props").isNull || col("props") === "")),
        uniqueKeys = Seq("event_id_unique" -> Seq("event_id")),
        fks = Seq(("user_is_customer", "user_id",
          load(s, dir, "customer"), "c_custkey")))
        .orderBy("rule")
    },
    // ---- Snapshot diff: two orders snapshots reconciled in one
    // full-outer key join — added/removed/changed with the exact changed
    // column set (the attribute store's lag-compare generalized to
    // whole-snapshot CDC audit). The "new" snapshot is a deterministic
    // perturbation: %97 keys dropped, %89 keys cloned to new ids, %13
    // prices bumped, %31 statuses flipped ----
    "q249_snapshot_diff" -> { (s, dir) =>
      import graft.operators.SnapshotDiff
      val o = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("price_cents"))
      val neu = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
        .withColumn("price_cents",
          when(pmod(col("o_orderkey"), lit(13)) === 0,
            col("price_cents") + 500L).otherwise(col("price_cents")))
        .withColumn("o_orderstatus",
          when(pmod(col("o_orderkey"), lit(31)) === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .unionByName(
          o.filter(pmod(col("o_orderkey"), lit(89)) === 0)
            .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      SnapshotDiff.diff(o, neu, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("change"),
          array_join(col("changed_cols"), ",").as("changed_cols"))
        .orderBy("o_orderkey")
    },
    // ---- Bitemporal attribute read: state AS OF a historical instant —
    // the SCD-2 validity view (q07) filtered to the containing range per
    // entity ("what did this attribute say at T?", the attribute
    // store's history-reconstruction contract). One keyed window to
    // build validity + a filter; at scale the filter pushes below the
    // window's shuffle output, never a second scan ----
    "q250_attr_asof" -> { (s, dir) =>
      val tUs = 1705276800000000L // mid-fixture instant (q238's boundary)
      AttributeOps.scd2(events(s, dir), "user_id", "ts", Seq("event_id"),
          Seq("event_type"))
        .select(col("user_id"), col("event_type"),
          expr("valid_from div 1000").as("valid_from_us"),
          expr("valid_to div 1000").as("valid_to_us"))
        .filter(col("valid_from_us") <= tUs &&
          (col("valid_to_us").isNull || col("valid_to_us") > tUs))
        .select("user_id", "event_type", "valid_from_us")
        .orderBy("user_id")
    },
    // ---- Robust per-entity outlier detection (median/MAD, not
    // mean/stddev — one corrupt reading can't drag the threshold): the
    // q230 ×2/×4 fixed-point trick keeps med2 = 2·median and
    // mad4 = 4·MAD exact integers (the interpolating percentile of
    // longs lands on integer or half-integer), so the emitted stats and
    // the 3-MAD cut (2·dev2 > 3·mad4) are engine-invariant. Three keyed
    // aggregates, no window ----
    "q252_robust_outliers" -> { (s, dir) =>
      val e = events(s, dir)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
        .select("user_id", "cents")
      val med = e.groupBy("user_id")
        .agg((expr("percentile(cents, 0.5)") * 2).cast("long").as("med2"))
      val dev = e.join(med, "user_id")
        .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
      val mad = dev.groupBy("user_id")
        .agg((expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
      dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), first(col("med2")).as("med2"),
          first(col("mad4")).as("mad4"),
          sum(when(col("dev2") * 2 > col("mad4") * 3, 1L).otherwise(0L))
            .cast("long").as("n_outliers"))
        .orderBy("user_id")
    },
    // ---- Declarative sessionization: Spark's BUILT-IN session_window
    // (gap-merged event-time windows) in one aggregate — the
    // Catalyst-native form of q45's lag/cumsum chain and the streaming
    // spec's mapGroupsWithState, same semantics (merge while gap <
    // 30 min, end = last event + gap). µs precision throughout ----
    "q261_session_window" -> { (s, dir) =>
      val e = load(s, dir, "events")
        .withColumn("evt", timestamp_micros(expr("ts div 1000")))
      e.groupBy(col("user_id"), session_window(col("evt"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    },
    // ---- 3-dimensional Morton clustering key (zorderKeyN): octree
    // file layout so row-group stats prune on ANY of three columns —
    // the q82 two-dim key generalized; same pure-integer arithmetic,
    // oracle replays the interleave bit-for-bit ----
    "q262_zorder3_key" -> { (s, dir) =>
      events(s, dir).select(col("event_id"),
        graft.operators.Layout.zorderKeyN(Seq(
          pmod(col("user_id"), lit(256L)),
          pmod(col("event_id"), lit(256L)),
          pmod(floor(col("value") * 100).cast("long"), lit(256L))),
          bits = 8).as("zkey"))
        .orderBy("event_id")
    },
    // ---- Benford first-digit audit (fraud/synthetic-data signal, the
    // classic DQ screen): first significant digit of the exact cents
    // amount vs the canonical Benford distribution, all-integer basis
    // points. ONE ≤9-key map-side aggregate + a broadcast scalar total
    // — no window, no second scan of the fact; the per-row digit
    // extraction rides the parquet scan. Expected shares are the
    // canonical log10(1+1/d) table as integer literals, so the gate is
    // engine-invariant (no libm in compared columns). ----
    "q263_benford_audit" -> { (s, dir) =>
      val li = load(s, dir, "lineitem")
        .withColumn("cents",
          (col("l_extendedprice").cast("decimal(12,2)") * lit(100))
            .cast("bigint"))
        .filter(col("cents").isNotNull && col("cents") > 0)
        .withColumn("digit",
          substring(col("cents").cast("string"), 1, 1).cast("bigint"))
      val counts = li.groupBy("digit").agg(count(lit(1)).as("cnt"))
      val total = li.agg(count(lit(1)).as("__total"))
      counts.crossJoin(broadcast(total))
        .withColumn("share_bp", expr("(cnt * 10000) DIV __total"))
        .withColumn("expected_bp", expr(
          """CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249
             WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669
             WHEN 7 THEN 580 WHEN 8 THEN 512 ELSE 458 END"""))
        .select(col("digit"), col("cnt"), col("share_bp"),
          col("expected_bp"),
          (col("share_bp") - col("expected_bp")).as("dev_bp"))
        .orderBy("digit")
    },
    // ---- Top user journeys: sessionize (30-min gap, the q45 pattern)
    // then the session's ordered event-type PATH (array_sort of
    // (ts, event_id, type) structs — bounded by session length, no
    // second window), counted and top-20 by (count, path). The
    // path-mining report a product team reads daily ----
    "q259_top_paths" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = e
        .withColumn("prev_sec", lag(col("ts_sec"), 1).over(wOrd))
        .withColumn("new_session",
          when(col("prev_sec").isNull ||
            (col("ts_sec") - col("prev_sec")) > 1800, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy("user_id", "session_id")
        .agg(array_sort(collect_list(struct(col("ts_sec"), col("event_id"),
          col("event_type")))).as("__evs"))
        .select(concat_ws(">",
          expr("transform(__evs, x -> x.event_type)")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(20)
    },
    // ---- Two-level materialization DAG with staleness PROPAGATION:
    // raw → stale HOURS → hourly store (whose markModified marks the
    // affected DAYS) → stale DAYS → daily store. Round 2's late trickle
    // re-materializes exactly the touched hours AND their containing
    // days — the reference's hourly-feeds-daily chain with per-level
    // modified logs. The correctness statement IS the oracle: after any
    // incremental schedule the daily store equals the one-shot full
    // recompute ----
    "q256_staleness_chain" -> { (s, dir) =>
      import graft.storage.{PartStore, PartStoreConfig}
      val base = java.nio.file.Files.createTempDirectory("graft_q256_").toString
      val e = events(s, dir).select(
          col("user_id").as("entity_id"), col("ts_sec"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("hr", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
      // sparse trickle (%997) so round 2 leaves some days untouched —
      // the emitted last_round column then PROVES selective propagation
      // (an oracle-derivable 1 for days the chain correctly skipped)
      val isRound2 = col("ts_sec") >= 1705276800L ||
        pmod(col("event_id"), lit(997)) === 0
      val raw = new PartStore(s,
        PartStoreConfig(s"$base/raw", 86400L, keyCols = Seq("event_id")))
      val hourly = new PartStore(s, PartStoreConfig(s"$base/hourly", 86400L))
      val daily = new PartStore(s, PartStoreConfig(s"$base/daily", 86400L * 32))
      var procRawFp: DataFrame = null
      var procHourFp: DataFrame = null
      def round(batch0: DataFrame, r: Long): Unit = {
        // one materialization of the round's trickle: the frame feeds the
        // raw store (twice on the round-2 merge: pindex collect + staged
        // write) AND the markModified distinct — without the pin the
        // events scan + filter re-executed for each (r19)
        val batch = batch0.localCheckpoint()
        raw.store("t", batch.select(col("event_id"), col("entity_id"),
          col("ts_sec").as("timestamp"), col("cents"))
          .withColumn("modified", lit(r)))
        raw.markModified("t",
          batch.select(col("hr").as("timestamp")).distinct(), nowSec = r)
        val rawFp = Materialization.fingerprint(
            Materialization.modifiedState(raw.readModifiedLog().get,
              Seq("timestamp", "part"), "modified"),
            "timestamp", "part", "last_modified").localCheckpoint()
        val staleHours =
          (if (procRawFp == null) rawFp
           else Materialization.staleChunks(rawFp, procRawFp, "timestamp"))
            .select(col("timestamp").as("hr"))
        // staleHours is read twice (pindex collect + semi-join) but
        // derives from the two CHECKPOINTED fingerprint frames — the
        // recompute is a metadata-scale compare, cheaper than
        // materializing it
        // partition-pruned re-aggregation (the readPartRange/production
        // shape): only the stale hours' DAY directories are scanned, not
        // the whole raw store — at 100 TB a late trickle touching one day
        // lists one directory. Bounded driver read: distinct pindex of
        // the stale set ≤ |days in corpus| (metadata scale, same bound as
        // the modified log itself).
        val stalePidx = staleHours
          .select(expr("hr div 86400").as("p")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        val hourAgg = raw.readPart("t").get
          .filter(col("pindex").isin(stalePidx: _*))
          .withColumn("hr", col("timestamp") - pmod(col("timestamp"), lit(3600L)))
          .join(staleHours, Seq("hr"), "left_semi")
          .groupBy("entity_id", "hr")
          .agg(count(lit(1)).as("samples"), sum(col("cents")).as("sum_cents"))
        // hourAgg timestamps are exactly the stale hours, whose day
        // pindexes were JUST collected (stalePidx) — the hint saves the
        // merge-path re-execution of the whole hourly aggregation for
        // its pindex-distinct collect (r19; hourly psize = 86400 matches
        // stalePidx's hr-div-86400 derivation)
        hourly.store("h", hourAgg
          .select(col("entity_id"), col("hr").as("timestamp"),
            col("samples"), col("sum_cents"))
          .withColumn("modified", lit(r)),
          batchIndicesHint = Some(stalePidx))
        // PROPAGATION: the re-materialized hours mark their days stale
        hourly.markModified("h",
          staleHours.select((col("hr") - pmod(col("hr"), lit(86400L)))
            .as("timestamp")).distinct(), nowSec = r)
        val hourFp = Materialization.fingerprint(
            Materialization.modifiedState(hourly.readModifiedLog().get,
              Seq("timestamp", "part"), "modified"),
            "timestamp", "part", "last_modified").localCheckpoint()
        val staleDays =
          (if (procHourFp == null) hourFp
           else Materialization.staleChunks(hourFp, procHourFp, "timestamp"))
            .select(col("timestamp").as("day"))
        // same pruned shape one level up: stale DAYS prune the hourly
        // store's day directories before the daily re-aggregation
        val staleDayPidx = staleDays
          .select(expr("day div 86400").as("p")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        val dayAgg = hourly.readPart("h").get
          .filter(col("pindex").isin(staleDayPidx: _*))
          .withColumn("day", col("timestamp") - pmod(col("timestamp"), lit(86400L)))
          .join(staleDays, Seq("day"), "left_semi")
          .groupBy("entity_id", "day")
          .agg(sum(col("samples")).cast("long").as("samples"),
            sum(col("sum_cents")).cast("long").as("sum_cents"))
        // dayAgg timestamps are the stale midnight-aligned days; the
        // daily store's psize is 86400·32, so its pindexes are the
        // collected epoch-day list div 32 — derived in the driver, no
        // re-execution of the daily aggregation for the collect (r19)
        daily.store("d", dayAgg
          .select(col("entity_id"), col("day").as("timestamp"),
            col("samples"), col("sum_cents"))
          .withColumn("modified", lit(r)),
          batchIndicesHint = Some(staleDayPidx.map(_ / 32).distinct))
        procRawFp = rawFp
        procHourFp = hourFp
      }
      round(e.filter(!isRound2), 1L)
      round(e.filter(isRound2), 2L)
      daily.readPart("d").get
        .select(col("entity_id"), col("timestamp").as("day"),
          col("samples"), col("sum_cents"),
          col("modified").as("last_round"))
        .orderBy("entity_id", "day")
    },
    // ---- Multi-horizon rolling features (ML feature prep): for every
    // event, trailing 1h and 24h counts/sums per entity in keyed RANGE
    // frames — one sort per entity serves all horizons, frames bounded
    // by per-entity history ----
    "q257_lag_features" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
        .select("user_id", "event_id", "ts_sec", "cents")
      def w(sec: Long) = Window.partitionBy("user_id").orderBy("ts_sec")
        .rangeBetween(-(sec - 1), 0)
      e.withColumn("cnt_1h", count(lit(1)).over(w(3600)))
        .withColumn("sum_1h", sum(col("cents")).over(w(3600)).cast("long"))
        .withColumn("cnt_24h", count(lit(1)).over(w(86400)))
        .withColumn("sum_24h", sum(col("cents")).over(w(86400)).cast("long"))
        .orderBy("user_id", "ts_sec", "event_id")
    },
    // ---- ANALYZE-style column profile: per-column non-null/null/NDV/
    // min/max for the whole events table in ONE aggregate pass (exact
    // NDV rides Expand; the scaladoc names KMV as the 100 TB swap) ----
    "q255_table_stats" -> { (s, dir) =>
      graft.operators.DataQuality.profile(
          events(s, dir).select("event_id", "ts_sec", "user_id",
            "event_type", "value", "props"),
          Seq("event_id", "ts_sec", "user_id", "event_type", "value", "props"))
        .orderBy("column")
    }
  )

  val oracleSql: Map[String, String] = {
    val ts = "(epoch_ns(ts)//1000000000)"
    val oracleSqlAsof =
      s"""WITH ev AS (
             SELECT user_id, event_id, $ts AS sec, value FROM events),
           hourly AS (
             SELECT user_id, (sec//3600)*3600 + 3600 AS avail_sec,
               count(*) AS prev_hr_events,
               max(CAST(floor(value*100) AS BIGINT)) AS prev_hr_max_cents
             FROM ev GROUP BY 1, 2),
           j AS (
             SELECT e.user_id, e.event_id, e.sec, h.avail_sec,
               h.prev_hr_events, h.prev_hr_max_cents
             FROM ev e ASOF LEFT JOIN hourly h
               ON e.user_id = h.user_id AND e.sec >= h.avail_sec)
           SELECT user_id, event_id, sec,
             CASE WHEN avail_sec IS NOT NULL AND sec - avail_sec <= 7200
               THEN avail_sec END AS asof_ts,
             CASE WHEN avail_sec IS NOT NULL AND sec - avail_sec <= 7200
               THEN prev_hr_events END AS prev_hr_events,
             CASE WHEN avail_sec IS NOT NULL AND sec - avail_sec <= 7200
               THEN prev_hr_max_cents END AS prev_hr_max_cents
           FROM j ORDER BY user_id, sec, event_id"""
    Map(
      "q01_time_agg" ->
        s"""SELECT user_id AS entity_id, ($ts//3600)*3600 + 3600 AS "timestamp",
            count(*) AS samples,
            CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value,
            CAST(max(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS max_value,
            CAST(min(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS min_value
            FROM events GROUP BY 1,2 ORDER BY 1,2""",
      "q72_salted_rollup" ->
        s"""SELECT user_id, ($ts//3600)*3600 + 3600 AS "timestamp",
            count(*) AS samples,
            CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value,
            min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY 1,2 ORDER BY 1,2""",
      "q02_entity_agg" ->
        """SELECT CAST(s_nationkey AS BIGINT) AS entity_id, count(*) AS samples,
            CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1 ORDER BY 1""",
      "q03_rollup_chain" ->
        s"""WITH hourly AS (
             SELECT user_id, ($ts//3600)*3600 + 3600 AS w, count(*) AS samples,
               CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
             FROM events GROUP BY 1,2)
           SELECT user_id % 10 AS entity_id, w AS "timestamp",
             CAST(sum(samples) AS BIGINT) AS samples,
             CAST(sum(CAST(sum_value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
           FROM hourly GROUP BY 1,2 ORDER BY 1,2""",
      // dict.update semantics: gated on the CARRYING package, and the max
      // goes through a (seq, value) struct because DuckDB's max_by SKIPS
      // null values — the struct max preserves a carried NULL at the top
      // seq, exactly like Spark's max_by (a carried NULL wins).
      "q04_merge_packages" ->
        s"""WITH u AS (
             SELECT user_id, ($ts//3600)*3600 AS hr, value AS counter_a,
               CAST(NULL AS DOUBLE) AS counter_b, event_id, 0 AS pkg
             FROM events WHERE event_type = 'click'
             UNION ALL
             SELECT user_id, ($ts//3600)*3600 AS hr, CAST(NULL AS DOUBLE),
               value, event_id, 1 AS pkg
             FROM events WHERE event_type = 'error')
           SELECT user_id, hr,
             (max(struct_pack(s := event_id, v := counter_a))
                FILTER (WHERE pkg = 0)).v AS counter_a,
             (max(struct_pack(s := event_id, v := counter_b))
                FILTER (WHERE pkg = 1)).v AS counter_b
           FROM u GROUP BY 1,2 ORDER BY 1,2""",
      "q05_current_ptr" ->
        """SELECT o_custkey, o_orderkey, o_orderstatus,
            epoch_ns(o_orderdate)//1000000000 AS order_sec
           FROM orders
           QUALIFY row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
           ORDER BY o_custkey""",
      "q06_compact" ->
        """SELECT user_id, event_id, event_type FROM (
             SELECT user_id, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             FROM events)
           WHERE prev IS NULL OR prev <> event_type
           ORDER BY user_id, event_id""",
      "q07_scd2" ->
        """WITH compacted AS (
             SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM (
               SELECT user_id, event_id, event_type, ts,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events)
             WHERE prev IS NULL OR prev <> event_type)
           SELECT user_id, event_type, ts_us AS valid_from_us,
             lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS valid_to_us
           FROM compacted ORDER BY user_id, valid_from_us""",
      "q08_upsert" ->
        """WITH tgt AS (
             SELECT o_orderkey, o_totalprice,
               epoch_ns(o_orderdate)//1000000000 AS modified,
               epoch_ns(o_orderdate)//1000000000 AS created
             FROM orders WHERE o_orderkey % 3 <> 0),
           bat AS (
             SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
               epoch_ns(o_orderdate)//1000000000 + 100 AS modified,
               epoch_ns(o_orderdate)//1000000000 + 100 AS created
             FROM orders WHERE o_orderkey % 2 = 0)
           SELECT coalesce(t.o_orderkey, b.o_orderkey) AS o_orderkey,
             greatest(t.modified, b.modified) AS modified,
             coalesce(t.created, b.created) AS created,
             CASE WHEN b.o_orderkey IS NOT NULL THEN b.o_totalprice
                  ELSE t.o_totalprice END AS o_totalprice
           FROM tgt t FULL OUTER JOIN bat b ON t.o_orderkey = b.o_orderkey
           ORDER BY o_orderkey""",
      "q09_entity_resolution" ->
        """WITH dim AS (SELECT s_name AS name, s_suppkey AS id FROM supplier),
           incoming AS (
             SELECT s_name AS name FROM supplier WHERE s_suppkey <= 50
             UNION ALL SELECT p_brand FROM part),
           matched AS (
             SELECT DISTINCT i.name, d.id
             FROM incoming i LEFT JOIN dim d ON i.name = d.name),
           mx AS (SELECT max(id) AS m FROM dim)
           SELECT name, id FROM matched WHERE id IS NOT NULL
           UNION ALL
           SELECT name, (SELECT m FROM mx) + dense_rank() OVER (ORDER BY name) AS id
           FROM matched WHERE id IS NULL
           ORDER BY name""",
      "q10_anti_join" ->
        """SELECT c_custkey, c_name FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
           ORDER BY c_custkey""",
      "q11_predicates" ->
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
           WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
             AND l_quantity >= 30 AND l_discount BETWEEN 0.02 AND 0.08
             AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
             AND l_linenumber IN (1, 2, 3, 4)
           ORDER BY l_orderkey, l_linenumber""",
      "q12_generated_trend" ->
        """SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
               (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS net_price,
             CASE WHEN l_quantity >= 40 THEN 'high'
                  WHEN l_quantity >= 20 THEN 'mid' ELSE 'low' END AS qty_class
           FROM lineitem ORDER BY l_orderkey, l_linenumber""",
      "q13_fingerprint" ->
        """WITH state AS (
             SELECT user_id, event_type, max(epoch_us(ts)) AS last_modified
             FROM events GROUP BY 1,2)
           SELECT user_id, max(last_modified) AS max_modified,
             string_agg(event_type || ':' || CAST(last_modified AS VARCHAR), ','
               ORDER BY event_type || ':' || CAST(last_modified AS VARCHAR)) AS fingerprint
           FROM state GROUP BY 1 ORDER BY 1""",
      "q14_stale_chunks" ->
        s"""WITH src AS (
             SELECT hr, max(last_modified) AS max_modified,
               string_agg(event_type || ':' || CAST(last_modified AS VARCHAR), ','
                 ORDER BY event_type || ':' || CAST(last_modified AS VARCHAR)) AS fingerprint
             FROM (SELECT ($ts//3600)*3600 AS hr, event_type, max(epoch_us(ts)) AS last_modified
                   FROM events GROUP BY 1,2) GROUP BY 1),
           processed AS (
             SELECT hr, string_agg(event_type || ':' || CAST(last_modified AS VARCHAR), ','
                 ORDER BY event_type || ':' || CAST(last_modified AS VARCHAR)) AS fingerprint
             FROM (SELECT ($ts//3600)*3600 AS hr, event_type, max(epoch_us(ts)) AS last_modified
                   FROM events WHERE $ts < 1705276800 GROUP BY 1,2) GROUP BY 1)
           SELECT s.hr, s.max_modified
           FROM src s LEFT JOIN processed p ON s.hr = p.hr
           WHERE p.fingerprint IS NULL OR p.fingerprint <> s.fingerprint
           ORDER BY s.hr""",
      "q15_series_join" ->
        s"""WITH hours AS (
             SELECT unnest(generate_series(1704067200, 1706655600, 3600)) AS hr),
           counts AS (
             SELECT ($ts//3600)*3600 AS hr, count(*) AS cnt FROM events GROUP BY 1)
           SELECT h.hr, coalesce(c.cnt, 0) AS cnt
           FROM hours h LEFT JOIN counts c ON h.hr = c.hr ORDER BY h.hr""",
      "q16_report" ->
        """SELECT count(*) AS row_count, count(DISTINCT user_id) AS entity_count,
             max(epoch_us(ts)) AS max_ts_us, min(epoch_us(ts)) AS min_ts_us
           FROM events""",
      "q17_topk" ->
        """SELECT o_orderkey, o_totalprice FROM orders
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
      "q18_month_rollup" ->
        """SELECT epoch_ns(date_trunc('month', o_orderdate))//1000000000 AS month_start,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
           FROM orders GROUP BY 1 ORDER BY 1""",
      "q19_partition_index" ->
        """SELECT epoch_ns(l_shipdate)//1000000000//345600 AS pindex, count(*) AS n,
             min(epoch_ns(l_shipdate)//1000000000) AS min_sec,
             max(epoch_ns(l_shipdate)//1000000000) AS max_sec
           FROM lineitem GROUP BY 1 ORDER BY 1""",
      "q335_granularity_parse" ->
        """WITH m AS (
             SELECT max(epoch_ns(ts)//1000000000) AS sec FROM events),
           mt AS (
             SELECT sec, make_timestamp(sec * 1000000) AS t FROM m),
           specs(gran, gname, kind, n) AS (VALUES
             ('900','15m','s',900), ('900 seconds','15m','s',900),
             ('15m','15m','s',900), ('30 min','30m','s',1800),
             ('1h','1h','s',3600), ('4 hours','4h','s',14400),
             ('1d','1d','d',1), ('2 days','2d','d',2), ('1w','1w','w',1),
             ('1 month','1month','mo',1), ('3 months','3month','mo',3),
             ('1y','12month','mo',12))
           SELECT gran, gname,
             CAST(CASE kind
               WHEN 's' THEN sec - sec % n
               WHEN 'd' THEN epoch(date_trunc('day', t))
               WHEN 'w' THEN epoch(date_trunc('week', t))
               ELSE epoch(date_trunc('month', t)) END AS BIGINT) AS trunc_sec,
             CAST(CASE kind
               WHEN 's' THEN sec - sec % n + n
               WHEN 'd' THEN epoch(date_trunc('day', t) + to_days(n))
               WHEN 'w' THEN epoch(date_trunc('week', t) + to_days(7 * n))
               ELSE epoch(date_trunc('month', t) + to_months(n)) END AS BIGINT)
               AS next_sec
           FROM specs, mt ORDER BY gran""",
      // q337: the oracle REGENERATES the sample data — SampleDataGen's
      // value is md5("name:idx:ts") first-32-bits mod 80000 milli-units,
      // replayed here nibble by nibble (the md5Ladder32 convention), so a
      // generator or ingest defect cannot hide behind a rows-only check.
      "q337_sample_data_gen" -> {
        def ladder(expr: String): String =
          (0 until 8).map { i =>
            val mult = BigInt(16).pow(7 - i)
            val term =
              s"(strpos('0123456789abcdef', substr(md5($expr), ${i + 1}, 1)) - 1)"
            if (mult == 1) term else s"$term * $mult"
          }.mkString(" + ")
        val p = ladder("'power:' || CAST(i AS VARCHAR) || ':' || CAST(sec AS VARCHAR)")
        val t = ladder("'temp:' || CAST(i AS VARCHAR) || ':' || CAST(sec AS VARCHAR)")
        s"""WITH ts AS (
             SELECT CAST(1705276800 + 3600 * unnest(generate_series(0, 23))
               AS BIGINT) AS sec),
           cells AS (
             SELECT sec, unnest(generate_series(0, 2)) AS i FROM ts),
           vals AS (
             SELECT sec, i, ($p) % 80000 AS p_milli, ($t) % 80000 AS t_milli
             FROM cells)
           SELECT sec AS ts_sec, CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT i) AS BIGINT) AS n_nodes,
             CAST(sum(p_milli) AS BIGINT) AS power_milli,
             CAST(sum(t_milli) AS BIGINT) AS temp_milli,
             CAST(max(p_milli) AS BIGINT) AS max_power_milli
           FROM vals GROUP BY 1 ORDER BY 1"""
      },
      // q338: zoned truncation replay — timezone('Europe/Amsterdam', tz)
      // converts instant→local wall clock, date_trunc on the naive local,
      // timezone(zone, naive) re-interprets in the zone (DuckDB icu).
      // next = local trunc + calendar interval, re-zoned — 23 h and 25 h
      // DST days fall out of the zone math, never hand-added.
      "q338_granularity_dst" ->
        """WITH secs(sec) AS (VALUES (1711800000), (1711845000),
             (1711848600), (1729944000), (1729989000), (1729992600)),
           g(gran, kind, n) AS (VALUES ('1h','s',3600), ('1d','d',1),
             ('1w','w',1), ('1month','mo',1)),
           loc AS (
             SELECT sec, gran, kind, n,
               timezone('Europe/Amsterdam', to_timestamp(sec)) AS lt
             FROM secs, g),
           tr AS (
             SELECT sec, gran, kind, n,
               CASE kind
                 WHEN 's' THEN sec - sec % n
                 WHEN 'd' THEN CAST(epoch(timezone('Europe/Amsterdam',
                   date_trunc('day', lt))) AS BIGINT)
                 WHEN 'w' THEN CAST(epoch(timezone('Europe/Amsterdam',
                   date_trunc('week', lt))) AS BIGINT)
                 ELSE CAST(epoch(timezone('Europe/Amsterdam',
                   date_trunc('month', lt))) AS BIGINT) END AS trunc_sec,
               CASE kind
                 WHEN 's' THEN sec - sec % n + n
                 WHEN 'd' THEN CAST(epoch(timezone('Europe/Amsterdam',
                   date_trunc('day', lt) + to_days(n))) AS BIGINT)
                 WHEN 'w' THEN CAST(epoch(timezone('Europe/Amsterdam',
                   date_trunc('week', lt) + to_days(7 * n))) AS BIGINT)
                 ELSE CAST(epoch(timezone('Europe/Amsterdam',
                   date_trunc('month', lt) + to_months(n))) AS BIGINT)
                 END AS next_sec
             FROM loc)
           SELECT CAST(sec AS BIGINT) AS sec, gran,
             CAST(trunc_sec AS BIGINT) AS trunc_sec,
             CAST(next_sec AS BIGINT) AS next_sec,
             CAST(next_sec - trunc_sec AS BIGINT) AS span_sec
           FROM tr ORDER BY sec, gran""",
      "q20_trigger" ->
        s"""SELECT user_id AS entity_id, $ts AS "timestamp",
             'user/1h/highvalue' AS rule,
             CAST(CASE WHEN value > 48 THEN 10 WHEN value > 44 THEN 5 ELSE 1 END AS BIGINT)
               AS weight,
             'HighValue: user ' || CAST(user_id AS VARCHAR) || ' value ' ||
               CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS details,
             '{}' AS data
           FROM events WHERE event_type = 'error' AND value > 40
           ORDER BY 1,2""",
      "q21_union_by_name" ->
        """SELECT CAST(n_nationkey AS BIGINT) AS ekey, n_name AS name, n_regionkey AS regionkey
           FROM nation
           UNION ALL BY NAME
           SELECT CAST(r_regionkey + 1000 AS BIGINT) AS ekey, r_name AS name FROM region
           ORDER BY ekey""",
      "q22_retention" ->
        s"""SELECT ($ts//86400)*86400 AS day, count(*) AS n FROM events
           WHERE $ts >= 1705276800 GROUP BY 1 ORDER BY 1""",
      "q23_json_props" ->
        """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
           FROM events GROUP BY 1 ORDER BY 1""",
      "q45_sessionize" ->
        s"""WITH gapped AS (
             SELECT user_id, event_id, ts, $ts AS sec,
               lag($ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
             FROM events),
           marked AS (
             SELECT user_id, event_id, ts, sec,
               CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END
                 AS new_session
             FROM gapped),
           sessions AS (
             SELECT user_id, sec,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             FROM marked)
           SELECT user_id, session_id, count(*) AS n_events,
             min(sec) AS session_start, max(sec) AS session_end
           FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""",
      "q39_array_ops" ->
        """SELECT user_id,
             array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
             CAST(len(list_sort(list(DISTINCT event_type))) AS INT) AS n_types,
             list_contains(list(DISTINCT event_type), 'error') AS has_error
           FROM events GROUP BY user_id ORDER BY user_id""",
      "q40_relation_cardinality" ->
        """SELECT CAST(o_custkey AS BIGINT) AS violated_key, count(*) AS n
           FROM orders GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""",
      // mapping is the (start, end]-convention CEILING: aligned timestamps
      // stay fixed (the hour label 24:00 belongs to the day ending 24:00)
      "q49_yaml_agg_chain" ->
        s"""WITH h AS (
             SELECT user_id AS entity_id,
               CASE WHEN $ts % 3600 = 0 THEN $ts
                    ELSE ($ts//3600)*3600 + 3600 END AS w,
               count(*) AS samples,
               CAST(sum(CAST(floor(value) AS INT)) AS BIGINT) AS value_i
             FROM events GROUP BY 1, 2)
           SELECT entity_id,
             CASE WHEN w % 86400 = 0 THEN w
                  ELSE (w//86400)*86400 + 86400 END AS "timestamp",
             CAST(sum(samples) AS BIGINT) AS samples,
             CAST(CAST(sum(value_i) AS DECIMAL(38,18)) AS DOUBLE) AS value_i
           FROM h GROUP BY 1, 2 ORDER BY 1, 2""",
      "q50_yaml_entity_agg" ->
        s"""WITH h AS (
             SELECT user_id AS entity_id, ($ts//3600)*3600 + 3600 AS w,
               count(*) AS samples,
               CAST(sum(CAST(floor(value) AS INT)) AS BIGINT) AS value_i
             FROM events GROUP BY 1, 2)
           SELECT entity_id % 10 AS entity_id, w AS "timestamp",
             CAST(sum(samples) AS BIGINT) AS samples,
             CAST(CAST(sum(value_i) AS DECIMAL(38,18)) AS DOUBLE) AS value_i
           FROM h GROUP BY 1, 2 ORDER BY 1, 2""",
      "q54_dn_hierarchy" ->
        """SELECT CAST(c_custkey AS BIGINT) AS source_id,
             CAST(100000 + ord(substr(lower(c_mktsegment), 1, 1)) AS BIGINT)
               AS target_id
           FROM customer ORDER BY source_id""",
      "q55_stable_chunks" ->
        s"""WITH state AS (
             SELECT ($ts//3600)*3600 AS hr, event_type,
               max($ts) AS last_modified
             FROM events GROUP BY 1, 2),
           chunks AS (
             SELECT hr, max(last_modified) AS max_modified FROM state GROUP BY 1)
           SELECT hr, max_modified FROM chunks
           WHERE hr < 1705708800
             AND max_modified + 1800 <= 1705708800
             AND hr > 1705708800 - 7*86400
           ORDER BY hr""",
      // ordering is on SECOND-precision timestamps (the CSV round-trip's
      // resolution) + event_id tiebreak — mirror exactly, not nanos
      "q52_attr_ingest" ->
        s"""SELECT user_id AS entity_id, $ts AS ts_sec, event_id, event_type
           FROM events WHERE event_id % 4 = 0
           QUALIFY row_number() OVER (PARTITION BY user_id
             ORDER BY $ts DESC, event_id DESC) = 1
           ORDER BY entity_id""",
      "q53_trigger_payload" ->
        s"""SELECT user_id AS entity_id, $ts AS "timestamp",
             'user/1h/payload' AS rule, CAST(1 AS BIGINT) AS weight,
             'high value' AS details,
             '{"entity_id":' || CAST(user_id AS VARCHAR) || ',"event_type":"'
               || event_type || '"}' AS data
           FROM events WHERE event_type = 'error' AND value > 40
           ORDER BY 1, 2""",
      "q62_typed_notifications" ->
        s"""SELECT event_id AS entity_id, $ts AS "timestamp",
             'event/typed' AS rule,
             CAST(CASE WHEN value > 48 THEN 1000 ELSE 10 END AS INTEGER) AS weight,
             'typed ' || CAST(event_id AS VARCHAR) AS details,
             CAST(value AS SMALLINT) AS value_snap,
             CAST(NULL AS DOUBLE) AS score,
             CAST(12345 AS BIGINT) AS created
           FROM events WHERE event_type = 'error' AND value > 40
           ORDER BY 1, 2""",
      // The round-trip writes what it read: expected end state = events
      // projected to the stored columns, second-truncated timestamps,
      // job_id 1 (first job in a fresh store).
      // q296: DuckDB TIMESTAMP is itself naive — make_timestamp rebuilds
      // the wall-clock values the CSV carried, no timezone anywhere
      "q296_ntz_csv" ->
        """SELECT doc_id,
             make_timestamp(2024, 1 + doc_id % 9, 1 + doc_id % 28,
               doc_id % 24, (doc_id * 7) % 60, 0) AS seen_at,
             TRUE AS tz_invariant
           FROM documents ORDER BY doc_id""",
      "q46_csv_ingest" ->
        s"""SELECT user_id AS entity_id, $ts AS ts_sec, event_id, value,
             event_type, CAST(1 AS BIGINT) AS job_id
           FROM events WHERE event_id % 4 = 0 ORDER BY event_id""",
      // q320: the harvested history is the 20% event slice; curr-ptr =
      // latest (timestamp, event_id) per entity. uid mirrors the identifier
      // column — entity_id itself is the resolver hash, Spark-side only.
      "q320_attr_plugin" ->
        s"""SELECT user_id AS uid, $ts AS ts_sec, event_id, event_type
           FROM events WHERE event_id % 5 = 0
           QUALIFY row_number() OVER (PARTITION BY user_id
             ORDER BY $ts DESC, event_id DESC) = 1
           ORDER BY uid""",
      // q329: the tagged defs are (event_id, value_cents) by
      // construction; report = latest row per user projected to them
      "q329_attribute_tags" ->
        s"""SELECT user_id, event_id,
             CAST(floor(value * 100) AS BIGINT) AS value_cents
           FROM events
           QUALIFY row_number() OVER (PARTITION BY user_id
             ORDER BY $ts DESC, event_id DESC) = 1
           ORDER BY user_id""",
      // q324: post-retag state = dormant where balance < 0, else the
      // lowercased segment — one tag per entity by construction
      "q324_complementary_tags" ->
        """SELECT CASE WHEN c_acctbal < 0 THEN 'dormant'
               ELSE lower(c_mktsegment) END AS tag,
             count(*) AS n_entities,
             CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS bal_cents
           FROM customer GROUP BY 1 ORDER BY tag""",
      // q321: links = lower(segment) per customer ∪ vip(acctbal>9000),
      // machinery flushed; the scoped rollup keeps only BUILDING-tagged
      // customers' orders, aggregated to nation × epoch-day bucket.
      "q321_entity_tags" ->
        """SELECT CAST(c_nationkey AS BIGINT) AS nation_id,
             ((epoch_ns(o_orderdate)//1000000000)//86400)//1024 AS bucket,
             count(*) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE lower(c_mktsegment) = 'building'
           GROUP BY 1, 2 ORDER BY 1, 2""",
      "q48_array_ingest" ->
        s"""SELECT event_id AS entity_id, $ts AS ts_sec,
             CAST(2 AS INT) AS n_vals,
             CAST(user_id * 3 AS BIGINT) AS sum_vals,
             CAST(user_id AS VARCHAR) || ',' || CAST(user_id * 2 AS VARCHAR)
               AS vals_str
           FROM events ORDER BY entity_id""",
      // DuckDB regex (RE2) has no lookbehind, so the escape-aware split is
      // expressed portably: swap '\,' for a sentinel char, split on ',',
      // restore. Same results as the Java-regex lookbehind split.
      "q43_dn_roundtrip" ->
        """WITH src AS (
             SELECT c_custkey,
               'segment=' || replace(c_mktsegment || ',' || c_name, ',', '\,')
                 || ',customer=' || CAST(c_custkey AS VARCHAR) AS dn
             FROM customer),
           split AS (
             SELECT c_custkey, dn,
               str_split(replace(dn, '\,', chr(1)), ',') AS parts
             FROM src)
           SELECT dn,
             CAST(len(parts) AS INT) AS n_parts,
             regexp_extract(parts[len(parts)], '^([^=]+)=', 1) AS etype,
             CAST(replace(regexp_extract(parts[len(parts)], '^[^=]+=(.*)$', 1),
               chr(1), ',') AS BIGINT) AS ename,
             replace(regexp_extract(parts[1], '^[^=]+=(.*)$', 1), chr(1), ',')
               AS seg_name,
             CASE WHEN len(parts) > 1 THEN
               replace(array_to_string(parts[1:len(parts)-1], ','), chr(1), '\,')
             ELSE NULL END AS parent_dn
           FROM split ORDER BY ename""",
      "q44_alias_resolve" ->
        """WITH dim AS (
             SELECT 'V-' || CAST(s_suppkey AS VARCHAR) AS alias,
               CAST(s_suppkey AS BIGINT) AS entity_id
             FROM supplier),
           incoming AS (
             SELECT DISTINCT 'V-' || CAST(c_custkey AS VARCHAR) AS alias
             FROM customer)
           SELECT i.alias, d.entity_id
           FROM incoming i LEFT JOIN dim d ON i.alias = d.alias
           ORDER BY i.alias""",
      "q47_hash_id_audit" ->
        """WITH incoming AS (
             SELECT DISTINCT name FROM (
               SELECT s_name AS name FROM supplier
               UNION ALL SELECT p_brand FROM part))
           SELECT CAST(count(*) AS BIGINT) AS n_names,
             CAST(count(*) AS BIGINT) AS n_distinct_ids,
             CAST(0 AS BIGINT) AS n_negative
           FROM incoming""",
      "q24_dn_parse" ->
        """SELECT 'segment=' || lower(c_mktsegment) || ',customer=' || CAST(c_custkey AS VARCHAR) AS dn,
             regexp_extract('segment=' || lower(c_mktsegment) || ',customer=' || CAST(c_custkey AS VARCHAR),
               'segment=([a-z]+)', 1) AS seg,
             CAST(regexp_extract('segment=' || lower(c_mktsegment) || ',customer=' || CAST(c_custkey AS VARCHAR),
               'customer=([0-9]+)', 1) AS BIGINT) AS cust
           FROM customer ORDER BY cust""",
      // Independent implementation: DuckDB's native ASOF JOIN (>= right ts,
      // latest wins) checks the union+running-window formulation against a
      // genuinely different algorithm, not a mirror of it.
      "q122_asof_join" -> oracleSqlAsof,
      // TPC-H gates: the same decimal-exact money arithmetic — products
      // and sums in DECIMAL, averages as double division of exact sums.
      "q149_tpch_q1" ->
        """WITH base AS (
             SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                 AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) *
                 (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)
                 AS sum_charge,
               count(*) AS count_order
             FROM lineitem
             WHERE epoch_ns(l_shipdate)//1000000000 <= 950000000
             GROUP BY 1, 2)
           SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
             sum_disc_price, sum_charge, count_order,
             sum_qty / count_order AS avg_qty,
             sum_base_price / count_order AS avg_price
           FROM base ORDER BY 1, 2""",
      "q150_tpch_q3" ->
        """SELECT l_orderkey,
             epoch_ns(o_orderdate)//1000000000 AS order_sec, o_orderpriority,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
               AS revenue
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND epoch_ns(o_orderdate)//1000000000 < 850000000
             AND epoch_ns(l_shipdate)//1000000000 > 850000000
           GROUP BY 1, 2, 3
           ORDER BY revenue DESC, l_orderkey LIMIT 10""",
      "q151_tpch_q5" ->
        """SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
               AS revenue
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE epoch_ns(o_orderdate)//1000000000 >= 800000000
             AND epoch_ns(o_orderdate)//1000000000 < 900000000
           GROUP BY 1 ORDER BY revenue DESC, n_name""",
      "q153_tpch_q18" ->
        """WITH big AS (
             SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS order_qty
             FROM lineitem GROUP BY 1
             HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 180)
           SELECT c_name, c_custkey, o_orderkey,
             epoch_ns(o_orderdate)//1000000000 AS order_sec,
             o_totalprice, CAST(order_qty AS DOUBLE) AS total_qty
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN big ON o_orderkey = l_orderkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
      "q154_tpch_q10" ->
        """SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
               AS revenue
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           JOIN nation ON c_nationkey = n_nationkey
           WHERE epoch_ns(o_orderdate)//1000000000 >= 850000000
             AND epoch_ns(o_orderdate)//1000000000 < 950000000
             AND l_returnflag = 'R'
           GROUP BY 1, 2, 3, 4
           ORDER BY revenue DESC, c_custkey LIMIT 20""",
      "q155_tpch_q14" ->
        """WITH l AS (
             SELECT l_partkey,
               CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS disc
             FROM lineitem
             WHERE epoch_ns(l_shipdate)//1000000000 >= 850000000
               AND epoch_ns(l_shipdate)//1000000000 < 900000000),
           base AS (
             SELECT
               CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN disc
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
               CAST(sum(disc) AS DOUBLE) AS total_revenue
             FROM l JOIN part ON l_partkey = p_partkey)
           SELECT promo_revenue, total_revenue,
             100.0 * promo_revenue / total_revenue AS promo_pct
           FROM base""",
      "q162_tpch_q4" ->
        """SELECT o_orderpriority, count(*) AS order_count
           FROM orders o
           WHERE epoch_ns(o_orderdate)//1000000000 >= 850000000
             AND epoch_ns(o_orderdate)//1000000000 < 950000000
             AND EXISTS (
               SELECT 1 FROM lineitem l
               WHERE l.l_orderkey = o.o_orderkey
                 AND epoch_ns(l.l_shipdate)//1000000000 >
                   epoch_ns(o.o_orderdate)//1000000000)
           GROUP BY 1 ORDER BY 1""",
      "q163_tpch_q7" ->
        """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             epoch_ns(l_shipdate)//1000000000//31536000 AS ship_yr,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
               AS revenue
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
           WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
              OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
           GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
      "q164_tpch_q8" ->
        """WITH vols AS (
             SELECT epoch_ns(o_orderdate)//1000000000//31536000 AS order_yr,
               sn.n_name AS supp_nation,
               CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                 AS vol
             FROM lineitem
             JOIN part ON l_partkey = p_partkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation sn ON s_nationkey = sn.n_nationkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation cnat ON c_nationkey = cnat.n_nationkey
             JOIN region ON cnat.n_regionkey = r_regionkey
             WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'),
           base AS (
             SELECT order_yr,
               CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_volume,
               CAST(sum(vol) AS DOUBLE) AS total_volume
             FROM vols GROUP BY 1)
           SELECT order_yr, nation_volume, total_volume,
             nation_volume / total_volume AS mkt_share
           FROM base ORDER BY order_yr""",
      "q165_tpch_q9" ->
        """SELECT n_name AS nation,
             epoch_ns(l_shipdate)//1000000000//31536000 AS ship_yr,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
               AS sum_profit
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE EXISTS (
             SELECT 1 FROM part
             WHERE p_partkey = l_partkey AND p_name LIKE '%red%')
           GROUP BY 1, 2 ORDER BY nation, ship_yr DESC""",
      "q166_tpch_q13" ->
        """WITH per_cust AS (
             SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer
             LEFT JOIN orders ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
             GROUP BY 1)
           SELECT c_count, count(*) AS custdist
           FROM per_cust GROUP BY 1
           ORDER BY custdist DESC, c_count DESC""",
      "q167_tpch_q17" ->
        """WITH part_avg AS (
             SELECT l_partkey AS pk,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                 AS avg_qty
             FROM lineitem GROUP BY 1)
           SELECT
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
             count(*) AS n_items
           FROM lineitem
           JOIN part_avg ON l_partkey = pk
           WHERE l_quantity < 0.2 * avg_qty
             AND EXISTS (
               SELECT 1 FROM part
               WHERE p_partkey = l_partkey AND p_brand = 'Brand#11')""",
      "q168_tpch_q19" ->
        """SELECT
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
               AS revenue,
             count(*) AS n_items
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
              OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
              OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)""",
      "q169_tpch_q22" ->
        """WITH avg_bal AS (
             SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS avg_bal
             FROM customer WHERE c_acctbal > 0)
           SELECT c_nationkey, count(*) AS numcust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
           FROM customer CROSS JOIN avg_bal
           WHERE c_acctbal > avg_bal
             AND NOT EXISTS (
               SELECT 1 FROM orders WHERE o_custkey = c_custkey
                 AND o_orderpriority = '1-URGENT')
           GROUP BY 1 ORDER BY 1""",
      "q203_tpch_q2" ->
        """WITH euro AS (
             SELECT s_suppkey, s_name, s_acctbal, n_name
             FROM supplier JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'EUROPE'),
           parts AS (
             SELECT p_partkey, p_name FROM part
             WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'),
           cost AS (
             SELECT l_partkey, l_suppkey,
               min(CAST(l_extendedprice AS DECIMAL(12,2))) AS supply_cost
             FROM lineitem
             WHERE l_partkey IN (SELECT p_partkey FROM parts)
               AND l_suppkey IN (SELECT s_suppkey FROM euro)
             GROUP BY 1, 2),
           mc AS (
             SELECT l_partkey AS mpk, min(supply_cost) AS min_cost
             FROM cost GROUP BY 1)
           SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             CAST(supply_cost AS DOUBLE) AS supply_cost
           FROM cost JOIN mc ON l_partkey = mpk AND supply_cost = min_cost
           JOIN euro ON l_suppkey = s_suppkey
           JOIN parts ON l_partkey = p_partkey
           ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
      "q204_tpch_q11" ->
        """WITH v AS (
             SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
             FROM lineitem
             WHERE l_suppkey IN (
               SELECT s_suppkey FROM supplier
               JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name = 'NATION_3')
             GROUP BY 1),
           t AS (SELECT sum(value_dec) AS tot FROM v)
           SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
           FROM v CROSS JOIN t
           WHERE value_dec * 1000 > tot
           ORDER BY part_value DESC, l_partkey""",
      "q205_tpch_q12" ->
        """SELECT
             CASE WHEN epoch_ns(l_shipdate)//1000000000
                 - epoch_ns(o_orderdate)//1000000000 > 86400*60
               THEN 'late' ELSE 'ontime' END AS ship_class,
             count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
               THEN 1 END) AS high_line_count,
             count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
               THEN 1 END) AS low_line_count
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE epoch_ns(l_shipdate)//1000000000 >= 800000000
             AND epoch_ns(l_shipdate)//1000000000 < 950000000
           GROUP BY 1 ORDER BY 1""",
      "q206_tpch_q15" ->
        """WITH r AS (
             SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                 AS rev
             FROM lineitem
             WHERE epoch_ns(l_shipdate)//1000000000 >= 850000000
               AND epoch_ns(l_shipdate)//1000000000 < 900000000
             GROUP BY 1)
           SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
           FROM r JOIN supplier ON l_suppkey = s_suppkey
           WHERE rev = (SELECT max(rev) FROM r)
           ORDER BY s_suppkey""",
      "q207_tpch_q16" ->
        """SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
           FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pl
           JOIN part ON l_partkey = p_partkey
           WHERE p_brand <> 'Brand#11' AND p_type NOT LIKE 'PROMO%'
             AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
             AND l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
           GROUP BY 1, 2, 3
           ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
      "q208_tpch_q20" ->
        """WITH ps AS (
             SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS ps_qty
             FROM lineitem
             WHERE epoch_ns(l_shipdate)//1000000000 >= 850000000
               AND epoch_ns(l_shipdate)//1000000000 < 900000000
               AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             GROUP BY 1, 2),
           tot AS (SELECT l_partkey AS tpk, sum(ps_qty) AS part_qty FROM ps GROUP BY 1),
           q AS (
             SELECT DISTINCT l_suppkey FROM ps JOIN tot ON l_partkey = tpk
             WHERE ps_qty * 4 > part_qty)
           SELECT s_name, s_acctbal
           FROM supplier
           WHERE s_nationkey IN (
               SELECT n_nationkey FROM nation
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'EUROPE')
             AND s_suppkey IN (SELECT l_suppkey FROM q)
           ORDER BY s_name""",
      "q209_tpch_q21" ->
        """SELECT s_name, count(*) AS numwait
           FROM lineitem l1
           JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
           JOIN supplier ON l1.l_suppkey = s_suppkey
           WHERE EXISTS (SELECT 1 FROM lineitem l2
               WHERE l2.l_orderkey = l1.l_orderkey
                 AND l2.l_suppkey <> l1.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM lineitem l3
               WHERE l3.l_orderkey = l1.l_orderkey
                 AND l3.l_suppkey <> l1.l_suppkey
                 AND l3.l_shipdate > l1.l_shipdate)
           GROUP BY 1
           ORDER BY numwait DESC, s_name LIMIT 100""",
      // The oracle recomputes the JSON round-trip's expected end state
      // straight from events: ts seconds survive the format+parse cycle
      // exactly (second-truncated on write), cents are integer-exact.
      "q210_json_ingest" ->
        s"""WITH ev AS (
             SELECT user_id, $ts AS sec, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents, event_type
             FROM events WHERE event_id % 3 = 0)
           SELECT event_type, count(*) AS n_rows,
             count(DISTINCT user_id) AS n_entities,
             min(sec) AS min_ts, max(sec) AS max_ts,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(max(event_id) AS BIGINT) AS max_event_id
           FROM ev GROUP BY 1 ORDER BY 1""",
      // The identical HdrHistogram integer bucketization, replayed in SQL:
      // shift = max(floor(log2 v) - 5, 0); bucket = shift*32 + (v >> shift);
      // quantile = smallest bucket reaching ceil(q*n); bounds invert the
      // bucket to its exact [lo, hi] value range.
      "q211_hdr_quantiles" ->
        """WITH v AS (
             SELECT source, greatest(n_chars, 0) AS v FROM documents),
           b AS (
             SELECT source,
               greatest(length(bin(v)) - 1 - 5, 0) * 32
                 + (v >> greatest(length(bin(v)) - 1 - 5, 0)) AS bucket,
               count(*) AS cnt
             FROM v GROUP BY 1, 2),
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
      "q212_kcore" ->
        """WITH raw AS (
             SELECT user_id AS u, event_id % 97 AS v FROM events
             WHERE user_id <> event_id % 97),
           sym AS (
             SELECT DISTINCT u, v FROM (
               SELECT u, v FROM raw UNION ALL SELECT v, u FROM raw)),
           n0 AS (SELECT DISTINCT u AS node FROM sym),
           -- peel by complement (keep = deg >= k among survivors) so a
           -- node whose every neighbor peeled removes too
           k1 AS (SELECT u AS node FROM sym GROUP BY 1 HAVING count(*) >= 60),
           a1 AS (SELECT u, v FROM sym
                  WHERE u IN (SELECT node FROM k1)
                    AND v IN (SELECT node FROM k1)),
           k2 AS (SELECT u AS node FROM a1 GROUP BY 1 HAVING count(*) >= 60),
           a2 AS (SELECT u, v FROM a1
                  WHERE u IN (SELECT node FROM k2)
                    AND v IN (SELECT node FROM k2)),
           k3 AS (SELECT u AS node FROM a2 GROUP BY 1 HAVING count(*) >= 60),
           a3 AS (SELECT u, v FROM a2
                  WHERE u IN (SELECT node FROM k3)
                    AND v IN (SELECT node FROM k3)),
           k4 AS (SELECT u AS node FROM a3 GROUP BY 1 HAVING count(*) >= 60)
           SELECT n0.node,
             CASE WHEN n0.node NOT IN (SELECT node FROM k1) THEN CAST(1 AS BIGINT)
                  WHEN n0.node NOT IN (SELECT node FROM k2) THEN CAST(2 AS BIGINT)
                  WHEN n0.node NOT IN (SELECT node FROM k3) THEN CAST(3 AS BIGINT)
                  WHEN n0.node NOT IN (SELECT node FROM k4) THEN CAST(4 AS BIGINT)
             END AS peel_round
           FROM n0 ORDER BY node""",
      "q213_hits" ->
        """WITH raw AS (
             SELECT DISTINCT user_id AS u, event_id % 97 AS v FROM events),
           nodes AS (SELECT u AS node FROM raw UNION SELECT v FROM raw),
           a1r AS (SELECT v AS node, count(*) * 1000000 AS s
                   FROM raw GROUP BY 1),
           a1 AS (SELECT node, (s * 1000000) // (SELECT max(s) FROM a1r) AS s
                  FROM a1r),
           h1r AS (SELECT raw.u AS node, sum(a1.s) AS s
                   FROM raw JOIN a1 ON raw.v = a1.node GROUP BY 1),
           h1 AS (SELECT node, (s * 1000000) // (SELECT max(s) FROM h1r) AS s
                  FROM h1r),
           a2r AS (SELECT raw.v AS node, sum(h1.s) AS s
                   FROM raw JOIN h1 ON raw.u = h1.node GROUP BY 1),
           a2 AS (SELECT node, (s * 1000000) // (SELECT max(s) FROM a2r) AS s
                  FROM a2r),
           h2r AS (SELECT raw.u AS node, sum(a2.s) AS s
                   FROM raw JOIN a2 ON raw.v = a2.node GROUP BY 1),
           h2 AS (SELECT node, (s * 1000000) // (SELECT max(s) FROM h2r) AS s
                  FROM h2r)
           SELECT nodes.node,
             CAST(coalesce(h2.s, 0) AS BIGINT) AS hub,
             CAST(coalesce(a2.s, 0) AS BIGINT) AS auth
           FROM nodes
           LEFT JOIN h2 ON nodes.node = h2.node
           LEFT JOIN a2 ON nodes.node = a2.node
           ORDER BY nodes.node""",
      // Winsorized mean assembled from the same exact components:
      // mid-range integer sum + clamp counts × R-7 cutoffs, one double
      // expression evaluated in the same association order.
      "q215_winsorized" ->
        """WITH cuts AS (
             SELECT source,
               quantile_cont(n_chars, 0.1) AS p10,
               quantile_cont(n_chars, 0.9) AS p90
             FROM documents GROUP BY 1)
           SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             max(c.p10) AS p10, max(c.p90) AS p90,
             CAST(sum(CASE WHEN d.n_chars >= c.p10 AND d.n_chars <= c.p90
               THEN d.n_chars ELSE 0 END) AS BIGINT) AS sum_mid,
             count(CASE WHEN d.n_chars < c.p10 THEN 1 END) AS n_lo,
             count(CASE WHEN d.n_chars > c.p90 THEN 1 END) AS n_hi,
             (CAST(sum(CASE WHEN d.n_chars >= c.p10 AND d.n_chars <= c.p90
                 THEN d.n_chars ELSE 0 END) AS BIGINT)
               + count(CASE WHEN d.n_chars < c.p10 THEN 1 END) * max(c.p10)
               + count(CASE WHEN d.n_chars > c.p90 THEN 1 END) * max(c.p90))
               / count(*) AS winsorized_mean
           FROM documents d JOIN cuts c ON d.source = c.source
           GROUP BY 1 ORDER BY 1""",
      // The incremental store answers EXACTLY the full-corpus sketch
      // query — layout invariance makes the q211 oracle its oracle too.
      "q216_hdr_incremental" ->
        """WITH v AS (
             SELECT source, greatest(n_chars, 0) AS v FROM documents),
           b AS (
             SELECT source,
               greatest(length(bin(v)) - 1 - 5, 0) * 32
                 + (v >> greatest(length(bin(v)) - 1 - 5, 0)) AS bucket,
               count(*) AS cnt
             FROM v GROUP BY 1, 2),
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
      "q217_ewma" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, $ts AS ts_sec,
               CAST(floor(value * 100) AS BIGINT) AS cents
             FROM events)
           SELECT user_id, event_id, ts_sec, cents,
             coalesce(lag(cents, 0) OVER w, 0) * 128
               + coalesce(lag(cents, 1) OVER w, 0) * 64
               + coalesce(lag(cents, 2) OVER w, 0) * 32
               + coalesce(lag(cents, 3) OVER w, 0) * 16
               + coalesce(lag(cents, 4) OVER w, 0) * 8
               + coalesce(lag(cents, 5) OVER w, 0) * 4
               + coalesce(lag(cents, 6) OVER w, 0) * 2
               + coalesce(lag(cents, 7) OVER w, 0) AS ewma_scaled
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
           ORDER BY user_id, ts_sec, event_id""",
      "q219_record_linkage" ->
        """WITH crm AS (
             SELECT c_custkey + 5000000 AS acct_id,
               CASE WHEN c_custkey % 3 = 0
                 THEN replace(c_name, 'Customer', 'Custmer')
                 WHEN c_custkey % 3 = 1 THEN upper(c_name)
                 ELSE c_name END AS acct_name,
               CASE WHEN c_custkey % 17 = 0 THEN (c_nationkey + 1) % 25
                 ELSE c_nationkey END AS acct_nation,
               floor(c_acctbal) AS acct_bal,
               c_custkey % 100 AS acct_tail
             FROM customer
             UNION ALL
             SELECT s_suppkey + 6000000, s_name, s_nationkey,
               floor(s_acctbal), s_suppkey % 100
             FROM supplier),
           pairs AS (
             SELECT c.c_custkey, m.acct_id
             FROM customer c JOIN crm m
               ON CAST(c.c_nationkey AS VARCHAR) || '|'
                   || CAST(c.c_custkey % 100 AS VARCHAR)
                 = CAST(m.acct_nation AS VARCHAR) || '|'
                   || CAST(m.acct_tail AS VARCHAR)
             UNION
             SELECT c.c_custkey, m.acct_id
             FROM customer c JOIN crm m
               ON CAST(regexp_extract(c.c_name, '([0-9]+)', 1) AS BIGINT)
                 = CAST(regexp_extract(m.acct_name, '([0-9]+)', 1) AS BIGINT)),
           scored AS (
             SELECT p.c_custkey, p.acct_id,
               CAST(
                 CASE WHEN levenshtein(lower(c.c_name), lower(m.acct_name)) <= 2
                   THEN 8 ELSE 0 END
                 + CASE WHEN CAST(regexp_extract(c.c_name, '([0-9]+)', 1) AS BIGINT)
                     = CAST(regexp_extract(m.acct_name, '([0-9]+)', 1) AS BIGINT)
                   THEN 4 ELSE 0 END
                 + CASE WHEN c.c_acctbal - m.acct_bal >= 0
                     AND c.c_acctbal - m.acct_bal < 1
                   THEN 2 ELSE 0 END
                 + CASE WHEN c.c_nationkey = m.acct_nation
                   THEN 1 ELSE 0 END AS BIGINT) AS score
             FROM pairs p
             JOIN customer c USING (c_custkey) JOIN crm m USING (acct_id))
           SELECT c_custkey, acct_id, score FROM scored
           WHERE score >= 12 ORDER BY c_custkey, acct_id""",
      "q220_transitions" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, $ts AS sec, event_type FROM events),
           t AS (
             SELECT user_id, event_type,
               lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY sec, event_id) AS next_type
             FROM ev),
           cnt AS (
             SELECT event_type, next_type, count(*) AS n FROM t
             WHERE next_type IS NOT NULL GROUP BY 1, 2),
           tot AS (
             SELECT event_type AS ft, sum(n) AS row_total FROM cnt GROUP BY 1)
           SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE) / row_total AS p
           FROM cnt JOIN tot ON event_type = ft
           ORDER BY 1, 2""",
      "q221_cusum" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, $ts AS sec,
               CAST(floor(value * 100) AS BIGINT) AS cents
             FROM events),
           med AS (
             SELECT user_id,
               CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
             FROM ev GROUP BY 1),
           y AS (
             SELECT e.user_id, event_id, sec,
               2 * cents - med2 - 50 AS y
             FROM ev e JOIN med USING (user_id)),
           c AS (
             SELECT user_id, event_id, sec, sum(y) OVER w AS cum FROM y
             WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
               ROWS UNBOUNDED PRECEDING)),
           s AS (
             SELECT user_id, event_id, sec,
               cum - least(0, min(cum) OVER w) AS cusum FROM c
             WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
               ROWS UNBOUNDED PRECEDING))
           SELECT user_id, count(*) AS n_alarms,
             min(sec) AS first_alarm_sec,
             CAST(max(cusum) AS BIGINT) AS max_cusum
           FROM s WHERE cusum > 2000 GROUP BY 1 ORDER BY 1""",
      "q222_m4_downsample" ->
        s"""WITH ev AS (
             SELECT user_id, $ts AS sec, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               ($ts) // 3600 AS hour,
               ($ts) * 10000000 + event_id AS okey
             FROM events)
           SELECT user_id, hour, count(*) AS n_points,
             min(cents) AS min_c, max(cents) AS max_c,
             arg_min(cents, okey) AS first_c,
             arg_max(cents, okey) AS last_c
           FROM ev GROUP BY 1, 2 ORDER BY 1, 2""",
      "q223_k_anonymity" ->
        """SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             count(*) AS class_size,
             count(*) < 5 AS suppress
           FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
      "q224_locf_gapfill" ->
        s"""WITH ev AS (
             SELECT user_id, ($ts) // 21600 AS bkt,
               CAST(floor(value * 100) AS BIGINT) AS cents
             FROM events),
           obs AS (
             SELECT user_id, bkt, CAST(sum(cents) AS BIGINT) AS cents
             FROM ev GROUP BY 1, 2),
           grid AS (
             SELECT u.user_id, g.bkt
             FROM (SELECT DISTINCT user_id FROM ev) u
             CROSS JOIN (SELECT unnest(generate_series(78892, 79011)) AS bkt) g),
           j AS (
             SELECT g.user_id, g.bkt, o.cents FROM grid g
             LEFT JOIN obs o ON g.user_id = o.user_id AND g.bkt = o.bkt),
           f AS (
             SELECT user_id, bkt, cents,
               last_value(cents IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY bkt
                 ROWS UNBOUNDED PRECEDING) AS filled
             FROM j)
           SELECT user_id, bkt, cents, filled,
             (cents IS NULL AND filled IS NOT NULL) AS is_gap
           FROM f ORDER BY user_id, bkt""",
      // Quarantine reasons recomputed from the corruption rules; reason
      // order = schema column order (ts before value).
      "q225_quarantine" ->
        """SELECT reasons, count(*) AS n_rows FROM (
             SELECT CASE
               WHEN event_id % 13 = 0 AND event_id % 11 = 0 THEN 'ts,value'
               WHEN event_id % 13 = 0 THEN 'ts'
               WHEN event_id % 11 = 0 THEN 'value'
               ELSE '__clean__' END AS reasons
             FROM events) GROUP BY 1 ORDER BY 1""",
      "q227_time_weighted_avg" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, $ts AS sec,
               CAST(floor(value * 100) AS BIGINT) AS cents
             FROM events),
           iv AS (
             SELECT user_id, cents,
               lead(sec) OVER (PARTITION BY user_id
                 ORDER BY sec, event_id) - sec AS dur
             FROM ev),
           g AS (
             SELECT user_id,
               CAST(sum(cents * dur) AS BIGINT) AS weighted_sum,
               CAST(sum(dur) AS BIGINT) AS span_sec,
               count(*) AS n_intervals
             FROM iv WHERE dur IS NOT NULL GROUP BY 1)
           SELECT user_id, weighted_sum, span_sec, n_intervals,
             CAST(weighted_sum AS DOUBLE) / span_sec AS twa_cents
           FROM g WHERE span_sec > 0 ORDER BY user_id""",
      "q232_trend_slope" ->
        s"""WITH ev AS (
             SELECT user_id, ($ts) - 1704067200 AS x,
               CAST(floor(value * 100) AS BIGINT) AS y
             FROM events),
           g AS (
             SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
             FROM ev GROUP BY 1),
           d AS (
             SELECT user_id, CAST(n AS BIGINT) AS n,
               n * sxy - sx * sy AS num0,
               n * sxx - sx * sx AS denx0,
               n * syy - sy * sy AS deny0
             FROM g)
           SELECT user_id, n,
             CAST(num0 AS DOUBLE) AS num,
             CAST(denx0 AS DOUBLE) AS denx,
             CAST(deny0 AS DOUBLE) AS deny,
             CAST(num0 AS DOUBLE) / CAST(denx0 AS DOUBLE)
               AS slope_cents_per_sec,
             CAST(num0 AS DOUBLE) /
               (sqrt(CAST(denx0 AS DOUBLE)) * sqrt(CAST(deny0 AS DOUBLE)))
               AS pearson_r
           FROM d WHERE denx0 > 0 AND deny0 > 0 ORDER BY user_id""",
      "q233_funnel_latency" ->
        s"""WITH ev AS (
             SELECT user_id, event_type, $ts AS sec FROM events),
           fv AS (
             SELECT user_id, min(sec) AS v_ts FROM ev
             WHERE event_type = 'view' GROUP BY 1),
           fc AS (
             SELECT e.user_id, min(e.sec) AS c_ts, min(fv.v_ts) AS v_ts2
             FROM ev e JOIN fv USING (user_id)
             WHERE e.event_type = 'click' AND e.sec >= fv.v_ts GROUP BY 1),
           fp AS (
             SELECT e.user_id, min(e.sec) AS p_ts, min(fc.c_ts) AS c_ts2
             FROM ev e JOIN fc USING (user_id)
             WHERE e.event_type = 'purchase' AND e.sec >= fc.c_ts GROUP BY 1),
           delays AS (
             SELECT 'view_to_click' AS stage,
               greatest(c_ts - v_ts2, 0) AS v FROM fc
             UNION ALL
             SELECT 'click_to_purchase' AS stage,
               greatest(p_ts - c_ts2, 0) AS v FROM fp),
           b AS (
             SELECT stage,
               greatest(length(bin(v)) - 1 - 5, 0) * 32
                 + (v >> greatest(length(bin(v)) - 1 - 5, 0)) AS bucket,
               count(*) AS cnt
             FROM delays GROUP BY 1, 2),
           c AS (
             SELECT stage, bucket, cnt,
               sum(cnt) OVER (PARTITION BY stage ORDER BY bucket) AS cum,
               sum(cnt) OVER (PARTITION BY stage) AS total
             FROM b),
           q AS (
             SELECT stage, CAST(max(total) AS BIGINT) AS n,
               min(CASE WHEN cum >= ceil(0.5 * total) THEN bucket END) AS b50,
               min(CASE WHEN cum >= ceil(0.9 * total) THEN bucket END) AS b90
             FROM c GROUP BY 1)
           SELECT stage, n,
             (b50 - greatest(b50 // 32 - 1, 0) * 32)
               << greatest(b50 // 32 - 1, 0) AS p50_lo,
             ((b50 - greatest(b50 // 32 - 1, 0) * 32)
               << greatest(b50 // 32 - 1, 0))
               + (CAST(1 AS BIGINT) << greatest(b50 // 32 - 1, 0)) - 1 AS p50_hi,
             (b90 - greatest(b90 // 32 - 1, 0) * 32)
               << greatest(b90 // 32 - 1, 0) AS p90_lo,
             ((b90 - greatest(b90 // 32 - 1, 0) * 32)
               << greatest(b90 // 32 - 1, 0))
               + (CAST(1 AS BIGINT) << greatest(b90 // 32 - 1, 0)) - 1 AS p90_hi
           FROM q ORDER BY stage""",
      // The live-monitor chain as set algebra: round-1 trigger rows over
      // the round-1-only rollup; round-2 trigger rows over the FULL
      // rollup of exactly the hours round 2 touched (= the fingerprint-
      // stale set: a new modified-log entry changes an hour's
      // fingerprint iff the hour appears in the round-2 batch); final
      // store = round-2 rows ∪ surviving round-1 rows (PK last-wins).
      "q238_live_monitor" ->
        s"""WITH ev AS (
             SELECT user_id AS entity_id, $ts AS sec, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents
             FROM events),
           e2 AS (
             SELECT entity_id, sec, event_id, cents,
               sec - sec % 3600 AS hr,
               (sec >= 1705276800 OR event_id % 97 = 0) AS is2
             FROM ev),
           agg1 AS (
             SELECT entity_id, hr, CAST(count(*) AS INTEGER) AS samples,
               max(cents) AS max_cents
             FROM e2 WHERE NOT is2 GROUP BY 1, 2),
           stale2 AS (SELECT DISTINCT hr FROM e2 WHERE is2),
           agg2 AS (
             SELECT entity_id, hr, CAST(count(*) AS INTEGER) AS samples,
               max(cents) AS max_cents
             FROM e2 JOIN stale2 USING (hr) GROUP BY 1, 2),
           n1 AS (
             SELECT entity_id, hr AS "timestamp",
               'user/1h/highmax' AS rule,
               CAST(CASE WHEN max_cents > 4800 THEN 10
                 WHEN max_cents > 4650 THEN 5 ELSE 1 END AS INTEGER) AS weight,
               'HighMax: user ' || CAST(entity_id AS VARCHAR) ||
                 ' cents ' || CAST(max_cents AS VARCHAR) AS details,
               samples, CAST(1 AS BIGINT) AS created
             FROM agg1 WHERE max_cents > 4500),
           n2 AS (
             SELECT entity_id, hr AS "timestamp",
               'user/1h/highmax' AS rule,
               CAST(CASE WHEN max_cents > 4800 THEN 10
                 WHEN max_cents > 4650 THEN 5 ELSE 1 END AS INTEGER) AS weight,
               'HighMax: user ' || CAST(entity_id AS VARCHAR) ||
                 ' cents ' || CAST(max_cents AS VARCHAR) AS details,
               samples, CAST(2 AS BIGINT) AS created
             FROM agg2 WHERE max_cents > 4500)
           SELECT * FROM n2
           UNION ALL
           SELECT * FROM n1
           WHERE NOT EXISTS (
             SELECT 1 FROM n2
             WHERE n2.entity_id = n1.entity_id
               AND n2."timestamp" = n1."timestamp" AND n2.rule = n1.rule)
           ORDER BY entity_id, "timestamp"""",
      "q185_bucketed_join" ->
        """SELECT o_orderpriority, count(*) AS n_items,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
               AS revenue
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY 1 ORDER BY 1""",
      "q156_funnel" ->
        s"""WITH ev AS (
             SELECT user_id, event_type, $ts AS sec FROM events),
           v AS (
             SELECT user_id, min(sec) AS v_ts FROM ev
             WHERE event_type = 'view' GROUP BY 1),
           c AS (
             SELECT e.user_id, min(e.sec) AS c_ts
             FROM ev e JOIN v ON e.user_id = v.user_id
             WHERE e.event_type = 'click' AND e.sec >= v.v_ts GROUP BY 1),
           p AS (
             SELECT e.user_id, min(e.sec) AS p_ts
             FROM ev e JOIN c ON e.user_id = c.user_id
             WHERE e.event_type = 'purchase' AND e.sec >= c.c_ts GROUP BY 1)
           SELECT
             (SELECT count(DISTINCT user_id) FROM ev) AS n_users,
             (SELECT count(*) FROM v) AS n_viewed,
             (SELECT count(*) FROM c) AS n_clicked_after_view,
             (SELECT count(*) FROM p) AS n_purchased_after_click""",
      "q157_cohort_retention" ->
        s"""WITH ev AS (
             SELECT user_id, $ts//604800 AS week FROM events),
           cohort AS (
             SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
           act AS (SELECT DISTINCT user_id, week FROM ev)
           SELECT c.cohort_week, a.week - c.cohort_week AS weeks_since,
             count(DISTINCT a.user_id) AS n_active
           FROM act a JOIN cohort c USING (user_id)
           GROUP BY 1, 2 ORDER BY 1, 2""",
      "q152_tpch_q6" ->
        """SELECT
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             count(*) AS n_items
           FROM lineitem
           WHERE epoch_ns(l_shipdate)//1000000000 >= 800000000
             AND epoch_ns(l_shipdate)//1000000000 < 900000000
             AND CAST(l_discount AS DECIMAL(12,2))
               BETWEEN CAST(0.05 AS DECIMAL(12,2)) AND CAST(0.07 AS DECIMAL(12,2))
             AND l_quantity < 24""",
      // Forward direction: DuckDB ASOF with e.sec <= h.avail picks the
      // SMALLEST avail >= sec — the comparator IS the direction.
      "q145_asof_forward" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, $ts AS sec FROM events),
           hourly AS (
             SELECT user_id, (sec//3600)*3600 + 3600 AS avail_sec,
               count(*) AS hr_events
             FROM ev GROUP BY 1, 2),
           j AS (
             SELECT e.user_id, e.event_id, e.sec, h.avail_sec, h.hr_events
             FROM ev e ASOF LEFT JOIN hourly h
               ON e.user_id = h.user_id AND e.sec <= h.avail_sec)
           SELECT user_id, event_id, sec,
             CASE WHEN avail_sec IS NOT NULL AND avail_sec - sec <= 7200
               THEN avail_sec END AS asof_ts,
             CASE WHEN avail_sec IS NOT NULL AND avail_sec - sec <= 7200
               THEN hr_events END AS hr_events
           FROM j ORDER BY user_id, sec, event_id""",
      "q146_point_in_interval" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, event_type, $ts AS sec FROM events),
           incidents AS (
             SELECT event_id AS incident_id, sec - 300 AS i_lo, sec + 900 AS i_hi
             FROM ev WHERE event_type = 'error' AND event_id % 7 = 0)
           SELECT incident_id, count(*) AS n_events,
             min(e.sec) AS first_sec, max(e.sec) AS last_sec
           FROM ev e JOIN incidents i ON e.sec >= i.i_lo AND e.sec < i.i_hi
           GROUP BY 1 ORDER BY 1""",
      // q138 = q122's semantics through the native physical operator —
      // same oracle text, third implementation of the same join.
      "q138_asof_native" -> oracleSqlAsof,
      // Independent implementation: a plain inequality join (DuckDB IEJoin)
      // vs the grid-bucketed equi-join.
      "q123_range_join" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, event_type, $ts AS sec FROM events),
           gapped AS (
             SELECT user_id, event_id, sec,
               lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_sec
             FROM ev),
           marked AS (
             SELECT user_id, event_id, sec,
               CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END
                 AS new_session
             FROM gapped),
           sess0 AS (
             SELECT user_id, sec,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             FROM marked),
           sessions AS (
             SELECT user_id, session_id, min(sec) AS s_lo, max(sec) + 1800 AS s_hi
             FROM sess0 GROUP BY 1, 2),
           incidents AS (
             SELECT event_id AS incident_id, sec - 300 AS i_lo, sec + 900 AS i_hi
             FROM ev WHERE event_type = 'error' AND event_id % 7 = 0)
           SELECT incident_id, count(*) AS n_sessions,
             count(DISTINCT user_id) AS n_users
           FROM sessions s JOIN incidents i
             ON s.s_lo < i.i_hi AND i.i_lo < s.s_hi
           GROUP BY 1 ORDER BY 1""",
      "q124_rolling_stats" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, $ts AS ts_sec,
               CAST(floor(value*100) AS BIGINT) AS cents
             FROM events)
           SELECT user_id, event_id, ts_sec, cents,
             count(*) OVER w AS roll_n,
             CAST(sum(cents) OVER w AS BIGINT) AS roll_sum,
             min(cents) OVER w AS roll_min,
             max(cents) OVER w AS roll_max
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           ORDER BY user_id, ts_sec, event_id""",
      // sum(1)/sum(cents) FILTER → NULL when a metric has no rows for the
      // hour — matching Spark's pivot cell semantics (count(*) would give 0)
      "q240_pivot_wide" ->
        s"""SELECT user_id AS entity_id, ($ts//3600)*3600 AS hr,
             CAST(sum(1) FILTER (WHERE event_type = 'view') AS BIGINT) AS view_cnt,
             CAST(sum(CAST(floor(value*100) AS BIGINT))
               FILTER (WHERE event_type = 'view') AS BIGINT) AS view_cents,
             CAST(sum(1) FILTER (WHERE event_type = 'click') AS BIGINT) AS click_cnt,
             CAST(sum(CAST(floor(value*100) AS BIGINT))
               FILTER (WHERE event_type = 'click') AS BIGINT) AS click_cents,
             CAST(sum(1) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_cnt,
             CAST(sum(CAST(floor(value*100) AS BIGINT))
               FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_cents
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
      "q241_unpivot_long" ->
        s"""WITH wide AS (
             SELECT user_id AS entity_id, ($ts//3600)*3600 AS hr,
               CAST(sum(1) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view",
               CAST(sum(1) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
               CAST(sum(1) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase
             FROM events GROUP BY 1, 2)
           SELECT entity_id, hr, metric, cnt FROM (
             SELECT entity_id, hr, 'view' AS metric, "view" AS cnt FROM wide
             UNION ALL
             SELECT entity_id, hr, 'click' AS metric, click AS cnt FROM wide
             UNION ALL
             SELECT entity_id, hr, 'purchase' AS metric, purchase AS cnt FROM wide)
           WHERE cnt IS NOT NULL
           ORDER BY entity_id, hr, metric""",
      // within each (g_rf, g_ls) stratum a grouped-away key is constant
      // NULL, so the ORDER BY never compares NULL against a value — the
      // engines' opposite null-ordering defaults cannot diverge
      "q242_cube_report" ->
        """SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
           FROM lineitem
           GROUP BY CUBE (l_returnflag, l_linestatus)
           ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""",
      // the store holds exactly the ingested events (two disjoint halves
      // upserted by event_id), so the oracle is the plain filter — the
      // gate's value is that the SPARK side answers it from the
      // zone-pruned read (ZoneMapSpec asserts directories were skipped)
      "q245_zonemap_scan" ->
        s"""WITH m AS (SELECT max(event_id) AS mx FROM events),
           f AS (
             SELECT event_id, $ts AS sec, CAST(floor(value*100) AS BIGINT) AS cents
             FROM events, m
             WHERE event_id BETWEEN mx//4 AND mx//2)
           SELECT (sec//86400)*86400 AS day, count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             min(event_id) AS min_id, max(event_id) AS max_id
           FROM f GROUP BY 1 ORDER BY 1""",
      // q219's match replay + recursive label spread (the q113 reach
      // pattern) + rule-based survivorship per cluster
      "q247_golden_record" ->
        """WITH RECURSIVE crm AS (
             SELECT c_custkey + 5000000 AS acct_id,
               CASE WHEN c_custkey % 3 = 0
                 THEN replace(c_name, 'Customer', 'Custmer')
                 WHEN c_custkey % 3 = 1 THEN upper(c_name)
                 ELSE c_name END AS acct_name,
               CASE WHEN c_custkey % 17 = 0 THEN (c_nationkey + 1) % 25
                 ELSE c_nationkey END AS acct_nation,
               floor(c_acctbal) AS acct_bal,
               c_custkey % 100 AS acct_tail
             FROM customer
             UNION ALL
             SELECT s_suppkey + 6000000, s_name, s_nationkey,
               floor(s_acctbal), s_suppkey % 100
             FROM supplier),
           cand AS (
             SELECT c.c_custkey, m.acct_id
             FROM customer c JOIN crm m
               ON CAST(c.c_nationkey AS VARCHAR) || '|'
                   || CAST(c.c_custkey % 100 AS VARCHAR)
                 = CAST(m.acct_nation AS VARCHAR) || '|'
                   || CAST(m.acct_tail AS VARCHAR)
             UNION
             SELECT c.c_custkey, m.acct_id
             FROM customer c JOIN crm m
               ON CAST(regexp_extract(c.c_name, '([0-9]+)', 1) AS BIGINT)
                 = CAST(regexp_extract(m.acct_name, '([0-9]+)', 1) AS BIGINT)),
           matches AS (
             SELECT p.c_custkey AS id1, p.acct_id AS id2
             FROM cand p
             JOIN customer c USING (c_custkey) JOIN crm m USING (acct_id)
             WHERE CASE WHEN levenshtein(lower(c.c_name), lower(m.acct_name)) <= 2
                     THEN 8 ELSE 0 END
                 + CASE WHEN CAST(regexp_extract(c.c_name, '([0-9]+)', 1) AS BIGINT)
                     = CAST(regexp_extract(m.acct_name, '([0-9]+)', 1) AS BIGINT)
                   THEN 4 ELSE 0 END
                 + CASE WHEN c.c_acctbal - m.acct_bal >= 0
                     AND c.c_acctbal - m.acct_bal < 1
                   THEN 2 ELSE 0 END
                 + CASE WHEN c.c_nationkey = m.acct_nation
                   THEN 1 ELSE 0 END >= 12),
           members AS (
             SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
               CAST(c_nationkey AS BIGINT) AS nation,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents,
               CAST(0 AS BIGINT) AS priority
             FROM customer
             UNION ALL
             SELECT CAST(acct_id AS BIGINT), acct_name,
               CAST(acct_nation AS BIGINT),
               CAST(acct_bal * 100 AS BIGINT), CAST(1 AS BIGINT)
             FROM crm),
           edges AS (
             SELECT id1 AS src, id2 AS dst FROM matches
             UNION ALL SELECT id2, id1 FROM matches),
           reach AS (
             SELECT id, id AS label FROM members
             UNION
             SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
           comp AS (
             SELECT id, CAST(min(label) AS BIGINT) AS keeper
             FROM reach GROUP BY 1),
           best AS (
             SELECT c.keeper AS cluster_id, mb.name AS golden_name
             FROM comp c JOIN members mb USING (id)
             QUALIFY row_number() OVER (PARTITION BY c.keeper
               ORDER BY mb.priority, mb.id) = 1),
           agg AS (
             SELECT c.keeper AS cluster_id, count(*) AS n_members,
               CAST(sum(CASE WHEN mb.priority = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_masters,
               max(mb.bal_cents) AS max_bal_cents,
               CAST(count(DISTINCT mb.nation) AS BIGINT) AS n_nations
             FROM comp c JOIN members mb USING (id) GROUP BY 1)
           SELECT a.cluster_id, a.n_members, a.n_masters, b.golden_name,
             a.max_bal_cents, a.n_nations
           FROM agg a JOIN best b USING (cluster_id) ORDER BY a.cluster_id""",
      "q248_dq_audit" ->
        """WITH rowr AS (
             SELECT count(*) AS checked,
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS user_id_not_null,
               CAST(sum(CASE WHEN NOT (value >= 0.0 AND value < 990.0)
                 THEN 1 ELSE 0 END) AS BIGINT) AS value_in_range,
               CAST(sum(CASE WHEN event_type NOT IN
                   ('view', 'click', 'purchase', 'signup', 'error')
                 THEN 1 ELSE 0 END) AS BIGINT) AS known_event_type,
               CAST(sum(CASE WHEN props IS NULL OR props = ''
                 THEN 1 ELSE 0 END) AS BIGINT) AS props_present
             FROM events),
           uniq AS (
             SELECT CAST(sum(c - 1) AS BIGINT) AS violations,
               count(*) AS checked
             FROM (SELECT count(*) AS c FROM events GROUP BY event_id)),
           fk AS (
             SELECT CAST(sum(CASE WHEN cust.c_custkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS violations,
               count(*) AS checked
             FROM events e
             LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) cust
               ON e.user_id = cust.c_custkey
             WHERE e.user_id IS NOT NULL)
           SELECT rule, violations, checked FROM (
             SELECT 'user_id_not_null' AS rule, user_id_not_null AS violations,
               checked FROM rowr
             UNION ALL SELECT 'value_in_range', value_in_range, checked FROM rowr
             UNION ALL SELECT 'known_event_type', known_event_type, checked FROM rowr
             UNION ALL SELECT 'props_present', props_present, checked FROM rowr
             UNION ALL SELECT 'event_id_unique', violations, checked FROM uniq
             UNION ALL SELECT 'user_is_customer', violations, checked FROM fk)
           ORDER BY rule""",
      "q249_snapshot_diff" ->
        """WITH o AS (
             SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
             FROM orders),
           n AS (
             SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 31 = 0 THEN 'X'
                 ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN price_cents + 500
                 ELSE price_cents END AS price_cents
             FROM o WHERE o_orderkey % 97 <> 0
             UNION ALL
             SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, price_cents
             FROM o WHERE o_orderkey % 89 = 0),
           j AS (
             SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               o.o_orderkey IS NOT NULL AS in_old,
               n.o_orderkey IS NOT NULL AS in_new,
               CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                 THEN 'o_custkey' END AS c1,
               CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 THEN 'o_orderstatus' END AS c2,
               CASE WHEN o.price_cents IS DISTINCT FROM n.price_cents
                 THEN 'price_cents' END AS c3
             FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey),
           cls AS (
             SELECT o_orderkey,
               CASE WHEN NOT in_old THEN 'added'
                 WHEN NOT in_new THEN 'removed'
                 WHEN c1 IS NOT NULL OR c2 IS NOT NULL OR c3 IS NOT NULL
                   THEN 'changed'
                 ELSE 'unchanged' END AS change,
               CASE WHEN in_old AND in_new THEN concat_ws(',', c1, c2, c3)
                 ELSE '' END AS changed_cols
             FROM j)
           SELECT o_orderkey, change, changed_cols FROM cls
           WHERE change <> 'unchanged' ORDER BY o_orderkey""",
      "q250_attr_asof" ->
        """WITH compacted AS (
             SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM (
               SELECT user_id, event_id, event_type, ts,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events)
             WHERE prev IS NULL OR prev <> event_type),
           v AS (
             SELECT user_id, event_type, ts_us AS valid_from_us,
               lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS valid_to_us
             FROM compacted)
           SELECT user_id, event_type, valid_from_us FROM v
           WHERE valid_from_us <= 1705276800000000
             AND (valid_to_us IS NULL OR valid_to_us > 1705276800000000)
           ORDER BY user_id""",
      // session_window merges while the next event is STRICTLY inside
      // the previous window [t, t+gap), so a new session starts at
      // diff >= gap (vs q45's sec-precision "> 1800" convention)
      "q261_session_window" -> {
        val gapUs = 1800000000L
        s"""WITH ev AS (
             SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
           g AS (
             SELECT *, lag(us) OVER (
               PARTITION BY user_id ORDER BY us, event_id) AS prev
             FROM ev),
           m AS (
             SELECT *, CASE WHEN prev IS NULL OR us - prev >= $gapUs
               THEN 1 ELSE 0 END AS ns
             FROM g),
           s0 AS (
             SELECT *, CAST(sum(ns) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             FROM m)
           SELECT user_id, min(us) AS start_us,
             max(us) + $gapUs AS end_us, count(*) AS n_events
           FROM s0 GROUP BY user_id, sid ORDER BY user_id, start_us"""
      },
      "q262_zorder3_key" -> {
        val cols = Seq("user_id", "event_id",
          "CAST(floor(value*100) AS BIGINT)")
        val terms = (for (i <- 0 until 8; j <- cols.indices) yield
          s"((((${cols(j)} % 256 + 256) % 256) >> $i) % 2) * ${1L << (i * 3 + j)}")
          .mkString("\n             + ")
        s"""SELECT event_id, CAST($terms AS BIGINT) AS zkey
           FROM events ORDER BY event_id"""
      },
      "q263_benford_audit" ->
        """WITH c AS (
             SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                         AS BIGINT) AS cents
             FROM lineitem),
           d AS (
             SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
               AS digit
             FROM c WHERE cents IS NOT NULL AND cents > 0),
           g AS (SELECT digit, count(*) AS cnt FROM d GROUP BY 1),
           t AS (SELECT count(*) AS total FROM d)
           SELECT digit, cnt,
             (cnt * 10000) // total AS share_bp,
             CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249
               WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669
               WHEN 7 THEN 580 WHEN 8 THEN 512 ELSE 458 END AS expected_bp,
             (cnt * 10000) // total -
             CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249
               WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669
               WHEN 7 THEN 580 WHEN 8 THEN 512 ELSE 458 END AS dev_bp
           FROM g, t ORDER BY digit""",
      "q259_top_paths" ->
        s"""WITH ev AS (
             SELECT user_id, event_id, $ts AS sec, event_type FROM events),
           g AS (
             SELECT *, lag(sec) OVER (
               PARTITION BY user_id ORDER BY sec, event_id) AS prev
             FROM ev),
           m AS (
             SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800
               THEN 1 ELSE 0 END AS ns
             FROM g),
           s0 AS (
             SELECT *, CAST(sum(ns) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             FROM m),
           p AS (
             SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY sec, event_id) AS path
             FROM s0 GROUP BY 1, 2)
           SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
           ORDER BY n_sessions DESC, path LIMIT 20""",
      // incremental-DAG == one-shot recompute: the whole point of the
      // staleness chain, so the oracle is the plain full aggregate
      "q256_staleness_chain" ->
        s"""WITH e AS (
             SELECT user_id, ($ts//86400)*86400 AS day,
               CAST(floor(value*100) AS BIGINT) AS cents,
               CASE WHEN $ts >= 1705276800 OR event_id % 997 = 0
                 THEN 2 ELSE 1 END AS rnd
             FROM events),
           dayr AS (SELECT day, CAST(max(rnd) AS BIGINT) AS last_round
             FROM e GROUP BY 1),
           agg AS (
             SELECT user_id AS entity_id, day, count(*) AS samples,
               CAST(sum(cents) AS BIGINT) AS sum_cents
             FROM e GROUP BY 1, 2)
           SELECT a.entity_id, a.day, a.samples, a.sum_cents, d.last_round
           FROM agg a JOIN dayr d USING (day) ORDER BY 1, 2""",
      "q257_lag_features" ->
        s"""WITH e AS (
             SELECT user_id, event_id, $ts AS ts_sec,
               CAST(floor(value*100) AS BIGINT) AS cents
             FROM events)
           SELECT user_id, event_id, ts_sec, cents,
             count(*) OVER w1 AS cnt_1h,
             CAST(sum(cents) OVER w1 AS BIGINT) AS sum_1h,
             count(*) OVER w24 AS cnt_24h,
             CAST(sum(cents) OVER w24 AS BIGINT) AS sum_24h
           FROM e
           WINDOW w1 AS (PARTITION BY user_id ORDER BY ts_sec
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW),
             w24 AS (PARTITION BY user_id ORDER BY ts_sec
               RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
           ORDER BY user_id, ts_sec, event_id""",
      "q252_robust_outliers" ->
        """WITH e AS (
             SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents
             FROM events),
           med AS (
             SELECT user_id,
               CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
             FROM e GROUP BY 1),
           dev AS (
             SELECT e.user_id, abs(e.cents * 2 - m.med2) AS dev2, m.med2
             FROM e JOIN med m USING (user_id)),
           mad AS (
             SELECT user_id,
               CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
             FROM dev GROUP BY 1)
           SELECT d.user_id, count(*) AS n,
             CAST(min(d.med2) AS BIGINT) AS med2,
             CAST(min(m.mad4) AS BIGINT) AS mad4,
             CAST(sum(CASE WHEN d.dev2 * 2 > m.mad4 * 3 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
           FROM dev d JOIN mad m USING (user_id)
           GROUP BY 1 ORDER BY 1""",
      "q255_table_stats" ->
        s"""WITH e AS (
             SELECT event_id, $ts AS ts_sec, user_id, event_type, value, props
             FROM events)
           SELECT "column", n_values, n_nulls, ndv, min_num, max_num,
             min_str, max_str
           FROM (
             SELECT 'event_id' AS "column", count(event_id) AS n_values,
               CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT event_id) AS BIGINT) AS ndv,
               CAST(min(event_id) AS DOUBLE) AS min_num,
               CAST(max(event_id) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             FROM e
             UNION ALL
             SELECT 'ts_sec', count(ts_sec),
               CAST(sum(CASE WHEN ts_sec IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT ts_sec) AS BIGINT),
               CAST(min(ts_sec) AS DOUBLE), CAST(max(ts_sec) AS DOUBLE),
               NULL, NULL FROM e
             UNION ALL
             SELECT 'user_id', count(user_id),
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT user_id) AS BIGINT),
               CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE),
               NULL, NULL FROM e
             UNION ALL
             SELECT 'event_type', count(event_type),
               CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT event_type) AS BIGINT),
               NULL, NULL, min(event_type), max(event_type) FROM e
             UNION ALL
             SELECT 'value', count(value),
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT value) AS BIGINT),
               min(value), max(value), NULL, NULL FROM e
             UNION ALL
             SELECT 'props', count(props),
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT props) AS BIGINT),
               NULL, NULL, min(props), max(props) FROM e)
           ORDER BY "column""""
    )
  }
}
