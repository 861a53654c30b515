package graft.cli

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Catalog CRUD commands (reference entity_type.py / data_source.py /
  * alias.py / notification_store.py — create/delete/list registries). */
class CatalogCliSpec extends SparkSpec {
  import spark.implicits._

  private def run(args: String*): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { Main.run(args.toList) }
    out.toString.trim
  }

  /** Error paths throw CliExit instead of killing the JVM — assert the
    * exit code a shell user would see. */
  private def runExpectExit(code: Int)(args: String*): Unit = {
    val ex = intercept[Main.CliExit] {
      Console.withOut(new java.io.PrintStream(
        new java.io.ByteArrayOutputStream())) { Main.run(args.toList) }
    }
    assert(ex.code == code, s"expected exit $code, got ${ex.code}")
  }

  private val base = {
    val b = "target/tmp/catalog_cli"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(b), true)
    b
  }

  test("entity-type create/list/delete; empty created type reads as empty dim") {
    assert(run("entity-type", "create", base, "router").contains("\"created\":true"))
    assert(run("entity-type", "create", base, "router").contains("\"created\":false"))
    assert(run("entity-type", "list", base) == "[\"router\"]")
    // a created-but-empty type must read as an empty dimension, not crash
    val dir = new graft.storage.EntityDirectory(spark, s"$base/entity")
    assert(dir.read("router").count() == 0)
    // and insert-missing into it works
    assert(dir.insertMissing("router", Seq("r1").toDF("name")) == 1)
    assert(run("entity-type", "delete", base, "router").contains("\"deleted\":true"))
    assert(run("entity-type", "list", base) == "[]")
  }

  test("data-source and alias registries round-trip") {
    assert(run("data-source", "create", base, "hub").contains("\"created\":true"))
    assert(run("data-source", "list", base) == "[\"hub\"]")
    assert(run("alias", "create", base, "equipment").contains("\"created\":true"))
    assert(run("alias", "list", base) == "[\"equipment\"]")
    assert(run("data-source", "delete", base, "hub").contains("\"deleted\":true"))
    assert(run("data-source", "list", base) == "[]")
  }

  test("quick-start writes a complete bundle that initializes end to end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qs_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_qs_base_").toString
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("quick-start", dir, "--instance-name", "campus"))
    }
    assert(out.toString.contains("\"instance\":\"campus\""))
    // the skeleton parses as a full instance...
    val inst = graft.model.InstanceModel.loadInstance(dir)
    assert(inst.trendStores.nonEmpty && inst.attributeStores.nonEmpty &&
      inst.notificationStores.nonEmpty && inst.relations.nonEmpty &&
      inst.virtualEntities.nonEmpty && inst.triggers.nonEmpty)
    assert(inst.trendStores.head.parts.head.name == "campus_router_main_15m")
    // ...and bootstraps a POPULATED instance in one command
    Console.withOut(new java.io.PrintStream(new java.io.ByteArrayOutputStream())) {
      Main.main(Array("initialize", dir, base, "--load-sample-data"))
    }
    val part = spark.read.parquet(s"$base/trend/campus_router_main_15m")
    assert(part.count() == 3)
    assert(spark.read.parquet(s"$base/attribute/inventory_router/history")
      .count() == 3)
    // ...and one materialization cycle rolls the loaded 15m data up to 1h
    // — the full onboarding path: quick-start → initialize → materialize
    val matOut = run("materialize", s"$base/trend",
      "campus_router_main_15m", "campus_router_main_1h", "3600")
    assert(matOut.contains("\"materialized_partitions\":"), matOut)
    val rolled = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(s"$base/trend", 86400))
      .readPart("campus_router_main_1h").get
    assert(rolled.count() >= 1)
    assert(rolled.columns.contains("samples"))
    // conservation: the rollup preserves each counter's total
    val srcDf = spark.read.parquet(s"$base/trend/campus_router_main_15m")
    val counters = srcDf.columns.filterNot(Set("entity_id", "timestamp",
      "modified", "created", "pindex", "job_id")).toSeq
    counters.foreach { c =>
      val a = srcDf.agg(sum(col(c).cast("double"))).head.getDouble(0)
      val b = rolled.agg(sum(col(c).cast("double"))).head.getDouble(0)
      assert(a == b, s"rollup lost counter $c: $a vs $b")
    }
  }

  test("structure dump -> edit -> load round-trips; re-load is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_struct_").toString
    val sbase = java.nio.file.Files.createTempDirectory("graft_struct_base_").toString
    run("quick-start", dir, "--instance-name", "campus")
    // a materialization definition rides along to prove the non-store
    // kinds round-trip through the dump with full fidelity
    val matDir = java.nio.file.Paths.get(dir, "materialization")
    java.nio.file.Files.createDirectories(matDir)
    java.nio.file.Files.writeString(matDir.resolve("campus_router_main_1h.yaml"),
      """target_trend_store_part: campus_router_main_1h
        |enabled: true
        |processing_delay: 30m
        |stability_delay: 5m
        |reprocessing_period: 3 days
        |sources:
        |  - trend_store_part: campus_router_main_15m
        |    mapping_function: mapping_15m->1h
        |""".stripMargin)
    // dump the instance structure (both spellings emit the same document)
    val dumped = run("structure", "dump", dir)
    assert(dumped == run("structure", dir))
    assert(dumped.contains("\"campus_router_main_15m\""))
    // FULL-fidelity round-trip: parseStructure(dump) == loadInstance for
    // every kind (aggregations excepted — they compile into stores/mats)
    val inst = graft.model.InstanceModel.loadInstance(dir)
    val reparsed = graft.model.InstanceModel.parseStructure(dumped)
    assert(reparsed.trendStores == inst.trendStores)
    assert(reparsed.attributeStores.map(_.copy(title = None)) ==
      inst.attributeStores.map(_.copy(title = None)))
    assert(reparsed.notificationStores.map(_.copy(title = None)) ==
      inst.notificationStores.map(_.copy(title = None)))
    assert(reparsed.relations == inst.relations)
    assert(reparsed.virtualEntities == inst.virtualEntities)
    assert(reparsed.materializations == inst.materializations)
    assert(reparsed.triggers == inst.triggers)
    // a materialization edit in the dump survives the round-trip
    val matEdited = graft.model.InstanceModel.parseStructure(
      dumped.replace("\"processing_delay\":\"30m\"", "\"processing_delay\":\"45m\""))
    assert(matEdited.materializations.map(_.processingDelay) == Seq("45m"))
    // edit: a new trend column on the 15m part
    val trendJson = """{"name":"tx_mb","data_type":"double precision","description":"","time_aggregation":"sum","entity_aggregation":"sum"}"""
    assert(dumped.contains(trendJson), "fixture drifted: tx_mb trend JSON not found")
    val edited = dumped.replace(trendJson,
      trendJson + """,{"name":"errors","data_type":"bigint"}""")
    assert(edited != dumped, "edit did not apply — fixture drifted")
    val dumpFile = java.nio.file.Paths.get(dir, "structure.json")
    java.nio.file.Files.writeString(dumpFile, edited)
    // load onto an empty base: every part's sidecar is created with the
    // edited column present
    val loaded = run("structure", "load", dumpFile.toString, sbase)
    assert(loaded.contains("\"errors\""), loaded)
    val ps = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(s"$sbase/trend", 86400))
    val cols = ps.sidecarSchema("campus_router_main_15m").get.fieldNames.toSeq
    assert(cols.contains("errors") && cols.contains("rx_mb") &&
      cols.contains("tx_mb"), cols)
    // list (physical catalog) shows the loaded parts
    val listed = run("trend-store", "list", s"$sbase/trend")
    assert(listed.contains("campus_router_main_15m"), listed)
    // attribute + notification stores came along with their declarations
    assert(graft.storage.AttributeStore.create(
      spark, s"$sbase/attribute/inventory_router", Seq.empty) == false,
      "attribute store sidecar missing after load")
    assert(new java.io.File(s"$sbase/notification").list().nonEmpty)
    // idempotent re-load: nothing added/removed/changed the second time
    val again = run("structure", "load", dumpFile.toString, sbase)
    assert(!again.replaceAll("\"added\":\\[\\]", "").contains("\"added\""),
      s"re-load was not a no-op: $again")
    // and the loaded base dumps... via trend-store show round-trip: the
    // edited column is visible to the catalog commands
    val showOut = run("trend-store", "list", s"$sbase/trend")
    assert(showOut.contains("campus_router_main_15m"), showOut)
  }

  test("aggregation-generate writes and compiles the standard ladder") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gen_").toString
    val sink = new java.io.PrintStream(new java.io.ByteArrayOutputStream())
    Console.withOut(sink) {
      Main.main(Array("quick-start", dir))
      Main.main(Array("aggregation-generate", dir))
    }
    def names(sub: String) =
      new java.io.File(s"$dir/$sub").list().toSet
    // the 15m ladder: 1h, 1d (from raw) then 1w, 1month (chained off 1d),
    // plus entity aggregations onto v-region for raw AND each target
    val aggs = names("aggregation")
    assert(Set("net_router_1h.yaml", "net_router_1d.yaml",
      "net_router_1w.yaml", "net_router_1month.yaml").subsetOf(aggs), aggs)
    assert(aggs.contains("net_v-region_15m.yaml") &&
      aggs.contains("net_v-region_1h.yaml"), aggs)
    // compiled artifacts landed: target stores + per-part materializations
    val trends = names("trend")
    assert(trends.contains("net_router_1h.yaml") &&
      trends.contains("net_router_1month.yaml"), trends)
    assert(names("materialization").contains("net_router_main_1h.yaml"))
    // everything generated still loads as one consistent instance
    val inst = graft.model.InstanceModel.loadInstance(dir)
    assert(inst.trendStores.map(_.title).count(_.startsWith("net_router_")) == 4)
    // chained rung really sources the 1d aggregation, not the raw store
    val w = inst.aggregations.flatMap(_.timeAggregation)
      .find(_.name == "net_router_1w").get
    assert(w.source == "net_router_1d" &&
      w.parts.head.source == "net_router_main_1d")
  }

  test("trend-store check-config flags duplicate parts; deduce emits loadable YAML") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tscli_").toString
    val sink = new java.io.PrintStream(new java.io.ByteArrayOutputStream())
    Console.withOut(sink) { Main.main(Array("quick-start", dir)) }
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("trend-store", "check-config", dir))
    }
    assert(out.toString.contains("\"errors\":0"), out.toString)
    // list-config shows the instance-declared stores (vs physical `list`)
    val cfg = run("trend-store", "list-config", dir)
    assert(cfg.contains("\"title\":\"Raw router counters\""), cfg)

    // deduce: CSV → trend-store YAML that parseTrendStore round-trips
    val csv = java.nio.file.Files.createTempDirectory("graft_dedcli_")
      .resolve("data.csv")
    java.nio.file.Files.writeString(csv,
      "node,ts,rx,label\nn1,2020-08-25 14:00:00,1.5,edge\n" +
        "n2,2020-08-25 14:00:00,40000,core\n")
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out2)) {
      Main.main(Array("trend-store", "deduce", csv.toString, "node", "ts",
        "net", "router", "15m"))
    }
    val ts = graft.model.InstanceModel.parseTrendStore(out2.toString)
    assert(ts.dataSource == "net" && ts.granularity.name == "15m")
    assert(ts.parts.head.name == "net_router_15m")
    val types = ts.parts.head.trends.map(t => t.name -> t.dataType.name).toMap
    assert(types("rx") == "real" && types("label") == "text", types)
  }

  test("aggregation hints override entity-aggregation type and prefix") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hints_").toString
    val sink = new java.io.PrintStream(new java.io.ByteArrayOutputStream())
    Console.withOut(sink) { Main.main(Array("quick-start", dir)) }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "aggregation"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "aggregation", "aggregation_hints.yaml"),
      "router->v-region: view_materialization+sum\n")
    Console.withOut(sink) { Main.main(Array("aggregation-generate", dir)) }
    val inst = graft.model.InstanceModel.loadInstance(dir)
    val ea = inst.aggregations.flatMap(_.entityAggregation)
      .find(_.name == "net_sum_v-region_15m")
      .getOrElse(fail(s"prefixed aggregation missing: ${
        inst.aggregations.flatMap(_.entityAggregation).map(_.name)}"))
    assert(ea.aggregationType == "VIEW_MATERIALIZATION")
    assert(ea.parts.head.name == "net_v-region_sum_main_15m")
  }

  test("expire CLI drops partitions before the cutoff") {
    import spark.implicits._
    val sb = s"$base/expire_store"
    val ps = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(sb, 86400))
    ps.store("p", Seq((1L, 1000L, 1.0, 1L), (1L, 90000L, 2.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    assert(run("expire", sb, "p", "86400").contains("\"expired_before\":86400"))
    assert(ps.readPart("p").get.select("power").head.getDouble(0) == 2.0)
  }

  test("trend-store change migrates a populated store from an edited definition; show reports both sides") {
    import graft.core.MinervaType._
    import graft.model.{Trend, TrendStore, TrendStorePart}
    val sb = s"$base/migr_store"
    val ps = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(sb, 86400))
    ps.store("net_node_15m", Seq((1L, 1000L, 10, 100L), (2L, 90000L, 20, 100L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    // the operator edits the YAML: power widens to bigint, temp appears
    val edited = TrendStore(
      title = "net_node", dataSource = "net", entityType = "node",
      granularity = graft.core.Granularity.parse("15m"),
      partitionSize = graft.core.Granularity.parse("1d"),
      parts = Seq(TrendStorePart("net_node_15m",
        Seq(Trend("power", MBigInt), Trend("temp", MDouble)))))
    val yaml = java.nio.file.Files.createTempFile("net_node", ".yaml")
    java.nio.file.Files.writeString(yaml,
      graft.model.InstanceModel.renderTrendStore(edited))
    val out = run("trend-store", "change", sb, yaml.toString)
    assert(out.contains("added [temp]"), out)
    assert(out.contains("changed [power]"), out)
    val back = ps.readPart("net_node_15m").get
    assert(back.schema("power").dataType.simpleString == "bigint")
    assert(back.schema("temp").dataType.simpleString == "double")
    assert(back.count() == 2)
    // idempotent: a second run reports nothing to do
    assert(run("trend-store", "change", sb, yaml.toString)
      .contains("no changes were made"))
    // show: declared config next to the stored sidecar
    val shown = run("trend-store", "show", sb, yaml.toString)
    assert(shown.contains("\"stored\":true"), shown)
    assert(shown.contains(
      "{\"name\":\"power\",\"data_type\":\"bigint\",\"time_aggregation\":\"sum\""), shown)
    assert(shown.contains("{\"name\":\"power\",\"type\":\"bigint\"}"), shown)
    // narrowing without --force fails loudly, with --force applies
    val narrowed = edited.copy(parts = Seq(TrendStorePart("net_node_15m",
      Seq(Trend("power", MSmallInt), Trend("temp", MDouble)))))
    java.nio.file.Files.writeString(yaml,
      graft.model.InstanceModel.renderTrendStore(narrowed))
    intercept[graft.storage.TrendMigration.NonUpwardChange] {
      run("trend-store", "alter-trends", sb, yaml.toString)
    }
    assert(run("trend-store", "alter-trends", "--force", sb, yaml.toString)
      .contains("Changed columns: power"))
    assert(ps.readPart("net_node_15m").get
      .schema("power").dataType.simpleString == "smallint")
  }

  test("trigger registry gates run-all by enabled; relation CLI rematerializes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trigcli_").toString
    val b = java.nio.file.Files.createTempDirectory("graft_trigcli_base_").toString
    val sink = new java.io.PrintStream(new java.io.ByteArrayOutputStream())
    Console.withOut(sink) {
      Main.main(Array("quick-start", dir, "--instance-name", "campus"))
      Main.main(Array("initialize", dir, b, "--load-sample-data"))
    }
    // install the bundle's trigger into the live registry
    val trigYaml = s"$dir/trigger/router-15m-rxhigh.yaml"
    assert(run("trigger", "create", b, trigYaml).contains("\"created\":true"))
    val listed = run("trigger", "list", b)
    assert(listed.contains("\"name\":\"router/15m/rxhigh\",\"enabled\":true"), listed)
    // run-all executes the enabled trigger against the loaded part
    val outDir = java.nio.file.Files.createTempDirectory("graft_trig_out_").toString
    val ran = run("trigger", "run-all", b, "campus_router_main_15m", outDir)
    assert(ran.contains("\"router/15m/rxhigh\":"), ran)
    // disabled trigger drops out of run-all (the reference's enabled gate)
    assert(run("trigger", "disable", b, "router/15m/rxhigh")
      .contains("\"enabled\":false"))
    assert(run("trigger", "run-all", b, "campus_router_main_15m", outDir) == "{}")
    // explicit execute still runs a disabled trigger (reference
    // execute-trigger semantics)
    assert(run("trigger", "execute", b, "router/15m/rxhigh",
      "campus_router_main_15m", outDir).contains("\"rule\":\"router/15m/rxhigh\""))
    assert(run("trigger", "delete", b, "router/15m/rxhigh")
      .contains("\"deleted\":true"))
    assert(run("trigger", "list", b) == "[]")
    // relation group: rematerialize from the instance + list edge sets
    val rel = run("relation", "materialize", dir, b)
    assert(rel.contains("\"router->v-region\":"), rel)
    assert(run("relation", "list", b).contains("\"router->v-region\""))
    // virtual-entity rematerialization is idempotent (insert-missing)
    val ve = run("virtual-entity", "materialize", dir, b)
    assert(ve.contains("\"v-region\":"), ve)
    // relation remove drops BOTH the instance YAML and the edge set;
    // create reinstalls from a definition file
    // the bundle file is named freely; remove matches by PARSED name
    val relYaml = java.nio.file.Paths.get(dir, "relation",
      "router-to-v-region.yaml")
    val relText = java.nio.file.Files.readString(relYaml)
    assert(run("relation", "remove", dir, b, "router->v-region")
      .contains("\"removed\":true,\"dropped_edges\":true"))
    assert(run("relation", "list", b) == "[]")
    assert(!java.nio.file.Files.exists(relYaml))
    val tmp = java.nio.file.Files.createTempFile("rel", ".yaml")
    java.nio.file.Files.writeString(tmp, relText)
    assert(run("relation", "create", dir, tmp.toString)
      .contains("\"created\":true"))
    assert(run("relation", "materialize", dir, b)
      .contains("\"router->v-region\":"))
    // standalone load-sample-data re-loads the named set into the base
    val lsd = run("load-sample-data", dir, b, "routers")
    assert(lsd.contains("\"loaded_partitions\":"), lsd)
  }

  test("trigger update-* patches one aspect in place, preserving enabled state") {
    val b = java.nio.file.Files.createTempDirectory("graft_trigupd_").toString
    // a part with known KPI rows: entity 1 fires (power 55 > 10), 2 doesn't
    val ps = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(s"$b/trend", 86400))
    ps.store("node_main_15m", Seq((1L, 900L, 55.0, 1L), (2L, 900L, 5.0, 1L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    def trigYaml(weightSql: String, dataLine: String = "") =
      s"""name: node/15m/power
         |kpi_data:
         |  - name: power
         |    data_type: numeric
         |thresholds:
         |  - name: max_power
         |    data_type: numeric
         |    value: 10
         |condition: |-
         |  power > max_power
         |weight: |-
         |  $weightSql
         |notification: |-
         |  SELECT format('p=%s', $$1.power)
         |$dataLine
         |notification_store: alerts
         |granularity: 15m
         |trend_store_links:
         |  - part_name: node_main_15m
         |    mapping_function: mapping_id
         |""".stripMargin.replace("\n\n", "\n")
    val yaml = java.nio.file.Files.createTempFile("trig_upd", ".yaml")
    java.nio.file.Files.writeString(yaml, trigYaml("1"))
    assert(run("trigger", "create", b, yaml.toString).contains("\"created\":true"))
    // disable first: update-* must PRESERVE enabled-state, not reset it
    assert(run("trigger", "disable", b, "node/15m/power")
      .contains("\"enabled\":false"))
    // operator edits the weight in the definition and pushes just that
    java.nio.file.Files.writeString(yaml,
      trigYaml("SELECT CASE WHEN $1.power > 20 THEN 777 ELSE 111 END"))
    val upd = run("trigger", "update-weight", b, yaml.toString)
    assert(upd.contains("\"updated\":\"weight\""), upd)
    assert(upd.contains("\"enabled\":false"), upd) // sidecar survived
    // execute (explicit execute runs even a disabled trigger) → new weight
    val outDir = java.nio.file.Files.createTempDirectory("graft_trigupd_out_")
      .toString
    run("trigger", "execute", b, "node/15m/power", "node_main_15m", outDir)
    val notes = spark.read.parquet(outDir)
    assert(notes.count() == 1)
    assert(notes.select("weight").head.getLong(0) == 777L)
    assert(notes.select("data").head.getString(0) == "{}") // no data fn yet
    // update-data-function patches ONLY the payload; the weight stays 777
    java.nio.file.Files.writeString(yaml, trigYaml("1",
      "data: |-\n  SELECT format('{\"power\": %s}', $1.power)"))
    assert(run("trigger", "update-data-function", b, yaml.toString)
      .contains("\"updated\":\"data-function\""))
    val outDir2 = java.nio.file.Files.createTempDirectory("graft_trigupd_out2_")
      .toString
    run("trigger", "execute", b, "node/15m/power", "node_main_15m", outDir2)
    val notes2 = spark.read.parquet(outDir2)
    assert(notes2.select("weight").head.getLong(0) == 777L) // NOT the yaml's 1
    assert(notes2.select("data").head.getString(0) == "{\"power\": 55.0}")
    // update-kpi-function patches the KPI surface (kpi_data / links /
    // granularity); the installed YAML round-trips through the parser
    assert(run("trigger", "update-kpi-function", b, yaml.toString)
      .contains("\"updated\":\"kpi-function\""))
    val installed = graft.model.InstanceModel.parseTrigger(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        b, "trigger", "node_15m_power.yaml")))
    assert(installed.kpiData.map(_.name) == Seq("power"))
    assert(installed.weight.contains("777")) // kpi update left weight alone
  }

  test("trend-store create/add-parts/delete/list standalone verbs") {
    import graft.core.MinervaType._
    import graft.model.{Trend, TrendStore, TrendStorePart}
    val sb = s"$base/verbs_store"
    val ps = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(sb, 86400))
    def defYaml(parts: TrendStorePart*) = {
      val ts = TrendStore(
        title = "net_node", dataSource = "net", entityType = "node",
        granularity = graft.core.Granularity.parse("15m"),
        partitionSize = graft.core.Granularity.parse("1d"),
        parts = parts)
      val p = java.nio.file.Files.createTempFile("verbs", ".yaml")
      java.nio.file.Files.writeString(p,
        graft.model.InstanceModel.renderTrendStore(ts))
      p.toString
    }
    val mainPart = TrendStorePart("net_node_main_15m",
      Seq(Trend("power", MBigInt)))
    val y1 = defYaml(mainPart)
    // create registers a fresh sidecar per part (no data yet)
    assert(run("trend-store", "create", sb, y1)
      .contains("\"created\":[\"net_node_main_15m\"]"))
    assert(ps.sidecarSchema("net_node_main_15m").exists(
      _.fieldNames.contains("power")))
    assert(run("trend-store", "list", sb)
      .contains("\"name\":\"net_node_main_15m\""))
    // add-parts creates only the MISSING part, leaving the live one alone
    val y2 = defYaml(mainPart, TrendStorePart("net_node_aux_15m",
      Seq(Trend("temp", MDouble))))
    assert(run("trend-store", "add-parts", sb, y2)
      .contains("\"added\":[\"net_node_aux_15m\"]"))
    // a created part accepts loads immediately (sidecar types the merge)
    ps.store("net_node_main_15m", Seq((1L, 1000L, 7L, 1L))
      .toDF("entity_id", "timestamp", "power", "modified"))
    assert(ps.readPart("net_node_main_15m").get.count() == 1)
    // delete drops sidecars AND partition data for every part
    assert(run("trend-store", "delete", sb, y2)
      .contains("\"net_node_main_15m\"")) // both parts reported
    assert(ps.sidecarSchema("net_node_main_15m").isEmpty)
    assert(ps.readPart("net_node_main_15m").isEmpty)
    assert(run("trend-store", "list", sb) == "[]")
  }

  test("trend-materialization registry, aggregation compile-all, filtered generate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tm_").toString
    val sink = new java.io.PrintStream(new java.io.ByteArrayOutputStream())
    Console.withOut(sink) { Main.main(Array("quick-start", dir)) }
    // filtered generate: only the named raw store (by title)
    assert(run("aggregation-generate", dir, "Raw router counters")
      .contains("\"raw_stores\":1"))
    // compile-all recompiles every generated aggregation definition
    val all = run("aggregation-compile-all", dir)
    assert(all.contains("\"compiled_definitions\":"), all)
    assert(all.contains("\"compiled\":\"net_router_1h\""), all)
    // the registry lists the generated materializations
    val listed = run("trend-materialization", "list", dir)
    assert(listed.contains("\"name\":\"net_router_main_1h\""), listed)
    // drop removes exactly one; a second drop reports no match
    assert(run("trend-materialization", "drop", dir, "net_router_main_1h")
      .contains("\"dropped\":true"))
    assert(!run("trend-materialization", "list", dir)
      .contains("net_router_main_1h"))
    assert(run("trend-materialization", "drop", dir, "net_router_main_1h")
      .contains("\"dropped\":false"))
    // create installs a definition verbatim; update replaces it in place
    val yaml = java.nio.file.Files.createTempFile("mat", ".yaml")
    def matYaml(enabled: Boolean) =
      s"""target_trend_store_part: net_router_main_1h
         |enabled: $enabled
         |processing_delay: 30m
         |stability_delay: 5m
         |reprocessing_period: 3 days
         |sources:
         |- trend_store_part: net_router_main_15m
         |  mapping_function: trend.mapping_id
         |""".stripMargin
    java.nio.file.Files.writeString(yaml, matYaml(enabled = true))
    assert(run("trend-materialization", "create", dir, yaml.toString)
      .contains("\"created\":true"))
    java.nio.file.Files.writeString(yaml, matYaml(enabled = false))
    assert(run("trend-materialization", "update", dir, yaml.toString)
      .contains("\"updated\":true"))
    val back = graft.model.InstanceModel.parseMaterialization(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        dir, "materialization", "net_router_main_1h.yaml")))
    assert(!back.enabled)
  }

  test("CLI error paths exit nonzero without side effects") {
    // unknown command → usage, exit 2
    runExpectExit(2)("no-such-command")
    runExpectExit(2)("entity-type", "create", base) // missing name
    // bare `structure dump` (no dir) → usage, not NoSuchElementException
    runExpectExit(2)("structure", "dump")
    // duplicate trend-store create refused (DuplicateTrendStore), exit 1
    import graft.core.MinervaType._
    import graft.model.{Trend, TrendStore, TrendStorePart}
    val sb = s"$base/errpaths_store"
    val ts = TrendStore(
      title = "net_node", dataSource = "net", entityType = "node",
      granularity = graft.core.Granularity.parse("15m"),
      partitionSize = graft.core.Granularity.parse("1d"),
      parts = Seq(TrendStorePart("err_part", Seq(Trend("power", MBigInt)))))
    val yaml = java.nio.file.Files.createTempFile("errpaths", ".yaml")
    java.nio.file.Files.writeString(yaml,
      graft.model.InstanceModel.renderTrendStore(ts))
    assert(run("trend-store", "create", sb, yaml.toString)
      .contains("\"created\""))
    runExpectExit(1)("trend-store", "create", sb, yaml.toString)
    // update-* on an uninstalled trigger → exit 1
    val trigDir = java.nio.file.Files.createTempDirectory("graft_errtrig_")
    val trigYaml = trigDir.resolve("t.yaml")
    java.nio.file.Files.writeString(trigYaml,
      "name: ghost\ncondition: 1 = 1\nweight: '1'\nnotification: n\n")
    runExpectExit(1)(
      "trigger", "update-weight", trigDir.toString, trigYaml.toString)
    // duplicate trend-materialization create → exit 1, file unchanged
    val inst = java.nio.file.Files.createTempDirectory("graft_errmat_")
    val mat = inst.resolve("def.yaml")
    java.nio.file.Files.writeString(mat,
      """target_trend_store_part: p1
        |enabled: true
        |processing_delay: 30m
        |stability_delay: 5m
        |reprocessing_period: 3 days
        |sources:
        |- trend_store_part: p0
        |  mapping_function: trend.mapping_id
        |""".stripMargin)
    assert(run("trend-materialization", "create", inst.toString, mat.toString)
      .contains("\"created\":true"))
    runExpectExit(1)(
      "trend-materialization", "create", inst.toString, mat.toString)
    // drop of a missing materialization is NOT an error (reference prints
    // "No materialization matched")
    assert(run("trend-materialization", "drop", inst.toString, "nope")
      .contains("\"dropped\":false"))
  }

  test("notification-store delete drops declaration and rows") {
    val yaml = java.nio.file.Files.createTempFile("alerts_del", ".yaml")
    java.nio.file.Files.writeString(yaml,
      """data_source: ops
        |entity_type: notification
        |attributes:
        |  - name: weight
        |    data_type: integer
        |""".stripMargin)
    val stem = yaml.getFileName.toString.stripSuffix(".yaml")
    run("notification-store", "create", base, yaml.toString)
    val ns = new graft.storage.NotificationStore(spark, s"$base/notification/$stem")
    ns.store(Seq((1L, 100L, "r", 7L, "d"))
      .toDF("entity_id", "timestamp", "rule", "weight", "details"), nowSec = 1L)
    assert(run("notification-store", "delete", base, stem)
      .contains("\"deleted\":true"))
    assert(new graft.storage.NotificationStore(
      spark, s"$base/notification/$stem").read().isEmpty)
    assert(run("notification-store", "delete", base, stem)
      .contains("\"deleted\":false"))
  }

  test("attribute-store create -> load -> compact -> curr-ptr round-trip") {
    val yaml = java.nio.file.Files.createTempFile("inventory", ".yaml")
    java.nio.file.Files.writeString(yaml,
      """data_source: inventory
        |entity_type: switch
        |attributes:
        |  - name: model
        |    data_type: text
        |  - name: ports
        |    data_type: integer
        |""".stripMargin)
    assert(run("attribute-store", "create", base, yaml.toString)
      .contains("\"attribute_store\":\"inventory_switch\",\"created\":true"))
    assert(run("attribute-store", "list", base)
      .contains("\"inventory_switch\""))
    // empty created store shows the DECLARED columns
    val shownEmpty = run("attribute-store", "show", base, "inventory_switch")
    assert(shownEmpty.contains("{\"name\":\"ports\",\"type\":\"int\"}"), shownEmpty)
    assert(shownEmpty.contains("\"history_rows\":0"), shownEmpty)
    // load two batches: entity 1 changes model, entity 2 stays put
    val st = new graft.storage.AttributeStore(spark, s"$base/attribute/inventory_switch")
    st.transferStaged(Seq((1L, 100L, "m1", 24), (2L, 100L, "m2", 48))
      .toDF("entity_id", "timestamp", "model", "ports"), nowSec = 100L)
    st.transferStaged(Seq((1L, 200L, "m9", 24), (2L, 200L, "m2", 48))
      .toDF("entity_id", "timestamp", "model", "ports"), nowSec = 200L)
    // compact: entity 2's unchanged run collapses, entity 1 keeps both
    assert(run("attribute-store", "compact", base, "inventory_switch")
      .contains("\"compacted_rows\":3"))
    // curr-ptr across ALL stores under the base (no name argument)
    val out = run("attribute-store", "materialize-curr-ptr", base)
    assert(out.contains("\"inventory_switch\":2"), out)
    val cur = st.currentSnapshot.get
    assert(cur.filter(col("entity_id") === 1).select("model").head.getString(0) == "m9")
    // incremental refresh after one more batch
    st.transferStaged(Seq((3L, 300L, "m3", 8))
      .toDF("entity_id", "timestamp", "model", "ports"), nowSec = 300L)
    assert(run("attribute-store", "materialize-curr-ptr", base,
      "inventory_switch", "--incremental").contains("\"inventory_switch\":3"))
    // show now reports stored rows and the snapshot
    val shown = run("attribute-store", "show", base, "inventory_switch")
    assert(shown.contains("\"history_rows\":5"), shown)
    assert(shown.contains("\"current_rows\":3"), shown)
    assert(run("attribute-store", "delete", base, "inventory_switch")
      .contains("\"deleted\":true"))
  }

  test("notification-store create persists a declaration that types later writes") {
    val yaml = java.nio.file.Files.createTempFile("alerts", ".yaml")
    java.nio.file.Files.writeString(yaml,
      """data_source: ops
        |entity_type: notification
        |attributes:
        |  - name: weight
        |    data_type: integer
        |  - name: details
        |    data_type: text
        |""".stripMargin)
    val stem = yaml.getFileName.toString.stripSuffix(".yaml")
    assert(run("notification-store", "create", base, yaml.toString)
      .contains("\"attributes\":2"))
    // a LATER writer constructed WITHOUT attributes picks up the persisted
    // declaration: weight narrows to the declared integer
    val ns = new graft.storage.NotificationStore(spark, s"$base/notification/$stem")
    ns.store(Seq((1L, 100L, "r", 7L, "d"))
      .toDF("entity_id", "timestamp", "rule", "weight", "details"), nowSec = 1L)
    val back = ns.read().get
    assert(back.schema("weight").dataType == org.apache.spark.sql.types.IntegerType)
    assert(back.select("weight").head.getInt(0) == 7)
  }
}
