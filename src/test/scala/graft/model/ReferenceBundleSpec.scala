package graft.model

import graft.SparkSpec
import graft.core.MinervaType
import org.apache.spark.sql.functions._

/** Loads the reference's own example instance bundle VERBATIM
  * (/root/reference/examples/tiny_instance — PostgreSQL relation queries,
  * `$1.`-style trigger fragments and all) and drives the full
  * `initialize --load-sample-data` flow, asserting populated trend
  * partitions, materialized KPIs, virtual entities, relations and typed
  * notifications. This is the end-to-end proof that a reference user's
  * bundle runs unmodified. */
class ReferenceBundleSpec extends SparkSpec {

  private val refDir = "/root/reference/examples/tiny_instance"
  private def refAvailable =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(refDir))

  private lazy val inst = InstanceModel.loadInstance(refDir)

  test("verbatim bundle: every parser produces the expected model") {
    assume(refAvailable)
    assert(inst.trendStores.map(_.dataSource).sorted == Seq("hub", "hub", "hub-kpi"))
    val raw = inst.trendStores.find(_.title == "Raw node counters").get
    assert(raw.parts.head.name == "hub_node_main_15m")
    assert(raw.parts.head.trends.map(_.name) ==
      Seq("outside_temp", "inside_temp", "power_kwh", "freq_power"))

    // relations carry the verbatim PostgreSQL query text
    assert(inst.relations.map(_.name).sorted ==
      Seq("node->v-site", "node-module->v-site"))
    assert(inst.relations.forall(_.query.contains("substring(")))

    // virtual entity: SELECT body extracted from the .sql
    val ve = inst.virtualEntities.head
    assert(ve.name == "v-site")
    assert(ve.viewSelect.exists(_.contains("VALUES ('1001'), ('1002'), ('1003')")))

    // notification store: typed attributes with PG type aliases honored
    val ns = inst.notificationStores.head
    assert(ns.name == "trigger-notification" &&
      ns.dataSource == "trigger-notification")
    val attrTypes = ns.attributes.map(a => a.name -> a.dataType).toMap
    assert(attrTypes("rule_id") == MinervaType.MInteger)
    assert(attrTypes("data") == MinervaType.MText)      // json → text
    assert(attrTypes("created") == MinervaType.MTimestamp) // timestamptz

    // trigger: thresholds + store link + notification store reference
    val t = inst.triggers.head
    assert(t.name == "node/15m/highpowerusage")
    assert(t.thresholds.map(th => th.name -> th.value) == Seq("max_power" -> 0.05))
    assert(t.notificationStore == "trigger-notification")
    assert(t.trendStoreLinks.map(_.partName) == Seq("hub_node_main_15m"))

    // materialization: view SQL present and enabled
    val m = inst.materializations.head
    assert(m.targetTrendStorePart == "hub-kpi_node_main_15m" && m.enabled)
    assert(m.view.exists(_.contains("power_kwh * 1000")))

    // sample-data definition
    val sd = InstanceModel.loadSampleDataDefs(refDir)
    assert(sd.map(_.name) == Seq("tiny-set"))
    assert(sd.head.identifier == "node" && sd.head.kind == "trend")
  }

  test("initialize --load-sample-data brings the verbatim bundle up populated") {
    assume(refAvailable)
    val base = "target/tmp/ref_bundle_init"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    val intervals = 4
    graft.cli.Main.main(Array("initialize", refDir, base,
      "--load-sample-data", s"--interval-count=$intervals"))

    // entity directory: 3 virtual v-sites + 2 generated nodes
    val dir = new graft.storage.EntityDirectory(spark, s"$base/entity")
    assert(dir.read("v-site").count() == 3)
    assert(dir.read("node").select("name").collect().map(_.getString(0)).sorted
      .toSeq == Seq("hillside14", "hillside15"))

    // relations ran (the verbatim PG query parses and executes); the
    // reference's own sample nodes have no '-' so the regex yields no edges
    val edges = graft.operators.InstanceInit.readRelation(
      spark, s"$base/relation", "node->v-site")
    assert(edges.columns.toSeq == Seq("source_id", "target_id"))
    assert(edges.count() == 0)

    // raw trend part: 2 nodes × intervals rendered from the tiny-set
    // template (the generator-module path), 15m-aligned timestamps
    val ps = new graft.storage.PartStore(
      spark, graft.storage.PartStoreConfig(s"$base/trend", 86400))
    val raw = ps.readPart("hub_node_main_15m").get
    assert(raw.count() == 2L * intervals)
    assert(raw.select("timestamp").distinct().count() == intervals)
    assert(raw.filter(pmod(col("timestamp"), lit(900)) =!= 0).count() == 0)
    // template values land in the generator's uniform [0, 80) range
    assert(raw.filter(col("power_kwh") < 0 || col("power_kwh") >= 80).count() == 0)

    // the view materialization populated the KPI part: every row has
    // power_mwh = power_kwh * 1000
    val kpi = ps.readPart("hub-kpi_node_main_15m").get
    assert(kpi.count() == 2L * intervals)
    val mismatched = kpi.select(col("entity_id"), col("timestamp"),
        col("power_mwh").cast("double").as("mwh"))
      .join(raw.select(col("entity_id"), col("timestamp"),
        col("power_kwh").cast("double").as("kwh")), Seq("entity_id", "timestamp"))
      .filter(abs(col("mwh") - col("kwh") * 1000) > 1e-6)
    assert(mismatched.count() == 0)

    // the trigger fired into the TYPED notification store: weight CASE
    // rewrote (>1 → 500, else 300), details template rendered,
    // declared-but-absent rule_id arrived as a typed NULL int column
    val ns = new graft.storage.NotificationStore(spark, s"$base/notification/trigger-notification")
    val notifs = ns.read().get
    assert(notifs.count() ==
      raw.filter(col("power_kwh") > 0.05).count())
    assert(notifs.count() > 0)
    // typed store: declared `weight integer` narrows the long expr output
    assert(notifs.schema("weight").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(notifs.filter(!col("weight").isin(500, 300)).count() == 0)
    val row = notifs.sort("entity_id", "timestamp").head
    assert(row.getAs[String]("details").startsWith("HighPowerUsage\n"))
    assert(row.getAs[String]("data").contains("\"power_kwh\""))
    assert(notifs.schema("rule_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(notifs.filter(col("rule_id").isNotNull).count() == 0)
  }
  test("generate-sample-data renders per-interval files without loading") {
    assume(refAvailable)
    val defs = InstanceModel.loadSampleDataDefs(refDir)
    assume(defs.nonEmpty)
    val name = defs.head.name
    val out = java.nio.file.Files.createTempDirectory("graft_gen").toString
    graft.cli.Main.main(Array("generate-sample-data", refDir, name, out,
      "--interval-count=3", "--now=1705708800"))
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 3)
    val body = scala.io.Source.fromFile(files.head).mkString
    assert(!body.contains("{{"), s"unrendered placeholders in:\n$body")
    // deterministic: same --now renders byte-identical files
    val out2 = java.nio.file.Files.createTempDirectory("graft_gen2").toString
    graft.cli.Main.main(Array("generate-sample-data", refDir, name, out2,
      "--interval-count=3", "--now=1705708800"))
    val a = new java.io.File(out).listFiles().map(f =>
      f.getName -> scala.io.Source.fromFile(f).mkString).toMap
    val b = new java.io.File(out2).listFiles().map(f =>
      f.getName -> scala.io.Source.fromFile(f).mkString).toMap
    assert(a == b)
  }

  test("generate-sample-data at 1month lands every interval on a month boundary") {
    // reference semantics (commands/generate_sample_data.py:61-110 +
    // granularity.truncate): end = truncate(now) and each earlier interval
    // steps back one CALENDAR month — 29/31/30-day steps across a leap
    // February, never a fixed-seconds decrement
    val dir = java.nio.file.Files.createTempDirectory("graft_month_gen_")
    val sd = dir.resolve("sample-data")
    java.nio.file.Files.createDirectories(sd.resolve("monthly"))
    java.nio.file.Files.writeString(sd.resolve("definition.yaml"),
      """- native:
        |    name: monthly
        |    data_source: net
        |    granularity: 1month
        |    parser_config:
        |      entity_type: node
        |      granularity: 1month
        |""".stripMargin)
    java.nio.file.Files.writeString(sd.resolve("monthly").resolve("sample.csv"),
      "node,timestamp,power\nn1,{{ timestamp }},{{ power[0] }}\n")
    val out = java.nio.file.Files.createTempDirectory("graft_month_out_").toString
    // now = 2024-03-15T10:17:00Z, mid-month in a leap year
    graft.cli.Main.main(Array("generate-sample-data", dir.toString, "monthly",
      out, "--interval-count=4", "--now=1710497820"))
    val got = new java.io.File(out).listFiles().map(_.getName).sorted.toSeq
    // month starts walking back: 2023-12-01, 2024-01-01, 2024-02-01,
    // 2024-03-01 00:00:00 UTC — a fixed-width step would drift off the 1st
    val expected = Seq(1701388800L, 1704067200L, 1706745600L, 1709251200L)
    assert(got == expected.map(ts => s"gen_$ts.csv"), got)
    expected.foreach { ts =>
      val inst = java.time.Instant.ofEpochSecond(ts)
        .atZone(java.time.ZoneOffset.UTC)
      assert(inst.getDayOfMonth == 1 && inst.getHour == 0 &&
        inst.getMinute == 0, inst.toString)
    }
  }

}
