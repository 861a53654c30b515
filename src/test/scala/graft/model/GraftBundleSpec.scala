package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drives `initialize --load-sample-data` over the graft-authored fixture
  * bundle (src/test/resources/graft_bundle) — the cases the reference's
  * tiny_instance can't cover: a populated attribute store with curr-ptr
  * materialization, attribute sample data, a notification store whose FILE
  * name differs from its data_source (name-first lookup), relation edges
  * that actually match, and a virtual-entity SQL with ';' inside a string
  * literal (quote-aware statement splitting). */
class GraftBundleSpec extends SparkSpec {

  private val bundleDir = {
    val url = getClass.getClassLoader.getResource("graft_bundle")
    assert(url != null, "graft_bundle test fixture missing")
    new java.io.File(url.toURI).getAbsolutePath
  }

  test("parsers: splitter keeps literal semicolons; store file name carried") {
    val inst = InstanceModel.loadInstance(bundleDir)
    // ';' inside the VALUES literal must not truncate the view body
    val ve = inst.virtualEntities.head
    assert(ve.name == "v-region")
    assert(ve.viewSelect.exists(_.contains("'no;man;land'")))
    assert(ve.viewSelect.exists(_.trim.startsWith("SELECT")))
    // notification store resolvable by file stem, not just data_source
    val ns = inst.notificationStores.head
    assert(ns.name == "alerts" && ns.dataSource == "ops-notif")
    // attribute store definition parsed
    val ad = inst.attributeStores.head
    assert(ad.dataSource == "inventory" && ad.entityType == "router")
    assert(ad.attributes.map(_.name) == Seq("vendor", "ports"))
    // sample sets: one trend, one attribute
    val sd = InstanceModel.loadSampleDataDefs(bundleDir)
    assert(sd.map(s => s.name -> s.kind).toSet ==
      Set("routers" -> "trend", "router-attrs" -> "attribute"))
  }

  test("structure dumps the loaded catalog as JSON") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.cli.Main.main(Array("structure", bundleDir))
    }
    val json = out.toString.trim
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(json.contains("\"net_router_main_15m\""))
    assert(json.contains("\"rx_mb\"") && json.contains("\"double precision\""))
    assert(json.contains("\"inventory\"") && json.contains("\"ports\""))
    assert(json.contains("\"alerts\"") && json.contains("\"ops-notif\""))
    assert(json.contains("\"router->v-region\""))
    assert(json.contains("\"v-region\""))
    assert(json.contains("\"router/15m/rxhigh\""))
    // well-formed: the driver-side json parser must accept it
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("initialize: attribute store, name-matched typed notifications, edges") {
    val base = "target/tmp/graft_bundle_init"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    graft.cli.Main.main(Array("initialize", bundleDir, base, "--load-sample-data"))

    // entity directory: sample routers + virtual regions (incl. the
    // semicolon-bearing one — the splitter preserved the full VALUES list)
    val dir = new graft.storage.EntityDirectory(spark, s"$base/entity")
    assert(dir.read("router").count() == 3)
    assert(dir.read("v-region").select("name").collect().map(_.getString(0)).toSet ==
      Set("north", "south", "no;man;land"))

    // relation edges EXIST: sample data loaded BEFORE derivatives, so the
    // query over entity_router saw the sample-created entities
    val edges = graft.operators.InstanceInit.readRelation(
      spark, s"$base/relation", "router->v-region")
    assert(edges.count() == 3)

    // attribute store: history + materialized curr-ptr snapshot
    val as = new graft.storage.AttributeStore(spark, s"$base/attribute/inventory_router")
    assert(as.history.get.count() == 3)
    val cur = as.currentSnapshot.get
    assert(cur.count() == 3)
    assert(cur.filter(col("vendor") === "zenith").count() == 1)

    // trigger wrote TYPED notifications into the store found BY FILE NAME
    // ('alerts'), though its data_source is 'ops-notif' — the typed schema
    // applied (weight narrowed to the declared integer)
    val ns = new graft.storage.NotificationStore(spark, s"$base/notification/alerts")
    val notifs = ns.read().get
    assert(notifs.count() == 2) // rx 25.5 and 12.0 exceed max_rx=10
    assert(notifs.schema("weight").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val byWeight = notifs.select("weight").collect().map(_.getInt(0)).sorted.toSeq
    assert(byWeight == Seq(100, 900)) // CASE weight: >20 → 900, else 100
    assert(notifs.select("details").collect().map(_.getString(0))
      .forall(_.startsWith("rx ")))

    // re-running initialize is IDEMPOTENT: upserted trends, insert-missing
    // entities, overwritten relations, PK-deduped notifications
    graft.cli.Main.main(Array("initialize", bundleDir, base, "--load-sample-data"))
    assert(dir.read("router").count() == 3)
    assert(graft.operators.InstanceInit.readRelation(
      spark, s"$base/relation", "router->v-region").count() == 3)
    assert(ns.read().get.count() == 2)
  }
}
