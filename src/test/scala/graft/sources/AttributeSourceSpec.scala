package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Attribute-side harvest plugin API (reference:
  * plugin_api_attribute.py:1-37 + harvest/plugins.py entry points):
  * registry semantics, ServiceLoader drop-in discovery, and the
  * `harvest-attributes` / `load-attributes` CLI chain into an
  * AttributeStore — the attribute twin of the trend-side J5 coverage. */
class AttributeSourceSpec extends SparkSpec {

  test("registry: built-in csv registered; register() wins over discovery") {
    assert(AttributeSources.get("csv").isDefined)
    assert(AttributeSources.names.contains("csv"))
    // a static registration under a discovered name shadows the drop-in
    val shadow = new AttributeSource {
      def name = "tsv-attr-test"
      def read(s: org.apache.spark.sql.SparkSession, p: String) =
        s.range(1).toDF("only_the_shadow")
    }
    AttributeSources.register(shadow)
    try assert(AttributeSources.get("tsv-attr-test").get eq shadow)
    finally AttributeSources.register(new TsvTestAttributeSource) // restore-ish
    assert(AttributeSources.get("no-such-attr-plugin").isEmpty)
  }

  test("ServiceLoader discovery: a META-INF/services drop-in loads " +
      "through the registry and the CLI harvest-attributes path") {
    // tsv-attr-test comes ONLY from
    // META-INF/services/graft.sources.AttributeSource (test resources =
    // the vendor jar's classpath contribution); it was never register()ed
    // in production code
    assert(AttributeSources.discovered.contains("tsv-attr-test"))
    val tsv = "node\tts\tstatus\tweight\n" +
      "n1\t2020-08-25 14:00:00\tactive\t3\n" +
      "n2\t2020-08-25 15:00:00\tidle\t5\n" +
      "n1\t2020-08-25 16:00:00\tretired\t4\n"
    val p = Paths.get("target/tmp/attr_plugin_drop.tsv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, tsv)
    val df = AttributeSources.get("tsv-attr-test").get.read(spark, p.toString)
    assert(df.count() == 3L)
    assert(df.columns.contains("entity") && df.columns.contains("timestamp"))

    // CLI path: harvest-attributes <plugin> resolves the discovered
    // source and lands rows in the attribute store's history through the
    // standard resolve → job-log → staged-transfer chain
    val base = "target/tmp/attr_plugin_cli_store"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.cli.Main.run(List(
        "harvest-attributes", "tsv-attr-test", p.toString, base, "node_attrs"))
    }
    assert(out.toString.contains("\"loaded_rows\":3"), out.toString)
    assert(out.toString.contains("\"plugin\":\"tsv-attr-test\""), out.toString)
    val store = new graft.storage.AttributeStore(spark, s"$base/node_attrs")
    val hist = store.history.get
    assert(hist.count() == 3L)
    assert(hist.columns.contains("status") && hist.columns.contains("weight"))
    // curr-ptr over the harvested history: one row per entity, latest wins
    val curr = graft.operators.AttributeOps.currentPtr(
      hist, "entity_id", Seq("timestamp"))
    assert(curr.count() == 2L)
    assert(curr.filter(org.apache.spark.sql.functions.col("status") === "retired")
      .count() == 1L)

    // an unknown plugin refuses with exit 2, listing what exists
    val ex = intercept[graft.cli.Main.CliExit] {
      Console.withOut(new java.io.PrintStream(
        new java.io.ByteArrayOutputStream())) {
        graft.cli.Main.run(List("harvest-attributes", "nope", p.toString, base, "x"))
      }
    }
    assert(ex.code == 2)
  }

  test("load-attributes routes through the built-in csv plugin chain") {
    val csv = "dev,seen,temp\nd1,2020-08-25 14:00:00,21\nd2,2020-08-25 15:00:00,23\n"
    val p = Paths.get("target/tmp/attr_load.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, csv)
    val base = "target/tmp/attr_load_store"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.cli.Main.run(List(
        "load-attributes", p.toString, "dev", "seen", base, "dev_attrs"))
    }
    assert(out.toString.contains("\"loaded_rows\":2"), out.toString)
    assert(out.toString.contains("\"plugin\":\"csv\""), out.toString)
    val hist = new graft.storage.AttributeStore(spark, s"$base/dev_attrs")
      .history.get
    assert(hist.count() == 2L && hist.columns.contains("temp"))
  }
}
