package graft.sources

import graft.SparkSpec
import graft.core.MinervaType
import graft.core.MinervaType._
import java.nio.file.{Files, Paths}

/** JSON-lines harvest plugin (A1/A2/A4 surface for the second in-tree
  * format): deduction through the shared lattice fold, normalization to
  * the package contract, and registry round-trip — the same properties
  * CsvTrendSourceSpec pins for CSV, plus cross-format deduction
  * agreement. */
class JsonTrendSourceSpec extends SparkSpec {

  private val jsonl =
    """{"node":"hillside14","timestamp":"2020-08-25T14:00:00","outside_temp":14.4,"count_small":12,"count_big":3000000000,"label":"ok"}
      |{"node":"hillside15","timestamp":"2020-08-25T14:00:00","outside_temp":null,"count_small":40000,"count_big":4000000000,"label":"warm"}
      |{"node":"hillside14","timestamp":"2020-08-25T14:15:00","outside_temp":14.5,"count_small":7,"count_big":5,"label":null}
      |""".stripMargin

  private def writeFixture(name: String): String = {
    val p = Paths.get(s"target/tmp/$name.jsonl")
    Files.createDirectories(p.getParent)
    Files.writeString(p, jsonl)
    p.toString
  }

  test("distributed deduction classifies JSON scalars through the lattice") {
    val path = writeFixture("jded")
    val cfg = JsonSourceConfig("node", Some("timestamp"))
    val schema = JsonTrendSource.deduceSchemaDistributed(spark, path, cfg).toMap
    assert(schema("node") == MText)
    assert(schema("timestamp") == MTimestampNtz)
    assert(schema("outside_temp") == MReal)
    assert(schema("count_small") == MInteger) // 40000 exceeds smallint
    assert(schema("count_big") == MBigInt)    // 4e9 exceeds integer
    assert(schema("label") == MText)
  }

  test("JSON and CSV drops of the same data deduce the same schema") {
    val jPath = writeFixture("jagree")
    val cPath = Paths.get("target/tmp/jagree.csv")
    Files.writeString(cPath,
      """node,timestamp,outside_temp,count_small,count_big,label
        |hillside14,2020-08-25T14:00:00,14.4,12,3000000000,ok
        |hillside15,2020-08-25T14:00:00,\N,40000,4000000000,warm
        |hillside14,2020-08-25T14:15:00,14.5,7,5,\N
        |""".stripMargin)
    val jSchema = JsonTrendSource.deduceSchemaDistributed(
      spark, jPath, JsonSourceConfig("node", Some("timestamp"))).toMap
    val cSchema = CsvTrendSource.deduceSchemaDistributed(
      spark, cPath.toString, CsvSourceConfig("node", Some("timestamp"))).toMap
    assert(jSchema == cSchema)
  }

  test("read normalizes: entity/timestamp naming, nulls, typed trends") {
    val path = writeFixture("jread")
    val cfg = JsonSourceConfig("node", Some("timestamp"),
      timestampFormat = "yyyy-MM-dd'T'HH:mm:ss")
    val schema = Seq[(String, MinervaType)](
      "node" -> MText, "timestamp" -> MTimestamp, "outside_temp" -> MReal,
      "count_small" -> MInteger, "count_big" -> MBigInt, "label" -> MText)
    val df = JsonTrendSource.read(spark, path, cfg, schema)
    assert(df.columns.toSet ==
      Set("entity", "timestamp", "outside_temp", "count_small", "count_big", "label"))
    val rows = df.orderBy("timestamp", "entity").collect()
    assert(rows.length == 3)
    // 2020-08-25T14:00:00 naive-as-UTC → epoch seconds
    assert(rows(0).getAs[Long]("timestamp") == 1598364000L)
    assert(rows(1).getAs[Float]("outside_temp") == null.asInstanceOf[Float]
      || rows(1).isNullAt(rows(1).fieldIndex("outside_temp")))
    assert(rows(2).getAs[Long]("timestamp") == 1598364900L)
    assert(rows(2).isNullAt(rows(2).fieldIndex("label")))
    assert(rows(0).getAs[Long]("count_big") == 3000000000L)
  }

  test("fixed-timestamp provider stamps when no timestamp column exists") {
    val p = Paths.get("target/tmp/jfixed.jsonl")
    Files.createDirectories(p.getParent)
    Files.writeString(p, """{"node":"n1","v":5}""" + "\n")
    val cfg = JsonSourceConfig("node", None, fixedTimestampSec = Some(1700000000L))
    val df = JsonTrendSource.read(spark, p.toString, cfg,
      Seq("node" -> MText, "v" -> MSmallInt))
    val r = df.collect().head
    assert(r.getAs[Long]("timestamp") == 1700000000L)
    assert(r.getAs[String]("entity") == "n1")
  }

  test("nested JSON values deduce as text (raw JSON string), scalars unaffected") {
    val p = Paths.get("target/tmp/jnested.jsonl")
    Files.createDirectories(p.getParent)
    Files.writeString(p,
      """{"node":"n1","meta":{"a":1,"b":"x"},"tags":[1,2,3],"v":7}""" + "\n")
    val cfg = JsonSourceConfig("node", None, fixedTimestampSec = Some(0L))
    val schema = JsonTrendSource.deduceSchemaDistributed(spark, p.toString, cfg).toMap
    // objects/arrays surface as their raw JSON text → lattice rank text;
    // the scalar column still classifies numerically
    assert(schema("meta") == MText && schema("tags") == MText)
    assert(schema("v") == MSmallInt)
  }

  test("plugin registers and reads through the TrendSources registry") {
    val path = writeFixture("jreg")
    TrendSources.register(JsonTrendSource.plugin(
      JsonSourceConfig("node", Some("timestamp"),
        timestampFormat = "yyyy-MM-dd'T'HH:mm:ss"), "json_spec"))
    assert(TrendSources.names.contains("json_spec"))
    val pkg = TrendSources.get("json_spec").get.read(spark, path)
    assert(pkg.columns.contains("entity") && pkg.columns.contains("timestamp"))
    assert(pkg.count() == 3)
    // deduced-through-plugin read keeps the typed contract
    assert(pkg.schema("count_big").dataType ==
      org.apache.spark.sql.types.LongType)
  }
}
