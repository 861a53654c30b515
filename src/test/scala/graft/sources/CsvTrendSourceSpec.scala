package graft.sources

import graft.SparkSpec
import graft.core.MinervaType._
import java.nio.file.{Files, Paths}

/** Mirrors the tiny_instance ingest fixture (FIXTURES.md §1: sample.csv with
  * identifier column `node`, ISO-8601 timestamps, numeric trends) and the
  * schema-deduction CLI (SURVEY A4). */
class CsvTrendSourceSpec extends SparkSpec {

  private val csv =
    """node,timestamp,outside_temp,inside_temp,power_kwh,label
      |hillside14,2020-08-25T14:00:00Z,14.4,32.4,55.8,ok
      |hillside15,2020-08-25T14:00:00Z,\N,30.0,50.1,warm
      |hillside14,2020-08-25T14:15:00Z,14.5,,56.2,ok
      |""".stripMargin

  private def writeFixture(name: String): String = {
    val p = Paths.get(s"target/tmp/$name.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, csv)
    p.toString
  }

  test("schema deduction follows the lattice") {
    val path = writeFixture("dedschema")
    val cfg = CsvSourceConfig("node", Some("timestamp"))
    val schema = CsvTrendSource.deduceSchema(spark, path, cfg).toMap
    assert(schema("node") == MText)
    assert(schema("outside_temp") == MReal)
    assert(schema("power_kwh") == MReal)
    assert(schema("label") == MText)
  }

  test("distributed deduction agrees with the driver lattice on adversarial values") {
    // one column per adversarial value family: the distributed CASE chain's
    // fast text/timestamp short-circuits must not change any
    // classification vs MinervaType.deduceValue's parse-based lattice
    val values = Seq(
      "42", "40000", "3000000000", "1.5", "NaN", "Infinity", "-Infinity",
      "e5", "true", "user=7", "north-r1", "2020-08-25 14:00:00",
      "2020-08-25T14:00:00", "2020-13-99 99:99:99", ".5", "+5", "-0.25",
      "12345678901234567890123", "\\N", "iphone", "none")
    val cols = values.indices.map(i => s"c$i")
    val p = Paths.get("target/tmp/adversarial.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p,
      cols.mkString(",") + "\n" + values.map(v => "\"" + v + "\"").mkString(",") + "\n")
    val cfg = CsvSourceConfig("c0", None)
    val dist = CsvTrendSource.deduceSchemaDistributed(spark, p.toString, cfg).toMap
    values.zipWithIndex.foreach { case (v, i) =>
      val want = graft.core.MinervaType.deduceValue(v)
      assert(dist(s"c$i") == want,
        s"value '$v': distributed=${dist(s"c$i")} driver=$want")
    }
  }

  test("readAudited: malformed cells quarantine with per-column reasons; null tokens don't") {
    val p = Paths.get("target/tmp/audited.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p,
      """node,timestamp,outside_temp,label
        |h14,2020-08-25T14:00:00Z,14.4,ok
        |h15,not-a-time,15.0,ok
        |h16,2020-08-25T14:30:00Z,oops,warm
        |h17,2020-08-25T14:45:00Z,\N,fine
        |""".stripMargin)
    val cfg = CsvSourceConfig("node", Some("timestamp"))
    val df = CsvTrendSource.readAudited(spark, p.toString, cfg, Seq(
      "node" -> graft.core.MinervaType.MText,
      "timestamp" -> graft.core.MinervaType.MTimestamp,
      "outside_temp" -> graft.core.MinervaType.MReal,
      "label" -> graft.core.MinervaType.MText))
    val byNode = df.collect()
      .map(r => r.getAs[String]("entity") ->
        r.getSeq[String](r.fieldIndex("parse_errors")).toList).toMap
    assert(byNode("h14").isEmpty)
    assert(byNode("h15") == Seq("timestamp"))
    assert(byNode("h16") == Seq("outside_temp"))
    assert(byNode("h17").isEmpty, "null token is not a parse error")
  }

  test("read normalizes: entity/timestamp naming, null tokens, typed trends") {
    val path = writeFixture("readnorm")
    val cfg = CsvSourceConfig("node", Some("timestamp"))
    val schema = Seq(
      "node" -> MText, "timestamp" -> MTimestamp,
      "outside_temp" -> MNumeric, "inside_temp" -> MNumeric,
      "power_kwh" -> MNumeric, "label" -> MText)
    val df = CsvTrendSource.read(spark, path, cfg, schema)
    assert(df.columns.contains("entity") && df.columns.contains("timestamp"))
    val rows = df.sort("timestamp", "entity").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("entity") == "hillside14")
    assert(rows(0).getAs[Long]("timestamp") == 1598364000L) // 2020-08-25T14:00Z
    assert(rows(1).isNullAt(rows(1).fieldIndex("outside_temp"))) // \N token
    assert(rows(2).isNullAt(rows(2).fieldIndex("inside_temp"))) // empty token
    assert(rows(2).getAs[java.math.BigDecimal]("power_kwh").doubleValue() == 56.2)
  }

  test("array columns parse COPY `{...}` form with null tokens") {
    val arrCsv =
      """node,timestamp,readings
        |n1,2020-08-25T14:00:00Z,"{1,2,3}"
        |n2,2020-08-25T14:00:00Z,"{4,\N,6}"
        |n3,2020-08-25T14:00:00Z,"{}"
        |n4,2020-08-25T14:00:00Z,\N
        |""".stripMargin
    val p = Paths.get("target/tmp/arrcsv.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, arrCsv)
    val cfg = CsvSourceConfig("node", Some("timestamp"))
    val schema = Seq("node" -> MText, "timestamp" -> MTimestamp,
      "readings" -> MArray(MBigInt))
    val df = CsvTrendSource.read(spark, p.toString, cfg, schema)
    val rows = df.sort("entity").collect()
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("readings")).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getSeq[Any](rows(1).fieldIndex("readings")).toSeq == Seq(4L, null, 6L))
    assert(rows(2).getSeq[Long](rows(2).fieldIndex("readings")).toSeq == Seq.empty)
    assert(rows(3).isNullAt(rows(3).fieldIndex("readings")))
  }

  test("distributed deduction honours values beyond any driver sample") {
    val csv2 = new StringBuilder("id,ts,v,label\n")
    (1 to 50).foreach(i => csv2 ++= s"$i,2020-08-25 14:00:00,$i.5,ok\n")
    csv2 ++= "74280,2020-08-25 14:00:00,1.0,ok\n" // beyond smallint, past sample
    val p = Paths.get("target/tmp/dedist.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, csv2.toString)
    val cfg = CsvSourceConfig("id", Some("ts"))
    // a 50-row sample wrongly deduces smallint for id...
    val sampled = CsvTrendSource.deduceSchema(spark, p.toString, cfg, sampleRows = 50).toMap
    assert(sampled("id") == MSmallInt)
    // ...the one-pass distributed fold sees every row
    val full = CsvTrendSource.deduceSchemaDistributed(spark, p.toString, cfg).toMap
    assert(full("id") == MInteger)
    assert(full("v") == MReal)
    assert(full("ts") == MTimestampNtz)
    assert(full("label") == MText)
  }

  test("configured timestampFormat is honoured") {
    val tsCsv =
      """node,timestamp,v
        |n1,25-08-2020 14:00:00,1
        |""".stripMargin
    val p = Paths.get("target/tmp/tsfmt.csv")
    Files.writeString(p, tsCsv)
    val cfg = CsvSourceConfig("node", Some("timestamp"),
      timestampFormat = "dd-MM-yyyy HH:mm:ss")
    val schema = Seq("node" -> MText, "timestamp" -> MTimestamp, "v" -> MBigInt)
    val df = CsvTrendSource.read(spark, p.toString, cfg, schema)
    assert(df.head.getAs[Long]("timestamp") == 1598364000L)
  }

  test("harvest plugin registry: lookup by name reads through the plugin") {
    val path = writeFixture("plugreg")
    assert(TrendSources.names.contains("csv")) // built-in self-registration
    TrendSources.register(
      CsvTrendSource.plugin(CsvSourceConfig("node", Some("timestamp")), "csv-node"))
    val df = TrendSources.get("csv-node").get.read(spark, path)
    assert(df.columns.contains("entity") && df.columns.contains("timestamp"))
    assert(df.count() == 3)
    assert(TrendSources.get("no-such-plugin").isEmpty)
  }

  test("timestamp parse falls back to the reference formats") {
    // caller keeps the offset-bearing DEFAULT format but the file carries
    // the reference's offset-less form — the fallback must parse it
    val tsCsv =
      """node,timestamp,v
        |n1,2020-08-25 14:00:00,1
        |n2,2020-08-25T15:00:00,2
        |""".stripMargin
    val p = Paths.get("target/tmp/tsfallback.csv")
    Files.writeString(p, tsCsv)
    val cfg = CsvSourceConfig("node", Some("timestamp")) // default format
    val schema = Seq("node" -> MText, "timestamp" -> MTimestamp, "v" -> MBigInt)
    val rows = CsvTrendSource.read(spark, p.toString, cfg, schema)
      .sort("entity").collect()
    assert(rows(0).getAs[Long]("timestamp") == 1598364000L)
    assert(rows(1).getAs[Long]("timestamp") == 1598367600L)
  }

  test("fixed timestamp provider when no timestamp column") {
    val path = writeFixture("fixedts")
    val cfg = CsvSourceConfig("node", None, fixedTimestampSec = Some(1700000000L))
    val schema = Seq("node" -> MText, "timestamp" -> MText,
      "outside_temp" -> MNumeric, "inside_temp" -> MNumeric,
      "power_kwh" -> MNumeric, "label" -> MText)
    val df = CsvTrendSource.read(spark, path, cfg, schema)
    assert(df.select("timestamp").distinct().head.getLong(0) == 1700000000L)
  }

  test("ServiceLoader discovery: a META-INF/services drop-in loads " +
      "through the registry and the CLI harvest path") {
    // tsv-test comes ONLY from META-INF/services/graft.sources.TrendSource
    // (test resources = the vendor jar's classpath contribution); it was
    // never register()ed
    assert(TrendSources.discovered.contains("tsv-test"))
    assert(TrendSources.names.contains("tsv-test"))
    val src = TrendSources.get("tsv-test").get
    val tsv = "node\tts\tv\nn1\t2020-08-25 14:00:00\t7\nn2\t2020-08-25 15:00:00\t9\n"
    val p = Paths.get("target/tmp/plugin_drop.tsv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, tsv)
    val df = src.read(spark, p.toString)
    assert(df.count() == 2L)
    assert(df.columns.contains("entity") && df.columns.contains("timestamp"))
    // a statically-registered name with the same key wins over discovery
    // (plugins.py:38-39 builtins-first), and unknown names stay None
    assert(TrendSources.get("no-such-plugin-xyz").isEmpty)
    // CLI path: harvest <plugin> resolves the discovered source and
    // lands rows in a part store through the standard load chain
    val base = "target/tmp/plugin_cli_store"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.cli.Main.run(List("harvest", "tsv-test", p.toString, base, "tsv_part"))
    }
    assert(out.toString.contains("\"plugin\":\"tsv-test\""), out.toString)
    val stored = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 86400)).readPart("tsv_part").get
    assert(stored.count() == 2L)
    assert(stored.columns.contains("v"))
    // an unknown plugin refuses with exit 2, listing what exists
    val ex = intercept[graft.cli.Main.CliExit] {
      Console.withOut(new java.io.PrintStream(
        new java.io.ByteArrayOutputStream())) {
        graft.cli.Main.run(List("harvest", "nope", p.toString, base, "x"))
      }
    }
    assert(ex.code == 2)
  }

  test("naive vs tz data columns: ntz is session-zone-proof, tz pins UTC") {
    val csvT =
      """node,seen,logged
        |n1,2020-08-25 14:00:00,2020-08-25 14:00:00
        |n2,2021-01-02T03:04:05,2021-01-02T03:04:05
        |""".stripMargin
    val p = Paths.get("target/tmp/ntzcsv.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, csvT)
    val cfg = CsvSourceConfig("node", None, fixedTimestampSec = Some(0L))
    val schema = Seq("node" -> MText,
      "seen" -> MTimestampNtz, // the deduced naive type
      "logged" -> MTimestamp) // declared timestamptz (instance YAML)
    def loadUnder(tz: String) = {
      val old = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", tz)
      try {
        val r = CsvTrendSource.read(spark, p.toString, cfg, schema)
          .sort("entity")
          .select("seen", "logged").collect().toSeq
        r.map(row => (row.getAs[java.time.LocalDateTime](0),
          row.getAs[java.sql.Timestamp](1).toInstant))
      } finally spark.conf.set("spark.sql.session.timeZone", old)
    }
    val utc = loadUnder("UTC")
    val tokyo = loadUnder("Asia/Tokyo")
    assert(utc == tokyo) // both columns independent of the session zone
    assert(utc.head._1 == java.time.LocalDateTime.of(2020, 8, 25, 14, 0, 0))
    // tz column localized in the reference's default parser tz = UTC
    assert(utc.head._2 == java.time.Instant.parse("2020-08-25T14:00:00Z"))
    assert(utc(1)._1 == java.time.LocalDateTime.of(2021, 1, 2, 3, 4, 5))
    assert(utc(1)._2 == java.time.Instant.parse("2021-01-02T03:04:05Z"))
  }
}
