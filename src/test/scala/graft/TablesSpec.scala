package graft

import org.apache.spark.sql.functions._

/** `Tables.load` time normalization: whatever physical type a regenerated
  * fixture ships (TIMESTAMP micros → NTZ, TIMESTAMP with tz, DATE — the
  * NANOS-as-BIGINT path is covered by every fixture-backed gate query),
  * time columns come out as BIGINT epoch-nanoseconds under the
  * naive-as-UTC contract that matches DuckDB's epoch_ns. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("micros-NTZ, tz-timestamp and date columns all load as epoch nanos") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_").toString
    // 2000-01-01 00:00:00 UTC = 946684800 s = day 10957 — all columns are
    // built from epoch constants so the spec never touches the JVM
    // default timezone (Timestamp.valueOf would)
    val sec = 946684800L
    Seq(1L).toDF("id")
      .withColumn("ts", timestamp_micros(lit(sec * 1000000L)))
      .withColumn("d", date_from_unix_date(lit((sec / 86400).toInt)))
      .withColumn("ts_ntz", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val got = Tables.load(spark, dir, "t")
    val schema = got.schema
    Seq("ts", "ts_ntz", "d").foreach { c =>
      assert(schema(c).dataType == org.apache.spark.sql.types.LongType,
        s"$c: ${schema(c).dataType}")
    }
    val r = got.select("ts", "ts_ntz", "d").head
    // session tz is UTC, so the naive literal IS the UTC instant for all
    // three physical shapes
    assert(r.getLong(0) == sec * Tables.NanosPerSecond)
    assert(r.getLong(1) == sec * Tables.NanosPerSecond)
    assert(r.getLong(2) == sec * Tables.NanosPerSecond)
    // and the downstream helpers agree
    val s2 = got.select(Tables.epochSec(col("ts")).as("s")).head.getLong(0)
    assert(s2 == sec)
  }
}
