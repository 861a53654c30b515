package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access.
  *
  * Fixture timestamp columns have shipped as both `TIMESTAMP(NANOS)` (which
  * Spark 4 only reads under `spark.sql.legacy.parquet.nanosAsLong=true`, as
  * BIGINT nanoseconds) and plain `TIMESTAMP(MICROS)` (which reads as
  * TIMESTAMP_NTZ). `load` normalizes every timestamp-typed column to BIGINT
  * epoch-nanoseconds so all graft queries do time math on epoch integers
  * (`nanos div 1e9`) regardless of the physical type — which is also the
  * cross-engine-deterministic representation for the DuckDB oracle
  * (`epoch_ns(ts)//1000000000`, identical for nanos and micros storage).
  */
object Tables {
  final val NanosPerSecond = 1000000000L

  /** Read one fixture table with timestamps normalized to BIGINT nanos.
    *
    * SESSION-WIDE CONTRACT, not a leak: this sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` and a UTC session
    * timezone on the CALLER's session and leaves them set. Both are
    * load-bearing at execution time — the frame is lazy, the NTZ→epoch
    * cast reads the analysis-time timezone, and the nanos conf governs
    * every later fixture read on the session — so a save/restore around
    * this call would silently break the returned frame. Callers sharing
    * the session with timezone-sensitive code must run that code on UTC
    * too (every graft query does: all time math is epoch-integer). NANOS
    * columns read as BIGINT directly; MICROS columns read as
    * TIMESTAMP_NTZ and convert naive-as-UTC, matching DuckDB's naive
    * `epoch_ns`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(f.name, unix_micros(col(f.name).cast("timestamp")) * lit(1000L))
        case org.apache.spark.sql.types.TimestampType =>
          d.withColumn(f.name, unix_micros(col(f.name)) * lit(1000L))
        // a DATE column would be the third physical shape a regenerated
        // fixture could ship — midnight UTC, same epoch-nanos contract
        case org.apache.spark.sql.types.DateType =>
          d.withColumn(f.name,
            unix_date(col(f.name)).cast("long") * lit(86400L * NanosPerSecond))
        case _ => d
      }
    }
  }

  /** Epoch seconds from a BIGINT-nanoseconds column. Exact integral
    * division: `/` on Columns is double division, and a double quotient of
    * ~1.7e9 has ~2.4e-7 ULP — a timestamp a few hundred ns below a second
    * boundary would round across it. Subtracting the remainder first keeps
    * every intermediate exact. */
  def epochSec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((c - pmod(c, lit(NanosPerSecond))) / lit(NanosPerSecond)).cast("long")

  /** SQL fragment: epoch seconds from a nanos column (integral division —
    * doubles would lose precision above 2^53 ns). */
  def epochSecSql(col: String): String = s"($col div 1000000000)"

  /** Epoch seconds for a column whatever its physical type: fixtures mix
    * TIMESTAMP(NANOS) (→ BIGINT under nanosAsLong) and TIMESTAMP(MICROS)
    * (→ TIMESTAMP_NTZ). Session timezone is UTC, so NTZ→TIMESTAMP→long is
    * the naive-as-UTC epoch, matching DuckDB's epoch_ns()//1e9. */
  def secCol(df: DataFrame, name: String): org.apache.spark.sql.Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType => expr(epochSecSql(name))
      case _ => unix_timestamp(col(name).cast("timestamp"))
    }
}
