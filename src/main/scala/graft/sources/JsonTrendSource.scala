package graft.sources

import graft.core.MinervaType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines trend source: the second in-tree harvest format plugin.
  *
  * The reference ships only CSV in-tree and loads further formats through
  * entry-point plugins (src/minerva/harvest/plugins.py:17-44, plugin API
  * src/minerva/harvest/plugin_api_trend.py) — this is such a plugin,
  * registered through the same `TrendSources` registry the CSV source
  * uses, yielding the identical normalized package contract
  * (`entity`, `timestamp` epoch-seconds, typed trend columns).
  *
  * Spark-first: `spark.read.json` with an explicit schema. Type deduction
  * reuses the SAME one-pass distributed Minerva-lattice fold as CSV
  * (SchemaDeduction) over an all-string read, so a JSON drop and a CSV
  * drop of the same data deduce identical trend-store schemas — the
  * property the reference's deducer API promises across formats
  * (harvest/trend_config_deducer.py). At 100 TB both the optional
  * name-discovery pass and the deduction fold are single map-side-combined
  * scans; pass `knownColumns` to skip discovery entirely.
  */
final case class JsonSourceConfig(
    identifierColumn: String,
    timestampColumn: Option[String], // None → supply fixedTimestamp
    fixedTimestampSec: Option[Long] = None,
    timestampFormat: String = "yyyy-MM-dd'T'HH:mm:ssXXX"
)

object JsonTrendSource {

  /** Package as a registrable harvest plugin (A2): deduce with the
    * distributed lattice fold, then read typed. */
  def plugin(cfg: JsonSourceConfig, pluginName: String = "json"): TrendSource =
    new TrendSource {
      def name: String = pluginName
      def read(spark: SparkSession, path: String): DataFrame = {
        val schema = deduceSchemaDistributed(spark, path, cfg).map {
          case (c, _) if cfg.timestampColumn.contains(c) =>
            c -> (MinervaType.MTimestamp: MinervaType)
          case (c, t) => c -> t
        }
        JsonTrendSource.read(spark, path, cfg, schema)
      }
    }

  /** All-string raw read: JSON scalars (numbers, booleans, nulls) land as
    * their literal text in StringType fields, which is exactly what the
    * lattice fold classifies. Column names come from `knownColumns` or
    * one schema-inference pass. */
  private def rawStrings(
      spark: SparkSession, path: String,
      knownColumns: Option[Seq[String]]): DataFrame = {
    val cols = knownColumns.getOrElse(
      spark.read.json(path).schema.map(_.name).toSeq)
    spark.read
      .schema(StructType(cols.map(c => StructField(c, StringType))))
      .json(path)
  }

  /** Exact full-input deduction, one distributed aggregate pass (A4) —
    * shared fold with the CSV source. JSON carries real nulls, so no null
    * token takes part in the classification. */
  def deduceSchemaDistributed(
      spark: SparkSession, path: String, cfg: JsonSourceConfig,
      knownColumns: Option[Seq[String]] = None): Seq[(String, MinervaType)] =
    SchemaDeduction.deduceFromRaw(rawStrings(spark, path, knownColumns),
      nullToken = "")

  /** Read and normalize to the package contract: typed columns per the
    * (declared or deduced) schema, identifier column → `entity`, timestamp
    * column parsed with the configured format to epoch seconds (or the
    * fixed-timestamp provider) — the same contract CsvTrendSource.read
    * yields, so everything downstream (B2 split, A5 store, D1 rollup) is
    * format-agnostic. */
  def read(
      spark: SparkSession, path: String, cfg: JsonSourceConfig,
      schema: Seq[(String, MinervaType)]): DataFrame = {
    // timestamps read as strings and parsed explicitly (identical parse
    // chain to CSV — never Spark's locale/TZ-implicit JSON timestamp path)
    val structFields = schema.map { case (c, t) =>
      val spark_t = t match {
        case MinervaType.MTimestamp | MinervaType.MTimestampNtz => StringType
        case other => other.sparkType
      }
      StructField(c, spark_t)
    }
    val raw = spark.read.schema(StructType(structFields)).json(path)
    val typed = schema.foldLeft(raw) { case (df, (c, t)) =>
      val castCol =
        if (cfg.timestampColumn.contains(c))
          coalesce(
            try_to_timestamp(col(c), lit(cfg.timestampFormat)),
            try_to_timestamp(regexp_replace(col(c), "T", " "))).cast("long")
        else t match {
          // naive `timestamp`: wall-clock verbatim, session-zone-proof
          case MinervaType.MTimestampNtz =>
            to_timestamp_ntz(regexp_replace(col(c), "T", " "))
          // `timestamp with time zone`: localized UTC (reference default),
          // explicit offset so the session zone never shifts the instant
          case MinervaType.MTimestamp =>
            to_timestamp(concat(regexp_replace(col(c), "T", " "), lit("Z")),
              "yyyy-MM-dd HH:mm:ssXXX")
          case _ => col(c) // already typed by the read schema
        }
      df.withColumn(c, castCol)
    }
    val withEntity = typed.withColumnRenamed(cfg.identifierColumn, "entity")
    cfg.timestampColumn match {
      case Some(tc) => withEntity.withColumnRenamed(tc, "timestamp")
      case None => withEntity.withColumn("timestamp",
        lit(cfg.fixedTimestampSec.getOrElse(
          throw new IllegalArgumentException(
            "no timestamp column and no fixed timestamp configured"))))
    }
  }
}
