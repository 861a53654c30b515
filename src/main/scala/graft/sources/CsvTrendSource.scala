package graft.sources

import graft.core.MinervaType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV trend source (reference: src/minerva/loading/csv/parser.py:29-146 —
  * header, per-column typed parsers, configurable delimiter/null token,
  * timestamp column or "current" timestamp, identifier column → entity ref;
  * plugin API src/minerva/harvest/plugin_api_trend.py).
  *
  * Spark-first: `spark.read.csv` with an explicit schema derived from the
  * Minerva type lattice. The reference's 5000-row chunking is obsolete —
  * Spark partitions the input; a 100 TB CSV drop ingests as one job whose
  * parallelism is file-split-driven.
  */
final case class CsvSourceConfig(
    identifierColumn: String,
    timestampColumn: Option[String], // None → supply fixedTimestamp
    fixedTimestampSec: Option[Long] = None,
    delimiter: String = ",",
    nullToken: String = "\\N",
    timestampFormat: String = "yyyy-MM-dd'T'HH:mm:ssXXX"
)

/** Pluggable source trait (harvest plugin API A2): implementations register
  * by name; `read` yields a normalized package DataFrame
  * (entity, timestamp, trends…). */
trait TrendSource {
  def name: String
  def read(spark: SparkSession, path: String): DataFrame
}

/** Harvest plugin registry (reference: harvest/plugin discovery via
  * pkg_resources entry points, src/minerva/harvest/plugins.py): named
  * registration + lookup; the CSV source self-registers as the built-in
  * (plugins.py:12-14 `builtin_types`). A deployment registers vendor
  * plugins at startup — either programmatically via [[register]] or by
  * DROPPING A JAR on the classpath that lists its [[TrendSource]]
  * implementations in `META-INF/services/graft.sources.TrendSource`:
  * [[discover]] is `java.util.ServiceLoader` over that contract, the JVM
  * analogue of the reference's `minerva.harvest.plugins` entry-point
  * group (plugins.py:9,17-18,37-48 — get_plugin falls back from builtins
  * to entry points; here statically-registered names likewise win over
  * discovered ones). */
object TrendSources {
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, TrendSource]

  def register(source: TrendSource): Unit = registry.put(source.name, source)
  def get(name: String): Option[TrendSource] =
    registry.get(name).orElse(discovered.get(name))
  def names: Seq[String] = (registry.keys ++ discovered.keys).toSeq.distinct.sorted

  /** Entry-point-style plugins from the classpath, loaded once on first
    * use (ServiceLoader iteration instantiates each provider via its
    * no-arg constructor, exactly entry_point.load()() at plugins.py:32).
    * A provider that fails to instantiate is skipped loudly on stderr
    * rather than poisoning the registry. */
  lazy val discovered: Map[String, TrendSource] = {
    val it = java.util.ServiceLoader.load(classOf[TrendSource]).iterator()
    val found = Map.newBuilder[String, TrendSource]
    while (it.hasNext) {
      try { val s = it.next(); found += s.name -> s }
      catch {
        case e: java.util.ServiceConfigurationError =>
          System.err.println(s"skipping unloadable TrendSource provider: $e")
      }
    }
    found.result()
  }

  register(CsvTrendSource.plugin(CsvSourceConfig("entity", Some("timestamp"))))
}

object CsvTrendSource {

  /** Package this source as a registrable harvest plugin: deduces the
    * schema with the one-pass distributed fold, then reads. */
  def plugin(cfg: CsvSourceConfig, pluginName: String = "csv"): TrendSource =
    new TrendSource {
      def name: String = pluginName
      def read(spark: SparkSession, path: String): DataFrame = {
        val schema = deduceSchemaDistributed(spark, path, cfg).map {
          case (c, _) if cfg.timestampColumn.contains(c) =>
            c -> (MinervaType.MTimestamp: MinervaType)
          case (c, t) => c -> t
        }
        CsvTrendSource.read(spark, path, cfg, schema)
      }
    }

  /** Deduce per-column Minerva types from a sample of the file
    * (A4, harvest/trend_config_deducer.py:9-47): read as all-string, fold
    * the lattice over a driver-side sample. Deduction reads only
    * `sampleRows` rows — cheap, but a value past the sample can exceed the
    * deduced type (e.g. ids crossing 32767 → smallint overflow at load).
    * Use `deduceSchemaDistributed` when the whole input must be honoured. */
  def deduceSchema(
      spark: SparkSession, path: String, cfg: CsvSourceConfig,
      sampleRows: Int = 10000): Seq[(String, MinervaType)] = {
    val raw = spark.read
      .option("header", "true").option("delimiter", cfg.delimiter)
      .option("nullValue", null: String) // keep raw strings; lattice handles nulls
      .csv(path)
    val cols = raw.columns
    val sample = raw.limit(sampleRows).collect()
    cols.zipWithIndex.map { case (c, i) =>
      c -> MinervaType.deduce(sample.iterator.map(r =>
        Option(r.getString(i)).getOrElse("\\N")))
    }.toSeq
  }

  /** Exact full-input deduction as ONE distributed aggregate pass: each
    * value classifies to its lattice rank via `try_cast` expressions
    * (codegen'd, no UDF), and `max(rank)` per column is the deduced type —
    * the Spark-native form of the reference's full fold
    * (datatype.py:960-975). At 100 TB this is a single map-side-combined
    * aggregation over the scan; there is no driver sample to be wrong. */
  def deduceSchemaDistributed(
      spark: SparkSession, path: String, cfg: CsvSourceConfig): Seq[(String, MinervaType)] = {
    val raw = spark.read
      .option("header", "true").option("delimiter", cfg.delimiter)
      .option("nullValue", null: String)
      .csv(path)
    // the lattice fold itself is format-agnostic and shared with the JSON
    // source (SchemaDeduction); header-only input deduces lattice bottom
    SchemaDeduction.deduceFromRaw(raw, cfg.nullToken)
  }

  /** Read and normalize: typed columns per the (declared or deduced)
    * schema, null tokens applied, identifier column renamed to `entity`,
    * timestamp column parsed to epoch seconds (or the configured fixed
    * timestamp — the reference's "current timestamp" provider,
    * csv/parser.py:125-146). */
  def read(
      spark: SparkSession, path: String, cfg: CsvSourceConfig,
      schema: Seq[(String, MinervaType)]): DataFrame = {
    val raw = rawStrings(spark, path, cfg, schema)
    val typed = schema.foldLeft(raw) { case (df, (c, t)) =>
      df.withColumn(c, typedColumn(cfg, c, t))
    }
    normalizeNames(typed, cfg)
  }

  /** Like [[read]] but with the reference's harvest error path made
    * row-level (harvest/error.py raises ParseError and fails the file;
    * at 100 TB a single malformed row must not kill a load): adds
    * `parse_errors` — the names of columns whose NON-NULL raw text
    * failed its typed parse — so callers split clean rows from a
    * quarantine frame (`size(parse_errors) > 0`) carrying the reason,
    * in the same single pass. Null tokens are not errors. */
  def readAudited(
      spark: SparkSession, path: String, cfg: CsvSourceConfig,
      schema: Seq[(String, MinervaType)]): DataFrame = {
    val raw = rawStrings(spark, path, cfg, schema)
    val withErrs = raw.withColumn("parse_errors",
      array_compact(array(schema.map { case (c, t) =>
        when(cleanedColumn(cfg, c).isNotNull && typedColumn(cfg, c, t).isNull,
          lit(c)).otherwise(lit(null).cast("string"))
      }: _*)))
    val typed = schema.foldLeft(withErrs) { case (df, (c, t)) =>
      df.withColumn(c, typedColumn(cfg, c, t))
    }
    normalizeNames(typed, cfg)
  }

  private def rawStrings(
      spark: SparkSession, path: String, cfg: CsvSourceConfig,
      schema: Seq[(String, MinervaType)]): DataFrame = {
    val structFields = schema.map { case (c, _) => StructField(c, StringType) }
    spark.read
      .option("header", "true").option("delimiter", cfg.delimiter)
      .schema(StructType(structFields))
      .csv(path)
  }

  private def cleanedColumn(cfg: CsvSourceConfig, c: String): Column =
    when(col(c) === cfg.nullToken || col(c) === "", lit(null))
      .otherwise(col(c))

  private def typedColumn(
      cfg: CsvSourceConfig, c: String, t: MinervaType): Column = {
    val cleaned = cleanedColumn(cfg, c)
    if (Some(c) == cfg.timestampColumn)
      // configured format first, then the reference's two recognized
      // forms — so a column deduction classified as timestamp
      // ('yyyy-MM-dd[ T]HH:mm:ss') always parses even when the caller
      // kept the offset-bearing default format
      coalesce(
        try_to_timestamp(cleaned, lit(cfg.timestampFormat)),
        try_to_timestamp(regexp_replace(cleaned, "T", " "))).cast("long")
    else t match {
      // deduced naive `timestamp`: wall-clock verbatim (TIMESTAMP_NTZ) —
      // the stored value is identical under every session timezone
      case MinervaType.MTimestampNtz =>
        to_timestamp_ntz(regexp_replace(cleaned, "T", " "))
      // declared `timestamp with time zone`: localized in the reference's
      // default parser timezone (UTC, datatype.py:139-141) — the explicit
      // offset makes the parse independent of the session zone
      case MinervaType.MTimestamp =>
        to_timestamp(concat(regexp_replace(cleaned, "T", " "), lit("Z")),
          "yyyy-MM-dd HH:mm:ssXXX")
      case arr: MinervaType.MArray =>
        // COPY `{a,b,c}` / bracketed `[a,b,c]` array form — the column
        // expression mirror of MinervaType.MArray.parseArray (reference
        // datatype.py:781-862, 1005-1016). Empty braces → empty array;
        // element null tokens → null elements.
        val inner = regexp_replace(cleaned, "^[\\{\\[]|[\\}\\]]$", "")
        when(cleaned.isNull, lit(null).cast(arr.sparkType))
          .when(trim(inner) === "", array().cast(arr.sparkType))
          .otherwise(transform(split(inner, ","), e =>
            when(trim(e) === cfg.nullToken || trim(e) === "", lit(null))
              .otherwise(trim(e)).try_cast(arr.elem.sparkType)))
      // try_cast: a malformed cell yields NULL (readAudited turns it
      // into a quarantine reason) instead of ANSI-mode failing the load
      case other => cleaned.try_cast(other.sparkType)
    }
  }

  private def normalizeNames(typed: DataFrame, cfg: CsvSourceConfig): DataFrame = {
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
