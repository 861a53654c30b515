package graft.sources

import graft.core.MinervaType
import org.apache.spark.sql.{DataFrame, SparkSession}
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

object CsvTrendSource {

  /** Deduce per-column Minerva types from a sample of the file
    * (A4, harvest/trend_config_deducer.py:9-47): read as all-string, fold
    * the lattice over a driver-side sample. At scale, deduction reads only
    * `sampleRows` rows — schema work never scans the full input. */
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

  /** Read and normalize: typed columns per the (declared or deduced)
    * schema, null tokens applied, identifier column renamed to `entity`,
    * timestamp column parsed to epoch seconds (or the configured fixed
    * timestamp — the reference's "current timestamp" provider,
    * csv/parser.py:125-146). */
  def read(
      spark: SparkSession, path: String, cfg: CsvSourceConfig,
      schema: Seq[(String, MinervaType)]): DataFrame = {
    val structFields = schema.map { case (c, _) => StructField(c, StringType) }
    val raw = spark.read
      .option("header", "true").option("delimiter", cfg.delimiter)
      .schema(StructType(structFields))
      .csv(path)
    val typed = schema.foldLeft(raw) { case (df, (c, t)) =>
      val cleaned = when(col(c) === cfg.nullToken || col(c) === "", lit(null))
        .otherwise(col(c))
      val castCol =
        if (Some(c) == cfg.timestampColumn)
          to_timestamp(cleaned, cfg.timestampFormat).cast("long")
        else t match {
          case MinervaType.MTimestamp => to_timestamp(regexp_replace(cleaned, "T", " "))
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
                  .otherwise(trim(e)).cast(arr.elem.sparkType)))
          case other => cleaned.cast(other.sparkType)
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
