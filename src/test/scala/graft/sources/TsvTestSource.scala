package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A "vendor format jar" stand-in for the ServiceLoader discovery spec:
  * a tab-separated trend source provided ONLY through
  * `META-INF/services/graft.sources.TrendSource` (test resources), never
  * register()ed — exactly how a deployment drops a format jar on the
  * classpath without touching graft (reference entry-point contract,
  * harvest/plugins.py:17-48). ServiceLoader requires the public no-arg
  * constructor this class has. */
class TsvTestSource extends TrendSource {
  def name: String = "tsv-test"
  def read(spark: SparkSession, path: String): DataFrame =
    CsvTrendSource.plugin(
      CsvSourceConfig("node", Some("ts"), delimiter = "\t",
        timestampFormat = "yyyy-MM-dd HH:mm:ss"),
      pluginName = name).read(spark, path)
}
