package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The attribute-side twin of [[TsvTestSource]]: a vendor-format stand-in
  * provided ONLY through `META-INF/services/graft.sources.AttributeSource`
  * (test resources), never register()ed — proving a deployment can drop an
  * attribute-format jar on the classpath without touching graft (reference
  * contract: harvest/plugin_api_attribute.py:1-37 discovered through the
  * same entry-point group as the trend plugins, harvest/plugins.py:17-48).
  * ServiceLoader requires the public no-arg constructor this class has. */
class TsvTestAttributeSource extends AttributeSource {
  def name: String = "tsv-attr-test"
  def read(spark: SparkSession, path: String): DataFrame =
    CsvAttributeSource.plugin(
      CsvSourceConfig("node", Some("ts"), delimiter = "\t",
        timestampFormat = "yyyy-MM-dd HH:mm:ss"),
      pluginName = name).read(spark, path)
}
