package graft.sources

import graft.core.MinervaType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Attribute-side harvest plugin contract (reference:
  * src/minerva/harvest/plugin_api_attribute.py:1-37 —
  * `HarvestParserAttribute.load_packages(stream, name)` yielding attribute
  * DataPackages, mirroring the trend-side `plugin_api_trend.py`). graft's
  * analogue of [[TrendSource]] for the attribute path: `read` yields the
  * normalized attribute package DataFrame (entity, timestamp, attrs…) ready
  * for entity resolution and an [[graft.storage.AttributeStore]] staged
  * transfer. One trait per storage side, exactly the reference's split —
  * a vendor format jar can ship either or both. */
trait AttributeSource {
  def name: String
  def read(spark: SparkSession, path: String): DataFrame
}

/** Attribute-plugin registry, the twin of [[TrendSources]] (reference
  * discovery: pkg_resources entry points in harvest/plugins.py:9,17-48 —
  * the same mechanism serves both plugin APIs there, so both graft
  * registries share the discovery convention): static [[register]] wins
  * over classpath drop-ins listed in
  * `META-INF/services/graft.sources.AttributeSource`. */
object AttributeSources {
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, AttributeSource]

  def register(source: AttributeSource): Unit =
    registry.put(source.name, source)
  def get(name: String): Option[AttributeSource] =
    registry.get(name).orElse(discovered.get(name))
  def names: Seq[String] =
    (registry.keys ++ discovered.keys).toSeq.distinct.sorted

  /** ServiceLoader sweep, loaded once on first use; an unloadable
    * provider is skipped loudly instead of poisoning the registry
    * (same contract as [[TrendSources.discovered]]). */
  lazy val discovered: Map[String, AttributeSource] = {
    val it = java.util.ServiceLoader.load(classOf[AttributeSource]).iterator()
    val found = Map.newBuilder[String, AttributeSource]
    while (it.hasNext) {
      try { val s = it.next(); found += s.name -> s }
      catch {
        case e: java.util.ServiceConfigurationError =>
          System.err.println(s"skipping unloadable AttributeSource provider: $e")
      }
    }
    found.result()
  }

  register(CsvAttributeSource.plugin(CsvSourceConfig("entity", Some("timestamp"))))
}

/** Built-in CSV attribute source: the same deduce-then-read chain the
  * trend-side CSV plugin uses (the reference's CSV parser serves both
  * plugin APIs — loading/csv/parser.py), packaged under the attribute
  * contract so `harvest-attributes csv …` and vendor drop-ins route
  * through one code path. */
object CsvAttributeSource {
  def plugin(cfg: CsvSourceConfig, pluginName: String = "csv"): AttributeSource =
    new AttributeSource {
      def name: String = pluginName
      def read(spark: SparkSession, path: String): DataFrame = {
        val schema = CsvTrendSource.deduceSchemaDistributed(spark, path, cfg).map {
          case (c, _) if cfg.timestampColumn.contains(c) =>
            c -> (MinervaType.MTimestamp: MinervaType)
          case (c, t) => c -> t
        }
        CsvTrendSource.read(spark, path, cfg, schema)
      }
    }
}
