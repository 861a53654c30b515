package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in QueriesCore (SURVEY §2 A-I surface) and
  * QueriesLLM (training-data pipeline operators). Every query here has a
  * DuckDB oracle unless its arithmetic is not expressible cross-engine
  * (float-accumulation ANN rerank, stubbed media decode) — those get the
  * driver's rows-only check and are covered by ScalaTest oracles instead.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full rollup chain: events → hourly time-aggregation → entity rollup
    * over a relation (the reference's materialization pipeline in one
    * plan). */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.queries("q03_rollup_chain")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesLLM.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesCore.oracleSql ++ QueriesLLM.oracleSql
}
