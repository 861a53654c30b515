package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relation (entity-edge) operations: materialization and cardinality
  * contracts (reference: src/minerva/commands/relation.py:50-95;
  * cardinality types one-to-one / one-to-many / many-to-one in
  * src/minerva/directory/relationtype.py:8-31,67-88).
  *
  * A relation is an edge DataFrame (source_id, target_id) materialized from
  * a query; cardinality is a declared contract we can validate with one
  * aggregation per side (no joins).
  */
object RelationOps {
  sealed trait Cardinality
  case object OneToOne extends Cardinality
  case object OneToMany extends Cardinality  // one source → many targets
  case object ManyToOne extends Cardinality  // many sources → one target

  /** Materialize a relation from a SQL query (`TRUNCATE; INSERT INTO …` in
    * the reference = overwrite here). */
  def materialize(spark: org.apache.spark.sql.SparkSession, query: String): DataFrame =
    spark.sql(query)

  /** Edges violating the declared cardinality. Empty ⇒ contract holds.
    * For OneToOne both sides must be unique; OneToMany requires unique
    * targets (each target has one source); ManyToOne requires unique
    * sources. */
  def violations(rel: DataFrame, cardinality: Cardinality): DataFrame = {
    def dupsOn(c: String) = rel.groupBy(col(c)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).withColumn("violated_key", col(c))
      .select(col("violated_key").cast("long"), col("n"))
    cardinality match {
      case ManyToOne => dupsOn("source_id")
      case OneToMany => dupsOn("target_id")
      case OneToOne => dupsOn("source_id").unionByName(dupsOn("target_id")).distinct()
    }
  }
}
