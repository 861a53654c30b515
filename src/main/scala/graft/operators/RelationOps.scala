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

  /** Build the child→parent relation from entity distinguished names: an
    * entity's parent is the entity whose dn equals the child's dn minus its
    * last part (the reference derives hierarchy relations from DNs —
    * directory/distinguishedname.py + relation materialized queries,
    * commands/relation.py:50-95). Entities = (id, dn); roots (single-part
    * DNs) have no edge. Equi-join on the parent dn string, escape-aware. */
  def fromDnHierarchy(entities: DataFrame): DataFrame = {
    import graft.core.DistinguishedName
    val parents = entities.select(col("dn").as("__parent_dn"), col("id").as("target_id"))
    entities
      .select(col("id").as("source_id"),
        DistinguishedName.parentDnCol(col("dn")).as("__parent_dn"))
      .filter(col("__parent_dn").isNotNull)
      .join(parents, Seq("__parent_dn"))
      .select("source_id", "target_id")
  }

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
