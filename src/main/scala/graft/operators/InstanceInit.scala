package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Instance, RelationDef, VirtualEntityDef}
import graft.storage.EntityDirectory

/** Instance bring-up derivatives: materialize the virtual entities and
  * relations of a loaded instance bundle (the reference's
  * `initialize_derivatives`, commands/initialize.py:150-156 —
  * `materialize_virtual_entities` then `materialize_relations`).
  *
  * Scale note: entity directories and relation edge sets are
  * dimension-sized (≤10⁷ rows), so everything here is control-plane work
  * next to the trend data; the relation queries themselves run as ordinary
  * Spark SQL and get the full optimizer.
  */
object InstanceInit {

  /** Materialize one virtual entity: run the view SELECT (must yield a
    * `name` column) and insert missing names into the directory
    * (virtual_entity.py:30-57: `INSERT INTO entity.<t> (name) SELECT name
    * FROM virtual_entity.<t> ON CONFLICT DO NOTHING`). Returns the number
    * of newly created entities. */
  def materializeVirtualEntity(
      spark: SparkSession, ve: VirtualEntityDef, dir: EntityDirectory): Long = {
    val select = ve.viewSelect.getOrElse(throw new IllegalArgumentException(
      s"virtual entity '${ve.name}' has no extractable CREATE VIEW … AS SELECT body"))
    val names = spark.sql(select).select(col("name").cast("string").as("name"))
    dir.insertMissing(ve.name, names)
  }

  /** Materialize every virtual entity of an instance; returns
    * type → new-entity count. */
  def materializeVirtualEntities(
      spark: SparkSession, inst: Instance, dir: EntityDirectory): Map[String, Long] =
    inst.virtualEntities.map(ve =>
      ve.name -> materializeVirtualEntity(spark, ve, dir)).toMap

  /** Materialize one relation: register the `entity_<type>` views for its
    * source/target types, run the query (must yield source_id, target_id),
    * and overwrite `<outBase>/<name>` (the reference's `TRUNCATE; INSERT
    * INTO relation.<name>`, commands/relation.py:50-95). Returns the edge
    * count. */
  def materializeRelation(
      spark: SparkSession, rel: RelationDef, dir: EntityDirectory,
      outBase: String): Long = {
    dir.registerViews(Seq(rel.sourceEntityType, rel.targetEntityType).distinct)
    val edges = spark.sql(rel.query)
      .select(col("source_id").cast("long"), col("target_id").cast("long"))
    // stage-then-swap is unnecessary here: relation sets are tiny and the
    // overwrite is atomic at the directory level for single-writer init
    edges.write.mode("overwrite").parquet(s"$outBase/${rel.name}")
    spark.read.parquet(s"$outBase/${rel.name}").count()
  }

  /** Materialize every relation of an instance; returns name → edge count. */
  def materializeRelations(
      spark: SparkSession, inst: Instance, dir: EntityDirectory,
      outBase: String): Map[String, Long] =
    inst.relations.map(r =>
      r.name -> materializeRelation(spark, r, dir, outBase)).toMap

  /** Read a materialized relation as an edge DataFrame. */
  def readRelation(spark: SparkSession, outBase: String, name: String): DataFrame =
    spark.read.parquet(s"$outBase/$name")
}
