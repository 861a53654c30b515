package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity aggregation (rollup along an entity hierarchy) — reference:
  * src/minerva/instance/aggregation_compilation.py:332-365 generates
  * `SELECT r.target_id AS entity_id, timestamp, count(*) AS samples,
  *  entity_agg_i("c_i")… FROM trend.part t
  *  JOIN relation."r" r ON t.entity_id = r.source_id
  *  GROUP BY timestamp, r.target_id`.
  *
  * Scale design: relation tables are edge lists (child→parent), orders of
  * magnitude smaller than trend parts — we broadcast them so the join is a
  * map-side BroadcastHashJoin and the only shuffle is the final partial+final
  * hash aggregation on (target_id, timestamp). If a relation ever exceeds
  * broadcast size (10s of millions of edges), drop the hint and let AQE pick
  * a shuffled hash join; the group-by key cardinality still bounds shuffle
  * volume. Skewed parents (a parent with millions of children) are handled
  * by the partial aggregation: map-side combine collapses per-partition
  * duplicates before the shuffle.
  */
object EntityAggregation {
  /** @param relation edge DataFrame with columns (source_id, target_id) */
  def aggregate(
      part: DataFrame,
      relation: DataFrame,
      entityCol: String,
      tsCol: String,
      aggs: Seq[Column]
  ): DataFrame = {
    part
      .join(broadcast(relation), part(entityCol) === relation("source_id"))
      .groupBy(relation("target_id").as("entity_id"), part(tsCol).as("timestamp"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
