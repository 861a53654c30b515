package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage: multi-pass blocked candidate generation for
  * Fellegi–Sunter-style matching (Fellegi & Sunter 1969, public; the
  * blocking methodology per Christen's survey, 2012).
  *
  * The scale problem linkage solves is the cross-product: comparing two
  * 10^9-row datasets directly is 10^18 pairs. Blocking replaces it with a
  * UNION of equi-joins — each pass joins on one cheap deterministic key
  * (a phonetic code, an id fragment, a geography), and a pair is a
  * candidate if ANY pass produces it. Multiple passes are the recall
  * mechanism: a record pair that disagrees on one blocking key (a typo'd
  * nation, a moved customer) still surfaces through another. Candidates
  * then get field-agreement scores (exact, edit-distance, numeric
  * proximity) and a threshold classifies — the scoring is the caller's
  * domain knowledge; this operator owns the candidate algebra.
  *
  * Scale shape: each pass is one hash equi-join (shuffle ∝ inputs, never
  * products); the union deduplicates on the id pair — at 100 TB each
  * pass's block sizes bound the pair fan-out, and a hot block (every
  * record sharing one key value) is the caller's signal to refine that
  * key, exactly as with LSH bucket caps in [[Dedup]]. */
object RecordLinkage {

  /** Candidate (leftId, rightId) pairs from the union of equi-join
    * blocking passes. `blockKeys` maps a left column to its right
    * counterpart per pass; null keys never match (SQL join semantics).
    * Pairs are distinct — a pair found by several passes counts once. */
  def blockedPairs(
      left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockKeys: Seq[(String, String)]): DataFrame = {
    require(blockKeys.nonEmpty, "blockedPairs needs at least one blocking key")
    blockKeys.map { case (lk, rk) =>
      left.select(col(leftId), col(lk).as("__bk"))
        .join(right.select(col(rightId), col(rk).as("__bk")), "__bk")
        .select(col(leftId), col(rightId))
    }.reduce(_.unionByName(_)).distinct()
  }
}
