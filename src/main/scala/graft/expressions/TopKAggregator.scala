package graft.expressions

import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (score, id) pairs, ordered by
  * (score desc, id asc).
  *
  * Why: `row_number().over(Window.partitionBy(query))` shuffles and sorts
  * EVERY candidate row (N×M for a similarity join) to keep k of them. An
  * algebraic top-k aggregate is bounded: map-side partial aggregation
  * collapses each partition to ≤k rows per key before the exchange, so
  * shuffle volume is |keys|·k·|partitions| instead of N×M. Same reasoning
  * as the reference's LIMIT-ed materialization batches (F2) applied to the
  * similarity path.
  *
  * Determinism: selection and ordering use exact comparisons on
  * (score desc, id asc) — results are identical to the window formulation
  * (verified row-for-row by the DuckDB oracle on q35).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  private def ordered(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sortBy(p => (-p._1, p._2)).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val appended = b :+ (in._2, in._1)
    // trim lazily: keep the buffer small without sorting every row
    if (appended.size >= 4 * k) ordered(appended) else appended
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    ordered(a ++ b)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = ordered(b)

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
