package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable bounded top-k buffer: parallel primitive arrays kept sorted by
  * (score desc, id asc), capacity k. Insertion is a linear scan + shift —
  * k is single-digit in the ANN paths, so this beats any heap. */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(score: Double, id: Long): Unit = {
    // NaN never enters: all NaN comparisons are false, so a NaN admitted
    // while the buffer is non-full could never be displaced while a NaN
    // arriving at a full buffer would be rejected — top-k membership would
    // depend on partition/merge order. A NaN cosine (corrupt vector) is
    // not a candidate, like a NULL one.
    if (java.lang.Double.isNaN(score)) return
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    var pos = if (n < k) n else n - 1 // drop the current worst when full
    while (pos > 0 && better(score, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = score; ids(pos) = id
    if (n < k) n += 1
  }
}

/** Native bounded top-k aggregate: keeps the k best (score, id) pairs per
  * group, ordered (score desc, id asc) — the TypedImperativeAggregate
  * replacement for the typed-Aggregator UDAF it replaced (see git history).
  *
  * Why: the typed-Aggregator UDAF pays a per-row encoder boundary (boxing
  * the input tuple, immutable Vector appends, periodic sorts) that
  * dominated q35 (probe: ~1 s of dot products vs ~3-4 s total). This
  * aggregate reads id/score primitives straight off the InternalRow into a
  * bounded pair of primitive arrays. Same algebraic-top-k shape: map-side
  * partials collapse each partition to ≤k rows per key, shuffle volume
  * |keys|·k·|partitions|, never N×M.
  *
  * Output: array<struct<_1: double, _2: long>> — field names match the
  * tuple encoding the UDAF produced, so downstream `t._1`/`t._2`
  * projections are unchanged. NULL id/score inputs are skipped (a NULL
  * cosine means a NULL vector — not a candidate), and NaN scores likewise
  * (see TopKBuffer.insert — admitting NaN would make membership depend on
  * arrival order). */
case class TopKPairs(
    left: Expression,  // id: LongType
    right: Expression, // score: DoubleType
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression]
    with ImplicitCastInputTypes {
  require(k > 0)

  // analysis-time contract (SQL `fvec_topk` callers): id coerces to BIGINT,
  // score to DOUBLE — instead of a mid-execution ClassCastException
  override def inputTypes = Seq(LongType, DoubleType)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = left.eval(input)
    val score = right.eval(input)
    if (id != null && score != null)
      b.insert(score.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.n) { b.insert(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { rows(i) = InternalRow(b.scores(i), b.ids(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.n * 16)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new TopKBuffer(k)
    var i = 0
    // entries arrive already sorted; insert preserves order in O(n)
    while (i < n) { b.insert(buf.getDouble, buf.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("_1", DoubleType, nullable = false),
      StructField("_2", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)
}

object TopKPairs {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** `topk(id, score)` as a DataFrame aggregate Column. */
  def topk(id: Column, score: Column, k: Int): Column =
    GraftBridge.column(TopKPairs(
      GraftBridge.expression(id),
      GraftBridge.expression(score), k).toAggregateExpression())
}
