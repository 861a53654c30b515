package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable bounded set of the k smallest DISTINCT longs, kept sorted
  * ascending in a primitive array. Distinctness is part of the contract —
  * the KMV estimator needs the k minimum *values* of the hashed set, and a
  * repeated hash (same element seen again) must not occupy two slots. */
final class MinKBuffer(val k: Int) {
  var n: Int = 0
  val vals = new Array[Long](k)

  def insert(v: Long): Unit = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vals(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < n && vals(lo) == v) return // duplicate value
    if (n == k && lo == k) return       // larger than the current max, full
    var i = if (n < k) n else k - 1
    while (i > lo) { vals(i) = vals(i - 1); i -= 1 }
    vals(lo) = v
    if (n < k) n += 1
  }
}

/** KMV (k-minimum-values) sketch aggregate: the k smallest distinct values
  * of a hashed column per group, as a sorted array<bigint>.
  *
  * The classic bounded-memory distinct-count estimator (Bar-Yossef et al.
  * 2002, public): with U = the k-th minimum normalized into (0, 1),
  * distinct ≈ (k−1)/U. Unlike HLL-family sketches (Spark's
  * approx_count_distinct), the result is a pure function of the input SET —
  * deterministic, engine-portable, oracle-checkable — and sketches merge by
  * unioning minima, so map-side partials carry ≤k longs per group and the
  * shuffle is |groups|·k regardless of corpus size. The estimator itself is
  * derived from the array by the caller (one division) so the sketch can
  * also be persisted and merged incrementally across ingest batches. */
case class MinKLongs(
    child: Expression, // hashed value: LongType
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKBuffer] with UnaryLike[Expression]
    with ImplicitCastInputTypes {
  require(k > 1, "KMV needs k > 1 (the estimator divides by k-1)")

  // analysis-time contract (SQL `kmv_mink` callers): the value column must
  // be (coercible to) BIGINT — without this, an INT column would pass
  // analysis and die mid-execution on the asInstanceOf[Long]
  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(b: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MinKBuffer, o: MinKBuffer): MinKBuffer = {
    var i = 0
    while (i < o.n) { b.insert(o.vals(i)); i += 1 }
    b
  }

  override def eval(b: MinKBuffer): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { out(i) = b.vals(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: MinKBuffer): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.n * 8)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putLong(b.vals(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new MinKBuffer(k)
    var i = 0
    while (i < n) { b.insert(buf.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKLongs =
    copy(child = newChild)
}

object MinKLongs {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** `mink(value, k)` as a DataFrame aggregate Column. */
  def mink(value: Column, k: Int): Column =
    GraftBridge.column(MinKLongs(
      GraftBridge.expression(value), k).toAggregateExpression())
}
