package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BaseOrdering, Descending,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the (c)-rung of the custom-operator ladder: a
  * LogicalPlan node, a SparkStrategy, and a SparkPlan that executes the
  * inclusive as-of merge in ONE streaming pass per partition. Backward
  * (greatest right ts ≤ left ts) scans both sides ascending; forward
  * (smallest right ts ≥ left ts) is the SAME merge loop over the
  * reversed timestamp order (keys still ascending, ts descending), with
  * the retain predicate and tolerance gap mirrored.
  *
  * Why a physical operator when [[graft.operators.TemporalOps.asofJoin]]
  * already composes it from union + running window: the composed plan
  * materializes the null-padded union (|L|+|R| rows × combined width) and
  * carries running `last(ignoreNulls)` window state per carried column;
  * this exec sorts each side in its own width and merges with O(1) state
  * (one retained right row), no union materialization, no window
  * machinery. Semantics are identical by construction and differential-
  * tested (`AsofJoinExecSpec`) — the composed form stays as the
  * executable specification, the exec is the fast path.
  *
  * Same distribution/ordering contract as SortMergeJoin: children hash-
  * clustered on the key and sorted by (key, ts) — so EnsureRequirements
  * plans exactly one exchange + sort per side, AQE applies, and at
  * 100 TB both sides stream (nothing is buffered beyond one row).
  */
final case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    keyCols: Seq[String],
    leftTs: String,
    rightTs: String,
    tolerance: Option[Long],
    forward: Boolean = false,
    asofTsAttr: AttributeReference = AttributeReference("asof_ts", LongType)())
  extends BinaryNode {

  def rightPayload: Seq[Attribute] =
    right.output.filterNot(a => keyCols.contains(a.name) || a.name == rightTs)

  override def output: Seq[Attribute] =
    left.output ++ (asofTsAttr +: rightPayload.map(_.withNullability(true)))

  // Every child column is load-bearing (keys/ts are referenced BY NAME at
  // planning time, not as expressions) — declare them all referenced so
  // ColumnPruning cannot push a narrowing Project below this node.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for the custom node: push left-only Filters below
  * [[AsofJoin]]. Catalyst's PushPredicateThroughJoin knows nothing about
  * this operator, so without the rule `asofJoinNative(...).filter(k = 5)`
  * shuffles and merges the FULL left side before dropping rows — with
  * it, the predicate reaches the left scan (partition pruning,
  * PushedFilters) exactly as it would through a plain join. Sound
  * because the operator emits exactly one output row per left row and a
  * left-attribute predicate reads only that row's columns. Right-side
  * predicates do NOT commute (dropping right rows changes which row is
  * "latest at-or-before") and are left untouched.
  * Registered via `spark.experimental.extraOptimizations` alongside the
  * strategy. */
object AsofJoinFilterPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet => ASet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoin) =>
      val leftSet = ASet(aj.left.output)
      // deterministic only: rand()/spark_partition_id()/input_file_name()
      // have empty references (hence "subsetOf") but change meaning when
      // re-sited — same guard Catalyst's own pushdown rules apply
      val (pushable, kept) = splitConjuncts(cond)
        .partition(c => c.deterministic && c.references.subsetOf(leftSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsofJoin]] into [[AsofJoinExec]]; register via
  * `spark.experimental.extraStrategies` ([[graft.operators.TemporalOps
  * .asofJoinNative]] does it idempotently). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case aj: AsofJoin =>
      def byName(side: LogicalPlan, n: String): Attribute =
        side.output.find(_.name == n).getOrElse(
          throw new IllegalArgumentException(
            s"AsofJoin: column '$n' not found in ${side.output.map(_.name)}"))
      AsofJoinExec(
        planLater(aj.left), planLater(aj.right),
        aj.keyCols.map(byName(aj.left, _)), aj.keyCols.map(byName(aj.right, _)),
        byName(aj.left, aj.leftTs), byName(aj.right, aj.rightTs),
        aj.rightPayload, aj.tolerance, aj.forward, aj.output) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    tolerance: Option[Long],
    forward: Boolean,
    output: Seq[Attribute])
  extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // forward scans the reversed ts order: keys ascending, ts descending —
  // the merge loop is direction-blind given this ordering
  private def tsDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, tsDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, tsDir))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, tsDir)

  // rows pass through in left order, one output row per left row
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val tol = tolerance
    val fwd = forward
    val keyTypes = leftKeys.map(_.dataType)
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lOut = left.output
    val rOut = right.output
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val matchedExprs: Seq[Expression] = rTsExpr +: rightPayload
    val matchedArity = matchedExprs.length
    // identity flatten of JoinedRow(left, matched); the matched half binds
    // NULLABLE regardless of the source attributes (unmatched rows emit
    // nulls there, and a non-nullable BoundReference would skip the null
    // check and read garbage)
    val flatSchema = lOut ++ (rTsExpr +: rightPayload).map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq[Expression](lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq[Expression](rTsExpr), rOut)
      val matchProj = UnsafeProjection.create(matchedExprs, rOut)
      val resultProj = UnsafeProjection.create(flatSchema, flatSchema)
      val nullMatch = new GenericInternalRow(matchedArity)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
        // the retained best-so-far right row for rKeyCopy's key group
        private var rKeyCopy: InternalRow = null
        private var matchRow: InternalRow = null
        private var matchTs: Long = 0L

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsRow = lTsProj(l)
          if (lTsRow.isNullAt(0)) {
            // NULL left ts never matches; it consumes no right rows, so
            // its position in the sort (first asc, last desc) is inert
            joined(l, nullMatch)
          } else {
            val lTs = lTsRow.getLong(0)
            var advancing = true
            while (advancing && rCur != null) {
              val rKey = rKeyProj(rCur)
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) {
                // keys strictly below the current left key can never match
                // a future left row (left is sorted ascending) — skip
                rCur = if (rIter.hasNext) rIter.next() else null
              } else if (cmp == 0) {
                val rTsRow = rTsProj(rCur)
                // retain while the right row is on the match side of the
                // left ts in SCAN order (asc: ts <= lTs, the last retained
                // is the greatest at-or-before; desc: ts >= lTs, the last
                // retained is the smallest at-or-after); stop at the
                // first row past it — it may match a later left row
                if (rTsRow.isNullAt(0)) {
                  rCur = if (rIter.hasNext) rIter.next() else null // null ts: unusable
                } else if (if (fwd) rTsRow.getLong(0) >= lTs
                           else rTsRow.getLong(0) <= lTs) {
                  matchTs = rTsRow.getLong(0)
                  matchRow = matchProj(rCur).copy()
                  rKeyCopy = rKey.copy()
                  rCur = if (rIter.hasNext) rIter.next() else null
                } else advancing = false // past the left ts: stop, keep for later
              } else advancing = false // right is ahead on key
            }
            val usable = matchRow != null && rKeyCopy != null &&
              keyOrd.compare(rKeyCopy, lKey) == 0 &&
              tol.forall(t => (if (fwd) matchTs - lTs else lTs - matchTs) <= t)
            joined(l, if (usable) matchRow else nullMatch)
          }
          resultProj(joined)
        }
      }
    }
  }
}
