package graft.storage

import graft.model.TrendStorePart
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema migration: reconcile an edited trend-store definition against a
  * live, populated part (reference `trend-store add-trends /
  * remove-trends / alter-trends / change`,
  * src/minerva/commands/trend_store.py:99-260,381-530; column add at
  * trendstorepart.py:141-167, type change at 351-374).
  *
  * The reference issues ALTER TABLE against PostgreSQL; the Spark-first
  * re-expression leans on parquet read-time schema evolution instead:
  *
  *   - **add**: metadata-only. The new column lands in the `_schema.json`
  *     sidecar; every existing footer lacks it, so reads surface typed
  *     NULLs — the exact backfill ALTER TABLE ADD COLUMN gives, at O(1).
  *   - **remove**: metadata-only. The sidecar drops the column; scans no
  *     longer project it (bytes linger in old footers until a partition is
  *     naturally rewritten by a later merge — Delta-style column drop).
  *   - **alter, in-ladder widening** (smallint→integer→bigint,
  *     real→double): metadata-only. Spark's vectorized parquet reader
  *     upcasts narrower footers under the wider declared type.
  *   - **alter, cross-ladder widening** (e.g. integer→double precision,
  *     anything→text): a parquet footer cannot be re-declared across
  *     ladders, so the part is rewritten once through the staged
  *     partition swap with an explicit cast — the same table rewrite
  *     PostgreSQL performs for ALTER TYPE.
  *   - **alter, narrowing**: refused unless `force` (the reference's weak
  *     `change_trend_data_upward` raises FeatureNotSupported; `--force`
  *     selects `change_all_trend_data`); with force, a cast rewrite.
  *
  * At 100 TB the common migrations (add a counter, widen a counter that
  * overflowed, retire a counter) are all metadata-only — no data pass at
  * all. Only cross-ladder/forced changes pay a rewrite, and that rewrite
  * is a single distributed cast-and-swap, never a driver-side loop.
  */
object TrendMigration {

  /** Engine-owned columns a migration must never add, drop, or retype. */
  val MetaColumns: Set[String] =
    Set("entity_id", "timestamp", "modified", "created", "job_id", "pindex")

  final case class TypeChange(
      trend: String,
      from: DataType,
      to: DataType,
      upward: Boolean,
      sidecarOnly: Boolean
  )

  final case class PartDiff(
      part: String,
      added: Seq[StructField],
      removed: Seq[String],
      changed: Seq[TypeChange]
  ) {
    def isEmpty: Boolean = added.isEmpty && removed.isEmpty && changed.isEmpty
  }

  final case class MigrationResult(
      part: String,
      added: Seq[String],
      removed: Seq[String],
      changed: Seq[String],
      rewrote: Boolean
  )

  /** Raised on a non-upward alter without --force — mirrors the shape of
    * the reference's FeatureNotSupported from change_trend_data_upward. */
  final class NonUpwardChange(changes: Seq[TypeChange])
      extends RuntimeException(
        changes.map(c =>
          s"cannot automatically change trend '${c.trend}' from " +
            s"${c.from.simpleString} to ${c.to.simpleString}: not an upward " +
            "change (pass --force to change anyway)").mkString("; "))

  // Minerva widening lattice ranks (datatype.py:908-917) on Spark types.
  private def rank(dt: DataType): Int = dt match {
    case ShortType => 0
    case IntegerType => 1
    case LongType => 2
    case FloatType => 3
    case DoubleType => 4
    case _: DecimalType => 5
    case TimestampNTZType => 6 // naive `timestamp` — the TYPE_ORDER member
    case TimestampType => 6 // `timestamp with time zone`, same rung
    case StringType => 7
    case _ => -1 // boolean / arrays: only identity is "upward"
  }

  /** Parquet read-time upcast ladders: within one of these a type change
    * needs no data rewrite (the vectorized reader promotes footers). */
  private def parquetUpcast(from: DataType, to: DataType): Boolean = {
    val intLadder = Seq[DataType](ShortType, IntegerType, LongType)
    val floatLadder = Seq[DataType](FloatType, DoubleType)
    Seq(intLadder, floatLadder).exists { l =>
      val (i, j) = (l.indexOf(from), l.indexOf(to))
      i >= 0 && j >= 0 && i <= j
    }
  }

  /** Diff a declared part against its stored sidecar. None = part has no
    * stored state yet (nothing to migrate). Generated trends are read-time
    * expressions here, never physical columns, so they don't participate. */
  def diff(store: PartStore, part: TrendStorePart): Option[PartDiff] = {
    val shadowing = part.trends.map(_.name).filter(MetaColumns.contains)
    require(shadowing.isEmpty,
      s"trend name(s) ${shadowing.mkString(", ")} shadow engine meta " +
        "columns — a migration would write duplicate sidecar fields and " +
        "poison every later read")
    store.sidecarSchema(part.name).map { sc =>
      val declared = part.trends.map(t => t.name -> t.dataType.sparkType)
      val declaredMap = declared.toMap
      val existing = sc.fields.filterNot(f => MetaColumns.contains(f.name))
      val existingNames = existing.map(_.name).toSet
      val added = declared.collect {
        case (n, dt) if !existingNames.contains(n) => StructField(n, dt)
      }
      val removed = existing.map(_.name).toSeq.filterNot(declaredMap.contains)
      val changed = existing.toSeq.flatMap { f =>
        declaredMap.get(f.name) match {
          case Some(to) if to != f.dataType =>
            Some(TypeChange(f.name, f.dataType, to,
              upward = rank(to) > rank(f.dataType) && rank(f.dataType) >= 0,
              sidecarOnly = parquetUpcast(f.dataType, to)))
          case _ => None
        }
      }
      PartDiff(part.name, added, removed, changed)
    }
  }

  /** `add-trends`: append declared-but-missing trends to the sidecar.
    * Returns the added names (reference add_trends_to_trend_store). */
  def addTrends(store: PartStore, part: TrendStorePart): Seq[String] =
    diff(store, part).toSeq.flatMap { d =>
      if (d.added.nonEmpty) applySidecar(store, part.name, addCols = d.added)
      d.added.map(_.name)
    }

  /** `remove-trends`: drop stored trends the definition no longer
    * declares (reference remove_trends_from_trend_store — explicit
    * command, never implicit at load). Metadata-only by default; `purge`
    * rewrites the part to physically drop the bytes — needed only before
    * RE-adding a removed trend under a different type (old footers would
    * otherwise still carry the old physical type). */
  def removeTrends(store: PartStore, part: TrendStorePart, purge: Boolean = false): Seq[String] =
    diff(store, part).toSeq.flatMap { d =>
      if (d.removed.nonEmpty) {
        if (purge) store.rewritePart(part.name, _.drop(d.removed: _*))
        else applySidecar(store, part.name, dropCols = d.removed.toSet)
      }
      d.removed
    }

  /** `alter-trends`: apply declared type changes. Upward in-ladder changes
    * are sidecar-only; cross-ladder (or, with force, narrowing) changes
    * rewrite the part once with explicit casts. Throws [[NonUpwardChange]]
    * on narrowing without force. */
  def alterTrends(store: PartStore, part: TrendStorePart, force: Boolean): Seq[String] = {
    val d = diff(store, part).getOrElse(return Seq.empty)
    applyChanges(store, part.name, d.changed, force)
  }

  /** `change`: one-shot reconciliation — add + remove + alter per part
    * (reference change_trend_store_part_weak/_strong). A part with no
    * stored state gets a fresh sidecar of the declared schema
    * (get_or_create_trend_store_part). */
  def changePart(store: PartStore, part: TrendStorePart, force: Boolean): MigrationResult = {
    diff(store, part) match {
      case None =>
        val meta = Seq(
          StructField("entity_id", LongType),
          StructField("timestamp", LongType),
          StructField("modified", LongType),
          StructField("created", LongType))
        val trendFields = part.trends.map(t => StructField(t.name, t.dataType.sparkType))
        // pindex last: the partition column every read/merge plans against
        store.setSidecar(part.name,
          StructType(meta ++ trendFields :+ StructField("pindex", LongType)))
        MigrationResult(part.name, part.trends.map(_.name), Seq.empty, Seq.empty, rewrote = false)
      case Some(d) =>
        val changed = applyChanges(store, part.name, d.changed, force,
          addCols = d.added, dropCols = d.removed.toSet)
        MigrationResult(part.name, d.added.map(_.name), d.removed, changed,
          rewrote = d.changed.exists(c => !c.sidecarOnly))
    }
  }

  /** Shared alter path: validates upwardness, then applies either a
    * metadata-only sidecar update or one cast rewrite covering every
    * change (plus any adds/drops riding along from `change`). */
  private def applyChanges(
      store: PartStore,
      partName: String,
      changes: Seq[TypeChange],
      force: Boolean,
      addCols: Seq[StructField] = Seq.empty,
      dropCols: Set[String] = Set.empty
  ): Seq[String] = {
    val nonUpward = changes.filterNot(_.upward)
    if (nonUpward.nonEmpty && !force) throw new NonUpwardChange(nonUpward)
    val needRewrite = changes.exists(c => !c.sidecarOnly)
    if (changes.isEmpty && addCols.isEmpty && dropCols.isEmpty) return Seq.empty
    if (!needRewrite)
      applySidecar(store, partName, changes, addCols, dropCols)
    else {
      val castTo = changes.map(c => c.trend -> c.to).toMap
      store.rewritePart(partName, { df =>
        val casted = castTo.foldLeft(df) { case (d, (c, t)) =>
          d.withColumn(c, col(c).cast(t))
        }
        val dropped = if (dropCols.isEmpty) casted else casted.drop(dropCols.toSeq: _*)
        addCols.foldLeft(dropped)((d, f) =>
          d.withColumn(f.name, lit(null).cast(f.dataType)))
      })
    }
    changes.map(_.trend)
  }

  /** Metadata-only sidecar edit: retype/add/drop columns, keeping stored
    * column order (pindex stays last — it is the partition column). */
  private def applySidecar(
      store: PartStore,
      partName: String,
      changes: Seq[TypeChange] = Seq.empty,
      addCols: Seq[StructField] = Seq.empty,
      dropCols: Set[String] = Set.empty
  ): Unit = {
    val sc = store.sidecarSchema(partName).getOrElse(return)
    val castTo = changes.map(c => c.trend -> c.to).toMap
    val retyped = sc.fields
      .filterNot(f => dropCols.contains(f.name))
      .map(f => castTo.get(f.name).fold(f)(t => f.copy(dataType = t)))
    val (pindex, rest) = retyped.partition(_.name == "pindex")
    store.setSidecar(partName, StructType(rest ++ addCols ++ pindex))
  }
}
