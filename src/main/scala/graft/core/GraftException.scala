package graft.core

/** Typed error taxonomy — the analogue of the reference's translation of
  * raw DB errors into a small exception vocabulary callers can match on
  * (src/minerva/error.py; integration_tests/storage/trend/test_error.py:19-79
  * asserts that storing to a missing table raises NoSuchTable and a
  * column/type mismatch surfaces as a typed error, not a driver crash).
  *
  * Every subtype extends IllegalArgumentException so pre-existing callers
  * (and specs) that catch the broad type keep working; the messages at the
  * retrofitted throw sites are unchanged. `TrendMigration.NonUpwardChange`
  * predates this file and stays where it is — it is the sixth member of
  * the taxonomy in spirit (the reference's FeatureNotSupported).
  */
sealed abstract class GraftException(message: String)
    extends IllegalArgumentException(message)

/** A part (or persisted index/sketch store part) that must exist doesn't —
  * the reference's NoSuchTable. */
final class NoSuchPartException(message: String) extends GraftException(message)

/** A referenced column is absent from the stored/declared schema —
  * the reference's NoSuchColumnError. */
final class NoSuchColumnException(message: String) extends GraftException(message)

/** Batch and stored/declared types conflict with no assignment cast —
  * the reference's DataTypeMismatch. */
final class TypeMismatchException(message: String) extends GraftException(message)

/** Creating a store/part that already exists — the reference's
  * DuplicateTable. */
final class DuplicateTrendStoreException(message: String)
    extends GraftException(message)

/** A second writer contended for a part's writer lease — the graft
  * analogue of the reference's serialization guarantees under concurrent
  * stores (integration_tests/storage/trend/test_store_concurrent.py:60-123:
  * racing writers must converge, never silently lose rows; on parquet the
  * read-merge-swap protocol cannot converge, so contention is refused
  * loudly instead). */
final class ConcurrentWriterException(message: String)
    extends GraftException(message)

/** The translator half of the contract: the reference wraps raw
  * psycopg2 errors with translate_postgresql_exception(s) so callers
  * match on the taxonomy, never on driver internals. The Spark analogue
  * maps engine error conditions (SparkThrowable.getCondition) onto the
  * same vocabulary; anything unrecognized passes through untouched. */
object GraftError {

  def translate(e: Throwable): Throwable = translate0(e, e, 0)

  /** Executor-side failures arrive wrapped (SparkException: "job aborted"
    * → cause: the typed error) — walk the cause chain for the first
    * recognizable condition, like the reference translator reads pgcode
    * off the root DatabaseError. */
  @annotation.tailrec
  private def translate0(original: Throwable, e: Throwable, depth: Int): Throwable =
    if (e == null || depth > 8) original
    else translateOne(e) match {
      case Some(t) => t
      case None => translate0(original, e.getCause, depth + 1)
    }

  private def translateOne(e: Throwable): Option[GraftException] = e match {
    case st: org.apache.spark.SparkThrowable =>
      val cond = Option(st.getCondition).getOrElse("")
      val msg = e.getMessage
      if (cond.startsWith("TABLE_OR_VIEW_NOT_FOUND") ||
          cond.startsWith("PATH_NOT_FOUND"))
        Some(new NoSuchPartException(msg))
      else if (cond.startsWith("UNRESOLVED_COLUMN") ||
          cond.startsWith("COLUMN_NOT_FOUND") ||
          cond.startsWith("FIELD_NOT_FOUND"))
        Some(new NoSuchColumnException(msg))
      else if (cond.startsWith("CAST_INVALID_INPUT") ||
          cond.startsWith("DATATYPE_MISMATCH"))
        Some(new TypeMismatchException(msg))
      else if (cond.startsWith("TABLE_OR_VIEW_ALREADY_EXISTS") ||
          cond.startsWith("LOCATION_ALREADY_EXISTS"))
        Some(new DuplicateTrendStoreException(msg))
      else None
    case _ => None
  }

  /** `translate_postgresql_exceptions`, the decorator form. */
  def translated[A](f: => A): A =
    try f
    catch { case scala.util.control.NonFatal(e) => throw translate(e) }
}
