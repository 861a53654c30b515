package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.{DataType, StructType}

/** `_schema.json` sidecar shared by the parquet-backed stores: scan
  * planning declares the stored schema instead of merging every file
  * footer (`mergeSchema=true` is O(files) driver work — the planning
  * bottleneck at 100 TB).
  *
  * Contract: the sidecar is written BEFORE the data it describes lands and
  * is always a SUPERSET of any file in the directory (column union, types
  * equal or wider) — Spark's parquet reader fills missing columns with
  * NULL and upcasts narrower files, so any crash interleaving still reads
  * correctly. A missing or corrupt sidecar means "fall back to
  * mergeSchema". */
private[storage] object SchemaSidecar {
  private def file(dir: String) = new Path(s"$dir/_schema.json")

  def read(fs: FileSystem, dir: String): Option[StructType] = {
    val p = file(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(DataType.fromJson(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType])
      catch { case _: Throwable => None }
      finally in.close()
    }
  }

  def write(fs: FileSystem, dir: String, schema: StructType): Unit = {
    fs.mkdirs(new Path(dir))
    val tmp = new Path(s"$dir/._schema.json.tmp")
    val out = fs.create(tmp, true)
    out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    fs.delete(file(dir), false)
    // crash between delete and rename leaves no sidecar → fallback path
    fs.rename(tmp, file(dir))
  }

  def delete(fs: FileSystem, dir: String): Unit =
    fs.delete(file(dir), false)

  /** Numeric widening ladders for append-only evolution: the sidecar takes
    * the WIDER type and stays a superset (narrower files upcast on read —
    * no rewrite needed). Integral and floating ladders are SEPARATE:
    * integral→floating (e.g. long + float) is NOT widening — it loses
    * precision AND Spark's parquet reader cannot read INT64 footers under a
    * declared FloatType, so such a sidecar would poison every read. That
    * conflict refuses the batch instead. */
  private val intOrder: Seq[DataType] = {
    import org.apache.spark.sql.types._
    Seq(ShortType, IntegerType, LongType)
  }
  private val floatOrder: Seq[DataType] = {
    import org.apache.spark.sql.types._
    Seq(FloatType, DoubleType)
  }

  private def widen(a: DataType, b: DataType): Option[DataType] =
    if (a == b) Some(a)
    else Seq(intOrder, floatOrder).collectFirst {
      case ladder if ladder.indexOf(a) >= 0 && ladder.indexOf(b) >= 0 =>
        ladder(math.max(ladder.indexOf(a), ladder.indexOf(b)))
    }

  /** Union of the saved and incoming schemas: saved column order first
    * (shared numeric columns widened), new incoming columns appended; None
    * when a shared column's types genuinely conflict — the caller must NOT
    * append such a batch (mixed un-widenable footers poison every
    * subsequent mergeSchema read). */
  def merged(saved: Option[StructType], incoming: StructType): Option[StructType] =
    saved match {
      case None => Some(incoming)
      case Some(s) =>
        val incomingTypes = incoming.fields.map(f => f.name -> f.dataType).toMap
        val savedNames = s.fields.map(_.name).toSet
        var conflict = false
        val mergedShared = s.fields.map { f =>
          incomingTypes.get(f.name) match {
            case None => f
            case Some(t) => widen(f.dataType, t) match {
              case Some(w) => f.copy(dataType = w)
              case None => conflict = true; f
            }
          }
        }
        if (conflict) None
        else Some(StructType(mergedShared ++
          incoming.fields.filterNot(f => savedNames.contains(f.name))))
    }
}
