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

  /** Union of the saved and incoming schemas: saved column order first,
    * new incoming columns appended; None when a shared column's types
    * differ (caller drops the sidecar and lets mergeSchema handle it). */
  def merged(saved: Option[StructType], incoming: StructType): Option[StructType] =
    saved match {
      case None => Some(incoming)
      case Some(s) =>
        val savedTypes = s.fields.map(f => f.name -> f.dataType).toMap
        val conflict = incoming.fields.exists(f =>
          savedTypes.get(f.name).exists(_ != f.dataType))
        if (conflict) None
        else Some(StructType(s.fields ++
          incoming.fields.filterNot(f => savedTypes.contains(f.name))))
    }
}
