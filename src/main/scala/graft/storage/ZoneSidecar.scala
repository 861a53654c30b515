package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-partition zone maps: `[min, max]` of selected integral columns for
  * every `pindex=` partition directory, in one tiny `_zones.tsv` sidecar
  * (`pindex \t col \t min \t max` lines; underscore prefix → invisible to
  * partition discovery).
  *
  * Why at 100 TB: `pindex` prunes on TIME, and the z-order layout skips
  * files via parquet min/max footers — but footer-based skipping still
  * LISTS and PLANS every partition directory. Real fleets have columns
  * that correlate with time without being the partition key (monotonic
  * ids, ingest sequence numbers); a zone map turns a predicate on such a
  * column into a pindex IN-list at PLANNING time — the scan never even
  * lists the skipped directories. This is the classic zone-map /
  * small-materialized-aggregate design (Moerkotte, "Small Materialized
  * Aggregates", VLDB'98 — the same structure Netezza zone maps and the
  * Delta/Iceberg per-file stats tables build on), kept at
  * partition-directory granularity so the whole sidecar is
  * O(partitions · zone columns) and readable in one driver-side open.
  *
  * Crash-safety contract (mirrors `_schema.json`): the sidecar is written
  * BEFORE partition swaps and only ever WIDENS an existing entry during
  * incremental stores, so under any crash interleaving every entry is a
  * SUPERSET of the live partition's value range — pruning with it can
  * never skip a matching row. Partitions with no entry are always read
  * (conservative), so a missing or partial sidecar degrades to a plain
  * filter, never to wrong answers.
  */
private[storage] object ZoneSidecar {
  /** zones(pindex)(col) = (min, max), both inclusive. */
  type Zones = Map[Long, Map[String, (Long, Long)]]

  private def file(dir: String) = new Path(s"$dir/_zones.tsv")

  def read(fs: FileSystem, dir: String): Option[Zones] = {
    val p = file(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val text = new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val rows = text.linesIterator.filter(_.nonEmpty).map { line =>
          val Array(pi, c, lo, hi) = line.split('\t')
          (pi.toLong, c, lo.toLong, hi.toLong)
        }.toSeq
        Some(rows.groupBy(_._1).map { case (pi, rs) =>
          pi -> rs.map(r => r._2 -> (r._3, r._4)).toMap
        })
      } catch { case _: Throwable => None } // corrupt sidecar → no pruning
      finally in.close()
    }
  }

  def write(fs: FileSystem, dir: String, zones: Zones): Unit = {
    fs.mkdirs(new Path(dir))
    val tmp = new Path(s"$dir/._zones.tsv.tmp")
    val out = fs.create(tmp, true)
    val text = zones.toSeq.sortBy(_._1).flatMap { case (pi, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, (lo, hi)) => s"$pi\t$c\t$lo\t$hi" }
    }.mkString("\n")
    out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    fs.delete(file(dir), false)
    // crash between delete and rename leaves no sidecar → no-pruning path
    fs.rename(tmp, file(dir))
  }

  /** Widen `base` with `add`: per (pindex, col) the union of ranges. */
  def widen(base: Zones, add: Zones): Zones =
    (base.keySet ++ add.keySet).map { pi =>
      val b = base.getOrElse(pi, Map.empty)
      val a = add.getOrElse(pi, Map.empty)
      pi -> (b.keySet ++ a.keySet).map { c =>
        (b.get(c), a.get(c)) match {
          case (Some((bl, bh)), Some((al, ah))) =>
            c -> (math.min(bl, al), math.max(bh, ah))
          case (Some(r), None) => c -> r
          case (None, Some(r)) => c -> r
          case _ => throw new IllegalStateException("unreachable")
        }
      }.toMap
    }.toMap

  def delete(fs: FileSystem, dir: String): Unit =
    fs.delete(file(dir), false)
}
