package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataPackage-shaped operations: merge, split-by-part, filters.
  *
  * A "package" in the reference is an in-flight batch of rows
  * `(entity_ref, timestamp, values…)` sharing entity type + granularity
  * (src/minerva/storage/trend/datapackage.py:40-56). In graft a package is
  * just a DataFrame with (entity, timestamp) keys — Spark partitioning
  * replaces the reference's 5000-row chunking entirely.
  */
object PackageOps {

  /** Package merge (datapackage.py:58-63,223-258): union packages with the
    * same shape key, then per-(entity, timestamp) dict-union of values —
    * *last package CARRYING a column wins for it*, exactly like the
    * reference's `dict.update()`: a carried NULL overwrites (a counter can
    * be cleared), while a package that doesn't have the column at all
    * leaves it untouched.
    *
    * Spark-first: `unionByName(allowMissingColumns)` + one hash aggregation
    * with `max_by(col, seq gated on carrier packages)`: rows from packages
    * that don't carry the column get a NULL ordering expr, which max_by
    * ignores — so only carriers compete, and among carriers the greatest
    * `seqCol` wins value-NULLs included. Single shuffle; map-side partials
    * apply.
    *
    * @param pkgs   packages in arrival order
    * @param seqCol a column (present in all packages) that orders rows;
    *               must be monotone in package arrival order when packages
    *               overlap on a column (the reference's job-id semantics)
    */
  def mergePackages(
      pkgs: Seq[DataFrame],
      keyCols: Seq[String],
      seqCol: String
  ): DataFrame = {
    val tagged = pkgs.zipWithIndex.map { case (df, i) =>
      df.withColumn("__pkg", lit(i))
    }
    val unioned = tagged.reduce(_.unionByName(_, allowMissingColumns = true))
    val valueCols =
      unioned.columns.filterNot(c => keyCols.contains(c) || c == seqCol || c == "__pkg")
    val aggs = valueCols.map { c =>
      val carriers = pkgs.zipWithIndex
        .collect { case (df, i) if df.columns.contains(c) => i }
      expr(s"max_by(`$c`, CASE WHEN `__pkg` IN (${carriers.mkString(",")}) " +
        s"THEN `$seqCol` END)").as(c)
    }
    unioned
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** Split one package per trend-store part: each part owns a subset of the
    * trend columns (datapackage.py:107-140; trendstore.py:240-250). One scan
    * feeds N projections — Catalyst prunes columns per branch, so each part
    * write reads only its own columns. */
  def splitByPart(
      df: DataFrame,
      keyCols: Seq[String],
      partColumns: Map[String, Seq[String]]
  ): Map[String, DataFrame] =
    partColumns.map { case (part, cols) =>
      val have = cols.filter(df.columns.contains)
      part -> df.select((keyCols ++ have).map(col): _*)
    }

  /** Row + column filter on load (loader.py:161-194: entity regex filter,
    * trend name filter; commands/load_data.py:57-60 `--dn-filter`). */
  def filterPackage(
      df: DataFrame,
      entityCol: String,
      entityRegex: Option[String],
      trendFilter: Option[String => Boolean],
      keyCols: Seq[String]
  ): DataFrame = {
    val rows = entityRegex.fold(df)(re => df.filter(col(entityCol).rlike(re)))
    trendFilter.fold(rows) { keep =>
      val cols = keyCols ++ rows.columns.filterNot(keyCols.contains).filter(keep)
      rows.select(cols.map(col): _*)
    }
  }

  /** Existing-trend filter (engine.py:59-73): drop columns unknown to the
    * target store before writing. */
  def restrictToStore(df: DataFrame, keyCols: Seq[String], storeCols: Set[String]): DataFrame =
    df.select((keyCols ++ df.columns.filterNot(keyCols.contains).filter(storeCols)).map(col): _*)
}
