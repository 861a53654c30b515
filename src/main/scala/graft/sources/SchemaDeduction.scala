package graft.sources

import graft.core.MinervaType
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Format-agnostic distributed schema deduction: the Minerva type-lattice
  * fold (reference datatype.py:960-975) as ONE map-side-combined aggregate
  * over an all-string DataFrame. Each value classifies to its lattice rank
  * via `try_cast` expressions (codegen'd, no UDF); `max(rank)` per column
  * is the deduced type. Both the CSV and JSON harvest sources fold through
  * this — a drop of the same data deduces the same trend-store schema
  * regardless of format, which is the deducer-API property the reference
  * promises across its format plugins (harvest/trend_config_deducer.py).
  */
private[sources] object SchemaDeduction {

  /** Lattice rank of one string column value; `nullToken` is the
    * format's explicit null spelling ("" for formats with native nulls). */
  def rankOf(c: String, nullToken: String): Column = {
    val v = s"`${c.replace("`", "``")}`" // backtick-escape the identifier
    val nullTok = nullToken.replace("\\", "\\\\").replace("'", "''")
    expr(
      s"""CASE
          WHEN $v IS NULL OR $v = '$nullTok' OR $v = '' THEN 0
          -- fast text path: every numeric form (after the cast's
          -- leading-byte trim, which skips ALL bytes <= 0x20, wider than
          -- regex \\s) starts with sign/digit/dot or NaN/Infinity, and
          -- both timestamp formats start with a digit — anything else is
          -- rank-7 text after ONE regex instead of eight parse attempts
          -- (this dominates deduction cost on string columns)
          WHEN NOT ($v RLIKE '^[\\\\x00-\\\\x20]*[+\\\\-.0-9nNiI]') THEN 7
          -- fast timestamp path: a shape-matching value that parses is
          -- rank 6 in the original chain too (the '-'/':' characters make
          -- every numeric try_cast fail), so testing it first is
          -- equivalent — and saves the six numeric attempts per value
          WHEN $v RLIKE '^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}$$'
            AND (try_to_timestamp($v, 'yyyy-MM-dd HH:mm:ss') IS NOT NULL
              OR try_to_timestamp($v, "yyyy-MM-dd'T'HH:mm:ss") IS NOT NULL) THEN 6
          WHEN try_cast($v AS SMALLINT) IS NOT NULL AND NOT contains($v, '.')
            AND NOT contains($v, 'e') AND NOT contains($v, 'E') THEN 0
          WHEN try_cast($v AS INT) IS NOT NULL AND NOT contains($v, '.')
            AND NOT contains($v, 'e') AND NOT contains($v, 'E') THEN 1
          WHEN try_cast($v AS BIGINT) IS NOT NULL AND NOT contains($v, '.')
            AND NOT contains($v, 'e') AND NOT contains($v, 'E') THEN 2
          WHEN try_cast($v AS FLOAT) IS NOT NULL
            AND NOT contains(lower($v), 'x') THEN 3
          WHEN try_cast($v AS DOUBLE) IS NOT NULL
            AND NOT contains(lower($v), 'x') THEN 4
          WHEN try_cast($v AS DECIMAL(38,18)) IS NOT NULL THEN 5
          WHEN try_to_timestamp($v, 'yyyy-MM-dd HH:mm:ss') IS NOT NULL
            OR try_to_timestamp($v, "yyyy-MM-dd'T'HH:mm:ss") IS NOT NULL THEN 6
          ELSE 7
        END""")
  }

  /** One aggregate pass over an all-string frame → per-column lattice
    * type. Header-only/empty input deduces the lattice bottom. */
  def deduceFromRaw(
      raw: DataFrame, nullToken: String): Seq[(String, MinervaType)] = {
    val cols = raw.columns.toSeq
    val row = raw
      .agg(max(rankOf(cols.head, nullToken)).as("c0"),
        cols.tail.zipWithIndex.map { case (c, i) =>
          max(rankOf(c, nullToken)).as(s"c${i + 1}")
        }: _*)
      .head()
    cols.zipWithIndex.map { case (c, i) =>
      c -> (if (row.isNullAt(i)) MinervaType.MSmallInt
            else MinervaType.TypeOrder(row.getInt(i)))
    }
  }
}
