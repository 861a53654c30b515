package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distinguished-name utilities (reference:
  * src/minerva/directory/distinguishedname.py:12-54).
  *
  * A DN is `type1=name1,type2=name2,...` — the reference uses it to encode
  * entity hierarchies (e.g. `network=G04,node=A001,cell=A001.3`). Commas
  * inside a name part are escaped as `\,`; `split_parts` honours the escape
  * via a negative-lookbehind split, `escape` produces it.
  *
  * Two API layers:
  *  - plain Scala (driver-side config parsing, specs) mirroring the
  *    reference functions 1:1;
  *  - Column expressions for distributed use over DN columns — all
  *    built-in regex/string functions (codegen'd, no UDFs).
  */
object DistinguishedName {

  private val ExplodeRegex = "([^,]+)=([^,]+)".r

  /** (type, name) pairs of a DN (distinguishedname.py:12 `explode`).
    * NOTE: mirrors the reference exactly — the regex is not escape-aware
    * (the reference's `explode` isn't either); use `splitParts` when parts
    * may contain escaped commas. */
  def explode(dn: String): Seq[(String, String)] =
    ExplodeRegex.findAllMatchIn(dn).map(m => (m.group(1), m.group(2))).toSeq

  /** Inverse of explode (distinguishedname.py:16 `implode`). */
  def implode(parts: Seq[(String, String)]): String =
    parts.map { case (t, n) => s"$t=$n" }.mkString(",")

  /** Escape-aware part split (distinguishedname.py:23 `split_parts`):
    * splits on commas NOT preceded by a backslash. */
  def splitParts(dn: String): Seq[String] =
    dn.split("(?<!\\\\),", -1).toSeq

  /** Escape reserved characters in a name part (distinguishedname.py:30). */
  def escape(part: String): String = part.replace(",", "\\,")

  /** Inverse of escape. */
  def unescape(part: String): String = part.replace("\\,", ",")

  /** Entity-type name = type of the LAST component
    * (distinguishedname.py:37 `entity_type_name_from_dn`). */
  def entityTypeName(dn: String): String = {
    val parts = explode(dn)
    require(parts.nonEmpty, s"invalid distinguished name: '$dn'")
    parts.last._1
  }

  // ---- Column layer (distributed; Spark regex = Java regex, so the
  // lookbehind split works unchanged) ----

  /** Array of escape-aware parts of a DN column. */
  def splitPartsCol(dn: Column): Column = split(dn, "(?<!\\\\),")

  /** Array of `type` components (escape-aware). */
  def partTypesCol(dn: Column): Column =
    transform(splitPartsCol(dn), p => regexp_extract(p, "^([^=]+)=", 1))

  /** Array of unescaped `name` components (escape-aware). */
  def partNamesCol(dn: Column): Column =
    transform(splitPartsCol(dn),
      p => regexp_replace(regexp_extract(p, "^[^=]+=(.*)$", 1), "\\\\,", ","))

  /** Entity-type name of a DN column (type of last part). */
  def entityTypeNameCol(dn: Column): Column =
    element_at(partTypesCol(dn), -1)

  /** Name (unescaped) of the last part — the entity's own name. */
  def entityNameCol(dn: Column): Column =
    element_at(partNamesCol(dn), -1)

  /** Escape a name-part column. */
  def escapeCol(part: Column): Column =
    regexp_replace(part, ",", "\\\\,")

  /** Parent DN (all parts but the last), null for a single-part DN —
    * drives hierarchy relations built from DNs. */
  def parentDnCol(dn: Column): Column = {
    val parts = splitPartsCol(dn)
    when(size(parts) > 1,
      array_join(slice(parts, lit(1), size(parts) - 1), ","))
      .otherwise(lit(null))
  }
}
