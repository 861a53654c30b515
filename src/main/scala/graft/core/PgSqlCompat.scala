package graft.core

/** Light PostgreSQL→Spark SQL rewrites for verbatim reference instance
  * bundles (the documented relation/view/trigger SQL contract).
  *
  * The reference's instance YAML embeds PostgreSQL run server-side
  * (examples/tiny_instance/relation/node->v-site.yaml,
  * trigger/node-15m-highpowerusage.yaml). graft's native contract is
  * portable Spark SQL over registered views — but a verbatim reference
  * bundle should load, so the handful of PostgreSQL spellings that appear
  * in instance definitions are rewritten mechanically:
  *
  *  - `entity."node-module"` (schema-qualified, quoted) →
  *    `entity_node_module` — the registered temp-view naming
  *    ([[graft.storage.EntityDirectory.viewName]]); same for the `trend`,
  *    `virtual_entity`, `attribute`, `relation` and `notification` schemas.
  *  - `substring(x from 'pattern')` → `regexp_extract(x, 'pattern', g)`
  *    with g=1 when the pattern has a capture group (PostgreSQL returns the
  *    first group when present, the whole match otherwise). Difference kept:
  *    PostgreSQL yields NULL on no match, regexp_extract yields '' — for
  *    the join predicates these queries use, both fail to match, which is
  *    the behavior that matters.
  *  - scalar trigger fragments ([[rewriteScalar]]): strip the `SELECT`
  *    wrapper and `$1.` row-variable prefixes, `ARRAY[…]` → `array(…)`,
  *    `E'…'` → `'…'` (Spark's default literal parsing interprets the same
  *    backslash escapes), `::type` casts dropped (graft stores json payloads
  *    as text), `format(…)` → `format_string(…)` (both printf-style; `%s`
  *    covers the reference usage).
  *
  * Anything outside these spellings must already be portable SQL; the
  * rewrite is deliberately textual and total — it never throws, and SQL
  * that needs no rewriting passes through byte-identical.
  */
object PgSqlCompat {

  private val schemas = "entity|virtual_entity|trend|attribute|relation|notification"

  private def sanitize(name: String): String =
    name.replaceAll("[^A-Za-z0-9_]", "_")

  /** Rewrite a relation/materialization/view query (table references +
    * substring-from). */
  def rewriteQuery(sql: String): String = {
    var s = sql
    // schema."quoted-name" → schema_quoted_name
    s = (s"""(?i)\\b($schemas)\\.\"([^\"]+)\"""").r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        m.group(1).toLowerCase + "_" + sanitize(m.group(2))))
    // schema.unquoted_name → schema_unquoted_name
    s = (s"""(?i)\\b($schemas)\\.([A-Za-z_][A-Za-z0-9_]*)""").r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        m.group(1).toLowerCase + "_" + m.group(2)))
    // substring(x from 'pattern') → regexp_extract(x, 'pattern', group)
    s = """(?is)\bsubstring\s*\(\s*([^()']+?)\s+from\s+('(?:[^']|'')*')\s*\)""".r
      .replaceAllIn(s, m => {
        val pat = m.group(2)
        val grp = if (pat.contains("(")) 1 else 0
        java.util.regex.Matcher.quoteReplacement(
          s"regexp_extract(${m.group(1).trim}, $pat, $grp)")
      })
    s
  }

  /** Rewrite a scalar trigger fragment (weight / notification / data /
    * condition) to a Spark `expr(…)`-parsable expression. */
  def rewriteScalar(sql: String): String = {
    var s = sql.trim.stripSuffix(";").trim
    // the reference wraps scalar rules in a SELECT (run per row with $1)
    s = "(?is)^SELECT\\s+".r.replaceFirstIn(s, "")
    s = s.replace("$1.", "")
    // ARRAY[a, b] → array(a, b) (reference usage has no nested brackets)
    s = "(?is)\\bARRAY\\s*\\[(.*?)\\]".r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(s"array(${m.group(1)})"))
    // E'…' escape-string literal → plain literal (Spark interprets \n etc.)
    s = "(?s)\\bE'((?:[^']|'')*)'".r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(s"'${m.group(1)}'"))
    // ::json / ::timestamptz[] / ::numeric casts → dropped
    s = "::\\s*[A-Za-z_][A-Za-z0-9_]*(\\s*\\[\\s*\\])?".r.replaceAllIn(s, "")
    // PG format() is printf-style like Spark's format_string()
    s = "(?i)\\bformat\\s*\\(".r.replaceAllIn(s, "format_string(")
    // PG array_to_string(arr, sep[, null_str]) ≡ Spark array_join
    s = "(?i)\\barray_to_string\\s*\\(".r.replaceAllIn(s, "array_join(")
    s
  }
}
