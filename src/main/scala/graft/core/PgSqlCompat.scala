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
  *    backslash escapes), PostgreSQL-only `::type` casts dropped (json /
  *    jsonb / timestamptz / reg* — graft stores json payloads as text;
  *    `::int`-style casts Spark itself parses are left alone),
  *    `format(…)` → `format_string(…)` and `array_to_string(…)` →
  *    `array_join(…)` (neither name exists in Spark, so valid Spark SQL is
  *    never touched).
  *
  * Identifier/cast rewrites run OUTSIDE string literals only — a literal
  * containing `trend.foo` or `$1.50` passes through untouched. Anything
  * outside these spellings must already be portable SQL; the rewrite is
  * deliberately textual and total — it never throws, and SQL that needs no
  * rewriting passes through byte-identical. Known limit: a table alias
  * that is itself a schema keyword (`… FROM edges entity`) is rewritten
  * like a schema reference; don't name aliases after schemas.
  */
object PgSqlCompat {

  private val schemas = "entity|virtual_entity|trend|attribute|relation|notification"

  private def sanitize(name: String): String =
    name.replaceAll("[^A-Za-z0-9_]", "_")

  /** Apply `f` to the text segments OUTSIDE single-quoted literals (a `''`
    * escape toggles twice — net unchanged). */
  private def outsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var inQ = false
    sql.foreach {
      case '\'' if !inQ =>
        out.append(f(seg.toString)); seg.clear(); inQ = true; out.append('\'')
      case '\'' => inQ = false; out.append('\'')
      case c if inQ => out.append(c)
      case c => seg.append(c)
    }
    out.append(f(seg.toString))
    out.toString
  }

  /** Rewrite a relation/materialization/view query (table references +
    * substring-from). */
  def rewriteQuery(sql: String): String = {
    // substring(x from 'pattern') first — quote/paren-aware scan so a
    // wrapped first argument (`substring(lower(r.name) from '…')`) still
    // rewrites; a bare regex on `[^()']` would skip it and Spark would
    // misparse the PG form into silent NULLs
    val s0 = rewriteSubstringFrom(sql)
    outsideLiterals(s0) { seg =>
      // schema."quoted-name" → schema_quoted_name — but the quoted name is
      // INSIDE a double quote, not a string literal, so handle it here
      val a = (s"""(?i)\\b($schemas)\\.\"([^\"]+)\"""").r.replaceAllIn(seg, m =>
        java.util.regex.Matcher.quoteReplacement(
          m.group(1).toLowerCase + "_" + sanitize(m.group(2))))
      // schema.unquoted_name → schema_unquoted_name
      (s"""(?i)\\b($schemas)\\.([A-Za-z_][A-Za-z0-9_]*)""").r.replaceAllIn(a, m =>
        java.util.regex.Matcher.quoteReplacement(
          m.group(1).toLowerCase + "_" + m.group(2)))
    }
  }

  /** `substring(expr from 'pattern')` → `regexp_extract(expr, 'pattern',
    * g)` with quote- and paren-depth-aware argument scanning (the first
    * argument may be an arbitrary nested expression). Only rewrites when
    * the part after a top-level ` from ` is a single quoted literal —
    * positional `substring(x FROM 2)` and anything else pass through.
    * Total: malformed input is left unchanged, never thrown on. */
  private def rewriteSubstringFrom(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    val word = "substring"
    while (i < s.length) {
      val c = s.charAt(i)
      val wordStart = i == 0 || {
        val p = s.charAt(i - 1); !Character.isLetterOrDigit(p) && p != '_'
      }
      lazy val parenAt: Int = {
        var j = i + word.length
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '(') j else -1
      }
      if (c == '\'') { inQ = !inQ; sb.append(c); i += 1 }
      else if (!inQ && wordStart &&
          s.regionMatches(true, i, word, 0, word.length) && parenAt >= 0) {
        // collect the argument text up to the matching close paren
        var depth = 1
        var q = false
        var j = parenAt + 1
        val args = new StringBuilder
        var fromAt = -1 // top-level " from " position within args
        while (j < s.length && depth > 0) {
          val ch = s.charAt(j)
          if (ch == '\'') q = !q
          else if (!q && ch == '(') depth += 1
          else if (!q && ch == ')') depth -= 1
          if (depth > 0) {
            if (!q && depth == 1 && fromAt < 0 && ch.isWhitespace &&
                s.regionMatches(true, j + 1, "from", 0, 4) &&
                j + 5 < s.length && s.charAt(j + 5).isWhitespace)
              fromAt = args.length
            args.append(ch)
          }
          j += 1
        }
        val closed = depth == 0
        val pat = if (fromAt < 0) ""
          else "(?is)^\\s*from\\s+(.*)$".r
            .findFirstMatchIn(args.substring(fromAt))
            .map(_.group(1).trim).getOrElse("")
        val isLit = pat.length >= 2 && pat.head == '\'' && pat.last == '\'' &&
          // a single literal: interior quotes only as doubled ''
          "'([^']|'')*'".r.pattern.matcher(pat).matches
        if (closed && fromAt >= 0 && isLit) {
          // recurse: the first argument may itself contain the PG form
          val arg = rewriteSubstringFrom(args.substring(0, fromAt).trim)
          val grp = if (pat.contains("(")) 1 else 0
          sb.append(s"regexp_extract($arg, $pat, $grp)")
          i = j
        } else { sb.append(c); i += 1 } // not the PG form — copy and move on
      }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `ARRAY[…]` → `array(…)` with quote- and nesting-aware bracket
    * matching, applied only where ARRAY appears outside a literal. */
  private def rewriteArrays(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      val wordStart = i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))
      lazy val bracketAt: Int = {
        var j = i + 5
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '[') j else -1
      }
      if (c == '\'') { inQ = !inQ; sb.append(c); i += 1 }
      else if (!inQ && wordStart && s.regionMatches(true, i, "ARRAY", 0, 5)
          && bracketAt >= 0) {
        sb.append("array(")
        var depth = 1
        var k = bracketAt + 1
        var q = false
        while (k < s.length && depth > 0) {
          val ch = s.charAt(k)
          if (ch == '\'') { q = !q; sb.append(ch) }
          else if (!q && ch == '[') { depth += 1; sb.append(ch) }
          else if (!q && ch == ']') {
            depth -= 1; sb.append(if (depth > 0) ']' else ')')
          }
          else sb.append(ch)
          k += 1
        }
        i = k
      }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `E'…'` escape-string literal → plain `'…'` (Spark's default literal
    * parsing interprets the same backslash escapes). Quote-aware left-to-
    * right scan: an `E` that sits INSIDE an ordinary literal (`… = 'GRADE
    * E' AND …`) is content, not an opener — a bare regex would strip it
    * and corrupt the quoting structure. Inside an E-string both `''` and
    * `\'` escape the quote; `\'` is re-emitted as `''` (same Spark
    * semantics) so the later passes' simple doubling-aware quote tracking
    * ([[outsideLiterals]], [[rewriteArrays]]) keeps literal parity. */
  private def rewriteEStrings(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      val wordStart = i == 0 || {
        val p = s.charAt(i - 1); !Character.isLetterOrDigit(p) && p != '_'
      }
      if (inQ) { sb.append(c); if (c == '\'') inQ = false; i += 1 }
      else if ((c == 'E' || c == 'e') && wordStart &&
          i + 1 < s.length && s.charAt(i + 1) == '\'') {
        sb.append('\'')
        var j = i + 2
        var open = true
        while (j < s.length && open) {
          val ch = s.charAt(j)
          if (ch == '\\' && j + 1 < s.length && s.charAt(j + 1) == '\'') {
            sb.append("''"); j += 2
          } else if (ch == '\\' && j + 1 < s.length) {
            sb.append(ch).append(s.charAt(j + 1)); j += 2
          } else if (ch == '\'' && j + 1 < s.length && s.charAt(j + 1) == '\'') {
            sb.append("''"); j += 2
          } else {
            sb.append(ch); if (ch == '\'') open = false; j += 1
          }
        }
        i = j
      }
      else { sb.append(c); if (c == '\'') inQ = true; i += 1 }
    }
    sb.toString
  }

  /** Rewrite a scalar trigger fragment (weight / notification / data /
    * condition) to a Spark `expr(…)`-parsable expression. */
  def rewriteScalar(sql: String): String = {
    var s = sql.trim.stripSuffix(";").trim
    // the reference wraps scalar rules in a SELECT (run per row with $1)
    s = "(?is)^SELECT\\s+".r.replaceFirstIn(s, "")
    // E-strings FIRST: rewriteArrays only understands doubled '' escapes,
    // so a backslash-escaped quote in an E'…' literal would desync its
    // in-quote tracking; rewriteEStrings normalizes \' to '' for it
    s = rewriteEStrings(s)
    s = rewriteArrays(s)
    outsideLiterals(s) { seg =>
      var t = seg.replace("$1.", "")
      // PostgreSQL-ONLY casts dropped; ::int etc. (valid Spark) untouched
      t = "(?i)::\\s*(json|jsonb|timestamptz|regclass|regprocedure|regproc)(\\s*\\[\\s*\\])?".r
        .replaceAllIn(t, "")
      // PG format() / array_to_string(): names Spark doesn't define
      t = "(?i)\\bformat\\s*\\(".r.replaceAllIn(t, "format_string(")
      t = "(?i)\\barray_to_string\\s*\\(".r.replaceAllIn(t, "array_join(")
      t
    }
  }
}
