package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The PG→Spark rewrite contract: reference spellings rewritten, string
  * literals and valid Spark SQL left untouched. */
class PgSqlCompatSpec extends AnyFunSuite {

  test("schema references rewrite; string literals are protected") {
    val q = """SELECT n.id FROM entity."node-module" n
              |JOIN trend.hub_x t ON t.note = 'see entity.node docs'""".stripMargin
    val out = PgSqlCompat.rewriteQuery(q)
    assert(out.contains("entity_node_module"))
    assert(out.contains("trend_hub_x"))
    assert(out.contains("'see entity.node docs'")) // literal untouched
  }

  test("substring-from rewrites with group selection") {
    assert(PgSqlCompat.rewriteQuery("substring(x from '([a-z]+)-.*')") ==
      "regexp_extract(x, '([a-z]+)-.*', 1)")
    assert(PgSqlCompat.rewriteQuery("substring(x from 'abc')") ==
      "regexp_extract(x, 'abc', 0)")
    // first argument may be an arbitrary nested expression
    assert(PgSqlCompat.rewriteQuery(
      "substring(lower(r.name) from '([a-z]+)-.*')") ==
      "regexp_extract(lower(r.name), '([a-z]+)-.*', 1)")
    // ...including another substring-from (recursive rewrite)
    assert(PgSqlCompat.rewriteQuery(
      "substring(substring(x from 'a(b)c') from 'b')") ==
      "regexp_extract(regexp_extract(x, 'a(b)c', 1), 'b', 0)")
    // positional/standard forms and literal content pass through
    assert(PgSqlCompat.rewriteQuery("substring(x FROM 2)") ==
      "substring(x FROM 2)")
    assert(PgSqlCompat.rewriteQuery("substring(x, 1, 3)") ==
      "substring(x, 1, 3)")
    assert(PgSqlCompat.rewriteQuery("'use substring(x from ''y'')'") ==
      "'use substring(x from ''y'')'")
  }

  test("scalar fragments: $1 and PG-only casts stripped outside literals only") {
    val s = "format('cost $1.50 :: total %s', $1.value::json)"
    val out = PgSqlCompat.rewriteScalar(s)
    assert(out == "format_string('cost $1.50 :: total %s', value)")
    // valid Spark ::int cast survives
    assert(PgSqlCompat.rewriteScalar("value::int + 1") == "value::int + 1")
    // literal containing ::active survives
    assert(PgSqlCompat.rewriteScalar("'state::active'") == "'state::active'")
  }

  test("ARRAY[..] converts with quote-aware bracket matching") {
    val s = "array_to_string(ARRAY['a]b', format('%s', x)], E'\\n')"
    val out = PgSqlCompat.rewriteScalar(s)
    assert(out == "array_join(array('a]b', format_string('%s', x)), '\\n')")
    // ARRAY inside a literal untouched
    assert(PgSqlCompat.rewriteScalar("'use ARRAY[1]'") == "'use ARRAY[1]'")
    // \' inside an E-string must not desync the ARRAY pass's quote
    // tracking (E-strings normalize before arrays rewrite)
    assert(PgSqlCompat.rewriteScalar("array_to_string(ARRAY[E'a\\'b'], ',')") ==
      "array_join(array('a''b'), ',')")
    assert(PgSqlCompat.rewriteScalar("E'don\\'t' || ARRAY[1, 2]") ==
      "'don''t' || array(1, 2)")
  }

  test("E inside an ordinary literal is content, not an E-string opener") {
    // regression: a bare-regex rewrite stripped the E from 'GRADE E' and
    // consumed the following literal, corrupting the quote structure
    val s = "grade = 'GRADE E' AND name = 'x'"
    assert(PgSqlCompat.rewriteScalar(s) == s)
    assert(PgSqlCompat.rewriteScalar("x = 'E' OR y = 'E'") ==
      "x = 'E' OR y = 'E'")
    // genuine E-strings still rewrite, with '' and \' quote escapes honored
    assert(PgSqlCompat.rewriteScalar("E'it''s\\n'") == "'it''s\\n'")
    // \' re-emits as '' (same Spark semantics) so downstream quote
    // tracking keeps literal parity...
    assert(PgSqlCompat.rewriteScalar("E'a\\'b' || 'E'") == "'a''b' || 'E'")
    // ...which keeps outside-literal rewrites live AFTER an escaped quote
    assert(PgSqlCompat.rewriteScalar("E'it\\'s' || $1.weight") ==
      "'it''s' || weight")
    assert(PgSqlCompat.rewriteScalar("lower(e'X')") == "lower('X')")
    // E preceded by an identifier char is not an opener
    assert(PgSqlCompat.rewriteScalar("CASE'x'") == "CASE'x'")
  }

  test("portable Spark SQL passes through byte-identical") {
    val q = "SELECT entity_id, value FROM kpi WHERE value > max_value"
    assert(PgSqlCompat.rewriteQuery(q) == q)
    assert(PgSqlCompat.rewriteScalar(
      "CASE WHEN value > 1 THEN 500 ELSE 300 END") ==
      "CASE WHEN value > 1 THEN 500 ELSE 300 END")
  }
}
