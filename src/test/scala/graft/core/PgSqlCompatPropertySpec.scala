package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** Property checks for the PG→Spark rewriter: it must be TOTAL (never
  * throw) and a FIXED POINT on SQL that contains none of the PostgreSQL
  * spellings it targets — the contract that keeps native graft bundles
  * byte-identical through the rewrite. */
object PgSqlCompatPropertySpec extends Properties("PgSqlCompat") {
  import Prop.forAll

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOf(Gen.alphaNumChar)
  } yield (h :: t).mkString

  // identifiers that are NOT the schema keywords the rewriter targets
  private val schemaWords =
    Set("entity", "virtual_entity", "trend", "attribute", "relation", "notification")
  private val safeIdent: Gen[String] =
    ident.retryUntil(i => !schemaWords.contains(i.toLowerCase), 100)

  // literals without the E-prefix/ARRAY spellings (those are PG-targeted)
  private val literal: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.const('.')
    )).map(cs => s"'${cs.mkString}'")

  // portable-SQL snippets: identifiers, qualified refs, literals, operators
  private val portable: Gen[String] = Gen.listOfN(12, Gen.frequency(
    4 -> safeIdent,
    2 -> Gen.zip(safeIdent, safeIdent).map { case (a, b) => s"$a.$b" },
    2 -> literal,
    1 -> Gen.oneOf("SELECT", "FROM", "WHERE", "JOIN", "GROUP BY", "AND"),
    1 -> Gen.oneOf("=", ">", "<", "+", "*", ","),
    1 -> Gen.choose(0, 9999).map(_.toString)
  )).map(_.mkString(" "))

  property("rewriteQuery is identity on portable SQL") = forAll(portable) { q =>
    PgSqlCompat.rewriteQuery(q) == q
  }

  property("rewriteScalar is identity on portable expressions") =
    // Strip leading SELECTs INSIDE the property (and all repeats):
    // rewriteScalar itself strips one leading SELECT by contract, and
    // scalacheck shrink candidates bypass a generator-side map — a
    // shrunk value like "SELECT 7" falsified the old one-strip-outside
    // formulation even though the rewriter behaved exactly as specified.
    forAll(portable) { raw =>
      val q = raw.replaceAll("(?i)^(SELECT\\s+)+", "")
      PgSqlCompat.rewriteScalar(q) == q.trim.stripSuffix(";").trim
    }

  property("rewrites are total on arbitrary strings") =
    forAll(Gen.asciiPrintableStr) { s =>
      PgSqlCompat.rewriteQuery(s) != null && PgSqlCompat.rewriteScalar(s) != null
    }

  property("literal content survives rewriteQuery verbatim") =
    forAll(literal) { lit =>
      val q = s"SELECT x FROM entity.t WHERE note = $lit"
      PgSqlCompat.rewriteQuery(q).contains(lit)
    }
}
