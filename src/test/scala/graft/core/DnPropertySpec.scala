package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks for the DN utilities and granularity parser:
  * round-trip laws the reference's semantics imply but its example-based
  * tests never state explicitly. */
object DnPropertySpec extends Properties("DistinguishedName") {
  import DistinguishedName._
  import Prop.forAll

  // type names: no commas or '='; name parts: anything without '=' once
  // escaped (commas are legal in RAW names and must survive escape/split)
  private val typeName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val rawName: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const(','), 1 -> Gen.const('.')
    )).map(_.mkString)
  private val parts: Gen[List[(String, String)]] =
    Gen.nonEmptyListOf(Gen.zip(typeName, rawName)).map(_.take(6))

  property("splitParts inverts escape-aware implode") = forAll(parts) { ps =>
    val dn = ps.map { case (t, n) => s"$t=${escape(n)}" }.mkString(",")
    val split = splitParts(dn)
    split.length == ps.length &&
      split.zip(ps).forall { case (part, (t, n)) =>
        part == s"$t=${escape(n)}" &&
          unescape(part.drop(t.length + 1)) == n
      }
  }

  property("implode inverts explode for comma-free names") =
    forAll(Gen.nonEmptyListOf(Gen.zip(typeName, typeName)).map(_.take(6))) { ps =>
      implode(explode(implode(ps))) == implode(ps)
    }

  property("entityTypeName is the last part's type") = forAll(parts) { ps =>
    val dn = ps.map { case (t, n) => s"$t=${escape(n).replace(",", "")}" }.mkString(",")
    entityTypeName(dn) == ps.last._1
  }

  property("escape/unescape are mutually inverse") = forAll(rawName) { n =>
    unescape(escape(n)) == n && !splitParts(s"a=${escape(n)}").exists(_.isEmpty)
  }
}

/** Granularity parser/truncation laws. */
object GranularityPropertySpec extends Properties("Granularity") {
  import Prop.forAll
  import java.time.{Instant, ZoneOffset}

  private val secGran: Gen[Long] =
    Gen.oneOf(60L, 300L, 900L, 1800L, 3600L, 14400L, 86400L)
  private val ts: Gen[Long] = Gen.choose(0L, 4102444800L) // 1970..2100

  property("parse(name) round-trips for sub-day granularities; day-multiples go calendar") =
    forAll(secGran) { g =>
      val parsed = Granularity.parse(SecondsGranularity(g).name)
      if (g % 86400 == 0) parsed == DaysGranularity((g / 86400).toInt) // DST-aware class
      else parsed == SecondsGranularity(g)
    }

  property("truncate is idempotent and <= t") = forAll(secGran, ts) { (g, t) =>
    val gran = SecondsGranularity(g)
    val i = Instant.ofEpochSecond(t)
    val tr = gran.truncate(i, ZoneOffset.UTC)
    gran.truncate(tr, ZoneOffset.UTC) == tr && !tr.isAfter(i) &&
      i.getEpochSecond - tr.getEpochSecond < g
  }

  property("next/prev are inverse steps on the grid") = forAll(secGran, ts) { (g, t) =>
    val gran = SecondsGranularity(g)
    val tr = gran.truncate(Instant.ofEpochSecond(t), ZoneOffset.UTC)
    gran.prev(gran.next(tr, ZoneOffset.UTC), ZoneOffset.UTC) == tr
  }

  property("timestampToIndex is monotone") = forAll(secGran, ts, ts) { (g, a, b) =>
    val (lo, hi) = (math.min(a, b), math.max(a, b))
    Granularity.timestampToIndex(g, Instant.ofEpochSecond(lo)) <=
      Granularity.timestampToIndex(g, Instant.ofEpochSecond(hi))
  }
}
