package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NfcNormalize: the native codegen'd UAX #15 NFC expression. */
class StringExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val nfc = StringExpressions.nfc _

  test("nfc: decomposed composes, precomposed passes through, idempotent") {
    val decomposed = "caf" + "é" // e + combining acute
    val precomposed = "café"
    val df = Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"))
      .toDF("id", "s")
      .select(col("id"), col("s"), nfc(col("s")).as("n"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2))).toMap
    assert(rows(1L)._2 == precomposed)        // composed to U+00E9
    assert(rows(1L)._1 != rows(1L)._2)        // input genuinely differed
    assert(rows(2L)._2 == precomposed)        // already-NFC fast path
    assert(rows(3L)._2 == "plain ascii")
    // idempotent: nfc(nfc(s)) == nfc(s)
    val twice = df.select(col("id"), (nfc(col("n")) === col("n")).as("eq"))
      .collect().map(_.getBoolean(1))
    assert(twice.forall(identity))
  }

  test("nfc: null in, null out; combining ring composes to one char") {
    val df = Seq((1L, Option("A\u030a")), (2L, None: Option[String]))
      .toDF("id", "s").select(col("id"), nfc(col("s")).as("n"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == "\u00c5") // A + ring -> precomposed
    assert(rows(0).getString(1).length == 1)
    assert(rows(1).isNullAt(1))
  }
}
