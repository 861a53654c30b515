package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (UAX #15).
  *
  * Why it exists: text pipelines must normalize BEFORE hashing — the
  * decomposed "é" and precomposed "é" are different byte
  * strings (different digests, different dedup verdicts, different
  * shingles) for the same rendered text. Spark ships no normalization
  * function, and a Scala UDF would both break whole-stage codegen and
  * pay serializer round-trips per row; this expression stays inside
  * codegen and calls the JDK's `java.text.Normalizer` (ICU-equivalent
  * for NFC) directly on the row's string.
  *
  * Null contract: null in → null out (UnaryExpression default). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is O(n) with no allocation for
    // the (overwhelmingly common) already-NFC case
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s,
         |    java.text.Normalizer.Form.NFC)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc"
}

object StringExpressions {
  /** Column-level NFC normalization backed by the codegen'd expression. */
  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
