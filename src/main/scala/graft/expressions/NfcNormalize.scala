package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization as a native
  * expression — the text-normalization stage real multilingual corpora
  * need before fingerprinting/dedup: the same visible string can arrive
  * as precomposed (`é` = U+00E9) or decomposed (`e` + U+0301) code-point
  * sequences, and byte-level dedup/shingling treats them as different
  * documents unless canonicalized first. (The reference app compares raw
  * Python strings, `app.py:40-48`, so it inherits this ambiguity; the
  * ASCII-dominant fixture never exposes it.)
  *
  * Pure per-row projection (embarrassingly parallel, stays inside
  * whole-stage codegen via [[doGenCode]]). The ASCII fast path skips the
  * `java.text.Normalizer` round-trip entirely — ASCII is closed under
  * NFC — so corpora that are mostly ASCII pay one byte scan per row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** static entry point shared by interpreted eval and generated code */
  def compute(s: UTF8String): UTF8String = {
    // ASCII bytes never change under NFC and cannot be part of a
    // multi-code-point sequence — return the input untouched (no JVM
    // String materialization) when every byte is < 0x80
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}
