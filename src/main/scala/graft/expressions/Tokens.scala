package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer — semantics identical to the
  * higher-order formulation `filter(split(text, " "), t => t =!= "")`
  * (asserted bit-equal in TextAnalysisSpec):
  *
  *   - `split(text, " ")` splits on the single literal space character
  *     (the regex " " has no metacharacters), keeping empty fields for
  *     consecutive/leading/trailing spaces;
  *   - the filter drops exactly those empties;
  *   - net: the array of maximal runs of non-space bytes, in order.
  *
  * The HOF version is the engine's single hottest expression — it sits
  * under every tokenize-consuming row (tf-idf, BM25, fingerprints,
  * budgets, quality gates) — and `ArrayFilter` is CodegenFallback: each
  * ROW pays a regex split materializing the empties plus an interpreted
  * lambda dispatch per ELEMENT. This compiles to one static call per
  * row doing a single byte scan: 0x20 never occurs inside a UTF-8
  * multibyte sequence, so splitting on the raw space byte is exact for
  * all inputs. (Reference behavior: `app.py` tokenizes with Python
  * `str.split()` — the SURVEY §2 B10 contract is the space-run form.)
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      Tokens.compute(s.asInstanceOf[UTF8String]).asInstanceOf[Array[AnyRef]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.expressions.Tokens.compute($c))")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {
  /** static entry point shared by interpreted eval and generated code */
  def compute(s: UTF8String): Array[UTF8String] = {
    val n = s.numBytes()
    // count runs first: one branch-light pass, then exact-size output
    // (an ArrayList of UTF8String boxes costs more than the second scan)
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val sp = s.getByte(i) == 0x20
      if (!sp && !inTok) count += 1
      inTok = !sp
      i += 1
    }
    if (count == 0) return Array.empty
    val out = new Array[UTF8String](count)
    var k = 0
    i = 0
    while (i < n) {
      if (s.getByte(i) != 0x20) {
        val start = i
        while (i < n && s.getByte(i) != 0x20) i += 1
        // copyUTF8String(start, end) copies the INCLUSIVE byte range —
        // a copy is required anyway: the source bytes live in a reused
        // row buffer
        out(k) = s.copyUTF8String(start, i - 1)
        k += 1
      } else i += 1
    }
    out
  }
}
