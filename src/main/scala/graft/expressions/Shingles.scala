package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native token n-gram shingling — semantics identical to the
  * higher-order formulation in `NearDup.shinglesHof` (asserted bit-equal
  * in NearDupSpec):
  *   - fewer than `n` tokens → a single shingle joining ALL tokens;
  *   - otherwise one shingle per window position, tokens joined with a
  *     single space (null tokens skipped, `concat_ws` semantics).
  *
  * The HOF version walks an interpreted `transform(sequence(...))` lambda
  * with a `slice` + `concat_ws` per position — measured at ~0.3 ms/doc
  * (1.7 s single-task for the 5k-doc sf0.1 fixture, and the verify join
  * evaluates it once per join side). This compiles to one static call per
  * row over the token array.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      Shingles.compute(a.asInstanceOf[ArrayData], n).asInstanceOf[Array[AnyRef]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.expressions.Shingles.compute($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val SPACE = UTF8String.fromString(" ")

  /** static entry point shared by interpreted eval and generated code */
  def compute(arr: ArrayData, n: Int): Array[UTF8String] = {
    val m = arr.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (m < n) {
      // short doc: one shingle of all tokens (concat_ws skips nulls and
      // yields "" for an empty array — same as the HOF formulation)
      Array(UTF8String.concatWs(SPACE, toks: _*))
    } else {
      val out = new Array[UTF8String](m - n + 1)
      val window = new Array[UTF8String](n)
      var p = 0
      while (p <= m - n) {
        var j = 0
        while (j < n) { window(j) = toks(p + j); j += 1 }
        out(p) = UTF8String.concatWs(SPACE, window: _*)
        p += 1
      }
      out
    }
  }
}
