package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric array columns — the one
  * perf-gated custom Expression the survey allows for (SURVEY.md §4.3).
  *
  * Semantics are IDENTICAL to the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, _+_)` — a sequential
  * ascending-index fold in double precision (so every oracle query keeps
  * hash-matching bit-for-bit) — but the HOF chain evaluates through
  * per-element lambda plumbing with boxed accumulators, while this
  * compiles to a tight primitive `for` loop inside whole-stage codegen.
  *
  * Mismatched lengths yield NULL — exactly the HOF twin's behavior
  * (`zip_with` null-pads the shorter array, the padded product is null,
  * and the fold propagates it), so a ragged pair can never produce a
  * silently-truncated finite score. Element nulls are not expected
  * (parquet float arrays / literals with containsNull=false); null INPUT
  * arrays propagate null via BinaryExpression's null handling.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // can yield null on mismatched lengths even when both inputs are
  // non-null, so codegen must keep isNull a real variable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val getL =
        if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR =
        if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${ev.value}Acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${ev.value}Acc += $getL * $getR;
         |  }
         |  ${ev.value} = ${ev.value}Acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
