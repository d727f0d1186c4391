package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd Euclidean distance over two numeric array columns —
  * the L2 sibling of [[DotProduct]] (SURVEY.md §2 B2).
  *
  * Semantics are IDENTICAL to the higher-order-function formulation
  * `sqrt(aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0d, _+_))` — a
  * sequential ascending-index fold in double precision followed by one
  * `Math.sqrt`, so results stay bit-equal to the HOF twin (asserted in
  * VectorFunctionsSpec) — but compiled to a tight primitive loop inside
  * whole-stage codegen instead of per-element lambda plumbing with boxed
  * accumulators. This is the hot inner expression of k-means assignment
  * ([[graft.operators.IvfIndex]]): per row it runs once per centroid, so
  * at corpus scale the constant factor is the build's compute bill.
  *
  * Mismatched lengths yield NULL — exactly the HOF twin's behavior
  * (`zip_with` null-pads the shorter array, the padded difference is
  * null, and the fold propagates it), so a ragged pair can never produce
  * a silently-truncated finite distance. Element nulls are not expected
  * (parquet float arrays / literals with containsNull=false); null INPUT
  * arrays propagate null via BinaryExpression's null handling.
  */
case class L2Distance(left: Expression, right: Expression)
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
      s"graft_l2 expects array<float|double> arguments, got " +
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
      val d = xv - yv
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
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
         |    double $d = $getL - $getR;
         |    ${ev.value}Acc += $d * $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt(${ev.value}Acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}
