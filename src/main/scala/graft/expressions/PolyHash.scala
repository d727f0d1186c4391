package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The closed-form polynomial string hash of the `_fixed` oracle twins
  * (`NearDup.polyHash`):
  * `h = fold(bytes, 7, (acc, b) -> (acc*131 + b) mod 1e9+7)`.
  *
  * Folds over the UTF-8 BYTES, which on ASCII input — the fixtures,
  * and the documented determinism contract of the poly-hash tier —
  * are exactly the character codes the HOF twin
  * ([[graft.operators.NearDup.polyHashHof]]: `split("")` + `ascii`)
  * and the DuckDB replay (`string_split('')` + `unicode`) fold over;
  * bit-parity on fixture text is pinned in NearDupSpec. The HOF form
  * walks an interpreted transform+filter+aggregate lambda chain PER
  * STRING (the CodegenFallback tax measured at ~1.2 s per fixed-twin
  * row); this is one static call inside whole-stage codegen. */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    PolyHash.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** static entry point shared by interpreted eval and generated code */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 7L
    var i = 0
    while (i < n) {
      acc = (acc * 131L + (s.getByte(i) & 0xFF)) % 1000000007L
      i += 1
    }
    acc
  }
}
