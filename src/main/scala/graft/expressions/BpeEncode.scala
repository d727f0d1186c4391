package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE subword tokenization (`graft_bpe`): text → array of BPE
  * pieces under the checked-in default merges table
  * ([[graft.functions.BpeTokenizer.default]] — the public Sennrich
  * merge-loop algorithm, fixed table, deterministic). One static call
  * per row inside whole-stage codegen, same pattern as [[Shingles]] /
  * [[MinHashSig]]; the tokenizer's rank map is a JVM-wide lazy singleton,
  * never serialized per task.
  *
  * Seeded-table tokenization is not SQL-expressible → the declared
  * queries built on it are rows-only per the driver contract, with the
  * merge-loop semantics property-tested in BpeSpec.
  */
case class BpeEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(graft.functions.BpeTokenizer
      .encodeUtf8(s.asInstanceOf[UTF8String]).asInstanceOf[Array[AnyRef]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.BpeTokenizer.encodeUtf8($c))")

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
