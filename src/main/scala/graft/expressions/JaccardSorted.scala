package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact Jaccard similarity of two SORTED, DEDUPLICATED string arrays —
  * the verify kernel of the set-similarity joins (reference behavior:
  * the all-pairs Jaccard the 193-line engine's dedup story implies;
  * here it runs once per CANDIDATE pair, so its per-pair cost is the
  * verify stage's whole bill at sf0.1).
  *
  * Semantics ≡ `size(array_intersect(a, b)) / size(array_union(a, b))`
  * on set-shaped inputs (bit-parity pinned in NearDupSpec): both forms
  * compute the exact integer |A∩B| and |A∪B| = |A| + |B| − |A∩B|, then
  * one double division — identical IEEE operands. The built-in pair
  * builds two UTF8String hash sets PER ROW-PAIR; this kernel is a
  * single allocation-free merge walk over arrays the caller sorted
  * ONCE per document (`array_sort`, binary order — the same
  * UTF8String.compareTo order the walk uses), amortized across every
  * pair the document appears in.
  *
  * Inputs MUST be sorted ascending with nulls last (array_sort's
  * default) and duplicate-free (array_distinct) — the callers in
  * [[graft.operators.NearDup]] construct exactly that shape. A single
  * null element (array_distinct keeps at most one) matches a null on
  * the other side, mirroring array_intersect's null-equality. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaccard_sorted expects (array<string>, array<string>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaccardSorted.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

object JaccardSorted {
  /** static entry point shared by interpreted eval and generated code */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = if (a.isNullAt(i)) null else a.getUTF8String(i)
      val y = if (b.isNullAt(j)) null else b.getUTF8String(j)
      if (x == null && y == null) { inter += 1; i += 1; j += 1 }
      else if (x == null) j += 1 // nulls sort last: y < null, advance j
      else if (y == null) i += 1
      else {
        val c = x.compareTo(y)
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    inter.toDouble / (na + nb - inter)
  }
}
