package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd scan kernels for the quantized index families — the
  * same justification as [[DotProduct]] (SURVEY.md §4.3): the compressed
  * scan IS the point of SQ8/PQ at 100 TB (read 4-32× fewer bytes at scan
  * speed), and a higher-order-function fold evaluates through
  * per-element interpreted lambda plumbing with boxed accumulators —
  * profiled this round at ~2 ms/row on the 64-dim fixture, which would
  * negate the compression win on any real corpus. Both kernels compile
  * to a tight primitive loop inside whole-stage codegen and reproduce
  * their HOF twins' double arithmetic EXACTLY (same fold order, same
  * start value), so every oracle-hash row is unchanged — asserted
  * element-for-element in SqIndexSpec/PqIndexSpec against the retained
  * HOF formulations. */
private[graft] trait CodesArrayKernel { self: UnaryExpression =>

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | ShortType | IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects an integral codes array, got ${other.simpleString}")
  }

  protected def elemJava(arr: String, i: String): String =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case ByteType  => s"(int) $arr.getByte($i)"
      case ShortType => s"(int) $arr.getShort($i)"
      case _         => s"$arr.getInt($i)"
    }

  protected def elemScala(arr: ArrayData, i: Int): Int =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case ByteType  => arr.getByte(i).toInt
      case ShortType => arr.getShort(i).toInt
      case _         => arr.getInt(i)
    }
}

/** dot(q, x̂) from an SQ8 codes row: `base + Σᵢ qdelta(i) · codes(i)`,
  * folded left-to-right in double — bit-identical to the HOF twin
  * `aggregate(sequence(0, d-1), base, (acc, i) => acc + qd[i+1] *
  * int(codes[i+1]))` ([[graft.operators.SqIndex.sqScoreHof]]) on every
  * well-formed row. A codes array shorter than the grid, or a null
  * element, yields NULL — deliberately SAFER than the twin, whose ANSI
  * `element_at` would fail the whole scan on one corrupt row (codes are
  * engine-written and always full-length, so the two never diverge on
  * real data; SqIndexSpec pins both claims). Extra trailing codes are
  * ignored exactly as the twin's bounded sequence ignores them. */
case class SqScoreExpr(child: Expression, base: Double,
                       qdelta: IndexedSeq[Double])
    extends UnaryExpression with CodesArrayKernel {

  @transient private lazy val qd: Array[Double] = qdelta.toArray

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val d = qd.length
    if (codes.numElements() < d) return null
    var acc = base
    var i = 0
    while (i < d) {
      if (codes.isNullAt(i)) return null
      acc += qd(i) * elemScala(codes, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tab = ctx.addReferenceObj("qdelta", qd, "double[]")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($c.numElements() < ${qd.length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = $base;
         |  for (int $i = 0; $i < ${qd.length}; $i++) {
         |    if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $tab[$i] * ${elemJava(c, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SqScoreExpr =
    copy(child = newChild)
}

/** The PQ asymmetric-distance fold from a codes row: `Σ_mi
  * table(mi·ks + codes(mi))`, folded left-to-right in double from 0.0 —
  * bit-identical to the HOF twin `aggregate(sequence(0, m-1), 0.0,
  * (acc, mi) => acc + tab[mi·ks + int(codes[mi+1]) + 1])`
  * ([[graft.operators.PqIndex.adcScoreHof]]) on every VALID codes row.
  * Short arrays, null elements, and codes outside [0, ks) all yield
  * NULL — deliberately SAFER than the twin, whose ANSI `element_at`
  * fails the whole scan on a short row and whose 1-based table index
  * would read a NEIGHBORING subspace's entry for an out-of-range code
  * (codes are engine-written and always in range, so the two never
  * diverge on real data; PqIndexSpec pins both claims). */
case class PqAdcScoreExpr(child: Expression, table: IndexedSeq[Double],
                          ks: Int)
    extends UnaryExpression with CodesArrayKernel {

  require(ks > 0 && table.nonEmpty && table.length % ks == 0,
    s"ADC table length ${table.length} must be a positive multiple of ks=$ks")

  @transient private lazy val tab: Array[Double] = table.toArray
  private def m: Int = table.length / ks

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() < m) return null
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) return null
      val c = elemScala(codes, mi)
      if (c < 0 || c >= ks) return null
      acc += tab(mi * ks + c)
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val t = ctx.addReferenceObj("adcTable", tab, "double[]")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |if ($codes.numElements() < $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    if ($codes.isNullAt($mi)) { ${ev.isNull} = true; break; }
         |    int $c = ${elemJava(codes, mi)};
         |    if ($c < 0 || $c >= $ks) { ${ev.isNull} = true; break; }
         |    $acc += $t[$mi * $ks + $c];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcScoreExpr =
    copy(child = newChild)
}
