package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native repetition-ratio quality signal — the row-local "fraction of
  * n-grams occupied by the most frequent n-gram" (Gopher-style
  * repetition filter), semantics identical to the higher-order
  * formulation retained as `TextAnalysis.repetitionRatioColHof`
  * (spec-pinned):
  *
  *   - tokens ([[Tokens]] — space runs), n-gram shingles
  *     ([[Shingles]] — single-space joined windows);
  *   - NULL for docs with fewer than `n` tokens (no n-gram — mirrors
  *     `when(size(tokens) >= n, …)`);
  *   - grams sorted (UTF8String binary order = `array_sort`), longest
  *     equal-run = max count; `round(best / n_grams, 4)` with Spark's
  *     Round semantics (`BigDecimal.valueOf(x).setScale(4, HALF_UP)`).
  *
  * The HOF version was an interpreted `aggregate` lambda over the
  * sorted gram array per ROW — profiled as a ~0.5 s single-task stall
  * inside q_trainmix_e2e's per-group offsets build (the whole corpus's
  * fold on one broadcast-build task) and the bulk of TrainmixProbe's
  * quality stage at 1M docs. One static call per row instead. */
case class RepetitionRatio(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_rep_ratio expects string, got ${dt.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else RepetitionRatio.compute(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val t = child.genCode(ctx)
    val boxed = ctx.freshName("repRatio")
    ev.copy(code =
      code"""
        ${t.code}
        java.lang.Double $boxed = ${t.isNull} ? null :
          graft.expressions.RepetitionRatio.compute(${t.value}, $n);
        boolean ${ev.isNull} = $boxed == null;
        double ${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
      """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionRatio = copy(child = newChild)
}

object RepetitionRatio {
  /** static entry point shared by interpreted eval and generated code;
    * returns null (no n-gram) for docs shorter than `n` tokens. */
  def compute(s: UTF8String, n: Int): java.lang.Double = {
    val toks = Tokens.compute(s)
    if (toks.length < n) return null
    val grams = Shingles.compute(
      new GenericArrayData(toks.asInstanceOf[Array[AnyRef]]), n)
    java.util.Arrays.sort(grams,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var best = 0
    var run = 0
    var i = 0
    while (i < grams.length) {
      if (i > 0 && grams(i).equals(grams(i - 1))) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    java.lang.Double.valueOf(
      java.math.BigDecimal.valueOf(best.toDouble / grams.length)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
  }
}
