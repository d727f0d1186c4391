package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd nearest-centroid argmin — the k-means assignment
  * kernel of [[graft.operators.IvfIndex]] as ONE compiled expression
  * (SURVEY.md §2 B5/B6).
  *
  * Returns the POSITION (0-based) of the centroid with the smallest
  * Euclidean distance to the input vector; ties break to the smallest
  * position; distances are compared AFTER `Math.sqrt`, reproducing the
  * historical higher-order-function fold
  * (`aggregate(cents, inf-struct, least(…L2Distance…))`) exactly on
  * uniform corpora — same per-element double fold as
  * [[L2Distance]], same rounded-comparison space, same tie rule
  * (asserted against the HOF twin in IvfIndexSpec).
  *
  * Why an expression and not the HOF: `aggregate` is CodegenFallback —
  * per row it pays interpreted lambda plumbing per centroid, and the
  * assignment runs once per corpus row per Lloyd iteration, so at
  * corpus scale the interpreter overhead IS the build's compute bill.
  * Here the k·d loop is a tight primitive nest inside whole-stage
  * codegen; the centroid matrix rides along as ONE plan reference
  * (`double[][]`), not k·d literal nodes.
  *
  * A vector whose length matches NO centroid yields NULL (a ragged
  * corpus cannot silently land in a cell; [[graft.operators.IvfIndex
  * .build]] turns that null into its loud ragged-corpus error — the
  * HOF fold's null-first ordering instead assigned such rows
  * arbitrarily, a hazard this expression deliberately removes).
  * Centroids of a DIFFERENT length than the input are skipped, never
  * compared. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "NearestCentroid needs at least one centroid")

  // the centroid matrix is a plan PARAMETER: the case-class default
  // would compare it by array reference identity, so two semantically
  // identical NearestCentroid nodes would never be equal — defeating
  // Catalyst canonicalization / subexpression elimination. Compare and
  // hash the matrix by VALUE instead.
  override def equals(other: Any): Boolean = other match {
    case NearestCentroid(c, m) =>
      c == child && java.util.Arrays.deepEquals(
        m.asInstanceOf[Array[AnyRef]], centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  override def dataType: DataType = IntegerType

  // null input vector, or a vector matching no centroid's length
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects array<float|double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val lf = isFloat
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val ce = centroids(c)
      if (ce.length == n) {
        var acc = 0.0
        var i = 0
        while (i < n) {
          val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
          val d = xv - ce(i)
          acc += d * d
          i += 1
        }
        val dist = math.sqrt(acc)
        if (dist < bestD) { bestD = dist; best = c }
      }
      c += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val ce = ctx.freshName("ce")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val getV = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = $v.numElements();
         |int $best = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double[] $ce = $cents[$c];
         |  if ($ce.length != $n) continue;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $getV - $ce[$i];
         |    $acc += $d * $d;
         |  }
         |  double $dist = java.lang.Math.sqrt($acc);
         |  if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |}
         |if ($best < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
