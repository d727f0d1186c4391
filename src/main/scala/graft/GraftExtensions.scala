package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, Shingles, SimHash64}

/** Engine extensions: registers the native expressions as SQL functions.
  *
  * Two install paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) — the standard
  *    extension-point route;
  *  - `GraftExtensions.install(spark)` — programmatic registration on an
  *    already-running session (what Verify/Bench/tests use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.simhashFunction)
    ext.injectFunction(GraftExtensions.shinglesFunction)
  }
}

object GraftExtensions {
  private val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2, "graft_dot(a, b) takes two array arguments")
      DotProduct(exprs.head, exprs(1))
    })

  private val simhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1, "graft_simhash(tokens) takes one array<string> argument")
      SimHash64(exprs.head)
    })

  private val shinglesFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        "graft_shingles(tokens, n) takes an array<string> and an int literal")
      val n = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_shingles: n must be an int literal, got $other")
      }
      Shingles(exprs.head, n)
    })

  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      dotFunction._1, dotFunction._2, dotFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      simhashFunction._1, simhashFunction._2, simhashFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      shinglesFunction._1, shinglesFunction._2, shinglesFunction._3)
  }

  /** Column-API handle on the native expression. */
  def dotCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  }
}
