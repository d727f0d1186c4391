package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{BpeEncode, DotProduct, GopherStats, JaccardSorted, L2Distance, NfcNormalize, PolyHash, Shingles, SimHash64, WinnowFp}

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
    ext.injectFunction(GraftExtensions.l2Function)
    ext.injectFunction(GraftExtensions.simhashFunction)
    ext.injectFunction(GraftExtensions.shinglesFunction)
    ext.injectFunction(GraftExtensions.nfcFunction)
    ext.injectFunction(GraftExtensions.winnowFunction)
    ext.injectFunction(GraftExtensions.bpeFunction)
    ext.injectFunction(GraftExtensions.jaccardSortedFunction)
    ext.injectFunction(GraftExtensions.polyHashFunction)
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

  private val l2Function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_l2"),
    new ExpressionInfo(classOf[L2Distance].getName, "graft_l2"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2, "graft_l2(a, b) takes two array arguments")
      L2Distance(exprs.head, exprs(1))
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
        "graft_shingles(tokens, n) takes an array<string> and a foldable integer")
      // standard SQL function ergonomics: any foldable integral expression
      // works as n — an INT literal, a BIGINT literal (3L), or a constant
      // arithmetic expression (1+2) — not just a pre-folded IntegerType
      // literal
      val e = exprs(1)
      val n = e match {
        case _ if e.foldable => e.eval() match {
          case v: Int => v
          case v: Long =>
            require(v >= 1 && v <= Int.MaxValue,
              s"graft_shingles: n out of range: $v")
            v.toInt
          case v: Short => v.toInt
          case v: Byte => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_shingles: n must be integral, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"graft_shingles: n must be a foldable integer expression, got $other")
      }
      Shingles(exprs.head, n)
    })

  private val nfcFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1, "graft_nfc(s) takes one string argument")
      NfcNormalize(exprs.head)
    })

  private val winnowFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_winnow"),
    new ExpressionInfo(classOf[WinnowFp].getName, "graft_winnow"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        "graft_winnow(tokens, window) takes an array<string> and a foldable integer")
      val e = exprs(1)
      require(e.foldable,
        s"graft_winnow: window must be a foldable integer expression, got $e")
      val w = e.eval() match {
        case v: Int => v
        case v: Long =>
          require(v >= 1 && v <= Int.MaxValue,
            s"graft_winnow: window out of range: $v")
          v.toInt
        case v: Short => v.toInt
        case v: Byte => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_winnow: window must be integral, got $other")
      }
      WinnowFp(exprs.head, w)
    })

  private val bpeFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bpe"),
    new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1, "graft_bpe(text) takes one string argument")
      BpeEncode(exprs.head)
    })

  private val jaccardSortedFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_jaccard_sorted"),
    new ExpressionInfo(classOf[JaccardSorted].getName, "graft_jaccard_sorted"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        "graft_jaccard_sorted(a, b) takes two sorted array<string> arguments")
      JaccardSorted(exprs.head, exprs(1))
    })

  private val gopherStatsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_gopher_stats"),
    new ExpressionInfo(classOf[GopherStats].getName, "graft_gopher_stats"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1,
        "graft_gopher_stats(text) takes one string argument")
      GopherStats(exprs.head)
    })

  private val polyHashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_polyhash"),
    new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1, "graft_polyhash(s) takes one string argument")
      PolyHash(exprs.head)
    })

  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      dotFunction._1, dotFunction._2, dotFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      l2Function._1, l2Function._2, l2Function._3)
    spark.sessionState.functionRegistry.registerFunction(
      simhashFunction._1, simhashFunction._2, simhashFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      shinglesFunction._1, shinglesFunction._2, shinglesFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      nfcFunction._1, nfcFunction._2, nfcFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      winnowFunction._1, winnowFunction._2, winnowFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      bpeFunction._1, bpeFunction._2, bpeFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      jaccardSortedFunction._1, jaccardSortedFunction._2,
      jaccardSortedFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      polyHashFunction._1, polyHashFunction._2, polyHashFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      gopherStatsFunction._1, gopherStatsFunction._2, gopherStatsFunction._3)
  }

  /** Column-API handle on the native expression. */
  def dotCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Column-API handle on the native L2-distance expression. */
  def l2Col(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(L2Distance(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Column-API handle on the weighted count-min-sketch aggregate
    * ([[graft.expressions.CmsWeighted]] — `count_min_sketch` over
    * pre-counted (item, count) rows, grid-identical to the built-in). */
  def cmsWeightedCol(item: Column, weight: Column, eps: Double,
                     confidence: Double, seed: Int): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.expressions.CmsWeighted(
      Bridge.expression(item), Bridge.expression(weight),
      eps, confidence, seed).toAggregateExpression())
  }
}
