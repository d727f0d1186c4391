package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass Gopher-gate statistics — the four raw counts every
  * Gopher quality rule (Rae et al. 2021 §A1.1) derives from, over the
  * engine's whitespace tokens ([[Tokens]] — space-run tokenization):
  *
  *   - `n_words`: token count;
  *   - `sum_len`: Σ of per-token CHARACTER counts (Spark `length`
  *     semantics — code points via UTF8String.numChars);
  *   - `n_stop`: tokens equal to one of {the, a, of, to, in};
  *   - `top_cnt`: occurrence count of the most frequent token
  *     (NULL when there are no tokens — mirroring
  *     `array_max(transform(array_distinct([]), …))`).
  *
  * Replaces the higher-order formulation (`aggregate` for sum_len,
  * nested `transform(array_distinct, w -> size(filter(tk, = w)))` for
  * top_cnt) that the AdmitProbe priced at MORE than both dedup tiers
  * of the gated admission kernel at 1M documents: the HOF lambdas are
  * CodegenFallback (interpreted dispatch per ELEMENT) and the top-word
  * fold is O(distinct × n) per ROW. This is one static call per row —
  * a single token scan plus an open-addressed count over the token
  * array — inside whole-stage codegen. Only the COUNTS move here; the
  * derived ratios/predicates stay Catalyst expressions in
  * `TextAnalysis.gopherCols`, so null/zero-token edge semantics are
  * the built-ins' own. Bit-parity with the retained HOF twin is
  * asserted in TextAnalysisSpec. */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_gopher_stats expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    GopherStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.GopherStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  private val stopwords: Array[UTF8String] =
    Array("the", "a", "of", "to", "in").map(UTF8String.fromString)

  /** static entry point shared by interpreted eval and generated code */
  def compute(s: UTF8String): InternalRow = {
    val toks = Tokens.compute(s)
    val n = toks.length
    var sumLen = 0L
    var nStop = 0L
    var i = 0
    while (i < n) {
      val t = toks(i)
      sumLen += t.numChars()
      var j = 0
      while (j < stopwords.length) {
        if (t.equals(stopwords(j))) { nStop += 1; j = stopwords.length }
        else j += 1
      }
      i += 1
    }
    if (n == 0)
      return InternalRow(0L, 0L, 0L, null)
    // most-frequent-token count: open-addressed linear-probe table over
    // the token array (capacity = next pow2 ≥ 2n, so load factor ≤ 0.5)
    val cap = Integer.highestOneBit(math.max(4, n * 2 - 1)) << 1
    val mask = cap - 1
    val keys = new Array[UTF8String](cap)
    val counts = new Array[Int](cap)
    var top = 0
    i = 0
    while (i < n) {
      val t = toks(i)
      var slot = t.hashCode() & mask
      while (keys(slot) != null && !keys(slot).equals(t))
        slot = (slot + 1) & mask
      if (keys(slot) == null) keys(slot) = t
      counts(slot) += 1
      if (counts(slot) > top) top = counts(slot)
      i += 1
    }
    InternalRow(n.toLong, sumLen, nStop, top.toLong)
  }
}
