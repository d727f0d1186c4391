package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local span-strip: given a document's token array and its
  * duplicated spans (array of (span_start, span_end) int structs,
  * 1-based inclusive token positions), drop every token inside any
  * span and return struct(kept_tokens, cleaned_text) — survivors
  * rejoined in order with single spaces.
  *
  * This replaces the exploded strip tail (posexplode every token
  * position → anti-join against exploded span coverage → collect_list
  * + array_sort + interpreted-lambda reassembly): three shuffles of a
  * TOKEN-POSITION-sized relation and a CodegenFallback transform per
  * doc become one join of the doc against its (tiny, per-doc) span
  * list plus this single static call per row. The old formulation is
  * retained as `SpanDedup.stripFromExploded` and pinned row-identical
  * in SpanDedupSpec.
  *
  * Null semantics (matching the exploded form exactly):
  *   - null token array (null text) → (0, "") — posexplode of null
  *     produced no rows, so the left join yielded the coalesce
  *     defaults;
  *   - null/empty span array (doc has no duplicated span — the left
  *     join miss) → all tokens kept, single-space joined;
  *   - overlapping or unordered spans are merged by a sort + merge
  *     walk (the islands producer emits disjoint ordered spans, but
  *     this kernel does not rely on it).
  *
  * The output is NEVER null, so the expression declares nullable =
  * false and carries its own null handling instead of
  * BinaryExpression's null-intolerant default. */
case class StripSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("kept_tokens", LongType, nullable = false),
    StructField("cleaned_text", StringType, nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
            ArrayType(StructType(Array(
              StructField(_, IntegerType, _, _),
              StructField(_, IntegerType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_strip_spans expects (array<string>, " +
          s"array<struct<int,int>>), got (${l.simpleString}, " +
          s"${r.simpleString})")
    }

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    val s = right.eval(input)
    StripSpans.compute(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val t = left.genCode(ctx)
    val s = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${t.code}
        ${s.code}
        InternalRow ${ev.value} = graft.expressions.StripSpans.compute(
          ${t.isNull} ? null : ${t.value},
          ${s.isNull} ? null : ${s.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripSpans =
    copy(left = newLeft, right = newRight)
}

object StripSpans {
  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = UTF8String.fromString("")

  /** static entry point shared by interpreted eval and generated code;
    * either argument may be null (see class doc). */
  def compute(toks: ArrayData, spans: ArrayData): InternalRow = {
    if (toks == null) return InternalRow(0L, EMPTY)
    val m = toks.numElements()
    val ns = if (spans == null) 0 else spans.numElements()
    if (ns == 0) {
      val all = new Array[UTF8String](m)
      var i = 0
      while (i < m) { all(i) = toks.getUTF8String(i); i += 1 }
      return InternalRow(m.toLong, UTF8String.concatWs(SPACE, all: _*))
    }
    // sort span starts/ends together (insertion sort: span counts are
    // per-doc small), then a merge walk over 1-based token positions
    val ss = new Array[Int](ns)
    val ee = new Array[Int](ns)
    var i = 0
    while (i < ns) {
      val st = spans.getStruct(i, 2)
      ss(i) = st.getInt(0)
      ee(i) = st.getInt(1)
      i += 1
    }
    i = 1
    while (i < ns) {
      val (s0, e0) = (ss(i), ee(i))
      var j = i - 1
      while (j >= 0 && ss(j) > s0) { ss(j + 1) = ss(j); ee(j + 1) = ee(j); j -= 1 }
      ss(j + 1) = s0; ee(j + 1) = e0
      i += 1
    }
    val kept = new Array[UTF8String](m)
    var nk = 0
    var si = 0
    var covEnd = 0 // rightmost covered position seen so far
    var p = 1
    while (p <= m) {
      while (si < ns && ss(si) <= p) {
        if (ee(si) > covEnd) covEnd = ee(si)
        si += 1
      }
      if (p > covEnd) {
        kept(nk) = toks.getUTF8String(p - 1)
        nk += 1
      }
      p += 1
    }
    val out = new Array[UTF8String](nk)
    System.arraycopy(kept, 0, out, 0, nk)
    InternalRow(nk.toLong, UTF8String.concatWs(SPACE, out: _*))
  }
}
