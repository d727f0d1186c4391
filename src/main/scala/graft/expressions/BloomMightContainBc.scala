package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a BROADCAST filter — the at-scale
  * alternative to `BloomFilterMightContain(Literal(bytes), …)` for the
  * gram-index router ([[graft.operators.SpanDedup.crossStripSpansIndexed]]).
  *
  * The literal form embeds the serialized filter in the logical plan and
  * in every task binary: fine up to the size gate (64 MB — see
  * `SpanDedup.MaxBloomLiteralBytes`), a scale-killer at the 10⁹–10¹⁰
  * distinct-gram design point where the sidecar is gigabytes. This
  * expression instead carries only the torrent-broadcast HANDLE in the
  * plan; each executor fetches the filter once from the block manager
  * (constructor-time in generated code — the fetch never sits on the
  * per-row path) and probes it with the same `mightContainLong` the
  * built-in uses, so router decisions are bit-identical across the two
  * forms (asserted in SpanDedupSpec via the forced-fallback gate).
  *
  * Long input only — the gram index always ships `xxhash64` keys.
  */
case class BloomMightContainBc(bc: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_bc expects bigint, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    bc.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    // fetched once per generated-class instance (per task), not per row
    val bloom = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloom",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$bloom.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBc =
    copy(child = newChild)
}
