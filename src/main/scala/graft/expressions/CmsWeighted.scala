package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch over PRE-COUNTED (item, count) rows — the weighted
  * twin of Spark's `count_min_sketch` aggregate. `CountMinSketch.add` is
  * additive, so a sketch built from (token, n) pairs is grid-identical
  * to one built from the raw n-fold token stream with the same
  * (eps, confidence, seed) — which lets a pipeline tokenize a corpus
  * ONCE into a counted relation and derive every per-batch sketch from
  * it, instead of re-running the explode per batching scheme (the
  * `incr_heavy_hitters` finding: three tokenize passes where one
  * suffices; at 100 TB the counted relation is the vocabulary-sized
  * artifact a deployment maintains anyway). Byte-equality with the
  * unweighted built-in is pinned in SketchSpec.
  *
  * Items hash exactly as the built-in does for strings (UTF-8 bytes via
  * `addBinary` — `CountMinSketchAgg`'s StringType path), so estimates
  * from either sketch are interchangeable. Null items and null/<=0
  * counts are skipped, matching the built-in's null handling.
  */
case class CmsWeighted(item: Expression, weight: Expression,
                       eps: Double, confidence: Double, seed: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(item, weight)
  // analysis-time typing (the r13 advice): without this a non-string
  // item or an IntegerType count passes analysis and dies at execution
  // on the asInstanceOf below — the built-in CountMinSketchAgg fails at
  // analysis for the same misuse, so this aggregate must too
  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName item must be STRING, got ${item.dataType.sql}")
    else if (weight.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName weight must be BIGINT, got ${weight.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_weighted"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val s = item.eval(input)
    val w = weight.eval(input)
    if (s != null && w != null) {
      val c = w.asInstanceOf[Long]
      if (c > 0) buf.addBinary(s.asInstanceOf[UTF8String].getBytes, c)
    }
    buf
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: CountMinSketch): Any = serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsWeighted =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsWeighted =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsWeighted =
    copy(item = newChildren(0), weight = newChildren(1))
}
