package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over a token array: `numHashes` seeded minima
  * of token-3-gram hashes. Bit-identical to the higher-order formulation
  * in `NearDup.minHashSignatureHof` (asserted in NearDupSpec):
  *   - token hash: xxhash64(token) (seed 42);
  *   - position padding: two trailing 0L sentinels (so every token starts
  *     one 3-gram);
  *   - shingle hash per seed s: the Spark multi-arg xxhash64 chain
  *     hash(s:int) → hash(t_i) → hash(t_i+1) → hash(t_i+2), seed 42.
  *
  * One static call per row over primitive arrays — the HOF chain walks
  * interpreted lambdas per (position × seed).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      MinHashSig.compute(a.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.MinHashSig.compute($c, $numHashes))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  // the first link of the multi-arg xxhash64 chain, hash(seed_id, 42), is
  // ROW-invariant (it depends only on the seed index), so the table is
  // computed once per JVM per numHashes, not per row (5k docs × 32 seeds
  // would otherwise redo 160k hash calls + one allocation per pass)
  private val seedBases =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seedBaseFor(numHashes: Int): Array[Long] =
    seedBases.computeIfAbsent(numHashes, { n =>
      Array.tabulate(n)(s => XxHash64Function.hash(s, IntegerType, 42L))
    })

  /** static entry point shared by interpreted eval and generated code */
  def compute(arr: ArrayData, numHashes: Int): Array[Long] = {
    val n = arr.numElements()
    // token hashes with two 0L pads — mirrors the HOF shifted-array zip
    val th = new Array[Long](n + 2)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // xxhash64(null) returns the seed unchanged, so a null token must
      // hash to 42L (not 0L) to stay bit-identical to the HOF twin
      th(i) = if (s == null) 42L else XxHash64Function.hash(s, StringType, 42L)
      i += 1
    }
    val seedBase = seedBaseFor(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var p = 0
    while (p < n) {
      var s = 0
      while (s < numHashes) {
        // Spark multi-arg xxhash64 chain: each value hashed with the
        // running hash as seed, starting at 42
        var h = XxHash64Function.hash(th(p), LongType, seedBase(s))
        h = XxHash64Function.hash(th(p + 1), LongType, h)
        h = XxHash64Function.hash(th(p + 2), LongType, h)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      p += 1
    }
    sig
  }
}
