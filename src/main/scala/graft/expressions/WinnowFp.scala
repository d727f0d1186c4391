package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native winnowing document fingerprint over a token array: the sorted
  * distinct minima of each sliding `window` of token-3-gram hashes.
  * Bit-identical to the higher-order formulation in
  * `NearDup.winnowFingerprintHof` (asserted in NearDupSpec):
  *   - token hash: xxhash64(token) (seed 42; null token → 42L, the seed
  *     passed through unchanged, exactly like the HOF's xxhash64(null));
  *   - position padding: two trailing 0L sentinels (so every token
  *     starts one 3-gram);
  *   - shingle hash: the Spark multi-arg xxhash64 chain
  *     hash(t_i) → hash(t_i+1) → hash(t_i+2), seed 42;
  *   - fingerprint: min of each of the max(n-window+1, 1) sliding
  *     windows, deduplicated, ascending.
  *
  * One static call per row over primitive arrays — the HOF chain builds
  * a struct-zip + a slice + an array_min allocation per position through
  * interpreted lambdas (measured 21 s for the 5k-doc sf0.1 fixture on
  * the single task a one-file parquet scan gets; native ~100 ms).
  */
case class WinnowFp(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      WinnowFp.compute(a.asInstanceOf[ArrayData], window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.WinnowFp.compute($c, $window))")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {
  /** static entry point shared by interpreted eval and generated code */
  def compute(arr: ArrayData, window: Int): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return Array.emptyLongArray
    // token hashes with two 0L pads — mirrors the HOF shifted-array zip
    val th = new Array[Long](n + 2)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      th(i) = if (s == null) 42L else XxHash64Function.hash(s, StringType, 42L)
      i += 1
    }
    val sh = new Array[Long](n)
    i = 0
    while (i < n) {
      var h = XxHash64Function.hash(th(i), LongType, 42L)
      h = XxHash64Function.hash(th(i + 1), LongType, h)
      h = XxHash64Function.hash(th(i + 2), LongType, h)
      sh(i) = h
      i += 1
    }
    // minimum of each sliding window (slices past the end truncate,
    // matching slice()'s semantics); O(n·window) with window ~4
    val nWin = math.max(n - (window - 1), 1)
    val mins = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var m = Long.MaxValue
      var j = w
      val end = math.min(w + window, n)
      while (j < end) {
        if (sh(j) < m) m = sh(j)
        j += 1
      }
      mins(w) = m
      w += 1
    }
    // ascending distinct — array_sort(array_distinct(...)) parity
    java.util.Arrays.sort(mins)
    var out = 1
    var idx = 1
    while (idx < nWin) {
      if (mins(idx) != mins(idx - 1)) { mins(out) = mins(idx); out += 1 }
      idx += 1
    }
    if (out == nWin) mins else java.util.Arrays.copyOf(mins, out)
  }
}
