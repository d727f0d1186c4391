package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke every declared query on sf0.001: runs, non-degenerate, and the
  * driver contract holds (oracle keys ⊆ query keys, column names stable).
  * Exact value parity vs DuckDB is the driver's gate, replicated locally
  * by tools/check_oracle.py at sf0.01. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("localFrameOrdered orders like Spark for supplementary chars (r14 advice)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // U+10000 (surrogate pair 0xD800 0xDC00) vs U+E000: UTF-16 code-unit
    // order puts the pair FIRST, code-point/UTF-8 order puts it LAST —
    // the exact divergence the helper used to inherit from compareTo
    val df = Seq("\uE000", new String(Character.toChars(0x10000)), "a", "")
      .toDF("k")
    val sparkOrder = df.orderBy(col("k")).as[String].collect().toSeq
    val local = Queries.localFrameOrdered(df, "k").as[String].collect().toSeq
    assert(local === sparkOrder)
    val sparkDesc = df.orderBy(col("k").desc).as[String].collect().toSeq
    val localDesc = Queries.localFrameOrdered(df, "-k").as[String].collect().toSeq
    assert(localDesc === sparkDesc)
    // non-atomic key fails loudly instead of casting blind
    val arr = Seq(Seq(1, 2), Seq(3)).toDF("k")
    intercept[IllegalArgumentException](
      Queries.localFrameOrdered(arr, "k").collect())
  }

  test("entry (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Queries.all.foreach { case (name, q) =>
    test(s"query $name runs on sf0.001 with stable columns") {
      val df = q.build(spark, TestSpark.sf0001)
      val cols = df.columns.toSeq
      assert(cols.distinct === cols, "duplicate column names break the oracle compare")
      assert(cols.nonEmpty)
      // deterministic: running twice gives identical collected output
      val a = df.collect().toSeq
      val b = q.build(spark, TestSpark.sf0001).collect().toSeq
      assert(a === b, s"$name is nondeterministic")
    }
  }
}
