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
