package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join returns exactly the plain join's multiset") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val lineitem = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val plain = orders.join(lineitem,
      orders("o_orderkey") === lineitem("l_orderkey")).count()
    val salted = Skew.saltedJoin(lineitem, "l_orderkey",
      Seq("l_orderkey", "l_linenumber"), orders, "o_orderkey",
      factor = 8).count()
    assert(salted === plain)
  }

  test("join key space includes the salt") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val lineitem = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val p = Skew.saltedJoin(lineitem, "l_orderkey",
      Seq("l_orderkey", "l_linenumber"), orders, "o_orderkey", 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt"))
  }
}
