package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed tables join with ZERO exchanges (shuffle-free SMJ)") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val customer = Tables.load(spark, TestSpark.sf0001, "customer")
    Bucketing.writeBucketed(orders, "orders_bkt", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "customer_bkt", "c_custkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_bkt").join(spark.table("customer_bkt"),
        spark.table("orders_bkt")("o_custkey") ===
          spark.table("customer_bkt")("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it is still correct
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
