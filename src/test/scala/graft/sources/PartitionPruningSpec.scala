package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** SURVEY.md §4.2 "partition pruning (static + dynamic)": both forms
  * against a partitioned-layout table. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    Tables.load(spark, TestSpark.sf0001, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    dir
  }

  test("static pruning: a literal partition filter reaches PartitionFilters") {
    val q = spark.read.parquet(path).filter($"event_type" === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    assert(q.count() === Tables.load(spark, TestSpark.sf0001, "events")
      .filter($"event_type" === "click").count())
  }

  test("dynamic pruning: a selective dim join prunes fact partitions at runtime") {
    val fact = spark.read.parquet(path)
    // DPP requires a non-local (file-backed) dim side with a selective
    // non-key filter
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dim").toString + "/d"
    Seq(("click", 1), ("purchase", 2), ("view", 3), ("error", 4), ("signup", 5))
      .toDF("etype", "w").write.mode("overwrite").parquet(dimPath)
    val ratioKey = "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
    val prevRatio = spark.conf.get(ratioKey)
    spark.conf.set(ratioKey, "10")
    try {
      val dim = spark.read.parquet(dimPath).filter($"w" === 1)
      val joined = fact.join(dim, fact("event_type") === dim("etype"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamic pruning subquery in the fact scan:\n$plan")
      assert(joined.count() === Tables.load(spark, TestSpark.sf0001, "events")
        .filter($"event_type" === "click").count())
    } finally {
      spark.conf.set(ratioKey, prevRatio)
    }
  }
}
