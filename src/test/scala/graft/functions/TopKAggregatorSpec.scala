package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Search

class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggregator keeps exactly k best with deterministic tie-break") {
    val topk = udaf(new TopKAggregator(3))
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 5L), (1L, 0.1, 1L), (1L, 0.5, 2L), (1L, 0.9, 20L),
      (2L, 0.2, 7L)
    ).toDF("g", "score", "id")
    val got = df.groupBy("g").agg(topk($"score", $"id").as("top"))
      .as[(Long, Seq[(Double, Long)])].collect.toMap
    assert(got(1L) === Seq((0.9, 5L), (0.9, 10L), (0.9, 20L)))
    assert(got(2L) === Seq((0.2, 7L)))
  }

  test("knnJoinAgg gives identical results to the window-based knnJoin") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter($"vec_id" < 8)
    val viaWindow = Search.knnJoin(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3)
      .select($"qid", col("vec_id").as("cid"), $"sim", $"rank".cast("long"))
      .as[(Long, Long, Double, Long)].collect.toSet
    val viaAgg = Search.knnJoinAgg(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3)
      .select($"qid", $"cid", $"sim", $"rank".cast("long"))
      .as[(Long, Long, Double, Long)].collect.toSet
    assert(viaAgg === viaWindow)
  }

  test("partial aggregation: plan shows two aggregate phases, no Window") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter($"vec_id" < 4)
    val p = Search.knnJoinAgg(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3).queryExecution.executedPlan.toString
    assert(!p.contains("Window"))
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation in:\n$p")
  }
}
