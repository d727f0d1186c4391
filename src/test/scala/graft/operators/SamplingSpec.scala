package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def knuth(id: Long): Long =
    ((id % 1000003L) * 2654435761L) % 1000000L

  test("clusterBalanced takes the m smallest-hash ids per cluster, in hash order") {
    val assign = (0L until 200L).map(id => (id, (id % 7).toInt))
      .toDF("vec_id", "cluster_id")
    val got = Sampling.clusterBalanced(assign, "vec_id", "cluster_id", m = 4)
      .as[(Int, Long, Int)].collect().toSeq
    // naive ground truth: per cluster, sort by (hash, id), take 4
    val want = (0L until 200L).groupBy(id => (id % 7).toInt)
      .flatMap { case (c, ids) =>
        ids.sortBy(id => (knuth(id), id)).take(4).zipWithIndex
          .map { case (id, i) => (c, id, i + 1) }
      }.toSeq
    assert(got.toSet === want.toSet)
    assert(got.size === 7 * 4)
  }

  test("a cluster smaller than the budget yields all its rows; result is deterministic") {
    val assign = Seq((1L, 0), (2L, 0), (3L, 1))
      .toDF("vec_id", "cluster_id")
    val a = Sampling.clusterBalanced(assign, "vec_id", "cluster_id", m = 5)
      .as[(Int, Long, Int)].collect().toSet
    val b = Sampling.clusterBalanced(assign, "vec_id", "cluster_id", m = 5)
      .as[(Int, Long, Int)].collect().toSet
    assert(a === b)
    assert(a.map(_._2) === Set(1L, 2L, 3L))
    assert(a.count(_._1 == 0) === 2 && a.count(_._1 == 1) === 1)
  }
}
