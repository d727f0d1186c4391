package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{QueryVectors, Tables, TestSpark}

class HyperplaneLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")

  test("driver-side bucket matches the executor-side bucket column") {
    val ps = HyperplaneLsh.planes(64, 8)
    // treat each corpus vector as a query: its own bucket column value
    // must equal the Scala-computed bucket
    val rows = emb.limit(20)
      .select($"vec_id", $"embedding",
        HyperplaneLsh.bucketCol($"embedding", ps).as("b"))
      .collect()
    rows.foreach { r =>
      val vec = r.getSeq[Float](1).map(_.toDouble).toIndexedSeq
      assert(HyperplaneLsh.bucketOf(vec, ps) === r.getLong(2))
    }
  }

  test("a vector identical to the query is always found (self-recall = 1)") {
    val q = emb.filter($"vec_id" === 42).select("embedding")
      .as[Array[Float]].head.map(_.toDouble).toSeq
    val got = HyperplaneLsh.annSearch(emb, "vec_id", "embedding", q, k = 1)
      .select("vec_id").as[Long].head
    assert(got === 42L)
  }

  test("probing prunes the corpus and keeps useful recall") {
    val ps = HyperplaneLsh.planes(64, 4)
    val probes = HyperplaneLsh.probeSet(QueryVectors.q1, ps)
    val candidates = emb
      .withColumn("b", HyperplaneLsh.bucketCol($"embedding", ps))
      .filter($"b".isin(probes: _*)).count()
    val total = emb.count()
    assert(candidates < total / 2, s"no pruning: $candidates of $total")

    val exact = Search.topK(emb, "embedding", "vec_id", QueryVectors.q1, 10)
      .select("vec_id").as[Long].collect.toSet
    val approx = HyperplaneLsh.annSearch(emb, "vec_id", "embedding",
      QueryVectors.q1, k = 10, nBits = 4).select("vec_id").as[Long].collect.toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall with $candidates/$total candidates")
  }
}
