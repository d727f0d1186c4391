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

  test("hashShard: total routing, parallelism-independence, shard-dir layout") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val sharded = Sampling.hashShard(docs, "doc_id", 8)
    val got = sharded.select($"doc_id", $"shard").as[(Long, Long)]
      .collect().toMap
    // exactly one shard per doc, all shards in range
    assert(got.size === 200 && got.values.forall(s => s >= 0 && s < 8))
    // parallelism-independent: a 1-partition replay routes identically
    val got1 = Sampling.hashShard(docs.coalesce(1), "doc_id", 8)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    assert(got1 === got)
    // write-time layout: one partition directory per shard
    val tmp = java.nio.file.Files.createTempDirectory("graft-shard").toString
    try {
      sharded.repartition(col("shard"))
        .write.partitionBy("shard").mode("overwrite").parquet(s"$tmp/out")
      val dirs = new java.io.File(s"$tmp/out").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs === got.values.toSet.map((s: Long) => s"shard=$s"))
      // round-trip preserves every row
      val back = spark.read.parquet(s"$tmp/out")
      assert(back.count() === 200L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }
}
