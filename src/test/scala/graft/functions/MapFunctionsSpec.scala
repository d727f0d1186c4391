package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** B31 map-function coverage: word-frequency as a per-doc map column —
  * the map surface the oracle can't hash-compare (dict ordering), unit-
  * tested instead. */
class MapFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("map_from_entries builds a per-doc word-count map; element_at reads it") {
    val docs = Seq((1L, "a b a c b a")).toDF("doc_id", "text")
    val wordCounts = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(map_from_entries(array_sort(collect_list(struct($"w", $"c"))))
        .as("wc"))
    val m = wordCounts.select($"wc").as[Map[String, Long]].head
    assert(m === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val a = wordCounts.select(element_at($"wc", "a")).as[Long].head
    assert(a === 3L)
    val keys = wordCounts.select(map_keys($"wc")).as[Seq[String]].head
    assert(keys.sorted === Seq("a", "b", "c"))
  }
}
