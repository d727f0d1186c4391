package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick fox"),
    (2L, "fox quick the"),   // same token multiset as 1
    (3L, "the quick fox"),   // byte-identical to 1
    (4L, "something else")
  ).toDF("doc_id", "text")

  test("tokenFingerprint: order-insensitive, content-sensitive") {
    val fps = docs.select(Dedup.tokenFingerprint($"text").as("fp"))
      .as[String].collect.toSeq
    assert(fps(0) === fps(1))
    assert(fps(0) === fps(2))
    assert(fps(0) !== fps(3))
  }

  test("exact: min-id representative and duplicate counts") {
    val got = Dedup.exact(docs, Dedup.tokenFingerprint($"text"), $"doc_id")
      .select("rep_id", "dup_cnt").as[(Long, Long)].collect.toSet
    assert(got === Set((1L, 3L), (4L, 1L)))
  }

  test("dropDuplicatesByKey keeps the full min-id row per group") {
    val kept = Dedup.dropDuplicatesByKey(docs, Dedup.tokenFingerprint($"text"), $"doc_id")
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    val got = kept.as[(Long, String)].collect.toSet
    assert(got === Set((1L, "the quick fox"), (4L, "something else")))
  }
}
