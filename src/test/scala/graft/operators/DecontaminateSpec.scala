package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flags only training docs echoing an eval n-gram, with distinct-hit counts") {
    val train = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),       // echoes eval 1
      (11L, "completely unrelated training text here"),
      (12L, "quick brown fox appears twice quick brown fox end"), // distinct-counted once
      (13L, "short doc")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a quick brown fox story"),
      (2L, "short doc")                                           // <3 tokens → whole-doc shingle
    ).toDF("doc_id", "text")
    val got = Decontaminate.contaminated(train, "doc_id", "text", eval, "text", n = 3)
      .as[(Long, Long)].collect.toMap
    assert(got.get(10L) === Some(1L), "shared 'quick brown fox' 3-gram")
    assert(got.get(12L) === Some(1L), "repeated phrase counts once (distinct shingles)")
    assert(got.get(13L) === Some(1L), "short doc matches eval's whole-doc shingle")
    assert(!got.contains(11L), "clean doc must not be flagged")
  }

  test("short-eval fallback: a 2-token eval answer inside a longer training doc is flagged") {
    val train = Seq(
      (20L, "the answer is forty two obviously"), // contains the short eval item
      (21L, "no relevant content at all"),
      (22L, "forty two")                          // verbatim-equal to the short item
    ).toDF("doc_id", "text")
    val eval = Seq((1L, "forty two")).toDF("doc_id", "text") // 2 tokens < n=5
    val got = Decontaminate.contaminated(train, "doc_id", "text", eval, "text", n = 5)
      .as[(Long, Long)].collect.toMap
    assert(got.get(20L) === Some(1L), "containment at the item's own length")
    assert(got.get(22L) === Some(1L),
      "verbatim short duplicate counts exactly once (no base+fallback double count)")
    assert(!got.contains(21L))
    // without the fallback only the verbatim whole-doc match survives
    val base = Decontaminate.contaminated(train, "doc_id", "text", eval, "text",
      n = 5, shortEvalPass = false).as[(Long, Long)].collect.toMap
    assert(base === Map(22L -> 1L))
  }

  test("short-eval fallback composes with n-gram hits into distinct-shingle counts") {
    val train = Seq(
      // echoes the eval 3-gram "alpha beta gamma" AND contains the
      // 2-token item "delta epsilon" → 2 distinct hits
      (30L, "alpha beta gamma then delta epsilon end")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "alpha beta gamma trailer"),
      (2L, "delta epsilon")
    ).toDF("doc_id", "text")
    val got = Decontaminate.contaminated(train, "doc_id", "text", eval, "text", n = 3)
      .as[(Long, Long)].collect.toMap
    assert(got === Map(30L -> 2L))
  }

  test("plan shape: training side has no shuffle before the broadcast join") {
    val train = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    val eval = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Decontaminate.contaminated(train, "doc_id", "text", eval, "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingles must broadcast:\n$plan")
  }
}
