package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // doc 1 and 2 share the 5-token run "a b c d e" (plus distinct tails);
  // doc 3 is unrelated; doc 4 is too short for k=3 grams... (k below)
  private lazy val docs = Seq(
    (1L, "a b c d e x1 y1 z1"),
    (2L, "p q a b c d e w2"),
    (3L, "nothing shared here at all ok"),
    (4L, "xx yy")
  ).toDF("doc_id", "text")

  test("duplicatedSpans finds exactly the shared run, merged maximally") {
    // k=3: shared 3-grams of "a b c d e" = [a b c][b c d][c d e] →
    // doc 1 hit positions 1,2,3 → one span [1, 5]; doc 2 positions
    // 3,4,5 → one span [3, 7]. Nothing else repeats.
    val got = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, Int, Int)].collect.toSet
    assert(got === Set((1L, 1, 5), (2L, 3, 7)))
  }

  test("coverageStats: every doc appears; zero rows for clean docs") {
    val got = SpanDedup.coverageStats(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long, Double)].collect
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((8L, 5L, 1L, 0.625)))
    assert(got(2L) === ((8L, 5L, 1L, 0.625)))
    assert(got(3L) === ((6L, 0L, 0L, 0.0)))
    assert(got(4L) === ((2L, 0L, 0L, 0.0)))
  }

  test("stripSpans removes exactly the duplicated-span tokens, in order") {
    val got = SpanDedup.stripSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, String)].collect
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((3L, "x1 y1 z1")))
    assert(got(2L) === ((3L, "p q w2")))
    assert(got(3L) === ((6L, "nothing shared here at all ok")))
    assert(got(4L) === ((2L, "xx yy")))
  }

  test("exact-duplicate pair is fully covered and strips to empty") {
    val dup = Seq((1L, "one two three four"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    val stats = SpanDedup.coverageStats(dup, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long, Double)].collect.toSet
    assert(stats === Set((1L, 4L, 4L, 1L, 1.0), (2L, 4L, 4L, 1L, 1.0)))
    val stripped = SpanDedup.stripSpans(dup, "doc_id", "text", k = 3)
      .as[(Long, Long, String)].collect.toSet
    assert(stripped === Set((1L, 0L, ""), (2L, 0L, "")))
  }

  test("within-doc repetition alone does not trigger (cross-doc only)") {
    val rep = Seq(
      (1L, "r r r r r r unique1"),
      (2L, "totally different text two")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(rep, "doc_id", "text", k = 3)
    assert(spans.count() === 0L)
  }

  test("separated hits stay separate spans; adjacent hits merge") {
    // k=3, shared runs "m m m" at both ends of doc 1 with a long unique
    // middle → two spans in doc 1.
    val d = Seq(
      (1L, "m m m u1 u2 u3 u4 u5 m m m"),
      (2L, "m m m other stuff")
    ).toDF("doc_id", "text")
    val got = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 3)
      .filter($"_id" === 1L).as[(Long, Int, Int)].collect.toSet
    assert(got === Set((1L, 1, 3), (1L, 9, 11)))
  }

  test("hashGrams=true is row-identical to string grams on the fixture") {
    val fx = Tables.load(spark, TestSpark.sf0001, "documents")
    val a = SpanDedup.coverageStats(fx, "doc_id", "text", k = 8)
      .orderBy("_id").collect.toSeq
    val b = SpanDedup.coverageStats(fx, "doc_id", "text", k = 8,
        hashGrams = true)
      .orderBy("_id").collect.toSeq
    assert(a === b)
  }

  test("strip conserves tokens: kept_tokens = n_tokens - dup_tokens") {
    val fx = Tables.load(spark, TestSpark.sf0001, "documents")
    val stats = SpanDedup.coverageStats(fx, "doc_id", "text", k = 8)
      .select($"_id", ($"n_tokens" - $"dup_tokens").as("expect"))
    val strip = SpanDedup.stripSpans(fx, "doc_id", "text", k = 8)
      .select($"_id", $"kept_tokens")
    val mismatches = stats.join(strip, "_id")
      .filter($"expect" =!= $"kept_tokens").count()
    assert(mismatches === 0L)
  }

  test("docs shorter than k produce no grams") {
    val short = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(SpanDedup.grams(short, "doc_id", "text", k = 3).count() === 0L)
  }

  test("crossStripSpans: only corpus-copied runs trigger, not incoming-internal") {
    val corpus = Seq((1L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val incoming = Seq(
      // quotes corpus tokens 1-5 ("the quick brown fox jumps") + novel tail
      (10L, "said that the quick brown fox jumps away now"),
      // duplicated WITHIN incoming only (10 and 11 share "n1 n2 n3") —
      // cross-set must NOT strip it
      (11L, "n1 n2 n3 x y z"),
      (12L, "n1 n2 n3 p q r")
    ).toDF("doc_id", "text")
    val got = SpanDedup.crossStripSpans(incoming, corpus,
        "doc_id", "text", k = 3)
      .as[(Long, Long, String)].collect
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 10: grams hitting the corpus start at "the quick brown",
    // "quick brown fox", "brown fox jumps" → positions 3,4,5 → span
    // [3, 7] → tokens 3-7 removed
    assert(got(10L) === ((4L, "said that away now")))
    assert(got(11L) === ((6L, "n1 n2 n3 x y z")))
    assert(got(12L) === ((6L, "n1 n2 n3 p q r")))
  }

  test("crossCoverageStats agrees with crossStripSpans token conservation") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val incoming = docs.filter($"doc_id" >= 25)
    val corpus = docs.filter($"doc_id" < 25)
    val stats = SpanDedup.crossCoverageStats(incoming, corpus,
        "doc_id", "text", k = 8)
      .select($"_id", ($"n_tokens" - $"dup_tokens").as("expect"))
    val strip = SpanDedup.crossStripSpans(incoming, corpus,
        "doc_id", "text", k = 8)
      .select($"_id", $"kept_tokens")
    assert(stats.join(strip, "_id")
      .filter($"expect" =!= $"kept_tokens").count() === 0L)
    // every incoming doc appears exactly once
    assert(strip.count() === incoming.count())
  }

  test("an incoming exact copy of a corpus doc strips to empty") {
    val corpus = Seq((1L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val incoming = Seq((10L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val got = SpanDedup.crossStripSpans(incoming, corpus,
        "doc_id", "text", k = 8)
      .as[(Long, Long, String)].collect.toSet
    assert(got === Set((10L, 0L, "")))
  }

  test("indexed strip ≡ direct cross strip on the fixture") {
    // the maintained gram-key artifact (Bloom router + key table) must
    // reproduce the direct corpus strip row-for-row — a Bloom false
    // positive may only route a position into the confirming join,
    // never mark it
    val fixture = Tables.load(spark, TestSpark.sf0001, "documents")
      .select($"doc_id", $"text")
    val inc = fixture.filter($"doc_id" >= 250)
    val corp = fixture.filter($"doc_id" < 250)
    val tmp = java.nio.file.Files.createTempDirectory("graft-gramidx-spec")
    try {
      val n = SpanDedup.buildGramIndex(corp, "doc_id", "text",
        tmp.toString, k = 8)
      assert(n > 0L)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, String)].collect.toSet
      assert(
        rows(SpanDedup.crossStripSpansIndexed(inc, "doc_id", "text",
          tmp.toString, k = 8))
          === rows(SpanDedup.crossStripSpans(inc, corp, "doc_id", "text",
            k = 8)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("broadcast-bloom fallback ≡ literal router ≡ direct strip") {
    // the >64 MB fallback path (torrent-broadcast BloomMightContainBc
    // instead of a plan Literal) must be decision-identical — forced at
    // fixture scale by gating the literal at 0 bytes
    val fixture = Tables.load(spark, TestSpark.sf0001, "documents")
      .select($"doc_id", $"text")
    val inc = fixture.filter($"doc_id" >= 250)
    val corp = fixture.filter($"doc_id" < 250)
    val tmp = java.nio.file.Files.createTempDirectory("graft-gramidx-bc")
    try {
      SpanDedup.buildGramIndex(corp, "doc_id", "text", tmp.toString, k = 8)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, String)].collect.toSet
      val direct = rows(SpanDedup.crossStripSpans(inc, corp,
        "doc_id", "text", k = 8))
      assert(rows(SpanDedup.crossStripSpansIndexed(inc, "doc_id", "text",
        tmp.toString, k = 8, maxLiteralBytes = 0L)) === direct)
      assert(rows(SpanDedup.crossStripSpansIndexed(inc, "doc_id", "text",
        tmp.toString, k = 8)) === direct)
      // a probe at the wrong k is refused, not silently wrong
      intercept[IllegalArgumentException] {
        SpanDedup.crossStripSpansIndexed(inc, "doc_id", "text",
          tmp.toString, k = 5)
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("refreshGramIndex: build + per-commit refresh ≡ rebuild on the union") {
    // the maintained-artifact refresh contract: appending a commit's
    // gen-distinct keys + bloom mergeInPlace must strip identically to
    // a full rebuild over the grown corpus (cross-generation duplicate
    // keys are absorbed by the islands merge)
    val fixture = Tables.load(spark, TestSpark.sf0001, "documents")
      .select($"doc_id", $"text")
    val day1 = fixture.filter($"doc_id" < 150)
    val day2 = fixture.filter($"doc_id" >= 150 && $"doc_id" < 250)
    val inc = fixture.filter($"doc_id" >= 250)
    val tmp = java.nio.file.Files.createTempDirectory("graft-gramidx-ref")
    try {
      val n1 = SpanDedup.buildGramIndex(day1, "doc_id", "text",
        tmp.toString, k = 8)
      val n2 = SpanDedup.refreshGramIndex(day2, "doc_id", "text",
        tmp.toString)
      assert(n1 > 0L && n2 > 0L)
      val meta = SpanDedup.readGramIndexMeta(tmp.toString).get
      assert(meta._4 === n1 + n2) // n_keys tracks appended totals
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, String)].collect.toSet
      assert(
        rows(SpanDedup.crossStripSpansIndexed(inc, "doc_id", "text",
          tmp.toString, k = 8))
          === rows(SpanDedup.crossStripSpans(inc, day1.unionByName(day2),
            "doc_id", "text", k = 8)))
      // an empty commit is a no-op (and must not corrupt the artifact)
      assert(SpanDedup.refreshGramIndex(day2.limit(0), "doc_id", "text",
        tmp.toString) === 0L)
      assert(SpanDedup.readGramIndexMeta(tmp.toString).get._4 === n1 + n2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("native row-local strip ≡ the exploded twin: fixture + edges") {
    // the strip tail moved from posexplode → anti-join → collected
    // reassembly to one native StripSpans call per row; both forms
    // must be row-identical everywhere, including null text (→ (0,'')),
    // span-free docs (all tokens kept), and full coverage (→ (0,''))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, String)].collect.toSet
    val edges = Seq(
      (1L, "alpha beta gamma one two three four five six seven eight end"),
      (2L, "one two three four five six seven eight"),
      (3L, "novel text with no copied runs here at all ok"),
      (4L, null.asInstanceOf[String]),
      (5L, ""),
      (6L, "x one two three four five six seven eight y one two three " +
        "four five six seven eight z"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    assert(
      rows(SpanDedup.crossStripSpans(edges, corpus, "doc_id", "text", k = 8))
        === rows(SpanDedup.crossStripSpansExploded(
          edges, corpus, "doc_id", "text", k = 8)))
    val fixture = Tables.load(spark, TestSpark.sf0001, "documents")
      .select($"doc_id", $"text")
    val inc = fixture.filter($"doc_id" >= 250)
    val corp = fixture.filter($"doc_id" < 250)
    assert(
      rows(SpanDedup.crossStripSpans(inc, corp, "doc_id", "text", k = 8))
        === rows(SpanDedup.crossStripSpansExploded(
          inc, corp, "doc_id", "text", k = 8)))
    assert(
      rows(SpanDedup.stripSpans(fixture, "doc_id", "text", k = 8))
        === rows(SpanDedup.stripSpansExploded(fixture, "doc_id", "text",
          k = 8)))
  }
}
