package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a", 5L),
    (2L, "b c", 3L)
  ).toDF("doc_id", "text", "n_chars")

  test("docStats: counts, distinct ratio, chars per token") {
    val got = TextAnalysis.docStats(docs, "doc_id", "text", "n_chars")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect.toSeq
    assert(got(0) === ((1L, 3L, 2L, 0.6667, 1.6667)))
    assert(got(1) === ((2L, 2L, 2L, 1.0, 1.5)))
  }

  test("wordFreq: corpus counts") {
    val got = TextAnalysis.wordFreq(docs, "text")
      .as[(String, Long)].collect.toMap
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("tfIdf: word in every doc has idf 0; rarer word scores higher") {
    val rows = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .as[(Long, String, Double)].collect  // (doc_id, word, tfidf)
    val byKey = rows.map { case (d, w, v) => ((d, w), v) }.toMap
    assert(byKey((1L, "b")) === 0.0) // b appears in both docs: ln(2/2)=0
    assert(byKey((1L, "a")) === math.floor(2 * math.log(2.0) * 10000) / 10000 ||
           byKey((1L, "a")) > 1.38)  // 2*ln(2) ≈ 1.3863
    assert(byKey((2L, "c")) > 0.69)  // ln(2) ≈ 0.6931
  }

  test("bm25: matches a hand-computed Okapi score; non-matching docs absent") {
    // corpus: 3 docs, query term "b" appears in docs 1 and 2
    val corpus = Seq(
      (1L, "a b b", 0L),     // tf(b)=2, dl=3
      (2L, "b c", 0L),       // tf(b)=1, dl=2
      (3L, "c d e", 0L)      // no query term → absent from output
    ).toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("b"))
      .as[(Long, Double)].collect.toMap
    assert(got.keySet === Set(1L, 2L))
    // N=3, df=2, avgdl=8/3; idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    val idf = math.log(1.6)
    def s(tf: Double, dl: Double): Double = {
      val raw = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (8.0 / 3)))
      math.rint(raw * 10000) / 10000
    }
    assert(got(1L) === s(2, 3))
    assert(got(2L) === s(1, 2))
  }

  test("bm25: rarer term outscores common term at equal tf") {
    val corpus = Seq(
      (1L, "x common", 0L), (2L, "common", 0L), (3L, "common", 0L),
      (4L, "common", 0L)
    ).toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.bm25(corpus, "doc_id", "text",
      Seq("x", "common")).as[(Long, Double)].collect.toMap
    // doc 1 holds both terms; its score strictly exceeds the
    // common-only docs, whose idf is depressed by df=4
    assert(got(1L) > got(2L))
  }

  test("bm25Many ≡ one bm25 ranking per query") {
    val corpus = Seq(
      (1L, "spark data join table", 0L),
      (2L, "data data data row", 0L),
      (3L, "table row fast spark", 0L),
      (4L, "nothing relevant here", 0L)
    ).toDF("doc_id", "text", "n_chars")
    val queries = Seq(1L -> Seq("spark", "data"), 2L -> Seq("row", "fast"))
    val many = TextAnalysis.bm25Many(corpus, "doc_id", "text", queries, k = 3)
      .as[(Long, Long, Double, Long)].collect.toSet
    val single = queries.flatMap { case (qid, terms) =>
      TextAnalysis.bm25(corpus, "doc_id", "text", terms)
        .orderBy($"bm25".desc, $"doc_id".asc).limit(3)
        .as[(Long, Double)].collect.zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
    }.toSet
    assert(many === single && many.nonEmpty)
  }

  test("rrfFuse: shared, keyword-only and vector-only ids all fuse") {
    val kw = Seq((10L, 1), (11L, 2)).toDF("doc_id", "rank")
    val vec = Seq((10L, 1), (12L, 2)).toDF("doc_id", "rank")
    val got = Search.rrfFuse(kw, vec, "doc_id")
      .as[(Long, Double)].collect.toMap
    def r(x: Double) = math.rint(x * 10000) / 10000
    assert(got(10L) === r(1.0 / 61 + 1.0 / 61)) // in both lists at rank 1
    assert(got(11L) === r(1.0 / 62))            // keyword-only
    assert(got(12L) === r(1.0 / 62))            // vector-only
    assert(got(10L) > got(11L))
  }

  test("rrfFuseMany: fusion is per-query; queries never cross") {
    val kw = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 10L, 1L))
      .toDF("qid", "doc_id", "rank")
    val vec = Seq((1L, 10L, 1L), (2L, 12L, 1L))
      .toDF("qid", "doc_id", "rank")
    val got = Search.rrfFuseMany(kw, vec, "qid", "doc_id")
      .as[(Long, Long, Double)].collect.toSet
    def r(x: Double) = math.rint(x * 10000) / 10000
    assert(got === Set(
      (1L, 10L, r(2.0 / 61)),  // both lists, query 1
      (1L, 11L, r(1.0 / 62)),  // keyword-only, query 1
      (2L, 10L, r(1.0 / 61)),  // query 2's keyword hit — NOT fused with
                               // query 1's vector hit on the same doc
      (2L, 12L, r(1.0 / 61)))) // vector-only, query 2
  }

  test("chunk: stride windows cover every token; overlap is width-stride") {
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "), 0L))
      .toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.chunk(df, "doc_id", "text", width = 4, stride = 2)
      .orderBy("chunk_idx")
      .as[(Long, Long, String)].collect.toSeq
    assert(got.map(_._2) === Seq(0L, 1L, 2L, 3L, 4L))
    assert(got.head._3 === "w1 w2 w3 w4")
    assert(got(1)._3 === "w3 w4 w5 w6")     // 2-token overlap
    assert(got.last._3 === "w9 w10")        // short tail chunk
  }

  test("tokens drops empty strings from repeated separators") {
    val df = Seq((1L, "x  y", 4L)).toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.docStats(df, "doc_id", "text", "n_chars")
      .select("n_tokens").as[Long].head
    assert(got === 2L)
  }

  test("repetitionRatioCol ≡ repetitionStats corpus-wide; short docs NULL") {
    val fixture = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
    val viaAgg = TextAnalysis.repetitionStats(fixture, "doc_id", "text")
      .select($"doc_id", $"rep_ratio").as[(Long, Double)].collect.toMap
    val viaCol = fixture.select($"doc_id",
      TextAnalysis.repetitionRatioCol($"text").as("r"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(viaCol.collect { case (id, Some(v)) => id -> v } === viaAgg)
    // docs excluded by the aggregate form (<2 tokens) are exactly the
    // NULLs of the column form
    assert(viaCol.collect { case (id, None) => id }.toSet ===
      (viaCol.keySet -- viaAgg.keySet))
    // repetitive text scores high, diverse text low, 1-token text null
    val tiny = Seq((1L, "a b a b a b"), (2L, "u v w x y z"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = tiny.select($"doc_id",
      TextAnalysis.repetitionRatioCol($"text").as("r")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    assert(got(1L) === 0.6)   // "a b" 3 of 5 grams
    assert(got(2L) === 0.2)   // 5 distinct grams
    assert(got(3L) === -1.0)  // no 2-gram
  }

  test("bigramLmScore: hand-checked smoothed bigram likelihoods") {
    // corpus: "a b", "a b c" → c1: a=2 b=2 c=1, V=3
    //         c2: "a b"=2, "b c"=1
    val corpus = Seq((10L, "a b"), (11L, "a b c")).toDF("doc_id", "text")
    // doc 1 "a b x": P(b|a)=(2+1)/(2+3)=0.6, P(x|b)=(0+1)/(2+3)=0.2
    // doc 2 "z z":   P(z|z)=(0+1)/(0+3)=1/3 (both words OOV)
    // doc 3 "solo":  no bigram → NULL
    val score = Seq((1L, "a b x"), (2L, "z z"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(score, corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    def bits(ps: Double*): Double =
      math.round(ps.map(p => -math.log(p) / math.log(2.0)).sum / ps.size * 10000)
        .toDouble / 10000
    assert(got === Seq(
      (1L, 2L, Some(bits(0.6, 0.2))),
      (2L, 1L, Some(bits(1.0 / 3))),
      (3L, 0L, None)))
    // fluency ordering: a corpus-seen doc scores fewer bits than OOV junk
    val fluent = TextAnalysis.bigramLmScore(
      Seq((1L, "a b c")).toDF("doc_id", "text"), corpus, "doc_id", "text")
      .collect()(0).getDouble(2)
    val junk = TextAnalysis.bigramLmScore(
      Seq((1L, "q r s")).toDF("doc_id", "text"), corpus, "doc_id", "text")
      .collect()(0).getDouble(2)
    assert(fluent < junk)
  }

  test("native Tokens ≡ the HOF filter(split) twin: fixture + edge shapes") {
    import org.apache.spark.sql.functions.col
    // edge shapes the byte-scan must get exactly right: empties from
    // leading/trailing/consecutive spaces, all-space, empty, single
    // token, multibyte UTF-8 (no 0x20 inside a multibyte sequence),
    // tabs/newlines NOT split (only literal space — split(" ")
    // semantics), and null text
    val edges = Seq(
      (1L, "a b a"), (2L, "  leading"), (3L, "trailing  "),
      (4L, "a  b   c"), (5L, "     "), (6L, ""), (7L, "single"),
      (8L, "héllo wörld é́ café"), (9L, "tab\tkept new\nline x"),
      (10L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val fixture = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edges, fixture)) {
      val got = df.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("t")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = df.select(col("doc_id"),
        TextAnalysis.tokensHof(col("text")).as("t")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got === want)
    }
  }

  test("native RepetitionRatio ≡ the HOF fold twin: fixture + edge shapes") {
    import org.apache.spark.sql.functions.col
    // short docs (< n tokens) must be NULL, all-same grams hit 1.0,
    // and rounding must match Spark's HALF_UP round(x, 4)
    val edges = Seq(
      (1L, ""), (2L, "one"), (3L, "one two"),
      (4L, "a a a a a a"), (5L, null.asInstanceOf[String]),
      (6L, "x y x y x y z"), (7L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val fixture = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edges, fixture); n <- Seq(2, 3)) {
      def m(c: org.apache.spark.sql.Column) =
        df.select(col("doc_id"), c.as("r")).collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(m(TextAnalysis.repetitionRatioCol(col("text"), n))
        === m(TextAnalysis.repetitionRatioColHof(col("text"), n)),
        s"n=$n")
    }
  }

  test("native GopherStats rules ≡ the HOF twin: fixture + edge shapes") {
    import org.apache.spark.sql.functions.col
    // edge shapes: empty doc (null ratios must fail the gate), all-space,
    // null text, all-same tokens (top_frac = 1), every-token-a-stopword,
    // multibyte tokens (mean_wlen counts CHARACTERS, not bytes), and a
    // gate-passing document
    val edges = Seq(
      (1L, ""), (2L, "     "), (3L, null.asInstanceOf[String]),
      (4L, "same same same same same"),
      (5L, "the a of to in the a of to in"),
      (6L, "héllo wörld café déjà vu naïve crème brûlée über jalapeño"),
      (7L, ("the quick brown fox jumps over a lazy dog of unusual size " +
        "and then runs to the distant hills in pursuit of winter food " +
        "while the pack follows close behind through fallen snow")))
      .toDF("doc_id", "text")
    val fixture = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (1 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i))
    for (df <- Seq(edges, fixture)) {
      val got = TextAnalysis.gopherRules(df, "doc_id", "text")
        .collect().map(key).toMap
      val want = TextAnalysis.gopherRulesHof(df, "doc_id", "text")
        .collect().map(key).toMap
      assert(got === want)
    }
  }
}
