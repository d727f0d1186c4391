package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  // hand-built table: merges apply in PRIORITY order
  private val t = new BpeTokenizer(Vector(
    ("a", "b"),        // rank 0
    ("ab", "c</w>"),   // rank 1
    ("b", "c</w>")     // rank 2 — must never fire on "abc" (ab wins first)
  ))

  test("merge loop follows priority order, not scan order") {
    // "abc" → [a, b, c</w>]; rank 0 (a,b) fires before rank 2 (b,c</w>)
    // even though both are present, then rank 1 completes the word
    assert(t.encodeWord("abc") === Seq("abc</w>"))
    // standalone "bc" has only the rank-2 pair available and merges via
    // it — proof that in "abc" it was PRIORITY (not inapplicability)
    // that routed through rank 0 then rank 1
    assert(t.encodeWord("bc") === Seq("bc</w>"))
  }

  test("lowest-rank present pair fires even when a higher-rank pair comes first in the word") {
    val t2 = new BpeTokenizer(Vector(("b", "c"), ("a", "b")))
    // "abcd" → [a,b,c,d</w>]: (b,c) is rank 0 and fires first → [a,bc,d</w>]
    // then (a,b) can never fire (no bare b left)
    assert(t2.encodeWord("abcd") === Seq("a", "bc", "d</w>"))
  }

  test("all occurrences merge left-to-right in one pass") {
    val t3 = new BpeTokenizer(Vector(("a", "a")))
    // "aaaa" → [a,a,a,a</w>] → one pass merges positions 0-1 and 2-3?
    // position 3 carries </w> so only (a,a) at 0-1 and... symbols are
    // [a,a,a,a</w>]: pairs (a,a) at 0,1; left-to-right non-overlapping:
    // [aa, a, a</w>]; next round: (a,a) no longer present (a</w> differs)
    assert(t3.encodeWord("aaaa") === Seq("aa", "a", "a</w>"))
  }

  test("unseen characters fall back to per-char pieces with the EOW marker") {
    assert(t.encodeWord("xyz") === Seq("x", "y", "z</w>"))
    assert(t.encodeWord("x") === Seq("x</w>"))
  }

  test("encode = whitespace split + per-word pieces; count matches") {
    val text = "abc bc  xyz"
    assert(t.encode(text) === Seq("abc</w>", "bc</w>", "x", "y", "z</w>"))
    assert(t.countTokens(text) === t.encode(text).length)
    assert(t.encode("") === Nil)
    assert(t.encode(null) === Nil)
    assert(t.countTokens(null) === 0)
  }

  test("round-trip: pieces concatenate back to the word (losslessness)") {
    for (w <- Seq("abc", "abcabc", "hello", "aaaa"))
      assert(t.encodeWord(w).mkString.replace(t.EOW, "") === w)
  }

  test("default checked-in table loads and is deterministic") {
    val d = BpeTokenizer.default
    val pieces = d.encode("the query engine answers unseenword")
    assert(pieces.nonEmpty)
    assert(pieces === d.encode("the query engine answers unseenword"))
    // every piece chain reassembles its word
    assert(pieces.mkString.replace(d.EOW, "") === "thequeryengineanswersunseenword")
  }

  test("learn: most frequent pair merges first, ties break lexicographically") {
    val merges = BpeTokenizer.learn(Map("ab" -> 3L, "cd" -> 3L, "ae" -> 1L), 2)
    // (a,b</w>) and (c,d</w>) both have count 3 — lexicographic tie-break
    assert(merges.head === ("a", "b</w>"))
    assert(merges(1) === ("c", "d</w>"))
    // learning then encoding: the learned table fully merges its corpus
    val lt = new BpeTokenizer(BpeTokenizer.learn(Map("low" -> 5L, "lower" -> 2L), 10))
    assert(lt.encodeWord("low") === Seq("low</w>"))
    assert(lt.encodeWord("lower") === Seq("lower</w>"))
  }

  test("learnDistributed ≡ driver-side learn on a word-frequency dictionary") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // mixed shapes: shared prefixes, a tie pair, repeated chars, 1-char
    // words — everything the merge fold has to get right
    val freqs = Map("low" -> 5L, "lower" -> 2L, "lowest" -> 1L,
      "newer" -> 6L, "wider" -> 3L, "aaaa" -> 4L, "ab" -> 3L, "cd" -> 3L,
      "a" -> 2L)
    val expected = BpeTokenizer.learn(freqs, 25)
    val got = graft.tools.LearnBpe.learnDistributed(spark,
      freqs.toSeq.toDF("word", "cnt"), 25)
    assert(got === expected)
    // both paths exhaust the same corpus at the same merge count
    assert(got.nonEmpty && got.size <= 25)
  }

  test("checked-in merges table ≡ learnDistributed on its generating fixture, byte-for-byte") {
    // the shipped table's provenance claim (header: learned from sf0.01
    // documents) is REPRODUCED through the distributed path, not just
    // property-tested on synthetic dictionaries: same fixture, same merge
    // budget, and the serialized lines past the header must match the
    // checked-in file exactly
    val spark = graft.TestSpark.spark
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/bpe_merges.txt"), "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val checked = graft.functions.BpeTokenizer.parseMerges(lines.iterator)
    val wordFreq = graft.operators.TextAnalysis.wordFreq(
      graft.Tables.load(spark, "/root/testdata/sf0.01", "documents"), "text")
    val relearned = graft.tools.LearnBpe.learnDistributed(spark, wordFreq, 200)
    assert(relearned === checked)
    assert(lines.drop(1) === relearned.map { case (a, b) => s"$a $b" })
  }

  test("parseMerges: only the first line is a comment — '#'-leading symbols survive") {
    val merges = BpeTokenizer.parseMerges(Iterator(
      "# header written by LearnBpe", "# i", "#i n", "a b</w>"))
    assert(merges === Vector(("#", "i"), ("#i", "n"), ("a", "b</w>")))
  }

  test("word memo: cached and cold paths agree; tables never cross-contaminate") {
    BpeTokenizer.clearMemo()
    val words = Seq("abc", "bc", "abcabc", "xyz", "aaaa", "hello")
    val cold = words.map(t.encodeWord) // fills the memo
    val warm = words.map(t.encodeWord) // served from the memo
    assert(warm === cold)
    // a DIFFERENT table over the same words must not see t's cached
    // pieces — the fingerprint keys distinct tables to distinct memos
    val t2 = new BpeTokenizer(Vector(("b", "c"), ("a", "b")))
    // (b,c) can't fire (the c carries </w>), so (a,b) merges → [ab, c</w>]
    assert(t2.encodeWord("abc") === Seq("ab", "c</w>"))
    assert(t2.encodeWord("abc") !== t.encodeWord("abc"))
    // and a fresh handle over the SAME merges shares the warm memo yet
    // still answers identically to the cold computation
    val tTwin = new BpeTokenizer(t.merges)
    assert(words.map(tTwin.encodeWord) === cold)
    // over-length words bypass admission but still encode correctly
    val long = "ab" * 40 // 80 chars > memoMaxWordLen
    assert(t.encodeWord(long).mkString.replace(t.EOW, "") === long)
    BpeTokenizer.clearMemo()
    assert(words.map(t.encodeWord) === cold) // cold again post-clear
  }

  test("null-safe and registered as SQL function graft_bpe") {
    val spark = graft.TestSpark.spark
    graft.GraftExtensions.install(spark)
    val rows = spark.sql(
      "SELECT graft_bpe(s) AS p FROM VALUES ('abc bc'), (CAST(NULL AS STRING)) AS t(s)")
      .collect()
    assert(rows(0).getSeq[String](0) ===
      BpeTokenizer.default.encode("abc bc"))
    assert(rows(1).isNullAt(0))
  }

  test("graft_bpe projection stays inside whole-stage codegen") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions.{col, size}
    val plan = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.bpeTokens(col("text"))).as("n_bpe"))
      .queryExecution.executedPlan.toString
    // a starred Project = fused into WholeStageCodegen (the HOF-based
    // n_ws twin in q_bpe_tokens is what pushes THAT query's Project out
    // of WSCG — higher-order functions are CodegenFallback; the native
    // expression itself must not)
    assert(plan.contains("*(1) Project") || plan.contains("* Project"),
      s"graft_bpe fell out of whole-stage codegen:\n$plan")
  }

  test("native expression ≡ driver-side encode on the fixture") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val d = BpeTokenizer.default
    val got = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .limit(50)
      .select(col("doc_id"), graft.operators.TextAnalysis.bpeTokens(col("text")).as("p"))
      .as[(Long, Seq[String])].collect()
    val texts = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .limit(50).select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { case (id, pieces) =>
      assert(pieces === d.encode(texts(id)), s"doc $id")
    }
  }
}
