package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 langs × 400 docs, each doc 12 tokens drawn from a per-lang pool —
  // enough distinct tokens to engage real sketch behavior
  private lazy val docs = {
    val rng = new scala.util.Random(7)
    (0 until 1200).map { i =>
      val lang = Seq("en", "de", "fr")(i % 3)
      val text = (0 until 12)
        .map(_ => s"${lang}_w${rng.nextInt(3000)}").mkString(" ")
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
  }

  private def mergedEst(batches: Int): Map[String, Double] =
    Sketch.mergeSketches(
        Sketch.vocabSketches(docs, "lang", "text",
          pmod(col("doc_id"), lit(batches))),
        Seq(col("lang")))
      .select(col("lang"), Sketch.estimate(col("sketch")).as("est"))
      .as[(String, Double)].collect().toMap

  test("union merge is grouping-invariant: any batching, same estimate") {
    val e1 = mergedEst(1)
    assert(mergedEst(2) === e1)
    assert(mergedEst(4) === e1)
    assert(mergedEst(7) === e1)
  }

  test("merged estimate tracks the exact distinct count within sketch error") {
    val exact = docs.select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("lang").agg(countDistinct(col("tok")).cast("double").as("n"))
      .as[(String, Double)].collect().toMap
    val est = mergedEst(4)
    for ((lang, n) <- exact) {
      assert(math.abs(est(lang) - n) / n < 0.05,
        s"$lang: est ${est(lang)} vs exact $n")
    }
  }

  test("a new batch only grows the merged estimate, and covers its novel tokens") {
    val old = docs.filter($"doc_id" < 600)
    val fresh = docs.filter($"doc_id" >= 600)
      .withColumn("text", concat($"text", lit(" zz_novel_1 zz_novel_2")))
    def est(d: org.apache.spark.sql.DataFrame): Map[String, Double] =
      Sketch.mergeSketches(
          Sketch.vocabSketches(d, "lang", "text", lit(0)), Seq(col("lang")))
        .select(col("lang"), Sketch.estimate(col("sketch")).as("est"))
        .as[(String, Double)].collect().toMap
    val oldEst = est(old)
    // merging the old sketches with the new batch's sketches — never
    // rereading `old` — equals sketching the full union
    val together = Sketch.mergeSketches(
        Sketch.vocabSketches(old, "lang", "text", lit(0))
          .unionAll(Sketch.vocabSketches(fresh, "lang", "text", lit(1))),
        Seq(col("lang")))
      .select(col("lang"), Sketch.estimate(col("sketch")).as("est"))
      .as[(String, Double)].collect().toMap
    val direct = est(old.unionAll(fresh))
    assert(together === direct)
    for ((lang, e) <- together) assert(e >= oldEst(lang))
  }

  // ---------------- count-min frequency sketches ----------------

  private def mergedCms(batches: Int): Map[String, Array[Byte]] =
    Sketch.mergeFreqSketches(
        Sketch.tokenFreqSketches(docs, "lang", "text",
          pmod(col("doc_id"), lit(batches))),
        Seq(col("lang")))
      .select(col("lang"), col("cms"))
      .as[(String, Array[Byte])].collect().toMap

  test("CMS merge is EXACT: any batching yields byte-identical sketches") {
    val one = mergedCms(1)
    for (b <- Seq(2, 4, 7); (lang, bytes) <- mergedCms(b))
      assert(java.util.Arrays.equals(bytes, one(lang)),
        s"batching $b diverged for $lang")
  }

  test("weighted CMS over counted tokens is byte-identical to the raw-stream sketch") {
    // the fusion incr_heavy_hitters relies on: tokenize ONCE into
    // (lang, batch, tok, cnt), sketch from counts — CMS addition is
    // linear, so the grids must match the unweighted built-in's exactly
    val toks = docs.select(col("lang"), col("doc_id"),
      explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
    val raw = Sketch.freqSketches(
        toks.select(col("lang"), pmod(col("doc_id"), lit(3)).as("__b"),
          col("tok")),
        col("tok"), col("__b"), Seq(col("lang")))
      .select(col("lang"), col("batch"), col("cms"))
      .as[(String, Long, Array[Byte])].collect()
      .map { case (l, b, s) => (l, b) -> s }.toMap
    val counted = toks
      .groupBy(col("lang"), pmod(col("doc_id"), lit(3)).as("__b"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val weighted = Sketch.freqSketchesWeighted(counted, col("tok"),
        col("cnt"), col("__b"), Seq(col("lang")))
      .select(col("lang"), col("batch"), col("cms"))
      .as[(String, Long, Array[Byte])].collect()
      .map { case (l, b, s) => (l, b) -> s }.toMap
    assert(weighted.keySet === raw.keySet)
    for ((k, bytes) <- weighted)
      assert(java.util.Arrays.equals(bytes, raw(k)), s"grid diverged at $k")
  }

  test("CMS estimates are one-sided (est >= exact), and exact when width >> keys") {
    // default eps=0.001 (~2k slots/row) vs ~2.4k tokens per lang DOES
    // collide (measured ~8% of tokens over-estimate, each by a little)
    // — one-sidedness must hold there regardless; at eps=1e-4 (20k
    // slots vs 2.4k keys) an over-estimate needs an all-rows collision
    // at ~1e-5 probability, so estimates are plain exact
    val exact = docs.select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    val defaults = mergedCms(4).map { case (l, b) =>
      l -> org.apache.spark.util.sketch.CountMinSketch.readFrom(b) }
    for ((lang, tok, n) <- exact)
      assert(defaults(lang).estimateCount(tok) >= n,
        s"$lang/$tok: under-estimate at default eps")
    val fine = Sketch.mergeFreqSketches(
        Sketch.tokenFreqSketches(docs, "lang", "text",
          pmod(col("doc_id"), lit(4)), eps = 1e-4),
        Seq(col("lang")))
      .select(col("lang"), col("cms"))
      .as[(String, Array[Byte])].collect().toMap
      .map { case (l, b) =>
        l -> org.apache.spark.util.sketch.CountMinSketch.readFrom(b) }
    var overs = 0
    for ((lang, tok, n) <- exact) {
      val est = fine(lang).estimateCount(tok)
      assert(est >= n)
      if (est > n) overs += 1
    }
    assert(overs <= exact.length / 100,
      s"$overs/${exact.length} over-estimates at eps=1e-4")
  }

  test("a coarse sketch stays one-sided while really colliding") {
    val coarse = Sketch.mergeFreqSketches(
        Sketch.tokenFreqSketches(docs, "lang", "text",
          pmod(col("doc_id"), lit(3)), eps = 0.2, confidence = 0.6),
        Seq(col("lang")))
      .select(col("lang"), col("cms"))
      .as[(String, Array[Byte])].collect().toMap
      .map { case (l, b) =>
        l -> org.apache.spark.util.sketch.CountMinSketch.readFrom(b) }
    val exact = docs.select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    var overs = 0
    for ((lang, tok, n) <- exact) {
      val est = coarse(lang).estimateCount(tok)
      assert(est >= n)
      if (est > n) overs += 1
    }
    // 10 slots per row at ~2-3k tokens/lang MUST collide somewhere
    assert(overs > 0, "coarse sketch showed no collisions — suspicious")
  }

  test("heavyHittersCounted over the counted relation ≡ heavyHittersTok over the raw stream") {
    val toks = docs.select(col("lang"), col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val want = Sketch.heavyHittersTok(toks, "lang", "tok",
        pmod(col("doc_id"), lit(3)))
      .orderBy(col("lang"), col("rank")).collect().toSeq
    val counted = toks
      .groupBy(col("lang"), pmod(col("doc_id"), lit(3)).as("b"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val got = Sketch.heavyHittersCounted(counted, "lang", "tok", "b", "cnt")
      .orderBy(col("lang"), col("rank")).collect().toSeq
    assert(got === want)
  }

  test("heavyHitters recovers the exact per-language top-10 at collision-free width") {
    val hh = Sketch.heavyHitters(docs, "lang", "text",
        pmod(col("doc_id"), lit(3)), eps = 1e-4)
      .select(col("lang"), col("rank"), col("tok"), col("est"))
      .as[(String, Long, String, Long)].collect()
    assert(hh.nonEmpty)
    val perLangW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("tok").asc)
    val exactTop = docs.select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(perLangW).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("lang"), col("rank"), col("tok"), col("n"))
      .as[(String, Long, String, Long)].collect()
    // at eps=1e-4 the estimates are exact on this fixture, so the
    // candidate-tracked sketch ranking equals the exact ranking
    assert(hh.sortBy(r => (r._1, r._2)) === exactTop.sortBy(r => (r._1, r._2)))
  }
}
