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
}
