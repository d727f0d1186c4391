package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("predicts the dominant-marker language") {
    val df = Seq(
      (1L, "the cat and the dog sat in the garden for hours"),
      (2L, "der hund und die katze ist nicht mit mir auf dem sofa"),
      (3L, "el perro y la casa de que un es se no habla"),
      (4L, "le chat et les chiens dans une maison est qui que"),
      (5L, "的 是 不 了 在 人 有 我 他 这")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", LangId.predict($"text").as("lang"))
      .as[(Long, String)].collect.toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh"))
  }

  test("deterministic tie-break on zero-marker text") {
    val df = Seq((1L, "xylophone zucchini")).toDF("doc_id", "text")
    val a = df.select(LangId.predict($"text")).as[String].head
    val b = df.select(LangId.predict($"text")).as[String].head
    assert(a === b)
    assert(a === "zh") // all scores 0 -> lexicographically largest code
  }
}
