package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EmbeddingCsvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("write → read round-trips the reference CSV contract") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/corpus"
    val df = Seq(
      (1L, "doc1", "hello world", Array(0.1f, 0.2f, 0.3f)),
      (2L, "user_added", "quoted, text", Array(-1.5f, 2.25f, 0f))
    ).toDF("chunk_id", "document_id", "chunk_text", "vector_embedding")

    EmbeddingCsv.write(df, dir)
    val back = EmbeddingCsv.read(spark, dir)

    assert(back.schema("vector_embedding").dataType.typeName === "array")
    val got = back.orderBy("chunk_id")
      .as[(Long, String, String, Array[Float])].collect.toSeq
    assert(got.map(_._1) === Seq(1L, 2L))
    assert(got(0)._3 === "hello world")
    assert(got(1)._3 === "quoted, text") // comma inside quoted field survives
    assert(got(0)._4.toSeq === Seq(0.1f, 0.2f, 0.3f))
    assert(got(1)._4.toSeq === Seq(-1.5f, 2.25f, 0f))
  }
}
