package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 30)

  test("synthetic media matches the declared schema") {
    val df = media.toDF()
    assert(df.schema("payload").dataType.typeName === "binary")
    assert(df.count === 30)
  }

  test("decodeAll: deterministic, one decoded row per asset, 8-dim features") {
    val a = Multimodal.decodeAll(media).collect.sortBy(_.media_id)
    val b = Multimodal.decodeAll(media).collect.sortBy(_.media_id)
    assert(a.length === 30)
    assert(a.map(_.features.toSeq).toSeq === b.map(_.features.toSeq).toSeq)
    assert(a.forall(_.features.length === 8))
    assert(a.forall(r => r.width >= 16 && r.height >= 16))
  }

  test("images decode to a single frame; videos to many") {
    val d = Multimodal.decodeAll(media).collect
    assert(d.filter(_.kind == "image").forall(_.n_frames == 1))
    assert(d.filter(_.kind == "video").forall(_.n_frames > 1))
  }

  test("resizeImages: aspect-preserving dims capped at maxSide, images only") {
    val decoded = Multimodal.decodeAll(media)
    val resized = Multimodal.resizeImages(decoded, media, maxSide = 256).collect()
    val nImages = decoded.filter(_.kind == "image").count()
    assert(resized.length.toLong === nImages)
    val byId = decoded.collect().map(d => d.media_id -> d).toMap
    resized.foreach { r =>
      assert(math.max(r.width, r.height) <= 256)
      val d = byId(r.media_id)
      // aspect ratio preserved within rounding
      val orig = d.width.toDouble / d.height
      val now = r.width.toDouble / r.height
      assert(math.abs(orig - now) / orig < 0.05, s"aspect drift: $orig vs $now")
      assert(r.payload.nonEmpty)
    }
    // deterministic
    val again = Multimodal.resizeImages(decoded, media, maxSide = 256).collect()
    assert(resized.map(r => (r.media_id, r.width, r.height, r.payload.toSeq)).toSet ===
      again.map(r => (r.media_id, r.width, r.height, r.payload.toSeq)).toSet)
  }

  test("extractText roundtrips document text through the binary ingest shape") {
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "unicode: ñ ü 中文 🚀"),
      (3L, ""),
      (4L, "  spaced   out  ")
    ).toDF("doc_id", "text")
    val media = Multimodal.asDocumentMedia(docs, "doc_id", "text")
    val out = Multimodal.extractText(media).collect()
      .map(r => r.media_id -> r.text).toMap
    assert(out === Map(1L -> "plain ascii text", 2L -> "unicode: ñ ü 中文 🚀",
      3L -> "", 4L -> "  spaced   out  "))
  }

  test("extractText refuses formats the stub has no extractor for") {
    val media = Seq(Multimodal.DocMediaRow(1L, Array[Byte](1, 2), "pdf")).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractText(media).collect()
    }
    assert(ex.getMessage.contains("no extractor") ||
      String.valueOf(ex.getCause).contains("no extractor"))
  }

  test("sampleFrames emits stride-spaced frame ids for videos only") {
    val decoded = Multimodal.decodeAll(media).toDF()
    val sampled = Multimodal.sampleFrames(decoded, stride = 10)
    val rows = sampled.as[(Long, Seq[Long])].collect
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, ids) =>
      ids.zipWithIndex.forall { case (f, i) => f == i * 10L } })
    val kinds = decoded.filter(col("kind") === "video").count
    assert(rows.length.toLong === kinds)
  }
}
