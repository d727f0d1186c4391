package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star tier): media as opaque `binary`
  * columns with typed metadata, processed per-partition so one decoder
  * instance handles a whole batch of rows (the Spark pattern for heavy
  * native resources — same shape as a per-executor model singleton).
  *
  * The actual byte-level decode is a clearly-marked deterministic STUB
  * (`StubCodec`): no image/audio libraries exist in this environment. The
  * Spark-side contracts — schema, partitioning, batched iteration, output
  * shape — are real and tested; swapping `StubCodec` for a JNI/FFmpeg/
  * ImageIO codec changes no plan shape.
  */
object Multimodal {

  /** media table schema: one row per asset, payload opaque. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),          // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta_format", StringType),   // container format tag
    StructField("meta_bytes", LongType)))

  final case class MediaRow(media_id: Long, kind: String,
                            payload: Array[Byte],
                            meta_format: String, meta_bytes: Long)

  final case class DecodedRow(media_id: Long, kind: String,
                              width: Int, height: Int,
                              n_frames: Int, features: Array[Float])

  /** STUB codec — deterministic fake decode standing in for the real
    * image/audio/video libraries (absent in this container). Derives
    * plausible dimensions/frame counts and a feature vector purely from
    * the payload bytes, so tests are reproducible. */
  object StubCodec {
    def decode(row: MediaRow): DecodedRow = {
      val bytes = if (row.payload == null) Array.emptyByteArray else row.payload
      var h = 1125899906842597L // deterministic FNV-ish fold of the payload
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      def pick(lo: Int, hi: Int, salt: Int): Int =
        lo + java.lang.Math.floorMod(h ^ salt, (hi - lo).toLong).toInt
      val frames = row.kind match {
        case "video" => pick(8, 240, 7)
        case "audio" => pick(100, 10000, 11)
        case _       => 1
      }
      val feat = Array.tabulate(8) { d =>
        (java.lang.Math.floorMod(h ^ (d * 1315423911L), 1000L) / 1000.0f)
      }
      DecodedRow(row.media_id, row.kind,
        width = pick(16, 4096, 3), height = pick(16, 4096, 5),
        n_frames = frames, features = feat)
    }
  }

  /** Decode + feature-extract, batched per partition: the codec is
    * instantiated once per partition (stand-in for an expensive native
    * init), rows stream through it. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init site for a real codec goes here
      rows.map(StubCodec.decode)
    }
  }

  final case class ResizedRow(media_id: Long, width: Int, height: Int,
                              payload: Array[Byte])

  /** Resize for image rows — STUB pixel path (no imaging libs in this
    * container): target dims are computed aspect-preserving for real
    * (`fit`), the payload transform is the deterministic fake. Batched
    * per partition like [[decodeAll]]; swapping in a real scaler changes
    * no plan shape. */
  def resizeImages(decoded: Dataset[DecodedRow],
                   media: Dataset[MediaRow],
                   maxSide: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    val dims = decoded.filter(_.kind == "image")
      .map(d => (d.media_id, d.width, d.height))
      .toDF("media_id", "w", "h")
    // filter to images BEFORE the join — audio/video payloads (the bulk
    // of the bytes) must never be deserialized just to be dropped
    media.filter(_.kind == "image").toDF().join(dims, "media_id")
      .select(col("media_id"), col("w"), col("h"), col("payload"))
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init site for a real scaler goes here
        rows.map { case (id, w, h, payloadOrNull) =>
          val payload =
            if (payloadOrNull == null) Array.emptyByteArray else payloadOrNull
          val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
          val nw = math.max(1, math.round(w * scale).toInt)
          val nh = math.max(1, math.round(h * scale).toInt)
          // STUB: a real implementation re-encodes pixels; the fake keeps
          // a deterministic payload prefix proportional to the area ratio
          val keep = math.max(1,
            (payload.length * (nw.toLong * nh) /
              math.max(1L, w.toLong * h)).toInt)
          ResizedRow(id, nw, nh, payload.take(keep))
        }
      }
  }

  final case class DocMediaRow(media_id: Long, payload: Array[Byte],
                               meta_format: String)
  final case class ExtractedRow(media_id: Long, text: String)

  /** STUB document-text extractor — stands in for a real PDF/HTML/DOCX
    * extraction library (the reference declares PyPDF2 in
    * requirements.txt:7 but the capability surface is binary→text; no
    * such library exists in this container). The stub handles the `txt`
    * format for real (UTF-8 decode — deterministic and lossless, which
    * is what lets the downstream chunker be oracle-checked end-to-end
    * through the binary roundtrip); any other format would be the real
    * library's job. */
  object StubExtractor {
    def extract(format: String, payload: Array[Byte]): String = {
      val bytes = if (payload == null) Array.emptyByteArray else payload
      format match {
        case "txt" | null =>
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        case other =>
          // a real extractor dispatches on container format here (pdf,
          // html, docx, ...); the stub refuses rather than fake it
          throw new UnsupportedOperationException(
            s"no extractor for format '$other' in this environment")
      }
    }
  }

  /** Binary→text document extraction, batched per partition like
    * [[decodeAll]]: one extractor instance per partition (the init site
    * for a real native library), rows stream through it. Input columns:
    * (media_id, payload, meta_format); output: (media_id, text).
    * Feed the result to `TextAnalysis.chunk` for the document→chunk
    * pipeline the reference's data model implies. */
  def extractText(media: Dataset[DocMediaRow]): Dataset[ExtractedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init site for a real extraction library goes here
      rows.map(r => ExtractedRow(r.media_id,
        StubExtractor.extract(r.meta_format, r.payload)))
    }
  }

  /** View a documents table as binary media rows (UTF-8 payload, `txt`
    * format tag) — the ingest shape a real pipeline sees when documents
    * arrive as files rather than clean text columns. */
  def asDocumentMedia(docs: DataFrame, idCol: String,
                      textCol: String): Dataset[DocMediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("txt").as("meta_format"))
      .as[DocMediaRow]
  }

  /** Frame sampling for video rows: every `stride`-th frame index up to
    * the decoded frame count — plan-side only (which frames to fetch),
    * the fetch itself is the codec's job. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_ids"))

  /** Deterministic synthetic media fixture (no binary fixture ships with
    * the harness). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")(((i % 3).toInt))
      val payload = Array.tabulate[Byte](((i % 64) + 16).toInt)(j => ((i * 131 + j * 7) % 251).toByte)
      MediaRow(i, kind, payload, if (kind == "image") "png" else "mkv", payload.length.toLong)
    }
  }
}
