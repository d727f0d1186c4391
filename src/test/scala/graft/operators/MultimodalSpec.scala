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
    assert(a.filter(_.kind == "image").forall(r => r.width >= 16 && r.height >= 16))
  }

  test("images decode to a single frame; videos to many") {
    val d = Multimodal.decodeAll(media).collect
    assert(d.filter(_.kind == "image").forall(_.n_frames == 1))
    assert(d.filter(_.kind == "video").forall(_.n_frames > 1))
  }

  test("image decode reads the REAL PNG header dims (not the stub's hash guess)") {
    val d = Multimodal.decodeAll(media).collect
    // syntheticMedia writes a byte-valid PNG IHDR with these exact dims
    d.filter(_.kind == "image").foreach { r =>
      assert(r.width === 64 + (r.media_id % 128).toInt, s"id ${r.media_id}")
      assert(r.height === 48 + (r.media_id % 96).toInt, s"id ${r.media_id}")
    }
  }

  test("audio decode reads the REAL WAV header (rate, channels, frame count)") {
    val d = Multimodal.decodeAll(media).collect
    d.filter(_.kind == "audio").foreach { r =>
      assert(r.width === 8000 + (r.media_id % 3).toInt * 4000)   // sample rate
      assert(r.height === 1 + (r.media_id % 2).toInt)            // channels
      assert(r.n_frames === 256 + (r.media_id % 512).toInt)      // sample frames
    }
  }

  test("MediaHeaders: sniff + dimension parse across four image formats") {
    import Multimodal.MediaHeaders
    val png = Multimodal.syntheticPng(640, 480, Array[Byte](1, 2, 3))
    assert(MediaHeaders.sniff(png) === Some("png"))
    assert(MediaHeaders.dimensions("png", png) === Some((640, 480)))
    // minimal JPEG: SOI, one APP0 segment, then SOF0 with dims 320x200
    val jpeg = Array[Int](0xFF, 0xD8, // SOI
      0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 200, 0x01, 0x40, 0x01, 0x00 // SOF0
    ).map(_.toByte)
    assert(MediaHeaders.sniff(jpeg) === Some("jpeg"))
    assert(MediaHeaders.dimensions("jpeg", jpeg) === Some((320, 200)))
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x10, 0x01, 0x20, 0x00).map(_.toByte) // 272 x 32 LE
    assert(MediaHeaders.sniff(gif) === Some("gif"))
    assert(MediaHeaders.dimensions("gif", gif) === Some((272, 32)))
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 0x40; bmp(19) = 0x01 // width 320 LE
    bmp(22) = 0xF0.toByte; bmp(23) = 0xFF.toByte // height -16 (top-down)
    bmp(24) = 0xFF.toByte; bmp(25) = 0xFF.toByte
    assert(MediaHeaders.sniff(bmp) === Some("bmp"))
    assert(MediaHeaders.dimensions("bmp", bmp) === Some((320, 16)))
    // truncated payloads answer None, never throw
    assert(MediaHeaders.dimensions("png", png.take(20)) === None)
    assert(MediaHeaders.dimensions("jpeg", jpeg.take(9)) === None)
    // unknown container → stub fallback path
    assert(MediaHeaders.sniff(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)) === None)
  }

  test("MediaHeaders: WAV chunk walk returns (rate, channels, frames)") {
    import Multimodal.MediaHeaders
    val wav = Multimodal.syntheticWav(44100, 2, 1000)
    assert(MediaHeaders.sniff(wav) === Some("wav"))
    assert(MediaHeaders.wavInfo(wav) === Some((44100, 2, 1000L)))
    assert(MediaHeaders.wavInfo(wav.take(30)) === None) // truncated fmt
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

  test("extractText refuses what it cannot read: unknown formats, non-PDF pdf, non-ZIP docx") {
    def refuses(format: String, payload: Array[Byte]): Unit = {
      val media = Seq(Multimodal.DocMediaRow(1L, payload, format)).toDS()
      val ex = intercept[org.apache.spark.SparkException] {
        Multimodal.extractText(media).collect()
      }
      assert(ex.getMessage.contains("no extractor") ||
        String.valueOf(ex.getCause).contains("no extractor"), format)
    }
    refuses("rtf", Array[Byte](1, 2))   // no pure-JVM extractor exists
    refuses("pdf", Array[Byte](1, 2))   // real extractor, wrong magic
    refuses("docx", Array[Byte](1, 2))  // real extractor, not a ZIP
  }

  // ---- real DOCX extraction (DocxText) ----

  test("DocxText: write → extract round-trips exact text; tabs/breaks/entities handled") {
    val paras = Seq("First paragraph with <angle> & \"quotes\".",
      "unicode: ñ 中文 🚀", "  preserved   spacing  kept  ")
    val docx = DocxText.write(paras)
    assert(docx.take(2).toSeq === Seq('P'.toByte, 'K'.toByte))
    assert(DocxText.extract(docx) === paras.mkString("\n").trim)
    // hand-written WordprocessingML beyond what the writer emits
    val xml = """<w:document><w:body>
      |<w:p><w:pPr><w:jc w:val="left"/></w:pPr>
      |<w:r><w:t xml:space="preserve">a </w:t></w:r>
      |<w:r><w:rPr><w:b/></w:rPr><w:t>bold</w:t></w:r>
      |<w:r><w:tab/><w:t>after&#32;tab</w:t></w:r></w:p>
      |<w:p><w:r><w:t>second</w:t><w:br/><w:t>line</w:t></w:r></w:p>
      |</w:body></w:document>""".stripMargin
    assert(DocxText.documentText(xml) ===
      "a bold\tafter tab\nsecond\nline")
    // a ZIP that is not a docx refuses loudly
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt")); z.closeEntry(); z.close()
    intercept[UnsupportedOperationException](DocxText.extract(bos.toByteArray))
  }

  test("OdtText: round trip with ODF whitespace encoding; hand-written spans/breaks; refusals") {
    val paras = Seq("plain text", "spaced:  two   three    four",
      "tabs\there", "unicode ñ 中文 & <esc>")
    val odt = OdtText.write(paras)
    assert(OdtText.extract(odt) === paras.mkString("\n").trim)
    // hand-written ODF beyond what the writer emits: styled spans keep
    // their text, line-breaks break, text:s defaults to one space
    val xml = """<office:document-content><office:body><office:text>
      |<text:p>a <text:span text:style-name="T1">styled</text:span> run</text:p>
      |<text:p>one<text:line-break/>two<text:s/>three</text:p>
      |</office:text></office:body></office:document-content>"""
      .stripMargin.replaceAll("\n", "")
    assert(OdtText.contentText(xml) === "a styled run\none\ntwo three")
    intercept[UnsupportedOperationException](OdtText.extract(Array[Byte](1, 2)))
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("x.txt")); z.closeEntry(); z.close()
    intercept[UnsupportedOperationException](OdtText.extract(bos.toByteArray))
  }

  test("RtfText: round trip incl. unicode; destinations dropped; hex and uc handled") {
    val paras = Seq("plain ascii", "specials \\ { } and\ttab",
      "unicode: ñ ü 中文 🚀")
    val rtf = RtfText.write(paras)
    assert(RtfText.extract(rtf) === paras.mkString("\n").trim)
    // hand-written RTF the wild produces: font/color tables, an
    // ignorable {\*} destination, hex escapes, formatting words
    val wild = ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Calibri;}}" +
      "{\\colortbl;\\red0\\green0\\blue0;}" +
      "{\\*\\generator LibreOffice}" +
      "\\pard\\b bold\\b0  caf\\'e9 end\\par second}")
    assert(RtfText.extract(wild.getBytes("ISO-8859-1")) ===
      "bold café end\nsecond")
    intercept[UnsupportedOperationException](
      RtfText.extract(Array[Byte](1, 2, 3, 4, 5)))
  }

  test("extractTextSafe: per-row error capture; damaged ZIPs refuse as the declared type") {
    val good = DocxText.write(Seq("fine document"))
    val damaged = good.clone()
    // corrupt the deflated data of the last entry, keep the PK magic
    (good.length - 30 until good.length - 10).foreach(k => damaged(k) = 0x55)
    val media = Seq(
      Multimodal.DocMediaRow(1L, good, "docx"),
      Multimodal.DocMediaRow(2L, Array[Byte](1, 2, 3, 4), "docx"),
      Multimodal.DocMediaRow(3L, damaged, "docx"),
      Multimodal.DocMediaRow(4L, good, "odt"),       // wrong part name
      Multimodal.DocMediaRow(5L, good, "mystery")    // unknown format
    ).toDS()
    val out = Multimodal.extractTextSafe(media).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).text === Some("fine document") && out(1L).error.isEmpty)
    assert(out(2L).text.isEmpty && out(2L).error.get.contains("no extractor"))
    // damaged zip: either the entry still inflates (zip redundancy) or
    // the declared refusal is captured — never a task-killing throw
    assert(out(3L).text.isDefined || out(3L).error.isDefined)
    assert(out(4L).error.get.contains("content.xml"))
    assert(out(5L).error.get.contains("no extractor"))
  }

  test("extractText docx format: real extraction chained into the chunker") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .filter(col("doc_id") < 20).select(col("doc_id"), col("text"))
    val media = docs.map { r =>
      Multimodal.DocMediaRow(r.getLong(0),
        DocxText.write(Seq(r.getString(1))), "docx")
    }
    val extracted = Multimodal.extractText(media).toDF()
      .select(col("media_id").as("doc_id"), col("text"))
    val viaDocx = TextAnalysis.chunk(extracted, "doc_id", "text",
      width = 5, stride = 5).collect().map(_.toSeq).toSet
    val direct = TextAnalysis.chunk(docs, "doc_id", "text",
      width = 5, stride = 5).collect().map(_.toSeq).toSet
    assert(viaDocx === direct)
    assert(viaDocx.nonEmpty)
  }

  // ---- real PDF extraction (PdfText) ----

  test("PdfText: write → extract round-trips exact text, compressed and raw") {
    val lines = Seq("First line of the page.",
      "unicode: ñ ü 中文 🚀 — em-dash", "parens (nested (deep)) and \\backslash")
    for (compress <- Seq(true, false)) {
      val pdf = PdfText.write(lines, compress = compress)
      assert(new String(pdf.take(5), "ISO-8859-1") === "%PDF-")
      assert(PdfText.extract(pdf) === lines.mkString("\n"), s"compress=$compress")
    }
  }

  test("PdfText: TJ arrays, hex strings, quote ops, comments, dicts and BI..EI are handled") {
    // hand-written content stream exercising the grammar beyond what
    // our writer emits (the shapes real-world generators produce)
    val content = """BT /F1 12 Tf 72 720 Td
      |% a comment ( with parens ) to ignore
      |[(kerned ) -120 (pair)] TJ
      |0 -14 Td
      |<48 65 78> Tj
      |(next via quote) '
      |BI /W 2 /H 2 ID ???? EI
      |(after image) Tj
      |ET""".stripMargin
    val body = ("1 0 obj\n<< /Length " + content.length + " >>\nstream\n" +
      content + "\nendstream\nendobj\n")
    val pdf = ("%PDF-1.4\n" + body + "%%EOF\n").getBytes("ISO-8859-1")
    val txt = PdfText.extract(pdf)
    assert(txt.contains("kerned pair"))
    assert(txt.contains("Hex"))
    assert(txt.contains("next via quote"))
    assert(txt.contains("after image"))
  }

  test("PdfText: unsupported per-stream filters are skipped, readable streams still extract") {
    val good = "BT (still here) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\nÿØÿà\nendstream\nendobj\n" +
      s"2 0 obj\n<< /Length ${good.length} >>\nstream\n$good\nendstream\nendobj\n" +
      "%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfText.extract(pdf) === "still here")
  }

  test("PdfText fuzz: seeded hostile unicode round-trips write → extract exactly") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 40).foreach { trial =>
      val lines = Seq.fill(1 + rnd.nextInt(4)) {
        val len = 1 + rnd.nextInt(119)
        val sb = new StringBuilder
        while (sb.length < len) rnd.nextInt(6) match {
          case 0 => sb.append(('a' + rnd.nextInt(26)).toChar)
          case 1 => sb.append("()\\/<>[]{}%#&".charAt(rnd.nextInt(13)))
          case 2 => sb.append(if (rnd.nextBoolean()) ' ' else '\t')
          case 3 => sb.append((0xA1 + rnd.nextInt(400)).toChar)
          case 4 => sb.append(new String(Character.toChars(0x1F300 + rnd.nextInt(256))))
          case _ => sb.append(('0' + rnd.nextInt(10)).toChar)
        }
        sb.toString
      }
      val expected = lines.mkString("\n").trim
      val got = PdfText.extract(PdfText.write(lines, compress = trial % 2 == 0))
      assert(got === expected, s"trial $trial lines=$lines")
    }
  }

  test("PdfText corruption fuzz: body damage never throws and never fabricates text") {
    val pdf = PdfText.write(Seq("stable line one", "stable line two"), compress = true)
    val rnd = new scala.util.Random(42)
    (1 to 60).foreach { trial =>
      val dmg = pdf.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        // never the %PDF- header — that one is a contractual refusal
        val at = 5 + rnd.nextInt(dmg.length - 5)
        dmg(at) = rnd.nextInt(256).toByte
      }
      val out = PdfText.extract(dmg) // must not throw
      // damaged streams either still decode (inflate is self-checking
      // enough that most corruption surfaces as DataFormatException →
      // stream skipped) or vanish; whatever survives must be a
      // substring-of-intent, not invented bytes rendered as text
      assert(out.length <= 64, s"trial $trial produced suspicious text: '$out'")
    }
    // header corruption refuses loudly
    val bad = pdf.clone(); bad(1) = 'X'.toByte
    intercept[UnsupportedOperationException](PdfText.extract(bad))
  }

  test("extractText pdf format: real extraction chained into the chunker") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .filter(col("doc_id") < 20).select(col("doc_id"), col("text"))
    val media = docs.map { r =>
      Multimodal.DocMediaRow(r.getLong(0),
        PdfText.write(Seq(r.getString(1)), compress = true), "pdf")
    }
    val extracted = Multimodal.extractText(media).toDF()
      .select(col("media_id").as("doc_id"), col("text"))
    val viaPdf = TextAnalysis.chunk(extracted, "doc_id", "text",
      width = 5, stride = 5).collect().map(_.toSeq).toSet
    val direct = TextAnalysis.chunk(docs, "doc_id", "text",
      width = 5, stride = 5).collect().map(_.toSeq).toSet
    assert(viaPdf === direct)
    assert(viaPdf.nonEmpty)
  }

  test("HtmlText: tag strip, block separation, whitespace collapse") {
    assert(Multimodal.HtmlText.extract(
      "<html><body><h1>Title</h1><p>one  two</p><p>three</p></body></html>")
      === "Title one two three")
    // inline tags do NOT separate words; block tags do
    assert(Multimodal.HtmlText.extract("a<b>b</b>c<br>d") === "abc d")
    assert(Multimodal.HtmlText.extract("  <div> x </div>  ") === "x")
  }

  test("HtmlText: script/style bodies dropped entirely, case-insensitive") {
    assert(Multimodal.HtmlText.extract(
      "before<script>if (1 < 2) { alert(\"x & y\"); }</script>after")
      === "beforeafter")
    assert(Multimodal.HtmlText.extract(
      "a<STYLE type=x>p { color: red; }</Style>b") === "ab")
    // unclosed raw-text element runs to end-of-string, never throws
    assert(Multimodal.HtmlText.extract("keep<script>var x = 1;") === "keep")
  }

  test("HtmlText: comments and doctype dropped") {
    assert(Multimodal.HtmlText.extract(
      "<!DOCTYPE html><!-- a <p> inside a comment -->text") === "text")
    assert(Multimodal.HtmlText.extract("a<!-- unclosed comment") === "a")
  }

  test("HtmlText: one-pass entity decode — no double decode") {
    assert(Multimodal.HtmlText.extract("x &amp; y") === "x & y")
    assert(Multimodal.HtmlText.extract("&lt;p&gt;") === "<p>")
    // &amp;lt; is the LITERAL string "&lt;", not a second-round "<"
    assert(Multimodal.HtmlText.extract("&amp;lt;") === "&lt;")
    assert(Multimodal.HtmlText.extract("a&nbsp;b") === "a b")
    assert(Multimodal.HtmlText.extract("&#65;&#x42;") === "AB")
    // unknown / malformed entities pass through verbatim
    assert(Multimodal.HtmlText.extract("&bogus; &#xZZ; & alone")
      === "&bogus; &#xZZ; & alone")
  }

  test("HtmlText: escape → extract round trip recovers the original text") {
    val hostile = "a & b < c > d \"quoted\" 'single'  &amp; literal"
    val esc = hostile.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    assert(Multimodal.HtmlText.extract(s"<p>$esc</p>")
      === hostile.replaceAll("\\s+", " ").trim)
  }

  test("extractText html format: real extraction chained into the chunker") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "x & y < z"))
      .toDF("doc_id", "text")
    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val media = docs.select(col("doc_id").as("media_id"),
      encode(concat(lit("<body><p>"), esc, lit("</p></body>")), "UTF-8")
        .as("payload"),
      lit("html").as("meta_format")).as[Multimodal.DocMediaRow]
    val extracted = Multimodal.extractText(media).toDF()
      .select(col("media_id").as("doc_id"), col("text"))
    // extraction inverts the escaping exactly — chunking the extracted
    // text must equal chunking the original
    val viaHtml = TextAnalysis.chunk(extracted, "doc_id", "text",
      width = 2, stride = 2).collect().map(r => r.toSeq).toSet
    val direct = TextAnalysis.chunk(docs, "doc_id", "text",
      width = 2, stride = 2).collect().map(r => r.toSeq).toSet
    assert(viaHtml === direct)
    assert(viaHtml.nonEmpty)
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

  // ---- real pixel/sample decode (JvmCodec) ----

  test("JvmCodec: solid PNG decodes to exact mean features, zero variance") {
    val png = JvmCodec.encodePng(JvmCodec.solidImage(10, 6, 120, 60, 200))
    val p = JvmCodec.decodeImage(png).get
    assert(p.width === 10 && p.height === 6 && p.nFrames === 1)
    assert(p.features(0) === (120 / 255.0).toFloat)
    assert(p.features(1) === (60 / 255.0).toFloat)
    assert(p.features(2) === (200 / 255.0).toFloat)
    val luma = (299L * 120 + 587L * 60 + 114L * 200) / 255000.0
    assert(p.features(3) === luma.toFloat)
    assert(p.features(4) === 0.0f)  // std of a constant
    assert(p.features(5) === 0.0f)  // gradient of a constant
    assert(p.features(6) === (10.0 / 16.0).toFloat)
    assert(p.features(7) === (if (luma > 0.5) 1.0f else 0.0f))
  }

  test("JvmCodec: BMP (lossless) exact; JPEG (lossy) close; GIF decodes") {
    val img = JvmCodec.solidImage(20, 20, 30, 180, 90)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val bmp = JvmCodec.decodeImage(enc("bmp")).get
    assert(bmp.width === 20 && bmp.features(0) === (30 / 255.0).toFloat)
    val jpg = JvmCodec.decodeImage(enc("jpg")).get
    assert(jpg.width === 20)
    assert(math.abs(jpg.features(1) - 180 / 255.0) < 0.02, "jpeg mean G drifted")
    val gif = JvmCodec.decodeImage(enc("gif")).get
    assert(gif.width === 20 && gif.height === 20 && gif.nFrames === 1)
  }

  test("JvmCodec: animated GIF reports its real frame count") {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 4).foreach { f =>
      val frame = JvmCodec.solidImage(12, 8, f * 40, 0, 0)
      writer.writeToSequence(new javax.imageio.IIOImage(frame, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val p = JvmCodec.decodeImage(bos.toByteArray).get
    assert(p.width === 12 && p.height === 8)
    assert(p.nFrames === 4)
  }

  test("JvmCodec dHash: invariant under uniform brightness shift, distinct patterns differ") {
    def pat(seed: Int, shift: Int): Long = JvmCodec.dHash(
      JvmCodec.grayImage(90, 80)((x, y) =>
        ((seed * 31 + x * 7 + y * 13) % 17) * 14 + shift))
    assert(pat(1, 0) === pat(1, 10), "brightness shift changed the hash")
    assert(pat(1, 0) !== pat(2, 0), "distinct patterns collided")
  }

  test("JvmCodec dHash on a 9x8 raster matches the bit formula (the SQL oracle's shape)") {
    val grid = Multimodal.syntheticGridMedia(spark, nGroups = 6, perGroup = 5)
      .collect().sortBy(_.media_id)
    grid.foreach { row =>
      val i = row.media_id; val g = i / 5
      var expect = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val l = (g * 31 + x * (7 + g % 5) + y * 13) % 17
        val r = (g * 31 + (x + 1) * (7 + g % 5) + y * 13) % 17
        if (r > l) expect |= 1L << (y * 8 + x)
      }
      val p = JvmCodec.decodeImage(row.payload).get
      assert(p.phash === expect, s"media_id $i")
      assert(p.phash !== 0L)
    }
    // within a group (pure brightness shifts) all hashes agree
    assert(grid.groupBy(_.media_id / 5).values
      .forall(g => g.map(r => JvmCodec.decodeImage(r.payload).get.phash).distinct.length == 1))
  }

  test("JvmCodec WAV: DC signal closed-form; sine RMS amp/sqrt2 and zcr 2f/rate") {
    val dc = Multimodal.syntheticWavDc(12000, 2, 500, 9000)
    val a = JvmCodec.decodeWav(dc).get
    assert(a.rate === 12000 && a.channels === 2 && a.frames === 500)
    assert(a.features(0) === (9000 / 32768.0).toFloat) // RMS of a constant
    assert(a.features(1) === 0.0f)                     // no crossings
    assert(a.features(2) === (9000 / 32768.0).toFloat) // peak
    assert(a.features(4) === (500.0 / 12000).toFloat)  // duration
    // 440 Hz sine, 1 s at 8 kHz mono
    val rate = 8000; val n = 8000; val amp = 12000.0
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    (0 until n).foreach(t => bb.putShort(
      math.round(amp * math.sin(2 * math.Pi * 440 * t / rate)).toShort))
    val s = JvmCodec.decodeWav(bb.array()).get
    assert(math.abs(s.features(0) - amp / math.sqrt(2) / 32768.0) < 0.002, "sine RMS")
    assert(math.abs(s.features(1) - 2 * 440.0 / rate) < 0.005, "sine zero-crossing rate")
  }

  test("JvmCodec G.711: mu-law and A-law WAV decode through the ITU expansion formulas") {
    // published reference points of the G.711 tables
    assert(JvmCodec.ulawToLinear(0xFF) === 0)        // quietest positive
    assert(JvmCodec.ulawToLinear(0x80) === 32124)    // loudest positive
    assert(JvmCodec.ulawToLinear(0x00) === -32124)   // loudest negative
    assert(JvmCodec.alawToLinear(0x55) === -8)       // quietest negative
    assert(JvmCodec.alawToLinear(0xD5) === 8)        // quietest positive
    assert(JvmCodec.alawToLinear(0xAA) === 32256)    // loudest positive
    def lawWav(format: Int, byte: Int, frames: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + frames)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(format.toShort).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
      bb.put("data".getBytes("US-ASCII")).putInt(frames)
      (0 until frames).foreach(_ => bb.put(byte.toByte))
      bb.array()
    }
    // a constant companded byte decodes to a constant linear sample:
    // RMS = peak = |decoded|/32768 exactly, zero crossings none
    val u = JvmCodec.decodeWav(lawWav(7, 0x9A, 300)).get
    val expectU = math.abs(JvmCodec.ulawToLinear(0x9A)) / 32768.0
    assert(u.frames === 300 && u.features(0) === expectU.toFloat)
    assert(u.features(1) === 0.0f && u.features(7) === 0.5f)
    val a = JvmCodec.decodeWav(lawWav(6, 0x2A, 300)).get
    val expectA = math.abs(JvmCodec.alawToLinear(0x2A)) / 32768.0
    assert(a.features(0) === expectA.toFloat)
    // expansion is monotone in segment: louder code → larger magnitude
    assert(math.abs(JvmCodec.ulawToLinear(0x85)) > math.abs(JvmCodec.ulawToLinear(0x95)))
  }

  test("JvmCodec: compressed-audio and 8-bit WAV are an honest None, not a guess") {
    // 8-bit PCM header (bits=16 is the supported contract)
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(0)
    assert(JvmCodec.decodeWav(bb.array()).isEmpty)
    assert(JvmCodec.decodeImage(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("decodeAll real path: solid fixture pixels, exact means, phash populated only for decodable images") {
    val real = Multimodal.syntheticMediaReal(spark, 60)
    val d = Multimodal.decodeAll(real).collect().sortBy(_.media_id)
    d.filter(_.kind == "image").foreach { r =>
      val i = r.media_id
      assert(r.width === (32 + i % 32).toInt && r.height === (24 + i % 24).toInt)
      assert(r.features(0) === (((i * 17) % 256) / 255.0).toFloat, s"id $i mean R")
      assert(r.features(4) === 0.0f)
    }
    d.filter(_.kind == "audio").foreach { r =>
      val i = r.media_id
      assert(r.width === (8000 + (i % 5) * 2000).toInt)  // rate
      assert(r.n_frames === (400 + i % 256).toInt)
      assert(r.features(0) === (((i * 37) % 20000) / 32768.0).toFloat, s"id $i RMS")
    }
    // the header-only fixture's corrupt-stream PNGs fall back: phash
    // absent (None) — honest, so a REAL all-zero hash (solid image)
    // can never collide with "pixels unreachable"
    val hdrOnly = Multimodal.decodeAll(media).collect()
    assert(hdrOnly.filter(_.kind == "image").forall(_.phash.isEmpty))
  }

  test("resizeImages real path: output is a decodable PNG at target dims with the source color") {
    val real = Multimodal.syntheticMediaReal(spark, 30)
    val decoded = Multimodal.decodeAll(real)
    val rz = Multimodal.resizeImages(decoded, real, maxSide = 16)
      .collect().sortBy(_.media_id)
    assert(rz.nonEmpty)
    rz.foreach { r =>
      val i = r.media_id
      val w = (32 + i % 32).toInt; val h = (24 + i % 24).toInt
      val scale = math.min(1.0, 16.0 / math.max(w, h))
      assert(r.width === math.max(1, math.round(w * scale).toInt))
      assert(r.height === math.max(1, math.round(h * scale).toInt))
      val back = JvmCodec.decodeImage(r.payload).get
      assert(back.width === r.width && back.height === r.height)
      // area-average of a solid is the same solid — decode recovers it
      assert(back.features(0) === (((i * 17) % 256) / 255.0).toFloat, s"id $i")
      assert(back.features(4) === 0.0f)
    }
  }

  test("TIFF: sniffed by magic (both byte orders) and fully decoded by the JDK reader") {
    import Multimodal.MediaHeaders
    val img = JvmCodec.solidImage(14, 9, 200, 40, 10)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos), "no tiff writer")
    val tiff = bos.toByteArray
    assert(MediaHeaders.sniff(tiff) === Some("tiff"))
    assert(MediaHeaders.sniff("MM *rest".getBytes("ISO-8859-1")) === Some("tiff"))
    val p = JvmCodec.decodeImage(tiff).get
    assert(p.width === 14 && p.height === 9)
    assert(p.features(0) === (200 / 255.0).toFloat) // lossless
    val row = Multimodal.MediaRow(7L, "image", tiff, "tiff", tiff.length.toLong)
    val d = Multimodal.decodeOne(row)
    assert(d.width === 14 && d.height === 9 && d.phash === Some(p.phash))
  }

  test("imageNearDup: structured rasters by banded Hamming, featureless by color bucket") {
    // 6 solid images in 3 colors (2 each) + one grid group of 3 shifts
    val solids = (0 until 6).map { i =>
      val p = JvmCodec.encodePng(JvmCodec.solidImage(20, 16,
        (i / 2) * 80 + 20, (i / 2) * 60 + 10, 200))
      Multimodal.MediaRow(100L + i, "image", p, "png", p.length.toLong)
    }
    val grid = Multimodal.syntheticGridMedia(spark, nGroups = 1, perGroup = 3)
      .collect().toSeq
    val dec = Multimodal.decodeAll(
      spark.createDataset(solids ++ grid)).toDF()
    val pairs = Multimodal.imageNearDup(dec, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same-color solids pair (distance-0 by color bucket); cross-color
    // solids never pair even though every solid shares dHash 0
    assert(pairs.contains((100L, 101L)) && pairs.contains((102L, 103L)) &&
      pairs.contains((104L, 105L)))
    assert(!pairs.exists { case (x, y) =>
      x >= 100 && y >= 100 && x / 2 != y / 2 && (x - 100) / 2 != (y - 100) / 2 })
    // the grid group (structured, brightness shifts) pairs via banding
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)) &&
      pairs.contains((0L, 2L)))
    // no structured-vs-solid cross-tier pairs
    assert(!pairs.exists { case (x, y) => x < 100 ^ y < 100 })
  }

  test("signatureCandidates on decoded dHashes equals brute-force Hamming pairs") {
    val dec = Multimodal.decodeAll(
      Multimodal.syntheticGridMedia(spark, nGroups = 8, perGroup = 4)).toDF()
    val banded = NearDup.signatureCandidates(dec, "media_id", "phash", maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hashes = dec.select(col("media_id"), col("phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(banded === brute)
    // the within-group (brightness-shift) pairs are all there at distance 0
    assert(brute.count(_._3 == 0) >= 8 * (4 * 3 / 2))
  }

  test("admitMediaPerceptual: exact tier catches byte dupes (any container), perceptual tier catches brightness shifts, cross-set contract holds") {
    val grid = Multimodal.syntheticGridMedia(spark, nGroups = 8, perGroup = 5).collect()
    val reps = grid.filter(r => r.media_id / 5 < 6 && r.media_id % 5 == 0)
    val videoPayload = Array.tabulate[Byte](64)(j => (j * 7).toByte)
    val corpusMedia = spark.createDataset(
      reps.toSeq :+ Multimodal.MediaRow(1000L, "video", videoPayload, "mkv", 64L))
    val corpusDec = Multimodal.decodeAll(corpusMedia).toDF()
      .join(corpusMedia.toDF().select(col("media_id"),
        xxhash64(col("payload")).as("payload_hash")), "media_id")
    val index = Multimodal.mediaIndexProjection(corpusDec)
    // incoming: brightness-shifted members of indexed groups 0-1 (new
    // ids), novel patterns (groups 6-7), a byte-exact video replay
    // under a new id, and a novel video
    val dupShift = grid.filter(r => r.media_id / 5 < 2 && r.media_id % 5 == 3)
      .map(r => r.copy(media_id = r.media_id + 2000))
    val novel = grid.filter(r => r.media_id / 5 >= 6 && r.media_id % 5 == 0)
      .map(r => r.copy(media_id = r.media_id + 3000))
    val videoReplay = Multimodal.MediaRow(4000L, "video", videoPayload, "mkv", 64L)
    val novelVideo = Multimodal.MediaRow(4001L, "video",
      Array.tabulate[Byte](64)(j => (j * 13 + 1).toByte), "mkv", 64L)
    val incoming = spark.createDataset(
      (dupShift ++ novel).toSeq :+ videoReplay :+ novelVideo)
    val (admitted, admittedDec) = Multimodal.admitMediaPerceptual(incoming, index)
    val ids = admitted.select(col("media_id")).collect().map(_.getLong(0)).toSet
    assert(ids === (novel.map(_.media_id).toSet + 4001L))
    assert(admittedDec.columns.contains("payload_hash"))
    assert(admittedDec.select(col("media_id")).collect()
      .map(_.getLong(0)).toSet === ids)
    // cross-set contract: splitting the incoming batch cannot change
    // the outcome (incoming rows never meet each other)
    val (a1, _) = Multimodal.admitMediaPerceptual(
      spark.createDataset(dupShift.toSeq :+ videoReplay), index)
    val (a2, _) = Multimodal.admitMediaPerceptual(
      spark.createDataset(novel.toSeq :+ novelVideo), index)
    val splitIds = (a1.select(col("media_id")).collect() ++
      a2.select(col("media_id")).collect()).map(_.getLong(0)).toSet
    assert(splitIds === ids)
  }

  test("reconcileMediaIndex: closes the corpus-without-index crash window idempotently") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mediarec")
    val corpus = s"$tmp/corpus"; val index = s"$tmp/index"
    val grid = Multimodal.syntheticGridMedia(spark, nGroups = 3, perGroup = 5).collect()
    val reps = spark.createDataset(grid.filter(_.media_id % 5 == 0).toSeq)
    // simulate the crash: payloads committed, index append never ran
    graft.sources.VersionedCorpus.append(reps.toDF(), corpus)
    assert(Multimodal.reconcileMediaIndex(spark, corpus, index) === 3L)
    val idx = graft.sources.VersionedCorpus.snapshot(spark, index)
    assert(idx.count() === 3L)
    assert(idx.columns.toSet ===
      Set("media_id", "payload_hash", "phash", "cbucket", "kind", "width", "height", "n_frames"))
    // second run finds no drift and appends nothing
    assert(Multimodal.reconcileMediaIndex(spark, corpus, index) === 0L)
    assert(graft.sources.VersionedCorpus.snapshot(spark, index).count() === 3L)
    // the reconciled index immediately rejects a shifted dupe
    val dupe = spark.createDataset(Seq(
      grid.find(_.media_id === 1L).get.copy(media_id = 500L)))
    val (admitted, _) = Multimodal.admitMediaPerceptual(dupe, idx)
    assert(admitted.count() === 0L)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("extractFrames: per-frame real decode of animated GIFs, stride-sampled, exact colors") {
    val media = Multimodal.syntheticAnimatedMedia(spark, n = 6, framesPer = 5)
    val frames = Multimodal.extractFrames(media, stride = 2).collect()
      .sortBy(r => (r.media_id, r.frame_idx))
    assert(frames.length === 6 * 3) // frames 0, 2, 4 per asset
    frames.foreach { r =>
      val i = r.media_id; val f = r.frame_idx
      assert(Set(0, 2, 4).contains(f))
      assert(r.width === (16 + i % 8).toInt && r.height === (12 + i % 6).toInt)
      assert(r.features(0) === (((i * 17 + f * 31) % 256) / 255.0).toFloat,
        s"id $i frame $f mean R")
      assert(r.features(4) === 0.0f)
    }
    // a single-frame still yields exactly frame 0
    val still = Multimodal.syntheticMediaReal(spark, 3)
    val sf = Multimodal.extractFrames(still, stride = 3).collect()
    assert(sf.map(r => (r.media_id, r.frame_idx)).toSeq === Seq((0L, 0)))
    // per-frame hashes ride the banded near-dup machinery: identical
    // frames across assets collide, distinct solid frames all hash 0
    // (featureless raster) — which is exactly why dedup uses phash
    // TOGETHER with the exact payload tier
    assert(frames.forall(_.phash === 0L))
  }

  test("frameNearDup: assets sharing ANY frame pattern match at distance 0") {
    val media = Multimodal.syntheticAnimatedGridMedia(
      spark, n = 20, framesPer = 3, nPatterns = 8)
    val pairs = Multimodal.frameNearDup(media, stride = 1, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // construction: asset i shows patterns {(i+f) % 8 | f < 3}; i and j
    // share one exactly when (j - i) mod 8 ∈ {±1, ±2} ∪ {0 (mod 8)}
    for (i <- 0L until 20L; j <- (i + 1) until 20L) {
      val d = ((j - i) % 8 + 8) % 8
      val share = d <= 2 || d >= 6 || d == 0
      if (share)
        assert(pairs.get((i, j)).contains(0), s"pair ($i,$j) d=$d should share a frame")
    }
    assert(pairs.values.exists(_ == 0))
  }

  test("EXIF orientation: real APP1/IFD walk, and the dihedral remap puts marked corners upright") {
    import Multimodal.MediaHeaders
    // a real JPEG with a hand-built EXIF APP1 spliced after SOI
    def withExif(orientation: Int, little: Boolean): Array[Byte] = {
      val img = JvmCodec.solidImage(10, 8, 60, 60, 60)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val jpeg = bos.toByteArray
      val bb = java.nio.ByteBuffer.allocate(36).order(
        if (little) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      bb.put(0xFF.toByte).put(0xE1.toByte)
      bb.order(java.nio.ByteOrder.BIG_ENDIAN).putShort(34) // segment length is always BE
      bb.order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      bb.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
      bb.put((if (little) "II" else "MM").getBytes("US-ASCII"))
      bb.putShort(42).putInt(8)         // TIFF magic + IFD0 offset
      bb.putShort(1)                    // one IFD entry
      bb.putShort(0x0112.toShort).putShort(3).putInt(1)
      bb.putShort(orientation.toShort).putShort(0)
      bb.putInt(0)                      // no next IFD
      jpeg.take(2) ++ bb.array() ++ jpeg.drop(2)
    }
    assert(MediaHeaders.exifOrientation(withExif(6, little = true)) === Some(6))
    assert(MediaHeaders.exifOrientation(withExif(8, little = false)) === Some(8))
    // no APP1 → None; non-JPEG → None
    val plain = JvmCodec.encodePng(JvmCodec.solidImage(4, 4, 1, 2, 3))
    assert(MediaHeaders.exifOrientation(plain) === None)
    // the remap: mark src(0,0) red on a 6x4 black raster and check the
    // corner it lands in for each of the eight orientations
    def marked(): java.awt.image.BufferedImage = {
      val img = JvmCodec.solidImage(6, 4, 0, 0, 0)
      img.setRGB(0, 0, 0xFF0000); img
    }
    def redAt(img: java.awt.image.BufferedImage, x: Int, y: Int): Boolean =
      (img.getRGB(x, y) & 0xFFFFFF) == 0xFF0000
    assert(redAt(JvmCodec.normalizeOrientation(marked(), 1), 0, 0))
    assert(redAt(JvmCodec.normalizeOrientation(marked(), 2), 5, 0))
    assert(redAt(JvmCodec.normalizeOrientation(marked(), 3), 5, 3))
    assert(redAt(JvmCodec.normalizeOrientation(marked(), 4), 0, 3))
    val t5 = JvmCodec.normalizeOrientation(marked(), 5)
    assert(t5.getWidth === 4 && t5.getHeight === 6 && redAt(t5, 0, 0))
    val t6 = JvmCodec.normalizeOrientation(marked(), 6)
    assert(t6.getWidth === 4 && redAt(t6, 3, 0)) // rotate CW: TL -> TR
    val t7 = JvmCodec.normalizeOrientation(marked(), 7)
    assert(redAt(t7, 3, 5))
    val t8 = JvmCodec.normalizeOrientation(marked(), 8)
    assert(redAt(t8, 0, 5)) // rotate CCW: TL -> BL
    // a double application of 3 (180) is the identity
    val back = JvmCodec.normalizeOrientation(
      JvmCodec.normalizeOrientation(marked(), 3), 3)
    assert(redAt(back, 0, 0))
  }

  test("model-based fuzz: admission + erasure vs a driver-side reference model") {
    // the dedup-store state machine, driven with random batches and
    // random erasures, checked against a trivially-correct driver
    // model: an image is admitted iff its payload is byte-novel AND its
    // pattern group has no LIVE index row; a video iff byte-novel.
    // Within a batch, rows never affect each other (cross-set
    // contract), and admission state advances only by what was
    // admitted.
    val rnd = new scala.util.Random(7)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mediafuzz")
    val corpus = s"$tmp/corpus"; val index = s"$tmp/index"
    val grid = Multimodal.syntheticGridMedia(spark, nGroups = 20, perGroup = 5)
      .collect().map(r => (r.media_id / 5, r.media_id % 5) -> r.payload).toMap
    val videoPool = (0 until 5).map(v =>
      Array.tabulate[Byte](48)(j => (v * 31 + j * 7).toByte))
    // model: live id → (payload content key, Some(group) for images)
    var live = Map.empty[Long, (String, Option[Long])]
    var nextId = 10000L
    def contentKey(k: Either[(Long, Long), Int]): String = k match {
      case Left((g, s)) => s"img:$g:$s"
      case Right(v)     => s"vid:$v"
    }
    for (round <- 1 to 8) {
      val batch = (1 to 6).map { _ =>
        val id = { nextId += 1; nextId }
        if (rnd.nextInt(4) == 0) {
          val v = rnd.nextInt(videoPool.length)
          (Multimodal.MediaRow(id, "video", videoPool(v), "mkv", 48L),
            contentKey(Right(v)), None)
        } else {
          val g = rnd.nextInt(20).toLong; val s = rnd.nextInt(5).toLong
          (Multimodal.MediaRow(id, "image", grid((g, s)), "png",
            grid((g, s)).length.toLong), contentKey(Left((g, s))), Some(g))
        }
      }
      val liveKeys = live.values.map(_._1).toSet
      val liveGroups = live.values.flatMap(_._2).toSet
      val expect = batch.filter { case (_, key, group) =>
        !liveKeys.contains(key) && group.forall(g => !liveGroups.contains(g))
      }.map(_._1.media_id).toSet
      val idx =
        if (graft.sources.VersionedCorpus.latest(index).isDefined)
          graft.sources.VersionedCorpus.snapshot(spark, index)
        else spark.range(0).select(col("id").as("media_id"),
          col("id").as("payload_hash"), col("id").as("phash"),
          col("id").cast("int").as("cbucket"))
      val incoming = spark.createDataset(batch.map(_._1))
      val (admitted, dec) = Multimodal.admitMediaPerceptual(incoming, idx)
      val got = admitted.select(col("media_id")).collect().map(_.getLong(0)).toSet
      assert(got === expect, s"round $round: model disagrees (live=${live.size})")
      if (got.nonEmpty) {
        graft.sources.VersionedCorpus.append(admitted, corpus)
        graft.sources.VersionedCorpus.append(
          Multimodal.mediaIndexProjection(dec), index)
        live ++= batch.filter(r => got.contains(r._1.media_id))
          .map(r => r._1.media_id -> (r._2, r._3))
      }
      // random erasure of one live asset: both stores forget, and the
      // model frees its content key and (maybe) its group
      if (live.nonEmpty && rnd.nextInt(3) == 0) {
        val victim = live.keys.toSeq.sorted.apply(rnd.nextInt(live.size))
        Forget.forget(spark, Seq(victim).toDF("media_id"),
          extraStores = Seq(corpus -> "media_id", index -> "media_id"))
        live -= victim
      }
    }
    // end state: the index mirrors the model exactly
    val finalIds = graft.sources.VersionedCorpus.snapshot(spark, index)
      .select(col("media_id")).collect().map(_.getLong(0)).toSet
    assert(finalIds === live.keySet)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("MP4 box walk: sniff, dims, duration, sample count; truncation-safe") {
    import Multimodal.MediaHeaders
    val mp4 = Multimodal.syntheticMp4(640, 360, timescale = 600,
      duration = 3000, samples = 150)
    assert(MediaHeaders.sniff(mp4) === Some("mp4"))
    assert(MediaHeaders.mp4Info(mp4) === Some((640, 360, 5000L, 150L)))
    // decode dispatch: real metadata, stub features, no phash
    val row = Multimodal.MediaRow(5L, "video", mp4, "mp4", mp4.length.toLong)
    val d = Multimodal.decodeOne(row)
    assert(d.width === 640 && d.height === 360 && d.n_frames === 150)
    assert(d.phash.isEmpty)
    // truncation never throws, falls back to the stub
    (1 until mp4.length by 37).foreach { cut =>
      Multimodal.decodeOne(row.copy(payload = mp4.take(cut)))
    }
    // a lying box size (larger than the payload) is rejected, not read
    val lying = mp4.clone()
    lying(0) = 0x7F // first box claims a huge size
    assert(MediaHeaders.mp4Info(lying) === None)
  }

  test("Matroska EBML walk: sniff, dims, duration; truncation-safe; unknown-size Segment") {
    import Multimodal.MediaHeaders
    val mkv = Multimodal.syntheticMkv(1280, 720, durationMs = 42_000L)
    assert(MediaHeaders.sniff(mkv) === Some("mkv"))
    assert(MediaHeaders.mkvInfo(mkv) === Some((1280, 720, 42000L)))
    val d = Multimodal.decodeOne(
      Multimodal.MediaRow(3L, "video", mkv, "mkv", mkv.length.toLong))
    assert(d.width === 1280 && d.height === 720 && d.n_frames === 0)
    // streaming files mark the Segment size UNKNOWN (all value bits 1):
    // the walk must still find its children, extending to end-of-buffer
    val segIdx = 5 // EBML header (4 id + 1 size) precedes the Segment
    val streaming = mkv.clone()
    streaming(segIdx + 4) = 0xFF.toByte // 1-byte size, all ones
    assert(MediaHeaders.mkvInfo(streaming) === Some((1280, 720, 42000L)))
    // truncation never throws
    (1 until mkv.length by 11).foreach { cut =>
      MediaHeaders.mkvInfo(mkv.take(cut))
    }
  }

  test("scanMetadata: header-only sweep agrees with full decode on dims, never touches pixels") {
    val real = Multimodal.syntheticMediaReal(spark, 30)
    val scan = Multimodal.scanMetadata(real).collect().sortBy(_.media_id)
    val full = Multimodal.decodeAll(real).collect().sortBy(_.media_id)
    scan.zip(full).foreach { case (s, f) =>
      assert(s.media_id === f.media_id)
      if (s.kind != "video") {
        assert(s.width === f.width && s.height === f.height, s"id ${s.media_id}")
        assert(s.n_frames === f.n_frames)
      }
      assert(s.phash.isEmpty) // pixels were never decoded
    }
  }
}
