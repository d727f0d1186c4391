package graft.operators

/** REAL pure-JVM DOCX text extraction — the last extraction format the
  * engine refused, un-refused: a .docx is a ZIP container (readable by
  * `java.util.zip.ZipInputStream`, in every JDK) holding OOXML parts,
  * and the text lives in `word/document.xml` under a small, published
  * element vocabulary (ECMA-376 WordprocessingML): `<w:t>` runs carry
  * text, `</w:p>` ends a paragraph, `<w:tab/>` and `<w:br/>` are
  * explicit whitespace.
  *
  * Honest coverage contract:
  *   - ZIP + `word/document.xml` + the `w:t`/`w:p`/`w:tab`/`w:br`
  *     vocabulary is fully handled, entities decoded (named + numeric),
  *     `xml:space="preserve"` semantics respected by never collapsing
  *     whitespace inside a run;
  *   - a payload that is not a ZIP, or a ZIP with no
  *     `word/document.xml`, refuses loudly (same contract as PDF's
  *     missing header) — never a silent empty string for a container we
  *     cannot actually read;
  *   - encrypted OOXML (OLE container, not ZIP) lands in the refusal
  *     path by construction.
  *
  * [[write]] is the matching minimal writer (one document part plus the
  * content-types and rels glue that makes standard tools accept the
  * file), so the fixtures round-trip text → write → extract exactly and
  * the driver's oracle can check the whole binary path from the
  * documents table alone.
  */
object DocxText {

  // ---------------- writer ----------------

  /** Minimal valid .docx carrying `paragraphs` as one `<w:p>` each. */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p =>
      s"""<w:p><w:r><w:t xml:space="preserve">${escapeXml(p)}</w:t></w:r></w:p>""")
      .mkString
    val documentXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        s"<w:body>$body</w:body></w:document>"
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
        "</Types>"
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
        "</Relationships>"
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    entry("[Content_Types].xml", contentTypes)
    entry("_rels/.rels", rels)
    entry("word/document.xml", documentXml)
    zip.close()
    bos.toByteArray
  }

  private def escapeXml(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  // ---------------- extractor ----------------

  /** Extract the document text: paragraphs joined with newlines,
    * trimmed. Refuses non-ZIP payloads and ZIPs without
    * `word/document.xml` loudly. */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4 ||
      !(bytes(0) == 'P' && bytes(1) == 'K' && bytes(2) == 3 && bytes(3) == 4))
      throw new UnsupportedOperationException(
        "no extractor for this payload: not a ZIP (docx) container")
    val zip = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var entry = zip.getNextEntry
      while (entry != null) {
        if (entry.getName == "word/document.xml") {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zip.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = zip.read(buf) }
          return documentText(new String(out.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8))
        }
        entry = zip.getNextEntry
      }
      throw new UnsupportedOperationException(
        "no extractor for this payload: ZIP has no word/document.xml")
    } catch {
      // damaged ZIP structure surfaces as the same declared refusal
      // type as a wrong magic — callers never see a raw ZipException
      case e: java.util.zip.ZipException =>
        throw new UnsupportedOperationException(
          s"no extractor for this payload: damaged ZIP (${e.getMessage})")
    } finally zip.close()
  }

  /** WordprocessingML walk: `<w:t>` runs captured verbatim (entities
    * decoded, whitespace preserved), `</w:p>` breaks paragraphs,
    * `<w:tab/>` and `<w:br/>` emit their whitespace. Everything else is
    * markup and skipped. */
  private[operators] def documentText(xml: String): String = {
    val out = new StringBuilder
    val n = xml.length
    var i = 0
    while (i < n) {
      if (xml.charAt(i) == '<') {
        val gt = xml.indexOf('>', i + 1)
        if (gt < 0) return out.toString.trim
        val tag = xml.substring(i + 1, gt)
        if (tag == "w:t" || tag.startsWith("w:t ")) {
          // run text: entities but never '<' until the close tag
          val close = xml.indexOf('<', gt + 1)
          val end = if (close < 0) n else close
          out.append(decodeEntities(xml.substring(gt + 1, end)))
          i = end
        } else {
          if (tag == "/w:p") {
            if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
          } else if (tag.startsWith("w:tab")) out.append('\t')
          else if (tag.startsWith("w:br")) out.append('\n')
          i = gt + 1
        }
      } else i += 1
    }
    out.toString.trim
  }

  private def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val sc = s.indexOf(';', i + 1)
        if (sc > i && sc - i <= 10) {
          val body = s.substring(i + 1, sc)
          val decoded: Option[String] = body match {
            case "amp" => Some("&"); case "lt" => Some("<")
            case "gt" => Some(">"); case "quot" => Some("\"")
            case "apos" => Some("'")
            case b if b.startsWith("#x") || b.startsWith("#X") =>
              try Some(Character.toChars(
                Integer.parseInt(b.substring(2), 16)).mkString)
              catch { case _: RuntimeException => None }
            case b if b.startsWith("#") =>
              try Some(Character.toChars(
                Integer.parseInt(b.substring(1), 10)).mkString)
              catch { case _: RuntimeException => None }
            case _ => None
          }
          decoded match {
            case Some(t) => out.append(t); i = sc + 1
            case None => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
