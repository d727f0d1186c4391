package graft.operators

/** The remaining two document containers, made real — after these, every
  * text-document format the extractor dispatch names is genuinely
  * parsed, and "no extractor" is reserved for payloads that truly need
  * absent codecs.
  *
  * [[OdtText]]: an .odt is a ZIP (java.util.zip) holding `content.xml`;
  * text lives in ODF `text:p` paragraphs with `text:tab`,
  * `text:line-break` and `text:s` (run-of-spaces — ODF collapses
  * literal space runs, so faithful round-trips must encode them).
  *
  * [[RtfText]]: RTF is plain-text markup ({\rtf1 ...}) — a control-word
  * walk with group tracking, the published escapes (\'hh hex, \uN
  * unicode with \uc fallback skipping), and destination groups
  * (fonttbl/colortbl/stylesheet/info/pict and any {\*...}) dropped with
  * their content.
  */
object OdtText {

  /** Minimal valid .odt: mimetype + content.xml. Space runs and tabs
    * are encoded per ODF whitespace rules so extraction inverts the
    * write exactly. */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p => s"<text:p>${encodeOdfText(p)}</text:p>").mkString
    val contentXml =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<office:document-content""" +
        """ xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"""" +
        """ xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">""" +
        s"<office:body><office:text>$body</office:text></office:body>" +
        "</office:document-content>"
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    entry("mimetype", "application/vnd.oasis.opendocument.text")
    entry("content.xml", contentXml)
    zip.close()
    bos.toByteArray
  }

  /** XML-escape + ODF whitespace encoding: tabs become `<text:tab/>`,
    * the second-and-on space of every run becomes `<text:s text:c=n/>`
    * (literal runs would collapse on a conforming reader). */
  private[operators] def encodeOdfText(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;"); i += 1
        case '<' => sb.append("&lt;"); i += 1
        case '>' => sb.append("&gt;"); i += 1
        case '\t' => sb.append("<text:tab/>"); i += 1
        case ' ' =>
          var j = i
          while (j < s.length && s.charAt(j) == ' ') j += 1
          sb.append(' ')
          if (j - i > 1) sb.append(s"""<text:s text:c="${j - i - 1}"/>""")
          i = j
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Extract `content.xml` text: paragraphs joined with newlines,
    * trimmed. Refuses non-ZIP payloads and ZIPs without content.xml. */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4 ||
      !(bytes(0) == 'P' && bytes(1) == 'K' && bytes(2) == 3 && bytes(3) == 4))
      throw new UnsupportedOperationException(
        "no extractor for this payload: not a ZIP (odt) container")
    val zip = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var entry = zip.getNextEntry
      while (entry != null) {
        if (entry.getName == "content.xml") {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zip.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = zip.read(buf) }
          return contentText(new String(out.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8))
        }
        entry = zip.getNextEntry
      }
      throw new UnsupportedOperationException(
        "no extractor for this payload: ZIP has no content.xml")
    } catch {
      case e: java.util.zip.ZipException =>
        throw new UnsupportedOperationException(
          s"no extractor for this payload: damaged ZIP (${e.getMessage})")
    } finally zip.close()
  }

  /** ODF walk: character data inside the body is text; `</text:p>` and
    * `<text:line-break/>` break lines, `<text:tab/>` tabs, `<text:s>`
    * expands its space count. Other elements are markup and skipped
    * (their character data still counts — spans and links keep their
    * text). */
  private[operators] def contentText(xml: String): String = {
    val out = new StringBuilder
    val bodyAt = xml.indexOf("<office:text")
    val n = xml.length
    var i = if (bodyAt < 0) 0 else xml.indexOf('>', bodyAt) + 1
    while (i < n && i > 0) {
      val c = xml.charAt(i)
      if (c == '<') {
        val gt = xml.indexOf('>', i + 1)
        if (gt < 0) return out.toString.trim
        val tag = xml.substring(i + 1, gt)
        if (tag == "/text:p") {
          if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
        } else if (tag.startsWith("text:tab")) out.append('\t')
        else if (tag.startsWith("text:line-break")) out.append('\n')
        else if (tag.startsWith("text:s")
          && (tag.length == 6 || !tag.charAt(6).isLetter)) {
          val m = """text:c="(\d+)"""".r.findFirstMatchIn(tag)
          out.append(" " * m.map(_.group(1).toInt).getOrElse(1))
        } else if (tag.startsWith("/office:text")) {
          return out.toString.trim // past the body
        }
        i = gt + 1
      } else if (c == '&') {
        val sc = xml.indexOf(';', i + 1)
        if (sc > i && sc - i <= 10) {
          val body = xml.substring(i + 1, sc)
          val dec = body match {
            case "amp" => Some("&"); case "lt" => Some("<")
            case "gt" => Some(">"); case "quot" => Some("\"")
            case "apos" => Some("'")
            case b if b.startsWith("#") =>
              try Some(Character.toChars(if (b.startsWith("#x") || b.startsWith("#X"))
                Integer.parseInt(b.substring(2), 16)
              else Integer.parseInt(b.substring(1), 10)).mkString)
              catch { case _: RuntimeException => None }
            case _ => None
          }
          dec match {
            case Some(t) => out.append(t); i = sc + 1
            case None => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString.trim
  }
}

/** RTF control-word walk — see [[OdtText]]'s file doc. */
object RtfText {

  /** Minimal RTF document: one \par-separated paragraph per line;
    * non-ASCII goes out as \uN (signed 16-bit units, '?' fallback), the
    * RTF delimiters escaped. */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder("{\\rtf1\\ansi\\uc1 ")
    paragraphs.zipWithIndex.foreach { case (p, idx) =>
      if (idx > 0) sb.append("\\par ")
      p.foreach { ch =>
        if (ch == '\\' || ch == '{' || ch == '}') sb.append('\\').append(ch)
        else if (ch == '\t') sb.append("\\tab ")
        else if (ch == '\n') sb.append("\\line ")
        else if (ch < 0x80) sb.append(ch)
        else {
          val u = ch.toInt
          sb.append("\\u").append(if (u > 32767) u - 65536 else u).append('?')
        }
      }
    }
    sb.append('}')
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Extract the document text. Refuses payloads without the `{\rtf`
    * magic. Groups are tracked; destination groups (fonttbl, colortbl,
    * stylesheet, info, pict, and any `{\*`) are dropped whole. */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 5 ||
      !(bytes(0) == '{' && bytes(1) == '\\' && bytes(2) == 'r' &&
        bytes(3) == 't' && bytes(4) == 'f'))
      throw new UnsupportedOperationException(
        "no extractor for this payload: missing {\\rtf header")
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new StringBuilder
    val skipDest = Set("fonttbl", "colortbl", "stylesheet", "info", "pict",
      "themedata", "listtable", "generator")
    var i = 0
    var depth = 0
    var skipUntilDepth = -1 // when >= 0, we are inside a dropped group
    var uc = 1
    def skipping: Boolean = skipUntilDepth >= 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '{') {
        depth += 1; i += 1
        // {\* ...} = ignorable destination
        if (!skipping && i + 1 < s.length && s.charAt(i) == '\\' &&
          s.charAt(i + 1) == '*') skipUntilDepth = depth
      } else if (c == '}') {
        if (skipping && depth == skipUntilDepth) skipUntilDepth = -1
        depth -= 1; i += 1
      } else if (c == '\\') {
        if (i + 1 >= s.length) i = s.length
        else {
          val e = s.charAt(i + 1)
          if (e == '\\' || e == '{' || e == '}') {
            if (!skipping) out.append(e); i += 2
          } else if (e == '\'') {
            if (i + 3 < s.length) {
              try {
                val v = Integer.parseInt(s.substring(i + 2, i + 4), 16)
                if (!skipping) out.append(v.toChar) // cp1252 ≈ latin1 here
              } catch { case _: NumberFormatException => () }
              i += 4
            } else i = s.length
          } else if (e == '~') { if (!skipping) out.append(' '); i += 2 }
          else if (e.isLetter) {
            var j = i + 1
            while (j < s.length && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var k = j
            var neg = false
            if (k < s.length && s.charAt(k) == '-') { neg = true; k += 1 }
            var param = 0L; var hasParam = false
            while (k < s.length && s.charAt(k).isDigit) {
              param = param * 10 + (s.charAt(k) - '0'); hasParam = true; k += 1
            }
            val p = if (neg) -param else param
            if (k < s.length && s.charAt(k) == ' ') k += 1 // delimiter eaten
            word match {
              case "par" | "line" => if (!skipping) out.append('\n')
              case "tab" => if (!skipping) out.append('\t')
              case "uc" => if (hasParam) uc = p.toInt
              case "u" if hasParam =>
                if (!skipping) {
                  val cp = (if (p < 0) p + 65536 else p).toInt
                  out.append(cp.toChar)
                }
                // skip the fallback character(s) the writer provided
                var skipped = 0
                while (skipped < uc && k < s.length) {
                  if (s.charAt(k) == '\\' && k + 3 < s.length &&
                    s.charAt(k + 1) == '\'') k += 4
                  else k += 1
                  skipped += 1
                }
              case w if !skipping && skipDest.contains(w) && depth > 0 =>
                skipUntilDepth = depth
              case _ => () // formatting word: ignore
            }
            i = k
          } else i += 2 // unknown escape: drop
        }
      } else if (c == '\r' || c == '\n') i += 1 // raw newlines are not text
      else { if (!skipping) out.append(c); i += 1 }
    }
    out.toString.trim
  }
}
