package graft.operators

/** REAL pure-JVM PDF text extraction — the capability the reference
  * declares through its PyPDF2 dependency (reference `requirements.txt:7`),
  * built on nothing but `java.util.zip`: PDF content streams compress
  * with FlateDecode, which IS zlib, so the JDK can inflate them, and the
  * text operators inside (ITU-independent, published in the PDF spec,
  * ISO 32000-1 §9.4) are a small byte grammar.
  *
  * Honest coverage contract, enforced per stream rather than per file:
  *   - streams stored raw or with /FlateDecode are read; any OTHER
  *     filter (DCT, LZW, crypt, ...) skips THAT stream — never a wrong
  *     answer, never a whole-file failure;
  *   - literal `(...)` strings with the full escape set (\n \r \t \b \f
  *     \( \) \\ octal \ooo, line continuations, nested parens) and
  *     `<hex>` strings are decoded as UTF-8 bytes;
  *   - text-showing ops Tj ' " TJ emit; T* TD Td ' " break lines; BT/ET
  *     bracket what counts; `<<..>>` dicts, `%` comments and BI..EI
  *     inline images are skipped;
  *   - a payload without the `%PDF-` header is refused loudly
  *     (UnsupportedOperationException), matching the extractor
  *     dispatch's refusal contract for formats we cannot read.
  *
  * [[write]] is the matching minimal writer (one page, Helvetica, one
  * content stream, optional Flate) used by the fixtures: text → write →
  * extract round-trips exactly, which is what lets the driver's DuckDB
  * oracle check the whole binary path from the documents table alone.
  */
object PdfText {

  // ---------------- writer ----------------

  /** Minimal single-page PDF carrying `lines` as one Tj per line.
    * Byte-accurate xref so standard readers accept it; `compress`
    * selects /FlateDecode for the content stream (the common case in
    * the wild) or raw (the debugging case). */
  def write(lines: Seq[String], compress: Boolean = true): Array[Byte] = {
    val content = {
      val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, i) =>
        if (i > 0) sb.append("0 -14 Td\n")
        sb.append('(').append(escapeString(line)).append(") Tj\n")
      }
      sb.append("ET")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val stream = if (compress) deflate(content) else content
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    put("%PDF-1.4\n")
    def obj(body: => Unit): Unit = {
      offsets += out.size()
      put(s"${offsets.length} 0 obj\n"); body; put("endobj\n")
    }
    obj { put("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj { put("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n") }
    obj { put("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\n") }
    obj {
      put(s"<< /Length ${stream.length}$filter >>\nstream\n")
      out.write(stream); put("\nendstream\n")
    }
    obj { put("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n") }
    val xref = out.size()
    put(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => put(f"$o%010d 00000 n \n"))
    put(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** PDF literal-string escape over the UTF-8 bytes: printable ASCII
    * passes, delimiters get backslashes, everything else goes octal —
    * so ANY unicode text survives the round trip. */
  private[operators] def escapeString(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length + 8)
    bytes.foreach { b =>
      val c = b & 0xFF
      if (c == '(' || c == ')' || c == '\\') sb.append('\\').append(c.toChar)
      else if (c >= 32 && c <= 126) sb.append(c.toChar)
      else sb.append(f"\\${c}%03o")
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ---------------- extractor ----------------

  /** Extract the text content of every readable content stream, joined
    * with newlines, trimmed. Refuses non-PDF payloads loudly; skips
    * (only) streams with filters the JVM cannot decode. */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 5 ||
      !(bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
        bytes(3) == 'F' && bytes(4) == '-'))
      throw new UnsupportedOperationException(
        "no extractor for this payload: missing %PDF- header")
    val parts = streams(bytes).flatMap(decodeStream(bytes, _))
      .map(extractContentText).filter(_.nonEmpty)
    parts.mkString("\n").trim
  }

  /** (dictStart, dataStart, dataEnd) for every stream..endstream. */
  private def streams(b: Array[Byte]): Seq[(Int, Int, Int)] = {
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i >= 0 && i < b.length) {
      val s = indexOf(b, "stream", i)
      if (s < 0) i = -1
      else {
        // "endstream" contains "stream" — make sure this is the keyword
        val isEnd = s >= 3 && b(s - 3) == 'e' && b(s - 2) == 'n' && b(s - 1) == 'd'
        // the keyword must directly follow the dict's ">>" (whitespace
        // allowed) — rejects the bytes s-t-r-e-a-m appearing inside
        // compressed data or strings
        var p = s - 1
        while (p >= 0 && (b(p) == ' ' || b(p) == '\r' || b(p) == '\n' || b(p) == '\t')) p -= 1
        val afterDict = p >= 1 && b(p) == '>' && b(p - 1) == '>'
        if (isEnd || !afterDict) i = s + 6
        else {
          var data = s + 6
          if (data < b.length && b(data) == '\r') data += 1
          if (data < b.length && b(data) == '\n') data += 1
          val e = indexOf(b, "endstream", data)
          if (e < 0) i = -1
          else {
            var dataEnd = e
            if (dataEnd > data && b(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > data && b(dataEnd - 1) == '\r') dataEnd -= 1
            // the governing dict spans from the owning "obj" keyword —
            // scanning from the last "<<" would land inside a NESTED
            // subdict (/DecodeParms <<...>>) and miss the /Filter
            val dict = lastIndexOf(b, "obj", s)
            found += ((math.max(dict, 0), data, dataEnd))
            i = e + 9
          }
        }
      }
    }
    found.toSeq
  }

  /** Inflate or pass through per the stream's dict; None for filters we
    * honestly cannot decode. */
  private def decodeStream(b: Array[Byte], s: (Int, Int, Int)): Option[Array[Byte]] = {
    val (dictStart, dataStart, dataEnd) = s
    val dict = new String(b, dictStart, dataStart - dictStart,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val data = java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
    if (dict.contains("/FlateDecode"))
      try {
        val inf = new java.util.zip.Inflater()
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished()) return None // truncated
          out.write(buf, 0, n)
        }
        inf.end()
        Some(out.toByteArray)
      } catch { case _: java.util.zip.DataFormatException => None }
    else if (dict.contains("/Filter")) None // filter we cannot decode
    else Some(data)
  }

  /** Walk one decoded content stream for text operators. */
  private def extractContentText(c: Array[Byte]): String = {
    val out = new StringBuilder
    val pending = new StringBuilder
    var inText = false
    var i = 0
    def flushLine(): Unit = {
      if (pending.nonEmpty) { out.append(pending); pending.clear() }
      if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
    }
    while (i < c.length) {
      val ch = c(i) & 0xFF
      if (ch == '%') { // comment to EOL
        while (i < c.length && c(i) != '\n' && c(i) != '\r') i += 1
      } else if (ch == '(') {
        val (str, next) = literalString(c, i)
        if (inText) pending.append(str)
        i = next
      } else if (ch == '<') {
        if (i + 1 < c.length && c(i + 1) == '<') { // dict: skip balanced
          var depth = 1; i += 2
          while (i + 1 < c.length && depth > 0) {
            if (c(i) == '<' && c(i + 1) == '<') { depth += 1; i += 2 }
            else if (c(i) == '>' && c(i + 1) == '>') { depth -= 1; i += 2 }
            else i += 1
          }
        } else {
          val (str, next) = hexString(c, i)
          if (inText) pending.append(str)
          i = next
        }
      } else if (ch == '/' || ch == '[' || ch == ']') {
        if (ch == '/') { i += 1; while (i < c.length && isRegular(c(i))) i += 1 }
        else i += 1
      } else if (isOperatorChar(ch)) {
        var j = i
        while (j < c.length && isOperatorChar(c(j) & 0xFF)) j += 1
        val op = new String(c, i, j - i, java.nio.charset.StandardCharsets.ISO_8859_1)
        op match {
          case "BT" => inText = true
          case "ET" => inText = false; flushLine()
          case "Tj" | "TJ" =>
            if (pending.nonEmpty) { out.append(pending); pending.clear() }
          case "'" | "\"" => // next-line-and-show: break BEFORE the string
            if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
            out.append(pending); pending.clear()
          case "Td" | "TD" | "T*" => if (inText) flushLine()
          case "BI" => // inline image: skip to EI
            val e = indexOf(c, "EI", j)
            i = if (e < 0) c.length else e + 2
          case _ => ()
        }
        if (op != "BI") i = j
      } else i += 1
    }
    flushLine()
    out.toString.trim
  }

  private def isRegular(b: Byte): Boolean = {
    val c = b & 0xFF
    !(c <= 32 || "()<>[]{}/%".indexOf(c) >= 0)
  }

  private def isOperatorChar(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '*' || c == '\'' || c == '"'

  /** Literal string at `i` (pointing at '('), full escape set, nesting.
    * Returns (decoded-as-UTF-8, index past the closing paren). */
  private def literalString(c: Array[Byte], i0: Int): (String, Int) = {
    val bytes = new java.io.ByteArrayOutputStream()
    var i = i0 + 1
    var depth = 1
    while (i < c.length && depth > 0) {
      val ch = c(i) & 0xFF
      if (ch == '\\' && i + 1 < c.length) {
        val e = c(i + 1) & 0xFF
        e match {
          case 'n' => bytes.write('\n'); i += 2
          case 'r' => bytes.write('\r'); i += 2
          case 't' => bytes.write('\t'); i += 2
          case 'b' => bytes.write('\b'); i += 2
          case 'f' => bytes.write('\f'); i += 2
          case '\r' => // line continuation (swallow optional \n)
            i += 2; if (i < c.length && c(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < c.length && c(i) >= '0' && c(i) <= '7') {
              v = v * 8 + (c(i) - '0'); i += 1; k += 1
            }
            bytes.write(v & 0xFF)
          case other => bytes.write(other); i += 2
        }
      } else if (ch == '(') { depth += 1; bytes.write(ch); i += 1 }
      else if (ch == ')') {
        depth -= 1
        if (depth > 0) bytes.write(ch)
        i += 1
      } else { bytes.write(ch); i += 1 }
    }
    (new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8), i)
  }

  /** Hex string at `i` (pointing at '<'). */
  private def hexString(c: Array[Byte], i0: Int): (String, Int) = {
    val bytes = new java.io.ByteArrayOutputStream()
    var i = i0 + 1
    var hi = -1
    while (i < c.length && c(i) != '>') {
      val d = Character.digit(c(i) & 0xFF, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { bytes.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) bytes.write(hi << 4) // odd count: low nibble 0 per spec
    (new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8),
      math.min(i + 1, c.length))
  }

  private def indexOf(b: Array[Byte], s: String, from: Int): Int = {
    val pat = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.max(0, from)
    while (i + pat.length <= b.length) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(b: Array[Byte], s: String, before: Int): Int = {
    val pat = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.min(before, b.length) - pat.length
    while (i >= 0) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i -= 1
    }
    -1
  }
}
