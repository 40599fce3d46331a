package graft.sources

import java.util.zip.Inflater

/** Minimal pure-JVM PDF text extraction (reference engine.py:29-33 —
  * pypdf's one-row-per-page `extract_text` loop), built only on
  * `java.util.zip` so the offline build needs no pdf jar.
  *
  * Scope — the common machine-written PDF shape:
  *   - content streams stored raw or `/FlateDecode`-compressed
  *     (Inflater); unsupported filters (DCT, LZW, crypt) are skipped;
  *   - text shown via `Tj`, `'`, `"` and `TJ` arrays with literal
  *     `(...)` strings (all standard escapes + octal) and `<...>` hex
  *     strings decoded as Latin-1 — correct for the standard fonts'
  *     unencoded case, a documented approximation for subsetted or
  *     CID-keyed fonts (where even pypdf needs the font's ToUnicode
  *     CMap, out of scope offline);
  *   - a "page" is a text-bearing content stream in document order —
  *     the full page-tree walk (/Pages → /Kids → /Contents indirection)
  *     is deliberately not implemented; for the overwhelmingly common
  *     one-content-stream-per-page layout the two notions coincide.
  *
  * The extraction itself is driver-free: it runs per file inside the
  * executors (Ingest.readPdfPages maps it over a binaryFile scan), so
  * a 100 TB PDF corpus parallelizes by file like any other binary
  * decode (same placement rationale as operators/Multimodal.scala).
  */
object PdfText {

  private def latin1(b: Array[Byte]): String = new String(b, "ISO-8859-1")

  def looksLikePdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && latin1(bytes.take(5)) == "%PDF-"

  private val lengthRe = "/Length\\s+(\\d+)(\\s+\\d+\\s+R)?".r

  /** All `stream`…`endstream` payloads with their owning object's dict
    * text, decompressed where the dict says /FlateDecode.
    *
    * Payload end: sliced by the dict's direct-integer `/Length` when one
    * is declared (a compressed payload can contain the literal bytes
    * "endstream" by chance, which a boundary scan would truncate —
    * partial inflate, silently dropped page text); the declared length
    * is trusted only when an `endstream` keyword actually follows the
    * slice. Indirect (`N 0 R`) or absent lengths fall back to the scan.
    * Either way the cursor then jumps past the consumed `endstream`, so
    * a literal "stream" inside a payload can't seed a garbage candidate.
    */
  private def decodedStreams(bytes: Array[Byte]): Seq[String] = {
    val raw = latin1(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = raw.indexOf("stream")
    while (i >= 0) {
      var next = i + 6
      // must be the keyword, not a substring of "endstream"
      val isEnd = i >= 3 && raw.regionMatches(i - 3, "endstream", 0, 9)
      val dataStart =
        if (i + 6 < raw.length && raw.charAt(i + 6) == '\r' &&
            i + 7 < raw.length && raw.charAt(i + 7) == '\n') i + 8
        else if (i + 6 < raw.length && raw.charAt(i + 6) == '\n') i + 7
        else -1
      if (!isEnd && dataStart > 0) {
        val dictStart = math.max(raw.lastIndexOf("obj", i), 0)
        val dict = raw.substring(dictStart, i)
        val byLen: Option[Int] =
          lengthRe.findFirstMatchIn(dict).filter(_.group(2) == null)
            .map(m => dataStart + m.group(1).toInt)
            .filter { e =>
              e <= raw.length && {
                var j = e
                while (j < raw.length &&
                       (raw.charAt(j) == '\r' || raw.charAt(j) == '\n')) j += 1
                raw.regionMatches(j, "endstream", 0, 9)
              }
            }
        val bounds: Option[(Int, Int)] = byLen match {
          case Some(dataEnd) => Some((dataEnd, raw.indexOf("endstream", dataEnd)))
          case None =>
            val end = raw.indexOf("endstream", dataStart)
            if (end > 0) {
              // trailing EOL before the endstream keyword is not stream data
              var dataEnd = end
              if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\n') dataEnd -= 1
              if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\r') dataEnd -= 1
              Some((dataEnd, end))
            } else None
        }
        bounds.foreach { case (dataEnd, endKw) =>
          val payload = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          if (dict.contains("/FlateDecode")) inflate(payload).foreach(d => out += latin1(d))
          else out += latin1(payload)
          if (endKw >= 0) next = endKw + 9
        }
      }
      i = raw.indexOf("stream", next)
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream(data.length * 4)
      val chunk = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(chunk)
        if (n > 0) buf.write(chunk, 0, n)
        else if (n == 0 && !inf.finished()) return Some(buf.toByteArray) // truncated
      }
      inf.end()
      Some(buf.toByteArray)
    } catch { case _: Exception => None }

  /** Literal string starting at `(`: returns (unescaped text, index past
    * the closing paren). Handles nesting, all named escapes, 1-3 digit
    * octal, and escaped-EOL line continuations per the PDF spec.
    */
  private def parseLiteral(cs: String, start: Int): (String, Int) = {
    val b = new StringBuilder
    var depth = 1
    var j = start + 1
    while (j < cs.length && depth > 0) {
      val c = cs.charAt(j)
      if (c == '\\' && j + 1 < cs.length) {
        val n = cs.charAt(j + 1)
        n match {
          case 'n' => b.append('\n'); j += 2
          case 'r' => b.append('\r'); j += 2
          case 't' => b.append('\t'); j += 2
          case 'b' => b.append('\b'); j += 2
          case 'f' => b.append('\f'); j += 2
          case '\n' => j += 2 // line continuation
          case '\r' => j += (if (j + 2 < cs.length && cs.charAt(j + 2) == '\n') 3 else 2)
          case d if d >= '0' && d <= '7' =>
            var k = j + 1; var oct = 0
            while (k < cs.length && k < j + 4 &&
                   cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
              oct = oct * 8 + (cs.charAt(k) - '0'); k += 1
            }
            b.append(oct.toChar); j = k
          case other => b.append(other); j += 2 // incl. \( \) \\
        }
      } else {
        if (c == '(') { depth += 1; b.append(c) }
        else if (c == ')') { depth -= 1; if (depth > 0) b.append(c) }
        else b.append(c)
        j += 1
      }
    }
    (b.toString, j)
  }

  /** Hex string starting at `<`: pairs decode as Latin-1 bytes; odd
    * trailing digit pads with 0 per spec.
    */
  private def parseHex(cs: String, start: Int): (String, Int) = {
    var j = start + 1
    val hex = new StringBuilder
    while (j < cs.length && cs.charAt(j) != '>') {
      val c = cs.charAt(j)
      if (!c.isWhitespace) hex.append(c)
      j += 1
    }
    if (hex.length % 2 == 1) hex.append('0')
    val b = new StringBuilder
    var k = 0
    while (k + 2 <= hex.length) {
      try b.append(Integer.parseInt(hex.substring(k, k + 2), 16).toChar)
      catch { case _: NumberFormatException => () }
      k += 2
    }
    (b.toString, j + 1)
  }

  private def isDelim(c: Char) =
    c.isWhitespace || "()<>[]{}/%".contains(c)

  /** Text shown by one content stream: walks the operator stream and
    * appends operands of Tj / ' / " and TJ arrays; ET and T* / Td / TD
    * produce line breaks so downstream tokenizers see word boundaries.
    */
  private[sources] def showText(cs: String): String = {
    val out = new StringBuilder
    var last: Option[String] = None   // most recent string operand
    val arr = scala.collection.mutable.ArrayBuffer.empty[String]
    var inArray = false
    var i = 0
    def emit(s: String): Unit = { out.append(s); out.append(' ') }
    while (i < cs.length) {
      val c = cs.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '%') { while (i < cs.length && cs.charAt(i) != '\n') i += 1 }
      else if (c == '(') {
        val (s, j) = parseLiteral(cs, i)
        if (inArray) arr += s else last = Some(s)
        i = j
      } else if (c == '<' && i + 1 < cs.length && cs.charAt(i + 1) != '<') {
        val (s, j) = parseHex(cs, i)
        if (inArray) arr += s else last = Some(s)
        i = j
      } else if (c == '<') i += 2 // dict open <<
      else if (c == '>') i += (if (i + 1 < cs.length && cs.charAt(i + 1) == '>') 2 else 1)
      else if (c == '[') { inArray = true; arr.clear(); i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else {
        val start = i
        while (i < cs.length && !isDelim(cs.charAt(i))) i += 1
        // a lone delimiter ('/', '{', '}', stray ')') yields an empty
        // token — consume the char or the scan would never advance
        if (i == start) i += 1
        cs.substring(start, i) match {
          case "Tj" | "'" | "\"" => last.foreach(emit); last = None
          case "TJ" => if (arr.nonEmpty) emit(arr.mkString); arr.clear()
          case "ET" | "T*" | "Td" | "TD" =>
            if (out.nonEmpty && out.last != '\n') {
              // trailing word-space becomes the break
              if (out.last == ' ') out.setLength(out.length - 1)
              out.append('\n')
            }
          case _ => ()
        }
      }
    }
    out.toString.trim
  }

  /** One entry per text-bearing content stream ("page"), document
    * order; a parseable PDF with no extractable text yields one empty
    * page (pypdf's shape: every page has a row, text may be "").
    */
  def extractPages(bytes: Array[Byte]): Seq[String] = {
    val pages = decodedStreams(bytes)
      .filter(s => s.contains("BT"))
      .map(showText)
      .filter(_.nonEmpty)
    if (pages.nonEmpty) pages else Seq("")
  }

  /** The non-PDF fallback "page" slicing (the original stub contract,
    * still pinned by IngestSpec): base64 of the bytes in 1024-char
    * slices — keeps (path, page, content) plumbing testable for opaque
    * binaries without pretending they parse.
    */
  def b64Slices(bytes: Array[Byte]): Seq[String] = {
    val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
    if (b64.isEmpty) Seq("")
    else b64.grouped(1024).toSeq
  }
}
