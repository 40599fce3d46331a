package graft.sources

import java.util.zip.Inflater

/** Minimal pure-JVM PDF text extraction (reference engine.py:29-33 —
  * pypdf's one-row-per-page `extract_text` loop), built only on
  * `java.util.zip` so the offline build needs no pdf jar.
  *
  * Scope — the common machine-written PDF shape:
  *   - content streams stored raw or compressed with /FlateDecode,
  *     /LZWDecode (EarlyChange default), /ASCIIHexDecode,
  *     /ASCII85Decode, /RunLengthDecode — applied as a chain in the
  *     /Filter array's order; streams with an undecodable link (image
  *     codecs, crypt) are skipped, never emitted raw;
  *   - text shown via `Tj`, `'`, `"` and `TJ` arrays with literal
  *     `(...)` strings (all standard escapes + octal) and `<...>` hex
  *     strings; hex strings resolve through the document's ToUnicode
  *     CMaps when present (bfchar/bfrange, 1- and 2-byte codes — the
  *     subsetted/CID-keyed case, same structure pypdf reads; see
  *     [[parseCMaps]] for the merged-map approximation), falling back
  *     to Latin-1 bytes for the standard unencoded case;
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
    * text, RAW (filters not yet applied) — shared by the text path
    * ([[decodedStreams]]) and the embedded-image path ([[jpegImages]]).
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
  private def rawStreams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val raw = latin1(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
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
          out += ((dict, payload))
          if (endKw >= 0) next = endKw + 9
        }
      }
      i = raw.indexOf("stream", next)
    }
    out.toSeq
  }

  /** Text-bearing stream payloads, filter chains applied. */
  private def decodedStreams(bytes: Array[Byte]): Seq[String] =
    rawStreams(bytes).flatMap { case (dict, payload) =>
      decodeFilters(dict, payload).map(latin1)
    }

  private val imageSubtypeRe = "/Subtype\\s*/Image".r

  /** Embedded baseline-JPEG image XObjects (r13 verdict ask #7):
    * streams whose dict declares `/Subtype /Image` with a /Filter
    * chain ENDING in DCTDecode. DCTDecode IS baseline JPEG, which the
    * JDK's ImageIO decodes natively — so these payloads feed the
    * multimodal operators as REAL rasters (pypdf's image surface,
    * engine.py:29-33). Pre-DCT transport links (Flate/ASCII wrappers)
    * are applied; the returned bytes are the JPEG itself. JPXDecode
    * (JPEG 2000) stays out — the JDK ships no codec for it, the one
    * permanently closed branch of this gap.
    */
  def jpegImages(bytes: Array[Byte]): Seq[Array[Byte]] =
    rawStreams(bytes).flatMap { case (dict, payload) =>
      jpegFromStream(dict, payload)
    }

  /** Apply the pre-codec transport links (Flate/ASCII/LZW/RLE wrappers
    * ahead of the terminal image codec) — shared by the JPEG and CCITT
    * branches. None on any unsupported link.
    */
  private def applyTransport(links: Seq[String],
                             payload: Array[Byte]): Option[Array[Byte]] =
    links.foldLeft(Option(payload)) { (acc, f) =>
      acc.flatMap { d =>
        f match {
          case "FlateDecode"     => inflate(d)
          case "LZWDecode"       => lzwDecode(d)
          case "ASCIIHexDecode"  => asciiHexDecode(d)
          case "ASCII85Decode"   => ascii85Decode(d)
          case "RunLengthDecode" => runLengthDecode(d)
          case _                 => None
        }
      }
    }

  private def jpegFromStream(dict: String,
                             payload: Array[Byte]): Option[Array[Byte]] = {
    val filters = filterNameRe.findAllMatchIn(dict).map(_.group(1)).toSeq
    if (imageSubtypeRe.findFirstIn(dict).isEmpty ||
        filters.isEmpty || filters.last != "DCTDecode") None
    else applyTransport(filters.init, payload)
  }

  /** Embedded CCITT Group 3/4 fax image XObjects (round 15 — the
    * second of the three image-codec branches, after round 14's
    * DCTDecode): streams whose dict declares `/Subtype /Image` with a
    * /Filter chain ending in CCITTFaxDecode. The payload plus the
    * dict's /DecodeParms transliterate into a TIFF compression-3/4
    * strip, which the JDK's TIFF ImageIO plugin decodes
    * ([[CcittTiff]]) — the bilevel scanned-document raster class.
    * Returned PNG-encoded so downstream consumers (the multimodal
    * fingerprint kernels, Ingest.readPdfImages assets) get a payload
    * every ImageIO consumer decodes. Pre-CCITT transport links
    * (Flate/ASCII wrappers) are applied like the JPEG path's.
    */
  def ccittImages(bytes: Array[Byte]): Seq[Array[Byte]] =
    rawStreams(bytes).flatMap { case (dict, payload) =>
      ccittFromStream(dict, payload)
    }

  private def ccittFromStream(dict: String,
                              payload: Array[Byte]): Option[Array[Byte]] = {
    val filters = filterNameRe.findAllMatchIn(dict).map(_.group(1)).toSeq
    if (imageSubtypeRe.findFirstIn(dict).isEmpty ||
        filters.isEmpty || filters.last != "CCITTFaxDecode") None
    else {
      def num(name: String): Option[Int] =
        s"/$name\\s+(-?\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
      def flag(name: String): Boolean =
        s"/$name\\s+true".r.findFirstIn(dict).isDefined
      // spec default is 1728, but a dict that omits /Columns while
      // declaring /Width means the width (writers that rely on the
      // default also emit 1728-wide images)
      val cols = num("Columns").orElse(num("Width")).getOrElse(1728)
      // /Rows 0 (or absent) means "until EOFB" — the image's /Height
      // is the authoritative row count in a PDF image dict
      val rows = num("Rows").filter(_ > 0).orElse(num("Height")).getOrElse(0)
      // /Decode [1 0] inverts the sample→color map at render time;
      // writers that set /BlackIs1 true typically pair it with
      // /Decode [1 0], and the two CANCEL — so the effective polarity
      // is the XOR, not /BlackIs1 alone (without this, such a doc's
      // extracted raster is inverted vs a normal-polarity copy of the
      // same image and their dHash pair is missed — nearly all
      // gradient bits flip)
      val decodeInverted =
        "/Decode\\s*\\[\\s*1(?:\\.0)?\\s+0(?:\\.0)?\\s*\\]".r.findFirstIn(dict).isDefined
      if (rows <= 0) None
      else applyTransport(filters.init, payload).flatMap { d =>
        CcittTiff.decode(d, cols, rows, num("K").getOrElse(0),
          flag("BlackIs1") ^ decodeInverted, flag("EncodedByteAlign"))
      }.map { img =>
        val b = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", b)
        b.toByteArray
      }
    }
  }

  /** All decodable embedded image XObjects in DOCUMENT STREAM ORDER —
    * one rawStreams pass dispatching on the terminal codec (DCTDecode →
    * raw JPEG bytes; CCITTFaxDecode → PNG-encoded raster), so mixed
    * PDFs keep a single ordinal space that reflects interleaving (the
    * per-codec [[jpegImages]]/[[ccittImages]] views are order-stable
    * only WITHIN a codec). Ingest.readPdfImages keys asset ids off this
    * ordering.
    */
  def imageStreams(bytes: Array[Byte]): Seq[Array[Byte]] =
    rawStreams(bytes).flatMap { case (dict, payload) =>
      jpegFromStream(dict, payload).orElse(ccittFromStream(dict, payload))
    }

  private val filterNameRe =
    "/(FlateDecode|LZWDecode|ASCIIHexDecode|ASCII85Decode|DCTDecode|JPXDecode|JBIG2Decode|CCITTFaxDecode|RunLengthDecode|Crypt)".r

  /** Apply the dict's /Filter chain to a stream payload. Name-or-array
    * both surface as filter names in order of appearance (an array's
    * textual order IS its application order). No /Filter → raw bytes;
    * a chain with an unsupported link (image codecs, crypt) → None —
    * emitting the undecoded bytes as a page candidate would be
    * garbage, the one thing a text extractor must not produce.
    */
  private[sources] def decodeFilters(dict: String, payload: Array[Byte]): Option[Array[Byte]] =
    if (!dict.contains("/Filter")) Some(payload)
    else filterNameRe.findAllMatchIn(dict).map(_.group(1)).toSeq
      .foldLeft(Option(payload)) { (acc, f) =>
        acc.flatMap { d =>
          f match {
            case "FlateDecode"    => inflate(d)
            case "LZWDecode"      => lzwDecode(d)
            case "ASCIIHexDecode" => asciiHexDecode(d)
            case "ASCII85Decode"  => ascii85Decode(d)
            case "RunLengthDecode" => runLengthDecode(d)
            case _                => None // image/crypt codecs: skip stream
          }
        }
      }

  /** PDF LZWDecode (TIFF variant): 9→12-bit codes MSB-first, 256 =
    * clear-table, 257 = EOD, EarlyChange=1 (the default — code width
    * bumps one entry early). Truncated input returns what decoded.
    */
  private def lzwDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      def freshTable() = {
        val t = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
        var c = 0
        while (c < 256) { t += Array(c.toByte); c += 1 }
        t += null; t += null // 256 clear, 257 eod
        t
      }
      var table = freshTable()
      var width = 9
      var prev: Array[Byte] = null
      var bitBuf = 0L; var bitCnt = 0
      var i = 0
      var done = false
      while (!done && (i < data.length || bitCnt >= width)) {
        if (bitCnt < width) {
          bitBuf = (bitBuf << 8) | (data(i) & 0xffL); bitCnt += 8; i += 1
        } else {
          val code = ((bitBuf >>> (bitCnt - width)) & ((1L << width) - 1)).toInt
          bitCnt -= width
          if (code == 256) { table = freshTable(); width = 9; prev = null }
          else if (code == 257) done = true
          else {
            val entry: Array[Byte] =
              if (code < table.length && code != 256 && code != 257) table(code)
              else if (code == table.length && prev != null) prev :+ prev(0)
              else { done = true; null } // corrupt: keep what decoded
            if (entry != null) {
              out.write(entry)
              if (prev != null) table += (prev :+ entry(0))
              prev = entry
              if (table.length >= (1 << width) - 1 && width < 12) width += 1
            }
          }
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  private def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val s = latin1(data)
      val body = s.takeWhile(_ != '>').filterNot(_.isWhitespace)
      val h = if (body.length % 2 == 1) body + "0" else body
      Some(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    } catch { case _: Exception => None }

  private def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val s0 = latin1(data)
      val endAt = s0.indexOf("~>")
      val s = (if (endAt >= 0) s0.substring(0, endAt) else s0)
        .filterNot(_.isWhitespace).stripPrefix("<~")
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == 'z') {
          out.write(Array[Byte](0, 0, 0, 0)); i += 1
        } else {
          val n = math.min(5, s.length - i)
          var v = 0L
          var k = 0
          while (k < 5) { // pad short final group with 'u'
            val c = if (k < n) s.charAt(i + k) else 'u'
            require(c >= '!' && c <= 'u', s"ascii85 char $c")
            v = v * 85 + (c - '!'); k += 1
          }
          val bs = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
          out.write(bs, 0, n - 1) // 5 chars → 4 bytes; n chars → n-1
          i += n
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  private def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      var done = false
      while (!done && i < data.length) {
        val n = data(i) & 0xff
        if (n == 128) done = true // EOD
        else if (n < 128) { out.write(data, i + 1, n + 1); i += n + 2 }
        else {
          val b = data(i + 1)
          var k = 0
          while (k < 257 - n) { out.write(b); k += 1 }
          i += 2
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

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

  /** Code → unicode maps harvested from the document's ToUnicode CMaps
    * (1-byte codes for simple subsetted fonts, 2-byte for CID-keyed) —
    * see [[parseCMaps]].
    */
  private[sources] final case class UniMap(one: Map[Int, String], two: Map[Int, String]) {
    def isEmpty: Boolean = one.isEmpty && two.isEmpty
  }
  private[sources] val emptyUniMap = UniMap(Map.empty, Map.empty)

  private val bfCharRe  = "(?s)beginbfchar(.*?)endbfchar".r
  private val bfRangeRe = "(?s)beginbfrange(.*?)endbfrange".r
  private val cmapTokRe = "<([0-9a-fA-F]+)>|\\[|\\]".r

  private def utf16Hex(hex: String): String = {
    val h = if (hex.length % 2 == 1) hex + "0" else hex
    val bytes = h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    new String(bytes, "UTF-16BE")
  }

  /** Merge every `beginbfchar`/`beginbfrange` section found in the
    * document's decoded streams into one code→unicode map. A subsetted
    * or CID-keyed font's glyph codes are arbitrary — the ToUnicode CMap
    * the writer embeds is the ONLY route back to text (pypdf reads the
    * same structure). Merging across fonts is a deliberate
    * approximation: resolving the /Font resource per Tf operator needs
    * the full object graph, and writers in practice keep code spaces
    * consistent; [[mapHex]] only applies a map when EVERY code of a
    * string resolves, so a collision degrades to the Latin-1 fallback
    * rather than silent garbage.
    */
  private[sources] def parseCMaps(streams: Seq[String]): UniMap = {
    val one = scala.collection.mutable.Map.empty[Int, String]
    val two = scala.collection.mutable.Map.empty[Int, String]
    def add(srcHex: String, dst: String): Unit =
      if (srcHex.length <= 2) one(Integer.parseInt(srcHex, 16)) = dst
      else if (srcHex.length == 4) two(Integer.parseInt(srcHex, 16)) = dst
    for (s <- streams if s.contains("beginbf")) {
      for (m <- bfCharRe.findAllMatchIn(s))
        hexPairs(m.group(1)).foreach { case (src, dst) => add(src, utf16Hex(dst)) }
      for (m <- bfRangeRe.findAllMatchIn(s)) {
        // tokens: hex items plus [ ] for the list-destination form
        val toks = cmapTokRe.findAllMatchIn(m.group(1)).map(t =>
          Option(t.group(1)).getOrElse(t.matched)).toList
        var rest = toks
        while (rest.nonEmpty) rest match {
          case lo :: hi :: "[" :: tail if lo != "[" && hi != "[" =>
            val (dsts, after) = tail.span(_ != "]")
            val start = Integer.parseInt(lo, 16)
            dsts.zipWithIndex.foreach { case (d, k) =>
              add(f"${start + k}%04x".takeRight(lo.length), utf16Hex(d))
            }
            rest = after.drop(1)
          case lo :: hi :: dst :: tail if lo != "[" && hi != "[" && dst != "[" =>
            val (l, h) = (Integer.parseInt(lo, 16), Integer.parseInt(hi, 16))
            val d0 = Integer.parseInt(dst, 16)
            // consecutive range: dst increments with the code
            for (c <- l to math.min(h, l + 65535)) {
              val dHex = f"${d0 + (c - l)}%04x"
              add(f"$c%04x".takeRight(lo.length), utf16Hex(dHex))
            }
            rest = tail
          case _ :: tail => rest = tail
          case Nil => rest = Nil
        }
      }
    }
    UniMap(one.toMap, two.toMap)
  }

  private def hexPairs(section: String): Seq[(String, String)] = {
    val items = cmapTokRe.findAllMatchIn(section)
      .flatMap(t => Option(t.group(1))).toSeq
    items.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
  }

  /** Map one hex-string's bytes through the ToUnicode tables: 2-byte
    * CID codes first (the common CID-keyed shape), then 1-byte codes —
    * applied only when EVERY code resolves, else the Latin-1 byte
    * decoding stands (unmapped plain-ASCII hex strings keep working).
    */
  private def mapHex(s: String, cmap: UniMap): String = {
    if (s.isEmpty || cmap.isEmpty) return s
    if (cmap.two.nonEmpty && s.length % 2 == 0) {
      val codes = s.grouped(2).map(p => (p.charAt(0) << 8) | p.charAt(1)).toSeq
      if (codes.forall(cmap.two.contains)) return codes.map(cmap.two).mkString
    }
    if (cmap.one.nonEmpty) {
      val codes = s.map(_.toInt)
      if (codes.forall(cmap.one.contains)) return codes.map(cmap.one).mkString
    }
    s
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
  private[sources] def showText(cs: String, cmap: UniMap = emptyUniMap): String = {
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
        val (raw, j) = parseHex(cs, i)
        val s = mapHex(raw, cmap) // ToUnicode-aware for CID/subsetted fonts
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
    val streams = decodedStreams(bytes)
    // ToUnicode CMap streams carry no BT — they feed the glyph-code
    // mapping and never surface as pages themselves
    val cmap = parseCMaps(streams)
    val pages = streams
      .filter(s => s.contains("BT"))
      .map(showText(_, cmap))
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
