package graft.sources

import java.util.zip.ZipInputStream

/** Minimal pure-JVM XLSX cell extraction (reference engine.py:25-26 —
  * pandas/openpyxl `read_excel`), built only on `java.util.zip` +
  * hand-rolled XML scanning so the offline build needs no spreadsheet
  * jar. An .xlsx file is a ZIP of XML parts; the cell data lives in
  *
  *   xl/sharedStrings.xml   — <si> string-table entries (t="s" cells
  *                            store an index into this table)
  *   xl/worksheets/sheet1.xml — <row><c r="A1" t="s|str|b|…"><v>…
  *
  * Scope — the common machine-written single-sheet shape:
  *   - first worksheet part only (lexicographically first
  *     `xl/worksheets/sheet*.xml`), the pandas default;
  *   - cell types: shared strings (t="s"), inline/formula strings
  *     (t="str"), inline <is><t> (t="inlineStr"), booleans (t="b" →
  *     true/false), everything else passes through as its raw <v>
  *     text (numbers keep their literal form);
  *   - date FORMATTING is out of scope: a date cell surfaces as its
  *     raw serial number (styles.xml number-format resolution is the
  *     documented seam a jar-enabled build closes);
  *   - XML entities (&amp; &lt; &gt; &quot; &apos; and numeric) are
  *     decoded; namespaced tags are matched by local name.
  *
  * Like PdfText, the extraction is driver-free: Ingest.readXlsx maps
  * it over a binaryFile scan, so a large .xlsx corpus parallelizes by
  * file (one file = one task — the right unit, since a worksheet part
  * is not splittable inside its ZIP stream).
  */
object XlsxText {

  def looksLikeXlsx(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4

  private def unzipParts(bytes: Array[Byte]): Map[String, String] = {
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map.empty[String, String]
    var e = zin.getNextEntry
    while (e != null) {
      val name = e.getName
      if (name == "xl/sharedStrings.xml" ||
          (name.startsWith("xl/worksheets/sheet") && name.endsWith(".xml"))) {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = zin.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
        out(name) = new String(buf.toByteArray, "UTF-8")
      }
      e = zin.getNextEntry
    }
    out.toMap
  }

  private[sources] def unescapeXml(s: String): String =
    if (!s.contains('&')) s
    else "&(#x?[0-9a-fA-F]+|amp|lt|gt|quot|apos);".r.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(m.group(1) match {
        case "amp" => "&"; case "lt" => "<"; case "gt" => ">"
        case "quot" => "\""; case "apos" => "'"
        case n if n.startsWith("#x") => Integer.parseInt(n.drop(2), 16).toChar.toString
        case n => Integer.parseInt(n.drop(1)).toChar.toString
      }))

  /** All <t>…</t> runs inside one <si> entry concatenated (rich-text
    * strings split one logical value across runs).
    */
  private val tRun = "(?s)<t(?:\\s[^>]*)?>(.*?)</t>|<t(?:\\s[^>]*)?/>".r
  private val siEntry = "(?s)<si>(.*?)</si>".r

  private def sharedStrings(xml: String): IndexedSeq[String] =
    siEntry.findAllMatchIn(xml).map { si =>
      tRun.findAllMatchIn(si.group(1))
        .map(m => unescapeXml(Option(m.group(1)).getOrElse(""))).mkString
    }.toIndexedSeq

  /** Column index (0-based) of an A1-style cell reference. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  // Self-closing alternatives MUST come first: regex alternation is
  // ordered, and the paired-tag branch would otherwise match a
  // self-closing tag (its '/' is just another [^>] attr char) and run
  // `.*?` through the NEXT element's closer — a styled empty cell
  // (`<c r="A1" s="1"/>`, common in Excel output) would silently
  // receive the following cell's value and drop that cell, and a
  // self-closing `<row/>` would merge two rows into one.
  private val rowRe  = "(?s)<row(?:\\s[^>]*)?/>|<row[\\s>].*?</row>".r
  private val cellRe = "(?s)<c\\s([^>]*)/>|<c\\s([^>]*)>(.*?)</c>".r
  private val attrRe = "(\\w+)=\"([^\"]*)\"".r
  private val vRe    = "(?s)<v(?:\\s[^>]*)?>(.*?)</v>".r

  /** One worksheet's rows as dense string arrays: absent cells are "",
    * row width = max referenced column across the sheet (ragged tails
    * padded — downstream needs rectangular rows).
    */
  private def sheetRows(xml: String, shared: IndexedSeq[String]): Seq[Array[String]] = {
    val rows = rowRe.findAllIn(xml).map { rowXml =>
      cellRe.findAllMatchIn(rowXml).flatMap { m =>
        // group(1) = self-closing attrs, group(2)/(3) = paired attrs/body
        val attrs = attrRe.findAllMatchIn(
          Option(m.group(1)).getOrElse(Option(m.group(2)).getOrElse("")))
          .map(a => a.group(1) -> a.group(2)).toMap
        val body = Option(m.group(3)).getOrElse("")
        val raw = attrs.get("t") match {
          case Some("s") =>
            vRe.findFirstMatchIn(body).map(v => shared(v.group(1).trim.toInt)).getOrElse("")
          case Some("inlineStr") =>
            tRun.findAllMatchIn(body)
              .map(t => unescapeXml(Option(t.group(1)).getOrElse(""))).mkString
          case Some("b") =>
            vRe.findFirstMatchIn(body).map(v =>
              if (v.group(1).trim == "1") "true" else "false").getOrElse("")
          case _ => // "str", numbers, untyped
            unescapeXml(vRe.findFirstMatchIn(body).map(_.group(1)).getOrElse(""))
        }
        attrs.get("r").map(r => colIndex(r) -> raw)
      }.toMap
    }.toSeq
    val width = (rows.iterator.flatMap(_.keys) ++ Iterator(-1)).max + 1
    rows.map(cells => Array.tabulate(width)(i => cells.getOrElse(i, "")))
  }

  /** First worksheet of an .xlsx as rectangular rows of cell strings
    * (empty Seq when the bytes hold no worksheet part).
    */
  def extractRows(bytes: Array[Byte]): Seq[Array[String]] = {
    val parts = unzipParts(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(IndexedSeq.empty)
    parts.keys.filter(_.startsWith("xl/worksheets/")).toSeq.sorted.headOption
      .map(k => sheetRows(parts(k), shared)).getOrElse(Seq.empty)
  }
}
