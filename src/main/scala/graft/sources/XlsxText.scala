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
  *   - date-styled numeric cells render as ISO strings: xl/styles.xml
  *     cellXfs → numFmtId resolution (builtin date/time ids + a custom
  *     formatCode heuristic), 1900 phantom-day and mac date1904 epochs
  *     honored — see [[styleDateKinds]]/[[serialToIso]]; cells whose
  *     style is not a date keep their literal serial text;
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
          name == "xl/styles.xml" || name == "xl/workbook.xml" ||
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

  /** What a cell style's number format renders: dates surface as ISO
    * strings instead of raw serials (pandas `read_excel` yields
    * datetimes there — the seam SURVEY §7.3 documented, now closed for
    * the standard format ids + custom format codes).
    */
  private[sources] sealed trait DateKind
  private[sources] case object NotDate  extends DateKind
  private[sources] case object DateOnly extends DateKind
  private[sources] case object TimeOnly extends DateKind
  private[sources] case object DateTime extends DateKind

  // Builtin number-format ids (ECMA-376 §18.8.30): 14-17 and the East
  // Asian 27-36/50-58 render dates, 18-21/45-47 times, 22 both.
  private val builtinDate = (Set(14, 15, 16, 17) ++ (27 to 36) ++ (50 to 58))
  private val builtinTime = Set(18, 19, 20, 21, 45, 46, 47)

  /** Classify one format code (builtin id or custom formatCode). The
    * custom heuristic mirrors what spreadsheet libraries do: strip
    * quoted literals, color/condition brackets and escaped chars, then
    * y/d ⇒ date part, h/s/AM-PM ⇒ time part, a bare m with no time
    * context ⇒ month (date). "General" and plain numeric codes map to
    * [[NotDate]].
    */
  private[sources] def classifyFormat(id: Int, code: Option[String]): DateKind = {
    val byId =
      if (builtinDate(id)) DateOnly
      else if (builtinTime(id)) TimeOnly
      else if (id == 22) DateTime
      else NotDate
    code match {
      case None => byId
      case Some(c) =>
        val stripped = c
          .replaceAll("\"[^\"]*\"", "")  // quoted literals
          .replaceAll("\\[[^\\]]*\\]", "") // [Red], [$-409], [h] elapsed
          .replaceAll("\\\\.", "")       // escaped chars
          .toLowerCase
        val hasTime = stripped.exists(ch => ch == 'h' || ch == 's') ||
          stripped.contains("am/pm")
        val hasDate = stripped.exists(ch => ch == 'y' || ch == 'd') ||
          (!hasTime && stripped.contains('m'))
        if (hasDate && hasTime) DateTime
        else if (hasDate) DateOnly
        else if (hasTime) TimeOnly
        else byId
    }
  }

  private val numFmtRe = "<numFmt\\b([^>]*)>".r
  private val xfRe     = "<xf\\b([^>]*)>".r
  private val cellXfsRe = "(?s)<cellXfs\\b[^>]*>(.*?)</cellXfs>".r

  /** Style index → [[DateKind]], from xl/styles.xml (cellXfs order). */
  private[sources] def styleDateKinds(stylesXml: String): IndexedSeq[DateKind] = {
    val custom = numFmtRe.findAllMatchIn(stylesXml).flatMap { m =>
      val attrs = attrRe.findAllMatchIn(m.group(1))
        .map(a => a.group(1) -> a.group(2)).toMap
      for (id <- attrs.get("numFmtId"); code <- attrs.get("formatCode"))
        yield id.toInt -> unescapeXml(code)
    }.toMap
    cellXfsRe.findFirstMatchIn(stylesXml).map(_.group(1)) match {
      case None => IndexedSeq.empty
      case Some(body) =>
        xfRe.findAllMatchIn(body).map { m =>
          val attrs = attrRe.findAllMatchIn(m.group(1))
            .map(a => a.group(1) -> a.group(2)).toMap
          val id = attrs.get("numFmtId").map(_.toInt).getOrElse(0)
          classifyFormat(id, custom.get(id))
        }.toIndexedSeq
    }
  }

  /** Excel serial → ISO string. 1900 system: serial 1 = 1900-01-01 and
    * the phantom 1900-02-29 (serial 60) never existed, so serials < 60
    * sit one day behind the 1899-12-30 epoch (the phantom itself maps
    * to Feb 28). 1904 system (mac workbooks, date1904 workbook
    * property): serial 0 = 1904-01-01, no phantom. The fraction is the
    * time of day, rounded to the nearest second.
    */
  private[sources] def serialToIso(v: Double, kind: DateKind, date1904: Boolean): String = {
    val days = math.floor(v).toLong
    val secs = math.round((v - days) * 86400.0)
    val (d0, s0) = if (secs >= 86400) (days + 1, 0L) else (days, secs)
    val date =
      if (date1904) java.time.LocalDate.of(1904, 1, 1).plusDays(d0)
      else java.time.LocalDate.of(1899, 12, 30)
        .plusDays(if (d0 < 60) d0 + 1 else d0)
    val time = java.time.LocalTime.ofSecondOfDay(s0)
    kind match {
      case DateOnly => date.toString
      case TimeOnly => time.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))
      case _ => date.toString + " " +
        time.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))
    }
  }

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
  private def sheetRows(xml: String, shared: IndexedSeq[String],
                        styles: IndexedSeq[DateKind] = IndexedSeq.empty,
                        date1904: Boolean = false): Seq[Array[String]] = {
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
            val v = unescapeXml(vRe.findFirstMatchIn(body).map(_.group(1)).getOrElse(""))
            // a date-styled numeric cell renders as ISO, not its serial
            val kind = attrs.get("s").map(_.toInt)
              .filter(i => i >= 0 && i < styles.length).map(styles).getOrElse(NotDate)
            if (kind == NotDate) v
            else v.toDoubleOption.map(serialToIso(_, kind, date1904)).getOrElse(v)
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
    val styles = parts.get("xl/styles.xml")
      .map(styleDateKinds).getOrElse(IndexedSeq.empty)
    val date1904 = parts.get("xl/workbook.xml").exists(wb =>
      "<workbookPr\\b[^>]*date1904=\"(1|true)\"".r.findFirstIn(wb).isDefined)
    parts.keys.filter(_.startsWith("xl/worksheets/")).toSeq.sorted.headOption
      .map(k => sheetRows(parts(k), shared, styles, date1904)).getOrElse(Seq.empty)
  }
}
