package graft.sources

/** Pure-JVM CCITT Group 3/4 fax decode for PDF `/CCITTFaxDecode` image
  * streams (reference: pypdf surfaces these images, engine.py:29-33).
  *
  * A CCITTFaxDecode payload IS a TIFF compression-type-3/4 strip — the
  * PDF filter parameters (/K, /Columns, /Rows, /EncodedByteAlign) are a
  * transliteration of the TIFF T4/T6 fields. The JDK ships a TIFF
  * ImageIO plugin (JDK 9+) whose reader implements both ITU T.4 (G3,
  * 1D MH and mixed 2D MR) and T.6 (G4, MMR), so the whole decode is a
  * 146-byte little-endian TIFF HEADER in front of the untouched
  * payload plus one `ImageIO.read` — the same JDK-codec judgment as
  * DCTDecode-is-baseline-JPEG (PdfText.jpegImages, round 14). No fax
  * code tables to maintain, and the decoder exercised is the one the
  * round-trip spec validates against the JDK's own CCITT ENCODER.
  *
  * JBIG2Decode and JPXDecode remain out: the JDK ships no decoder for
  * either — the permanently closed branch of this gap (SURVEY §1.3).
  */
object CcittTiff {

  /** Wrap a raw CCITT bitstream in a minimal single-strip TIFF.
    *
    * @param k         PDF /K: < 0 → pure 2D (T.6/G4, TIFF compression
    *                  4); 0 → 1D MH (G3, compression 3); > 0 → mixed
    *                  1D/2D G3 (compression 3 with the T4Options 2D
    *                  bit — each line carries its own 1D/2D tag bit,
    *                  which the TIFF reader handles)
    * @param blackIs1  EFFECTIVE polarity: false keeps the fax
    *                  convention (white runs render white —
    *                  PhotometricInterpretation 0); true inverts the
    *                  packing (photometric 1). PDFs setting
    *                  /BlackIs1 true normally pair it with
    *                  /Decode [1 0], which cancels back to the
    *                  standard rendering — so callers pass
    *                  /BlackIs1 XOR /Decode-inverted (PdfText
    *                  .ccittFromStream does), not /BlackIs1 raw.
    * @param byteAlign PDF /EncodedByteAlign → T4Options fill-bits flag
    *                  (G3 only; T.6 has no aligned-EOL mode)
    */
  def wrapTiff(data: Array[Byte], columns: Int, rows: Int, k: Int,
               blackIs1: Boolean, byteAlign: Boolean): Array[Byte] = {
    val g4 = k < 0
    // 11 IFD entries either way: T6Options for G4, T4Options for G3
    val nEntries = 11
    val dataOff = 8 + 2 + nEntries * 12 + 4
    val out = java.nio.ByteBuffer.allocate(dataOff + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    out.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, value: Long): Unit = {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(1)
      if (typ == 3) out.putShort(value.toShort).putShort(0) // SHORT, padded
      else out.putInt(value.toInt)                          // LONG
    }
    entry(256, 4, columns.toLong)                 // ImageWidth
    entry(257, 4, rows.toLong)                    // ImageLength
    entry(258, 3, 1L)                             // BitsPerSample
    entry(259, 3, if (g4) 4L else 3L)             // Compression
    entry(262, 3, if (blackIs1) 1L else 0L)       // Photometric
    entry(266, 3, 1L)                             // FillOrder (MSB first)
    entry(273, 4, dataOff.toLong)                 // StripOffsets
    entry(277, 3, 1L)                             // SamplesPerPixel
    entry(278, 4, rows.toLong)                    // RowsPerStrip
    entry(279, 4, data.length.toLong)             // StripByteCounts
    if (g4) entry(293, 4, 0L)                     // T6Options
    else entry(292, 4,                            // T4Options
      (if (k > 0) 1L else 0L) | (if (byteAlign) 4L else 0L))
    out.putInt(0) // next IFD
    out.put(data)
    out.array()
  }

  /** Decode a CCITT payload to a raster; None when the JDK reader
    * rejects the stream (truncated/garbled payloads surface through
    * the multimodal byte-hash fallback instead, never a crash).
    */
  def decode(data: Array[Byte], columns: Int, rows: Int, k: Int,
             blackIs1: Boolean, byteAlign: Boolean): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      wrapTiff(data, columns, rows, k, blackIs1, byteAlign))))
    catch { case _: Exception => None }
}
