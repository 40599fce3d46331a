package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier, ImageWriteParam}
import javax.imageio.metadata.IIOMetadataNode

/** Pure-JVM multimodal codecs — REAL decode/encode, zero external deps.
  *
  * The JDK ships working raster codecs: `javax.imageio` reads/writes
  * PNG, JPEG, BMP, GIF and WBMP, including every frame of an animated
  * GIF, and WAV/RIFF PCM is a 44-byte header over raw samples. That is
  * enough to make the engine's image / audio / video kernels genuinely
  * decode pixels and samples (reference requirements.txt:9-10 only
  * *declared* Pillow/pytesseract without using them, so this goes past
  * the reference): feature extraction reads real channel statistics,
  * resize is a real bilinear raster scale, video frame-sampling decodes
  * animated-GIF frames, audio windowing slices real PCM at the codec's
  * true byte rate.
  *
  * Codecs the JDK does not ship (MP4/H.264, MP3, TIFF-LZW …) fall back
  * to the deterministic byte-signature kernels in [[Multimodal]] —
  * documented, not hidden: `decode*` here returns None and the caller
  * keeps its offline-testable contract.
  *
  * Everything is static and allocation-local: safe to call from
  * `mapPartitions` kernels on executors without serializing state.
  */
object Codecs {

  locally {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false) // in-memory streams, no /tmp spill
  }

  // ------------------------------------------------------------------
  // images
  // ------------------------------------------------------------------

  /** Decode any ImageIO-supported payload (PNG/JPEG/BMP/GIF/WBMP). */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bo)
    bo.toByteArray
  }

  /** Real bilinear raster resize; output re-encoded as PNG. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeImage(bytes).map { src =>
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
      g.dispose()
      encodePng(dst)
    }

  /** 256-bit difference hash (16×16-grid dHash) — the v2 fingerprint
    * that retires the 64-bit band-keyspace ceiling (SCALE.md): 4×16-bit
    * bands over 64 bits collide at ~4·2⁻¹⁶, making candidate mass
    * ~n²·6×10⁻⁵ — negligible to ~10⁷ assets, real near ~10⁸ — while
    * 4×64-bit bands over 256 bits collide at ~2⁻⁶², so random
    * collisions stay zero at any conceivable asset count and candidate
    * mass is true-duplicate-bounded. Krawetz's dHash construction
    * at 4× the classic 9×8 grid: bilinear-resize to 17×16 grayscale, bit
    * (y·16+x) = 1 iff luma(x,y) > luma(x+1,y), packed little-endian
    * into 4 longs (word k holds bits [64k, 64k+63] = grid rows
    * [4k, 4k+3]). Row-major packing keeps each band a contiguous
    * 4-row horizontal strip, so localized edits (a logo, a caption)
    * dirty few bands and banded recall stays high.
    */
  def dhash256(img: BufferedImage): Array[Long] = {
    val dst = new BufferedImage(17, 16, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 17, 16, null)
    g.dispose()
    def luma(x: Int, y: Int): Int = {
      val p = dst.getRGB(x, y)
      (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
    }
    val words = new Array[Long](4)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        if (luma(x, y) > luma(x + 1, y)) {
          val bit = y * 16 + x
          words(bit >> 6) |= 1L << (bit & 63)
        }
        x += 1
      }
      y += 1
    }
    words
  }

  /** 8-dim real image signature from decoded pixels:
    * [meanR, meanG, meanB, lumaMean, lumaStd, gradH, gradV, aspect].
    * Channel means are in [0,1]; gradients are mean absolute
    * neighbour-luma deltas (edge energy); aspect = w/h.
    */
  def imageFeatures(img: BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val n = (w * h).toDouble
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
    var gh = 0.0; var gv = 0.0
    val luma = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = ((p >> 16) & 0xff) / 255.0
        val g = ((p >> 8) & 0xff) / 255.0
        val b = (p & 0xff) / 255.0
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
        luma(y * w + x) = l
        x += 1
      }
      y += 1
    }
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (x + 1 < w) gh += math.abs(luma(y * w + x + 1) - luma(y * w + x))
        if (y + 1 < h) gv += math.abs(luma((y + 1) * w + x) - luma(y * w + x))
        x += 1
      }
      y += 1
    }
    val lm = sl / n
    val lvar = math.max(sl2 / n - lm * lm, 0.0)
    Array(
      (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat, lm.toFloat,
      math.sqrt(lvar).toFloat,
      (if (w > 1) gh / ((w - 1).toDouble * h) else 0.0).toFloat,
      (if (h > 1) gv / (w.toDouble * (h - 1)) else 0.0).toFloat,
      (w.toDouble / h).toFloat)
  }

  // ------------------------------------------------------------------
  // animated GIF (the JDK's only multi-frame "video" container)
  // ------------------------------------------------------------------

  /** Decode every frame of a (possibly animated) GIF. None if the
    * payload is not a GIF the reader accepts.
    */
  def gifFrames(bytes: Array[Byte]): Option[IndexedSeq[BufferedImage]] =
    if (bytes == null || bytes.length == 0) None
    else {
      val readers = ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)))
          val n = r.getNumImages(true)
          if (n <= 0) None else Some((0 until n).map(r.read))
        } catch { case _: Exception => None }
        finally r.dispose()
      }
    }

  /** Encode frames as an animated GIF with a uniform per-frame delay. */
  def encodeAnimatedGif(frames: Seq[BufferedImage], delayMs: Long): Array[Byte] = {
    require(frames.nonEmpty, "animated GIF needs at least one frame")
    val bo = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bo)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      val p: ImageWriteParam = w.getDefaultWriteParam
      val md = w.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromBufferedImageType(BufferedImage.TYPE_INT_RGB), p)
      val fmt = md.getNativeMetadataFormatName
      val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", math.max(delayMs / 10, 1).toString) // centiseconds
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      md.setFromTree(fmt, root)
      w.prepareWriteSequence(null)
      frames.foreach(f => w.writeToSequence(new IIOImage(f, null, md), p))
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bo.toByteArray
  }

  // ------------------------------------------------------------------
  // WAV / RIFF PCM (manual parse: deterministic, no SPI lookup)
  // ------------------------------------------------------------------

  /** Decoded WAV: real sample rate/channels/width plus the PCM payload
    * slice. `byteRate` is bytes of PCM per second — the true decode
    * rate the audio windower needs (`windowAudio`'s stub guessed
    * 1 byte/ms; a 16-bit 8 kHz mono stream is actually 16 000).
    */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       pcm: Array[Byte]) {
    def bytesPerFrame: Int = channels * (bitsPerSample / 8)
    def byteRate: Int = sampleRate * bytesPerFrame
    def durationMs: Long = if (byteRate == 0) 0L else pcm.length * 1000L / byteRate
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Parse a RIFF/WAVE container with PCM (format 1) audio, walking the
    * chunk list for `fmt ` and `data` (extra chunks like LIST are
    * skipped, as the spec requires). None for anything else.
    */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var pos = 12
    var rate = 0; var ch = 0; var bits = 0; var fmtOk = false
    var pcm: Array[Byte] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = le32(bytes, pos + 4)
      if (len < 0 || pos + 8 + len > bytes.length) return None
      id match {
        case "fmt " if len >= 16 =>
          val audioFormat = le16(bytes, pos + 8)
          ch = le16(bytes, pos + 10)
          rate = le32(bytes, pos + 12)
          bits = le16(bytes, pos + 22)
          fmtOk = audioFormat == 1 && ch > 0 && rate > 0 && (bits == 8 || bits == 16)
        case "data" =>
          pcm = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case _ => // skip LIST/fact/etc.
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmtOk && pcm != null) Some(Wav(rate, ch, bits, pcm)) else None
  }

  /** Mono float samples in [-1, 1]: channels averaged, 8-bit unsigned /
    * 16-bit signed little-endian widened.
    */
  def monoSamples(w: Wav): Array[Float] = {
    val frames = w.pcm.length / w.bytesPerFrame
    val out = new Array[Float](frames)
    var f = 0
    while (f < frames) {
      var acc = 0.0
      var c = 0
      while (c < w.channels) {
        val off = f * w.bytesPerFrame + c * (w.bitsPerSample / 8)
        acc += (if (w.bitsPerSample == 8) ((w.pcm(off) & 0xff) - 128) / 128.0
                else le16(w.pcm, off).toShort / 32768.0)
        c += 1
      }
      out(f) = (acc / w.channels).toFloat
      f += 1
    }
    out
  }

  /** Minimal PCM-16 mono WAV writer (fixtures + synthetic assets). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bo = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bo.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bo.putShort)
    bo.array()
  }

  /** 256-bit energy-envelope fingerprint — the audio sibling of
    * [[dhash256]] (Haitsma-Kalker energy-difference family,
    * time-domain form — no FFT in the JDK): mono
    * samples split into 257 equal sub-windows, bit b = 1 iff
    * RMS(sub b) > RMS(sub b+1), packed into 4 longs (word k holds
    * bits [64k, 64k+63], a contiguous quarter of the timeline — so a
    * trim or splice dirties few bands). Gradient bits over a
    * NORMALIZED envelope are invariant to amplitude scaling and
    * codec/container round-trips, and robust to small trims. Clips too short to populate 257
    * windows (< 514 samples — ~64 ms at 8 kHz, below any content
    * clip) fingerprint all-zero (degenerate by contract).
    */
  def audioFingerprint256(w: Wav): Array[Long] = {
    val words = new Array[Long](4)
    val s = monoSamples(w)
    if (s.length < 514) return words
    val sub = 257
    val win = s.length / sub
    val rms = Array.tabulate(sub) { b =>
      var acc = 0.0; var i = b * win
      val end = i + win
      while (i < end) { acc += s(i).toDouble * s(i); i += 1 }
      math.sqrt(acc / win)
    }
    var b = 0
    while (b < 256) {
      if (rms(b) > rms(b + 1)) words(b >> 6) |= 1L << (b & 63)
      b += 1
    }
    words
  }

  /** 8-dim real audio signature from decoded PCM:
    * [rms, zeroCrossRate, peak, meanAbs, rms(q1), rms(q2), rms(q3), rms(q4)]
    * — quartile RMS gives a coarse temporal envelope, the feature a
    * VAD/music-speech gate actually keys on.
    */
  def audioFeatures(w: Wav): Array[Float] = {
    val s = monoSamples(w)
    val n = s.length
    if (n == 0) return new Array[Float](8)
    var sum2 = 0.0; var sumAbs = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val v = s(i)
      sum2 += v * v; sumAbs += math.abs(v); peak = math.max(peak, math.abs(v))
      if (i > 0 && ((s(i - 1) >= 0) != (v >= 0))) zc += 1
      i += 1
    }
    def segRms(q: Int): Float = {
      val lo = n.toLong * q / 4; val hi = n.toLong * (q + 1) / 4
      if (hi <= lo) 0f
      else {
        var a = 0.0; var j = lo.toInt
        while (j < hi) { a += s(j) * s(j); j += 1 }
        math.sqrt(a / (hi - lo)).toFloat
      }
    }
    Array(math.sqrt(sum2 / n).toFloat, zc.toFloat / n, peak.toFloat,
      (sumAbs / n).toFloat, segRms(0), segRms(1), segRms(2), segRms(3))
  }
}
