package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (builder north star: image/audio/video as opaque
  * binary columns with typed metadata) with REAL decode kernels.
  *
  * The kernels genuinely decode payloads with the JDK's own codecs
  * ([[Codecs]]): ImageIO raster decode (PNG/JPEG/BMP/GIF) for images,
  * RIFF/PCM parsing for audio, animated-GIF frame extraction for video.
  * Feature extraction reads channel statistics off decoded pixels,
  * resize is a real bilinear scale re-encoded as PNG, audio windows
  * slice PCM at the codec's true byte rate. Payloads in formats the JDK
  * cannot decode (H.264, MP3, …) fall back to a deterministic
  * byte-signature / byte-slice kernel — the offline-testable contract —
  * and are NOT silently dropped; a production build swaps richer codecs
  * into [[Codecs]] without touching any Spark-side signature here.
  *
  * Spark-side shape: per-partition batched execution (`mapPartitions` —
  * one kernel iterator per partition, the Scala analogue of
  * `mapInPandas`), fixed-width feature vectors (predictable memory),
  * bounded output rows per asset for frame/window explosion. Binary
  * payloads ride a shuffle only when explicitly repartitioned.
  */
object Multimodal {

  /** Asset row: opaque payload + typed metadata. */
  final case class Asset(asset_id: Long, modality: String, data: Array[Byte],
                         width: Int, height: Int, duration_ms: Long)

  final case class Feature(asset_id: Long, modality: String, dim: Int,
                           features: Array[Float])

  final case class Frame(asset_id: Long, frame_idx: Int, frame: Array[Byte])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("data", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** FALLBACK kernel for payloads no JDK codec accepts: deterministic
    * 8-float signature from raw bytes, so unknown formats still flow
    * through the pipeline with a stable (if semantically blind) vector.
    */
  private def byteSignature(data: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    if (data != null) {
      var i = 0
      while (i < data.length) { out(i % 8) += (data(i) & 0xff) / 255.0f; i += 1 }
    }
    out
  }

  /** REAL decode dispatch: image → ImageIO pixels, audio → PCM samples,
    * video → animated-GIF frames (per-frame image features averaged).
    * Returns the 8-dim modality signature, or the byte-signature
    * fallback when the payload defeats every JDK codec.
    */
  private[operators] def decodeFeatures(modality: String, data: Array[Byte]): Array[Float] = {
    val real: Option[Array[Float]] = modality match {
      case "image" => Codecs.decodeImage(data).map(Codecs.imageFeatures)
      case "audio" => Codecs.decodeWav(data).map(Codecs.audioFeatures)
      case "video" =>
        Codecs.gifFrames(data).map { frames =>
          val acc = new Array[Float](8)
          frames.foreach { fr =>
            val f = Codecs.imageFeatures(fr)
            var i = 0; while (i < 8) { acc(i) += f(i); i += 1 }
          }
          var i = 0; while (i < 8) { acc(i) /= frames.size; i += 1 }
          acc
        }
      case _ => None
    }
    real.getOrElse(byteSignature(data))
  }

  /** Batched feature extraction — one kernel invocation stream per
    * partition (the `mapInPandas` shape): iterator in, iterator out,
    * constant memory per partition.
    */
  def featurize(assets: Dataset[Asset]): Dataset[Feature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val f = decodeFeatures(a.modality, a.data)
        Feature(a.asset_id, a.modality, f.length, f)
      }
    }
  }

  /** 256-bit perceptual fingerprint row, 4 longs (word k = bits
    * [64k, 64k+63]) — the v2 shape that retires the 64-bit band
    * keyspace ceiling (each of the 4 LSH bands keys a FULL long, so
    * random band collisions are ~2⁻⁶² instead of ~2⁻¹⁶).
    */
  final case class ImageHash(asset_id: Long, h0: Long, h1: Long, h2: Long,
                             h3: Long, decoded: Boolean)

  /** 4-word fallback fingerprint for undecodable payloads: TWO seeded
    * 32-bit MurmurHash3 values packed per word, so each LSH band key
    * carries a full 64 bits of entropy — a sign-extended single murmur
    * would leave the upper half constant and fallback rows' band keys
    * colliding at ~2⁻³², regrowing the quadratic candidate mass the
    * 256-bit rebuild retires (an undecodable-heavy corpus would pay it
    * in the band join before the hamming==0 rule discards the pairs).
    * Identical bytes ⇒ identical words, so the exact-match fallback
    * rule still fires; Hamming proximity between fallback hashes
    * remains meaningless by contract.
    */
  private def byteHash4(data: Array[Byte]): Array[Long] = {
    val d = if (data == null) Array.emptyByteArray else data
    Array.tabulate(4) { k =>
      val hi = scala.util.hashing.MurmurHash3.bytesHash(d, 0x9747b28c + 2 * k)
      val lo = scala.util.hashing.MurmurHash3.bytesHash(d, 0x9747b28c + 2 * k + 1)
      (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
    }
  }

  /** Perceptual 256-bit dHash per image asset (REAL decode via ImageIO;
    * video assets hash their first GIF frame; Codecs.dhash256 —
    * 16×16-grid gradient bits). Undecodable payloads fall back to a
    * byte-content fingerprint (still catches EXACT duplicates) and are
    * flagged `decoded = false` so consumers can separate perceptual
    * matches from byte matches. Per-partition batched, one iterator
    * per partition — the same kernel shape as [[featurize]].
    */
  def imageHashes(assets: Dataset[Asset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets
      .filter(a => a.modality == "image" || a.modality == "video")
      .mapPartitions { it =>
        it.map { a =>
          val img = a.modality match {
            case "image" => Codecs.decodeImage(a.data)
            case _       => Codecs.gifFrames(a.data).flatMap(_.headOption)
          }
          val (h, dec) = img match {
            case Some(i) => (Codecs.dhash256(i), true)
            case None    => (byteHash4(a.data), false)
          }
          ImageHash(a.asset_id, h(0), h(1), h(2), h(3), dec)
        }
      }
  }

  /** 256-bit TEMPORAL fingerprint per video asset: dHash of the
    * per-pixel MEAN raster over all decoded GIF frames. The first-frame
    * hash [[imageHashes]] gives video rows is blind past frame 0 — two
    * videos sharing an intro frame read IDENTICAL there (a false-dup
    * class), and a re-encode differing only at frame 0 is missed. The
    * temporal mean carries every frame's content: shared-intro videos
    * with different tails separate (3 of 4 frames differ ⇒ the mean
    * differs ⇒ gradient bits flip), while per-frame noise and
    * re-encode/brightness shifts average out. Order-invariant by
    * construction (a re-cut of the same frames pairs — the
    * conservative choice for dedup; document order is not content).
    * Undecodable payloads byte-hash with decoded=false, the
    * [[imageHashes]] contract.
    */
  def videoHashes(assets: Dataset[Asset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").mapPartitions { it =>
      it.map { a =>
        val mean = Codecs.gifFrames(a.data).filter(_.nonEmpty).map(meanRaster)
        val (h, dec) = mean match {
          case Some(i) => (Codecs.dhash256(i), true)
          case None    => (byteHash4(a.data), false)
        }
        ImageHash(a.asset_id, h(0), h(1), h(2), h(3), dec)
      }
    }
  }

  /** Per-pixel mean over frames (intersection extent — GIF frames of
    * one stream share dims, but clamp defensively).
    */
  private def meanRaster(frames: IndexedSeq[java.awt.image.BufferedImage]): java.awt.image.BufferedImage = {
    val w = frames.map(_.getWidth).min
    val h = frames.map(_.getHeight).min
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val n = frames.size
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var r = 0; var g = 0; var b = 0
        frames.foreach { f =>
          val p = f.getRGB(x, y)
          r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
        }
        out.setRGB(x, y, ((r / n) << 16) | ((g / n) << 8) | (b / n))
        x += 1
      }
      y += 1
    }
    out
  }

  final case class AudioHash(asset_id: Long, h0: Long, h1: Long, h2: Long,
                             h3: Long, decoded: Boolean)

  /** 256-bit energy-envelope fingerprint per audio asset (REAL
    * RIFF/PCM decode; Codecs.audioFingerprint256) — same contract as
    * [[imageHashes]]: undecodable payloads byte-hash with
    * `decoded = false`.
    */
  def audioHashes(assets: Dataset[Asset]): Dataset[AudioHash] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "audio").mapPartitions { it =>
      it.map { a =>
        val (h, dec) = Codecs.decodeWav(a.data) match {
          case Some(w) => (Codecs.audioFingerprint256(w), true)
          case None    => (byteHash4(a.data), false)
        }
        AudioHash(a.asset_id, h(0), h(1), h(2), h(3), dec)
      }
    }
  }

  /** Resize pass for image assets (real bilinear raster scale, output
    * re-encoded PNG); non-images and undecodable payloads pass through
    * with a byte-budget truncation fallback (documented contract).
    */
  def resizeImages(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.modality == "image") {
          val resized = Codecs.resizeImage(a.data, w, h).getOrElse {
            val d = if (a.data == null) Array.emptyByteArray else a.data
            java.util.Arrays.copyOf(d, math.max(w * h, 1))
          }
          a.copy(data = resized, width = w, height = h)
        } else a
      }
    }
  }

  /** Frame sampling for video assets: one frame every `everyMs`
    * milliseconds — REAL frames when the payload is an animated GIF
    * (the sampled frame is decoded and served PNG-encoded), byte-slice
    * fallback otherwise. Output rows per asset = duration/everyMs,
    * bounded by construction either way.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").flatMap { a =>
      val n = math.max((a.duration_ms / math.max(everyMs, 1L)).toInt, 0)
      Codecs.gifFrames(a.data) match {
        case Some(frames) =>
          // frame f covers [f*frameDur, (f+1)*frameDur); sample time
          // i*everyMs lands on floor(t/frameDur), clamped to the last
          val frameDur = math.max(a.duration_ms / frames.size, 1L)
          (0 until n).map { i =>
            val idx = math.min(i * everyMs / frameDur, frames.size - 1L).toInt
            Frame(a.asset_id, i, Codecs.encodePng(frames(idx)))
          }
        case None =>
          val d = if (a.data == null) Array.emptyByteArray else a.data
          (0 until n).map { i =>
            val sliceStart = if (d.isEmpty) 0 else (i * 16) % math.max(d.length, 1)
            Frame(a.asset_id, i,
              java.util.Arrays.copyOfRange(d, sliceStart, math.min(sliceStart + 16, d.length)))
          }
      }
    }
  }

  final case class AudioWindow(asset_id: Long, window_idx: Int,
                               start_ms: Long, window: Array[Byte])

  /** Overlapping fixed-length windows over audio assets — the
    * spectrogram/feature-prep shape (window + hop). For RIFF/PCM
    * payloads the windows are REAL: start offsets map time→bytes
    * through the decoded byte rate (sampleRate × channels × width),
    * aligned to sample-frame boundaries, sliced from the actual PCM
    * data chunk, with duration taken from the codec (not metadata).
    * Non-WAV payloads keep the documented 1 byte/ms fallback over raw
    * bytes. Output rows per asset = floor((duration−window)/hop)+1 —
    * never unbounded amplification.
    */
  def windowAudio(assets: Dataset[Asset], windowMs: Long, hopMs: Long): Dataset[AudioWindow] = {
    import assets.sparkSession.implicits._
    val hop = math.max(hopMs, 1L)
    assets.filter(_.modality == "audio").flatMap { a =>
      Codecs.decodeWav(a.data) match {
        case Some(wav) if wav.byteRate > 0 =>
          val winBytes = (windowMs * wav.byteRate / 1000L).toInt
          val starts = 0L to math.max(wav.durationMs - windowMs, 0L) by hop
          starts.zipWithIndex.map { case (startMs, i) =>
            val b0raw = (startMs * wav.byteRate / 1000L).toInt
            val b0 = b0raw - b0raw % wav.bytesPerFrame // sample-aligned
            val b1 = math.min(b0 + winBytes, wav.pcm.length)
            AudioWindow(a.asset_id, i, startMs,
              java.util.Arrays.copyOfRange(wav.pcm, b0, math.max(b1, b0)))
          }
        case _ =>
          val d = if (a.data == null) Array.emptyByteArray else a.data
          val bytesPerMs = 1L // fallback decode rate for unknown formats
          val starts = 0L to math.max(a.duration_ms - windowMs, 0L) by hop
          starts.zipWithIndex.map { case (startMs, i) =>
            val b0 = ((startMs * bytesPerMs) % math.max(d.length, 1)).toInt
            val b1 = math.min(b0 + (windowMs * bytesPerMs).toInt, d.length)
            AudioWindow(a.asset_id, i, startMs,
              java.util.Arrays.copyOfRange(d, b0, math.max(b1, b0)))
          }
      }
    }
  }

  /** Deterministic synthetic asset table for specs/demos, now carrying
    * REAL encoded payloads the kernels decode end-to-end: images are
    * 8×8 PNGs (id-seeded gradient), audio is 8 kHz PCM-16 mono WAV
    * (id-seeded sine, exactly duration_ms long), video is a 4-frame
    * animated GIF whose frame delay spans duration_ms.
    */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val mod = Seq("image", "audio", "video")(id.toInt % 3)
      val durMs = 1000L + id * 100
      val data = mod match {
        case "image" => Codecs.encodePng(syntheticImage(id, 0))
        case "audio" =>
          val samples = Array.tabulate[Short]((durMs * 8).toInt) { i =>
            (math.sin(2 * math.Pi * (220 + id) * i / 8000.0) * 16000).toShort
          }
          Codecs.encodeWavPcm16(samples, 8000)
        case "video" =>
          Codecs.encodeAnimatedGif((0 until 4).map(f => syntheticImage(id, f)), durMs / 4)
      }
      Asset(id, mod, data, 8, 8, durMs)
    }
  }

  /** Deterministic synthetic video corpus for the temporal-dedup
    * pipeline (mm_video_dedup): n 4-frame animated GIFs of 16×16
    * noise rasters (the dHash-stable family — see [[noiseRaster]]),
    * with two PLANTED structures:
    *  - frame 0 is a shared "intro" seeded by id % 5, so ~n/5 videos
    *    open with the byte-identical frame — the class a first-frame
    *    hash FALSELY pairs and the temporal mean must separate
    *    (frames 1-3 are id-unique noise);
    *  - every id ≡ 3 (mod 7) video repeats video id−1's frames with a
    *    +2 brightness lift — a re-encode near-dup the temporal
    *    fingerprint must pair (byte-different, perceptually equal).
    */
  def syntheticVideos(spark: SparkSession, n: Int): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val src: Long = if (id % 7 == 3 && id > 0) id - 1 else id
      val lift: Int = if (id % 7 == 3 && id > 0) 2 else 0
      val frames = (0 until 4).map { f =>
        val base = if (f == 0) noiseRaster(30000L + src % 5)
                   else noiseRaster(40000L + src * 4 + f)
        if (lift == 0) base else brighten(base, lift)
      }
      (id, Codecs.encodeAnimatedGif(frames, 250L))
    }
  }

  private def brighten(img: java.awt.image.BufferedImage, d: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      def c(v: Int) = math.min(255, v + d)
      out.setRGB(x, y, (c((p >> 16) & 0xFF) << 16) | (c((p >> 8) & 0xFF) << 8) | c(p & 0xFF))
    }
    out
  }

  /** Deterministic synthetic PDF corpus for the PDF-embedded-image
    * pipeline (mm_pdf_images): n minimal PDFs, each embedding TWO
    * baseline-JPEG `/Subtype /Image` XObjects behind `/Filter
    * /DCTDecode` (the stream shape PdfText.jpegImages extracts;
    * reference pypdf image surface, engine.py:29-33) beside a plain
    * text page stream. Image 0 is a unique id-seeded raster; image 1
    * is a shared "logo" raster seeded by pdf_id % 7, so PDFs in the
    * same logo class embed byte-identical JPEGs — the boilerplate-
    * image duplication a corpus audit hunts across documents.
    */
  def syntheticPdfs(spark: SparkSession, n: Int): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    spark.range(n).map(id => (id, pdfWithJpegs(id)))
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", b)
    b.toByteArray
  }

  private def pdfWithJpegs(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def imgObj(num: Int, jpg: Array[Byte]): Unit = {
      // dims must match the embedded payload (16×16 noiseRaster):
      // imageHashes decodes dims from the bytes, but any metadata
      // consumer (e.g. the resize path) trusts the declared values
      w(s"$num 0 obj << /Subtype /Image /Width 16 /Height 16 " +
        s"/Filter /DCTDecode /Length ${jpg.length} >> stream\n")
      out.write(jpg); w("\nendstream endobj\n")
    }
    w("%PDF-1.4\n")
    val txt = s"BT (synthetic pdf $id) Tj ET"
    w(s"1 0 obj << /Length ${txt.length} >> stream\n")
    w(txt); w("\nendstream endobj\n")
    imgObj(2, encodeJpeg(noiseRaster(10000L + id)))
    imgObj(3, encodeJpeg(noiseRaster(id % 7)))
    w("%%EOF\n")
    out.toByteArray
  }

  /** Seeded 16×16 noise raster: distinct seeds land ~half the dHash
    * bits apart (~128 of 256 — far above the ≤24 pair threshold), so
    * the only pdf-image pairs are the byte-identical shared logos —
    * the 8×8 gradient
    * family used by the asset fixtures is dHash-degenerate (low
    * gradient entropy) and would pair half the corpus.
    */
  private def noiseRaster(seed: Long): java.awt.image.BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, rnd.nextInt() & 0xFFFFFF)
    img
  }

  private def syntheticImage(id: Long, frame: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val r = ((x + frame) * 31 + id) % 256
      val g = (y * 17 + id * 3) % 256
      val b = (x * y + id * 7) % 256
      img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b.toInt)
    }
    img
  }
}
