package graft

import graft.operators.{Codecs, Multimodal}

/** Multimodal binary-column plumbing: schema, batched kernel execution,
  * output shapes, determinism — and the REAL decode kernels (JDK
  * codecs: ImageIO rasters, RIFF/PCM audio, animated-GIF frames).
  * Ground-truth cases assert actual pixel/sample math, not just shapes;
  * the byte-signature fallback for non-JDK formats is pinned too.
  */
class MultimodalSpec extends SparkSpecBase {

  test("featurize: fixed-width vectors, deterministic across runs") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val f1 = Multimodal.featurize(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.featurize(assets).collect().sortBy(_.asset_id)
    assert(f1.length == 30)
    assert(f1.forall(_.dim == 8))
    assert(f1.forall(_.features.length == 8))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("featurize: survives repartition (kernel is per-partition, not per-order)") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val a = Multimodal.featurize(assets).collect().sortBy(_.asset_id).map(_.features.toSeq).toSeq
    val b = Multimodal.featurize(assets.repartition(7)).collect().sortBy(_.asset_id).map(_.features.toSeq).toSeq
    assert(a == b)
  }

  test("image features are real pixel statistics (solid red ground truth)") {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0xff0000)
    val f = Codecs.imageFeatures(Codecs.decodeImage(Codecs.encodePng(img)).get)
    assert(math.abs(f(0) - 1.0f) < 1e-3, "meanR of solid red = 1")
    assert(f(1) < 1e-3 && f(2) < 1e-3, "meanG/meanB of solid red = 0")
    assert(math.abs(f(3) - 0.299f) < 1e-3, "luma of pure red = 0.299")
    assert(f(4) < 1e-3 && f(5) < 1e-3 && f(6) < 1e-3, "solid color: no variance, no edges")
    assert(f(7) == 1.0f, "8x8 aspect = 1")
  }

  test("audio features are real PCM statistics (sine ground truth)") {
    // 1 s of 440 Hz at amplitude 16000/32768 — RMS = amp/sqrt(2)
    val amp = 16000.0 / 32768.0
    val samples = Array.tabulate[Short](8000)(i =>
      (math.sin(2 * math.Pi * 440 * i / 8000.0) * 16000).toShort)
    val wav = Codecs.decodeWav(Codecs.encodeWavPcm16(samples, 8000)).get
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.durationMs == 1000L)
    val f = Codecs.audioFeatures(wav)
    assert(math.abs(f(0) - amp / math.sqrt(2)) < 0.01, s"sine RMS, got ${f(0)}")
    // 440 Hz crosses zero 880 times/s → zcr ≈ 880/8000 = 0.11
    assert(math.abs(f(1) - 0.11f) < 0.01, s"sine zero-cross rate, got ${f(1)}")
    assert(math.abs(f(2) - amp) < 0.01, "peak = amplitude")
    // stationary signal: all four quartile RMS values equal the global RMS
    (4 to 7).foreach(i => assert(math.abs(f(i) - f(0)) < 0.01, s"quartile $i"))
  }

  test("undecodable payload falls back to byte signature, never throws") {
    import spark.implicits._
    val junk = Multimodal.Asset(99L, "image", Array.tabulate[Byte](32)(_.toByte), 8, 8, 500L)
    val f = Multimodal.featurize(spark.createDataset(Seq(junk))).collect()
    assert(f.length == 1 && f(0).features.length == 8)
    assert(f(0).features.exists(_ != 0f), "fallback signature is byte-derived, not zeros")
  }

  test("resizeImages: real bilinear scale — output decodes as a 4x4 raster") {
    val out = Multimodal.resizeImages(Multimodal.syntheticAssets(spark, 9), 4, 4).collect()
    val images = out.filter(_.modality == "image")
    assert(images.nonEmpty)
    images.foreach { a =>
      assert(a.width == 4 && a.height == 4)
      val img = Codecs.decodeImage(a.data).get
      assert(img.getWidth == 4 && img.getHeight == 4, "payload is a real 4x4 image")
    }
    // non-images pass through byte-identical
    val orig = Multimodal.syntheticAssets(spark, 9).collect().map(a => a.asset_id -> a.data.toSeq).toMap
    out.filter(_.modality != "image").foreach(a =>
      assert(a.data.toSeq == orig(a.asset_id), "non-image payload untouched"))
  }

  test("resize preserves solid color (real raster semantics, not byte truncation)") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x00ff00)
    val asset = Multimodal.Asset(1L, "image", Codecs.encodePng(img), 8, 8, 0L)
    val out = Multimodal.resizeImages(spark.createDataset(Seq(asset)), 4, 4).collect()(0)
    val back = Codecs.decodeImage(out.data).get
    for (y <- 0 until 4; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xffffff) == 0x00ff00, s"pixel ($x,$y)")
  }

  test("sampleFrames: real animated-GIF frames, PNG-served, bounded per asset") {
    val frames = Multimodal.sampleFrames(Multimodal.syntheticAssets(spark, 9), 500L).collect()
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset.nonEmpty)
    byAsset.foreach { case (id, fs) =>
      val dur = 1000L + id * 100
      assert(fs.length == (dur / 500L).toInt, s"asset $id")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length).toSeq)
      fs.foreach { fr =>
        val img = Codecs.decodeImage(fr.frame).get
        assert(img.getWidth == 8 && img.getHeight == 8, "each sampled frame is a real 8x8 raster")
      }
    }
    // sampling at t=0 serves the FIRST encoded frame's pixels
    val a0 = Multimodal.syntheticAssets(spark, 9).collect().find(_.modality == "video").get
    val first = Codecs.gifFrames(a0.data).get.head
    val served = Codecs.decodeImage(byAsset(a0.asset_id).minBy(_.frame_idx).frame).get
    for (y <- 0 until 8; x <- 0 until 8)
      assert((served.getRGB(x, y) & 0xffffff) == (first.getRGB(x, y) & 0xffffff),
        s"frame-0 pixel ($x,$y) matches the decoded GIF frame")
  }

  test("windowAudio: real PCM slices at the codec's true byte rate") {
    val out = Multimodal.windowAudio(Multimodal.syntheticAssets(spark, 9), 500L, 250L)
      .collect().groupBy(_.asset_id)
    val assets = Multimodal.syntheticAssets(spark, 9).collect()
    assert(out.keySet == assets.filter(_.modality == "audio").map(_.asset_id).toSet,
      "only audio assets produce windows")
    for ((id, ws) <- out) {
      val a = assets.find(_.asset_id == id).get
      val wav = Codecs.decodeWav(a.data).get
      assert(wav.durationMs == a.duration_ms, "metadata duration matches the codec's")
      val expected = ((wav.durationMs - 500L) / 250L).toInt + 1
      assert(ws.length == expected, s"asset $id: ${ws.length} windows, expected $expected")
      val sorted = ws.sortBy(_.window_idx)
      assert(sorted.map(_.start_ms).toSeq == (0 until expected).map(_ * 250L),
        "starts must be hop-spaced from 0")
      // 8 kHz × 16-bit mono = 16 bytes/ms → a 500 ms window is 8000 PCM bytes
      assert(ws.forall(_.window.length == 500 * wav.byteRate / 1000),
        "windows carry exactly windowMs of real PCM")
      // the slice IS the PCM at that offset
      val w0 = sorted.head
      assert(w0.window.toSeq == wav.pcm.slice(0, w0.window.length).toSeq)
    }
  }

  test("binary assets round-trip through parquet (lake persistence)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    val assets = Multimodal.syntheticAssets(spark, 12)
    assets.toDF().write.mode("overwrite").parquet(s"$dir/assets.parquet")
    val back = spark.read.parquet(s"$dir/assets.parquet").as[Multimodal.Asset]
    val f1 = Multimodal.featurize(assets).collect().sortBy(_.asset_id).map(_.features.toSeq).toSeq
    val f2 = Multimodal.featurize(back).collect().sortBy(_.asset_id).map(_.features.toSeq).toSeq
    assert(f1 == f2, "features must be identical after a parquet round-trip")
  }

  test("mm_image_dedup: planted perceptual near-dups pair, unrelated images don't") {
    import spark.implicits._
    // 32×32 gradient raster; the near-dup is the same raster with a
    // mild global brightness lift (+12) — byte-different, perceptually
    // identical; the unrelated image is an independent pattern
    def img(bright: Int, unrelated: Boolean): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v0 = if (unrelated) ((x * 7) ^ (y * 13)) * 9 % 256
                 else (x * 6 + y * 2) % 256
        val v = math.min(255, v0 + bright)
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      graft.operators.Codecs.encodePng(im)
    }
    val assets = Seq(
      Multimodal.Asset(1L, "image", img(0, unrelated = false), 32, 32, 0L),
      Multimodal.Asset(2L, "image", img(12, unrelated = false), 32, 32, 0L), // near-dup of 1
      Multimodal.Asset(3L, "image", img(0, unrelated = true), 32, 32, 0L),
      Multimodal.Asset(4L, "image", Array[Byte](1, 2, 3), 0, 0, 0L) // undecodable
    ).toDS()
    val h = Multimodal.imageHashes(assets).collect().map(x => x.asset_id -> x).toMap
    assert(h(1L).decoded && h(2L).decoded && h(3L).decoded && !h(4L).decoded)
    def words(x: Multimodal.ImageHash) = Seq(x.h0, x.h1, x.h2, x.h3)
    def ham(a: Multimodal.ImageHash, b: Multimodal.ImageHash): Int =
      words(a).zip(words(b)).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    // 256-bit thresholds: the 64-bit ≤6 / >6 dial scaled 4× (24 of 256)
    val d12 = ham(h(1L), h(2L))
    val d13 = ham(h(1L), h(3L))
    assert(d12 <= 24, s"brightness-shifted copy must be a perceptual near-dup, hamming=$d12")
    assert(d13 > 24, s"unrelated image must not pair, hamming=$d13")
    // the BANDED join must also recall the pair: ≥1 of the 8 32-bit
    // bands within Hamming 1 (the v3 multi-probe recall contract the
    // LSH stage rides — mmDedupPairs probes each band key's single-bit
    // neighbors, so a ≤1-flip band is reached)
    def halves(ws: Seq[Long]): Seq[Long] =
      ws.flatMap(w => Seq(w & 0xFFFFFFFFL, (w >>> 32) & 0xFFFFFFFFL))
    assert(halves(words(h(1L))).zip(halves(words(h(2L)))).exists {
        case (x, y) => java.lang.Long.bitCount(x ^ y) <= 1 },
      s"planted near-dup must have a ≤1-flip 32-bit band: ${words(h(1L))} vs ${words(h(2L))}")
    // and the dhash survives a re-encode (PNG -> raster -> PNG)
    val re = graft.operators.Codecs.encodePng(
      graft.operators.Codecs.decodeImage(img(0, unrelated = false)).get)
    val hr = graft.operators.Codecs.dhash256(
      graft.operators.Codecs.decodeImage(re).get).toSeq
    assert(hr == words(h(1L)), "dhash must be stable under lossless re-encode")
  }

  test("mm_audio_dedup: re-leveled copy fingerprints equal, different tone differs") {
    import spark.implicits._
    def tone(freq: Double, amp: Double): Array[Byte] = {
      // amplitude-modulated tone so the energy ENVELOPE carries shape
      val samples = Array.tabulate[Short](8000) { i =>
        val env = 0.5 + 0.5 * math.sin(2 * math.Pi * freq * i / 8000.0)
        (math.sin(2 * math.Pi * 440.0 * i / 8000.0) * env * amp * 32767 * 0.9).toShort
      }
      graft.operators.Codecs.encodeWavPcm16(samples, 8000)
    }
    val assets = Seq(
      Multimodal.Asset(1L, "audio", tone(3.0, 1.0), 0, 0, 1000L),
      Multimodal.Asset(2L, "audio", tone(3.0, 0.5), 0, 0, 1000L), // half volume — same envelope shape
      Multimodal.Asset(3L, "audio", tone(11.0, 1.0), 0, 0, 1000L), // different modulation
      Multimodal.Asset(4L, "audio", Array[Byte](9, 9), 0, 0, 0L)
    ).toDS()
    val h = Multimodal.audioHashes(assets).collect().map(x => x.asset_id -> x).toMap
    assert(h(1L).decoded && h(2L).decoded && h(3L).decoded && !h(4L).decoded)
    def words(x: Multimodal.AudioHash) = Seq(x.h0, x.h1, x.h2, x.h3)
    def ham(a: Multimodal.AudioHash, b: Multimodal.AudioHash): Int =
      words(a).zip(words(b)).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val d12 = ham(h(1L), h(2L))
    val d13 = ham(h(1L), h(3L))
    assert(d12 <= 24, s"re-leveled copy must match (amplitude-invariant), hamming=$d12")
    assert(d13 > 24, s"different envelope must not match, hamming=$d13")
    def halves(ws: Seq[Long]): Seq[Long] =
      ws.flatMap(w => Seq(w & 0xFFFFFFFFL, (w >>> 32) & 0xFFFFFFFFL))
    assert(halves(words(h(1L))).zip(halves(words(h(2L)))).exists {
        case (x, y) => java.lang.Long.bitCount(x ^ y) <= 1 },
      "re-leveled copy must have a ≤1-flip 32-bit band for the LSH stage")
  }

  test("mm_pdf_images: a JPEG planted in two PDFs pairs across documents") {
    import spark.implicits._
    // The end-to-end composition contract (r14 verdict ask #7): the
    // SAME raster (one with a mild +8 brightness lift — byte-different
    // JPEGs, perceptually identical) embedded as /DCTDecode image
    // XObjects in TWO different PDFs must surface as a cross-PDF
    // near-dup pair through extract → dHash → band join → Hamming
    // verify; each PDF's unrelated second image must not pair.
    def jpeg(bright: Int, unrelated: Boolean): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v0 = if (unrelated) ((x * 11) ^ (y * 5)) * 13 % 256
                 else (x * 5 + y * 3) % 256
        val v = math.min(255, v0 + bright)
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", b)
      b.toByteArray
    }
    def pdf(jpgs: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      w("%PDF-1.4\n")
      jpgs.zipWithIndex.foreach { case (j, i) =>
        w(s"${i + 1} 0 obj << /Subtype /Image /Width 32 /Height 32 " +
          s"/Filter /DCTDecode /Length ${j.length} >> stream\n")
        out.write(j); w("\nendstream endobj\n")
      }
      w("%%EOF\n")
      out.toByteArray
    }
    val pdfs = Seq(
      (10L, pdf(Seq(jpeg(0, unrelated = false), jpeg(0, unrelated = true)))),
      (20L, pdf(Seq(jpeg(8, unrelated = false)))))
    val extracted = pdfs.flatMap { case (pid, bytes) =>
      // imageStreams: the unified production surface (same ordinal
      // space as Ingest.readPdfImages and the mmfp_pdf builder)
      graft.sources.PdfText.imageStreams(bytes).zipWithIndex.map { case (j, i) =>
        Multimodal.Asset(pid + i, "image", j, 32, 32, 0L)
      }
    }
    assert(extracted.map(_.asset_id).sorted == Seq(10L, 11L, 20L),
      s"extraction must surface all planted JPEGs in stream order: ${extracted.map(_.asset_id)}")
    val fp = Multimodal.imageHashes(extracted.toDS()).toDF()
      .select($"asset_id", $"h0", $"h1", $"h2", $"h3", $"decoded")
    assert(fp.filter(!$"decoded").count() == 0, "every extracted JPEG must real-decode")
    val pairs = graft.queries.ExtensibilityOps.mmDedupPairs(fp)
      .select($"id_a", $"id_b", $"hamming", $"perceptual")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(pairs.exists { case (a, b, h, p) => a == 10L && b == 20L && h <= 24 && p },
      s"the cross-PDF planted pair must surface: ${pairs.toSeq}")
    assert(!pairs.exists { case (a, b, _, _) => a == 11L || b == 11L },
      s"the unrelated image must not pair: ${pairs.toSeq}")
  }

  test("mm band recall: uniformly-spread flips pair under multi-probe where exact 64-bit bands could not") {
    import spark.implicits._
    // The r16 ADVICE medium, demonstrated at the fingerprint level:
    // 8 flips placed ONE PER 32-bit half-word dirty every 64-bit word
    // (the retired 4×64 exact-band join has no clean band — the pair
    // was silently never a candidate) but leave every 32-bit band at
    // exactly Hamming 1, which the probe-1 ring reaches. hamming=8 is
    // well inside the ≤24 verify, so the only thing between this pair
    // and the output is candidate RECALL.
    val base = Seq(0x1234567890ABCDEFL, -0x0FEDCBA987654322L,
      0x0F0F0F0F0F0F0F0FL, 0x7A7A7A7A7A7A7A7AL)
    val flipped = base.map(w => w ^ ((1L << 7) | (1L << 39))) // one flip per half
    val fp = Seq(
      (1L, base(0), base(1), base(2), base(3), true),
      (2L, flipped(0), flipped(1), flipped(2), flipped(3), true)
    ).toDF("asset_id", "h0", "h1", "h2", "h3", "decoded")
    val pairs = graft.queries.ExtensibilityOps.mmDedupPairs(fp)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 8L, true)),
      s"8 uniformly-spread flips must be recalled by the probe-1 band ring: $pairs")
    // and the guarantee boundary: 15 flips (pigeonhole: some band ≤1)
    val flip15 = base.zipWithIndex.map { case (w, i) =>
      // 4+4+4+3 flips across the words, two per half except the last
      val bits = (0 until (if (i == 3) 3 else 4)).map(b => 1L << (b * 13 + i))
      w ^ bits.reduce(_ | _)
    }
    val fp15 = Seq(
      (1L, base(0), base(1), base(2), base(3), true),
      (2L, flip15(0), flip15(1), flip15(2), flip15(3), true)
    ).toDF("asset_id", "h0", "h1", "h2", "h3", "decoded")
    val p15 = graft.queries.ExtensibilityOps.mmDedupPairs(fp15)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(p15.map(t => (t._1, t._2, t._3)) == Seq((1L, 2L, 15L)),
      s"d=15 is inside the pigeonhole guarantee: $p15")
  }

  test("mm_video_dedup: temporal mean pairs re-encodes and separates shared intros (first-frame hash does neither)") {
    import spark.implicits._
    val vids = Multimodal.syntheticVideos(spark, 42)
      .map { case (id, bytes) => Multimodal.Asset(id, "video", bytes, 16, 16, 1000L) }
    // the TEMPORAL fingerprint: planted +2-brightness re-encode dups
    // (id ≡ 3 mod 7 copies id−1) pair; shared-intro classes (frame 0
    // byte-identical across id % 5) do not
    val fp = Multimodal.videoHashes(vids).toDF()
    assert(fp.filter(!$"decoded").count() == 0, "every GIF must real-decode")
    val pairs = graft.queries.ExtensibilityOps.mmDedupPairs(fp)
      .as[(Long, Long, Long, Boolean)].collect().toSeq.map(t => (t._1, t._2))
    val planted = (0L until 42L).filter(i => i % 7 == 3 && i > 0).map(i => (i - 1, i))
    assert(pairs.sorted == planted.sorted,
      s"temporal pairs must be exactly the planted re-encodes: got $pairs want $planted")
    // the FALSE-DUP class the temporal hash retires: first-frame
    // hashes (what mm_image_dedup's video rows use) read two
    // same-intro-class, different-tail videos as IDENTICAL
    val ff = Multimodal.imageHashes(vids).collect().map(x => x.asset_id -> x).toMap
    def words(x: Multimodal.ImageHash) = Seq(x.h0, x.h1, x.h2, x.h3)
    // ids 0 and 5 share intro class (0 % 5 == 5 % 5) and neither is a
    // planted re-encode of the other
    assert(words(ff(0L)) == words(ff(5L)),
      "shared-intro videos must collide under the first-frame hash (the gap being closed)")
    assert(!pairs.contains((0L, 5L)),
      "the temporal fingerprint must NOT pair shared-intro, different-tail videos")
  }

  test("mm_dedup_incremental: agrees with the full-corpus entry on every batch-straddling pair, and only those") {
    import spark.implicits._
    // planted fingerprint table spanning the asset_id % 10 == 7 batch
    // split: 7↔21 a near-dup straddling pair (d=3), 17↔27 an exact dup
    // INSIDE the batch (must NOT appear — both sides are batch),
    // 1↔2 a near-dup inside the store (must NOT appear), 37↔5 a
    // straddling exact pair, 9 unrelated
    val base = 0x0123456789ABCDEFL
    def fp(id: Long, h0: Long, dec: Boolean = true) =
      (id, h0, ~h0, h0 ^ 0x5555555555555555L, h0 + 99L, dec)
    val rows = Seq(
      fp(7L, base), fp(21L, base ^ 0x7L),            // straddling near (d=3)
      fp(17L, base << 1), fp(27L, base << 1),        // batch-internal exact
      fp(1L, ~base), fp(2L, ~base ^ 0x1L),           // store-internal near
      fp(37L, 0x42L), fp(5L, 0x42L),                 // straddling exact
      fp(9L, 0x7777000077770000L))
      .toDF("asset_id", "h0", "h1", "h2", "h3", "decoded")
    val inc = graft.queries.ExtensibilityOps.mmDedupIncremental(rows)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exactly the straddling pairs, oriented batch→store
    assert(inc === Set((7L, 21L), (37L, 5L)), s"got $inc")
    // consistency with the full-corpus surface: the straddling subset
    // of mmDedupPairs (normalized to unordered pairs) must be identical
    val full = graft.queries.ExtensibilityOps.mmDedupPairs(rows)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .map { case (a, b) => Set(a, b) }
      .filter(p => p.exists(_ % 10 == 7) && p.exists(_ % 10 != 7)).toSet
    assert(inc.map { case (a, b) => Set(a, b) } === full)
  }

  test("asset schema contract is stable") {
    assert(Multimodal.assetSchema.fieldNames.toSeq ==
      Seq("asset_id", "modality", "data", "width", "height", "duration_ms"))
    import spark.implicits._
    val df = Multimodal.syntheticAssets(spark, 3).toDF()
    assert(df.schema("data").dataType.typeName == "binary")
  }
}
