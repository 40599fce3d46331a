package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder north star: image/audio/video as
  * opaque binary columns with typed metadata).
  *
  * The decode/feature-extract kernels are STUBBED with deterministic
  * fakes — the container has no image/audio codecs — but everything
  * Spark-side is real: the schema contract, the per-partition batched
  * execution (`mapPartitions`, the Scala analogue of `mapInPandas` —
  * one iterator pass per partition, no per-row task overhead), the
  * output shapes, and the partitioning. A production build replaces
  * only the `fake*` kernels with real codec calls; every signature
  * stays fixed.
  *
  * Scale notes: binary payloads ride the shuffle only when explicitly
  * repartitioned; featurize emits fixed-width vectors (predictable
  * memory); frame sampling bounds output rows per asset.
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

  /** STUB decode kernel: a real build calls the image codec here.
    * The fake derives a deterministic 8-float signature from payload
    * bytes so downstream plumbing is testable offline.
    */
  private def fakeDecodeFeatures(data: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    if (data != null) {
      var i = 0
      while (i < data.length) { out(i % 8) += (data(i) & 0xff) / 255.0f; i += 1 }
    }
    out
  }

  /** STUB resize kernel: real build = codec resize; fake = truncate/pad
    * payload to `w*h` bytes, keeping the byte-budget contract.
    */
  private def fakeResize(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(w * h, 1)
    val d = if (data == null) Array.emptyByteArray else data
    java.util.Arrays.copyOf(d, n)
  }

  /** Batched feature extraction — one kernel invocation stream per
    * partition (the `mapInPandas` shape): iterator in, iterator out,
    * constant memory per partition.
    */
  def featurize(assets: Dataset[Asset]): Dataset[Feature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val f = fakeDecodeFeatures(a.data)
        Feature(a.asset_id, a.modality, f.length, f)
      }
    }
  }

  /** Resize pass for image assets; non-images pass through untouched. */
  def resizeImages(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.modality == "image")
          a.copy(data = fakeResize(a.data, w, h), width = w, height = h)
        else a
      }
    }
  }

  /** Frame sampling for video assets: every `everyMs` milliseconds,
    * bounded rows per asset (duration/everyMs). STUB frame extraction
    * slices the payload deterministically.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").flatMap { a =>
      val n = math.max((a.duration_ms / math.max(everyMs, 1L)).toInt, 0)
      (0 until n).map { i =>
        val d = if (a.data == null) Array.emptyByteArray else a.data
        val sliceStart = if (d.isEmpty) 0 else (i * 16) % math.max(d.length, 1)
        Frame(a.asset_id, i,
          java.util.Arrays.copyOfRange(d, sliceStart, math.min(sliceStart + 16, d.length)))
      }
    }
  }

  final case class AudioWindow(asset_id: Long, window_idx: Int,
                               start_ms: Long, window: Array[Byte])

  /** Overlapping fixed-length windows over audio assets — the
    * spectrogram/feature-prep shape (window + hop). Offsets map time to
    * payload bytes through a STUB bytes-per-ms rate (a real build
    * decodes PCM and windows samples; the window/hop arithmetic, bounded
    * output rows per asset, and iterator-batched execution are the real
    * contract). Output rows per asset = ceil((duration-window)/hop)+1,
    * bounded by duration — never unbounded amplification.
    */
  def windowAudio(assets: Dataset[Asset], windowMs: Long, hopMs: Long): Dataset[AudioWindow] = {
    import assets.sparkSession.implicits._
    val bytesPerMs = 1L // stub decode rate
    assets.filter(_.modality == "audio").flatMap { a =>
      val d = if (a.data == null) Array.emptyByteArray else a.data
      val hop = math.max(hopMs, 1L)
      val starts = 0L to math.max(a.duration_ms - windowMs, 0L) by hop
      starts.zipWithIndex.map { case (startMs, i) =>
        val b0 = ((startMs * bytesPerMs) % math.max(d.length, 1)).toInt
        val b1 = math.min(b0 + (windowMs * bytesPerMs).toInt, d.length)
        AudioWindow(a.asset_id, i, startMs,
          java.util.Arrays.copyOfRange(d, b0, math.max(b1, b0)))
      }
    }
  }

  /** Deterministic synthetic asset table for specs/demos: payload bytes
    * derived from asset_id, three modalities round-robin.
    */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val mod = Seq("image", "audio", "video")(id.toInt % 3)
      val data = Array.tabulate[Byte](64)(i => ((id * 31 + i * 7) % 256).toByte)
      Asset(id, mod, data, 8, 8, 1000L + id * 100)
    }
  }
}
