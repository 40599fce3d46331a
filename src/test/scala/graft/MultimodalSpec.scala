package graft

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema, batched kernel execution,
  * output shapes, determinism. The decode kernels are stubbed (documented
  * in Multimodal.scala) — these specs pin the Spark-side contract.
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

  test("resizeImages: only image modality touched, byte budget w*h") {
    val out = Multimodal.resizeImages(Multimodal.syntheticAssets(spark, 9), 4, 4).collect()
    val images = out.filter(_.modality == "image")
    val others = out.filter(_.modality != "image")
    assert(images.nonEmpty && images.forall(a => a.data.length == 16 && a.width == 4 && a.height == 4))
    assert(others.forall(a => a.data.length == 64 && a.width == 8))
  }

  test("sampleFrames: bounded rows per asset = duration/everyMs") {
    val frames = Multimodal.sampleFrames(Multimodal.syntheticAssets(spark, 9), 500L).collect()
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset.nonEmpty)
    byAsset.foreach { case (id, fs) =>
      val dur = 1000L + id * 100
      assert(fs.length == (dur / 500L).toInt, s"asset $id")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length).toSeq)
    }
  }

  test("windowAudio: audio-only, hop-spaced starts, bounded window count") {
    val out = Multimodal.windowAudio(Multimodal.syntheticAssets(spark, 9), 500L, 250L)
      .collect().groupBy(_.asset_id)
    val assets = Multimodal.syntheticAssets(spark, 9).collect()
    assert(out.keySet == assets.filter(_.modality == "audio").map(_.asset_id).toSet,
      "only audio assets produce windows")
    for ((id, ws) <- out) {
      val dur = assets.find(_.asset_id == id).get.duration_ms
      val expected = ((dur - 500L) / 250L).toInt + 1
      assert(ws.length == expected, s"asset $id: ${ws.length} windows, expected $expected")
      val sorted = ws.sortBy(_.window_idx)
      assert(sorted.map(_.start_ms).toSeq == (0 until expected).map(_ * 250L),
        "starts must be hop-spaced from 0")
      assert(ws.forall(_.window.length <= 500), "window bytes bounded by windowMs budget")
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

  test("asset schema contract is stable") {
    assert(Multimodal.assetSchema.fieldNames.toSeq ==
      Seq("asset_id", "modality", "data", "width", "height", "duration_ms"))
    import spark.implicits._
    val df = Multimodal.syntheticAssets(spark, 3).toDF()
    assert(df.schema("data").dataType.typeName == "binary")
  }
}
