package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("decode: binary payload column -> typed media metadata, partition-batched") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.docsAsMedia(spark, docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val decoded = Multimodal.decode(spark, media.repartition(5))
    val rows = decoded.collect()
    assert(rows.length === docs.count())
    rows.foreach { m =>
      assert(m.n_bytes > 0)
      assert(m.width >= 64 && m.width < 512)
      assert(m.height >= 64 && m.height < 512)
      assert(m.n_frames >= 1 && m.n_frames <= 16)
      assert(m.feature.size === Multimodal.FeatureDim)
      assert(m.feature.forall(f => f >= 0f && f < 1f))
    }
  }

  test("resize: aspect-preserving fit into the target box, never upscales") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val decoded = Multimodal.decode(spark, Multimodal.docsAsMedia(spark, docs))
    val resized = Multimodal.resize(decoded, maxW = 128, maxH = 96).collect()
    val orig = decoded.collect().map(m => m.doc_id -> m).toMap
    resized.foreach { r =>
      val o = orig(r.doc_id)
      assert(r.width <= 128 && r.height <= 96, s"${r.doc_id} out of box")
      assert(r.width <= o.width && r.height <= o.height, "resize must not upscale")
      // aspect preserved within integer-floor tolerance
      val s = math.min(1.0, math.min(128.0 / o.width, 96.0 / o.height))
      assert(r.width === math.max(1, math.floor(o.width * s).toInt))
      assert(r.height === math.max(1, math.floor(o.height * s).toInt))
      assert(r.feature === o.feature, "embedding is resolution-invariant")
    }
  }

  test("frame sampling: every k-th frame, fan-out matches n_frames exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val decoded = Multimodal.decode(spark, Multimodal.docsAsMedia(spark, docs))
    val k = 4
    val frames = Multimodal.sampleFrames(decoded, everyK = k).collect()
    val byDoc = frames.groupBy(_.doc_id)
    decoded.collect().foreach { m =>
      val fs = byDoc(m.doc_id).map(_.frame_idx).sorted.toSeq
      assert(fs === (0 until m.n_frames by k).toSeq, s"doc ${m.doc_id}")
    }
    // per-frame features differ across frames of the same doc
    byDoc.values.filter(_.length > 1).take(5).foreach { rs =>
      assert(rs.map(_.frame_feature).distinct.length === rs.length)
    }
  }

  test("decode is deterministic and partition-layout-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.docsAsMedia(spark, docs)
    val a = Multimodal.decode(spark, media.repartition(3)).collect().sortBy(_.doc_id).toSeq
    val b = Multimodal.decode(spark, media.repartition(11)).collect().sortBy(_.doc_id).toSeq
    assert(a === b)
  }
}
