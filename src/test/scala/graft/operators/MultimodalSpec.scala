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

  test("decode is deterministic and partition-layout-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.docsAsMedia(spark, docs)
    val a = Multimodal.decode(spark, media.repartition(3)).collect().sortBy(_.doc_id).toSeq
    val b = Multimodal.decode(spark, media.repartition(11)).collect().sortBy(_.doc_id).toSeq
    assert(a === b)
  }
}
