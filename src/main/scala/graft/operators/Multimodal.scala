package graft.operators

import graft.util.XxHash64

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode / feature-extraction runs batched per
  * partition. The actual image/audio decoding libraries do NOT exist in
  * this container, so the decode kernel below is an explicitly marked
  * deterministic STUB — the Spark-side contract (schema, batching,
  * partition-parallel execution, typed output) is real and tested, and a
  * real decoder drops into [[decodeKernel]] without touching the plan.
  */
object Multimodal {

  /** Typed decoded-media row. `feature` is a fixed-width embedding the way
    * a real vision tower would emit one.
    */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Seq[Float])

  val FeatureDim = 8

  /** STUB decode kernel: a real implementation would decode image/video
    * bytes (libjpeg/ffmpeg) and run feature extraction; this sandbox has no
    * media libs, so features derive deterministically from the payload
    * bytes. Signature and batch shape are the real contract.
    */
  def decodeKernel(docId: Long, payload: Array[Byte]): MediaMeta = {
    val h = XxHash64.hash(payload, 0L)
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = 64 + java.lang.Math.floorMod(h, 448L).toInt,
      height = 64 + java.lang.Math.floorMod(h >>> 16, 448L).toInt,
      n_frames = 1 + java.lang.Math.floorMod(h >>> 32, 15L).toInt,
      feature = (0 until FeatureDim).map { i =>
        (java.lang.Math.floorMod(XxHash64.hash(payload, i.toLong), 1000L) / 1000.0f)
      })
  }

  /** Decode a binary payload column partition-batched: one kernel-warmup
    * per partition (the way a real decoder amortizes model/codec init),
    * then streamed rows. Input df must have (doc_id: long, payload: binary).
    */
  def decode(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // a real decoder initializes its codec/session HERE, once per batch
        batch.map { case (id, bytes) => decodeKernel(id, bytes) }
      }
  }

  /** Documents-as-media fixture: treats the text bytes as an opaque payload
    * (this sandbox has no real media corpus).
    */
  def docsAsMedia(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long"), encode(col("text"), "UTF-8").as("payload"))

  /** STUB resize kernel: a real implementation rescales decoded pixels; the
    * stub recomputes the typed metadata a resize produces (aspect-preserving
    * fit into maxW × maxH, feature unchanged — embeddings are
    * resolution-invariant in a real tower too). Deterministic.
    */
  def resizeKernel(m: MediaMeta, maxW: Int, maxH: Int): MediaMeta = {
    val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
    m.copy(
      width = math.max(1, math.floor(m.width * scale).toInt),
      height = math.max(1, math.floor(m.height * scale).toInt))
  }

  /** Aspect-preserving resize over decoded media, partition-batched like
    * [[decode]] (a real resizer amortizes its buffers the same way).
    */
  def resize(media: Dataset[MediaMeta], maxW: Int, maxH: Int): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(resizeKernel(_, maxW, maxH)))
  }

  /** One sampled frame of a media payload. */
  case class FrameRow(doc_id: Long, frame_idx: Int, frame_feature: Seq[Float])

  /** Frame sampling: every `everyK`-th frame of each decoded medium, with a
    * deterministic per-frame feature (STUB — a real sampler seeks/decodes
    * the frame; the fan-out shape, schema and per-frame feature contract
    * are real). One input row explodes to ceil(n_frames / everyK) rows.
    */
  def sampleFrames(media: Dataset[MediaMeta], everyK: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(everyK >= 1)
    media.flatMap { m =>
      (0 until m.n_frames by everyK).map { f =>
        FrameRow(m.doc_id, f,
          m.feature.zipWithIndex.map { case (x, i) =>
            // stub per-frame drift: a real sampler would emit the frame's
            // own embedding; offset keeps frames distinguishable + exact
            (x + f.toFloat / 16f + i * 0f)
          })
      }
    }
  }
}
