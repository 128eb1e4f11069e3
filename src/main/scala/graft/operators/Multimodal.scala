package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction / resize / frame sampling run as partition-local batch
  * transforms (`mapPartitions` — the Scala analogue of `mapInPandas`).
  *
  * The actual codec calls are STUBBED with deterministic fakes (the
  * image/audio libraries are not in this container); everything
  * Spark-side — schemas, encoders, partitioning, batch shape, the
  * pipeline composition — is real and tested. Swapping `FakeCodec` for
  * a JNI/javacv codec changes no plumbing.
  *
  * Scale notes: media blobs never pass through a shuffle in these
  * transforms (narrow mapPartitions); feature vectors (small) are what
  * downstream joins/aggregations shuffle. Partitioning stays whatever
  * the source had — repartition by size before heavy decode stages so
  * each task holds a bounded number of blobs in memory.
  */
object Multimodal {

  /** A media row: blob + typed metadata. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
                             sampleRate: Int, nFrames: Int)
  final case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class DecodedRecord(media_id: Long, meta: MediaMeta,
                                 pixels: Array[Float])
  final case class FeatureRecord(media_id: Long, kind: String,
                                 features: Array[Float])
  final case class FrameRecord(media_id: Long, frame_idx: Int,
                               content: Array[Byte])

  /** Deterministic stand-ins for the real codecs. */
  object FakeCodec {
    /** "Decode" bytes to a float plane of width×height (stub: byte
      * values normalized; a real impl calls the image decoder here).
      */
    def decode(content: Array[Byte], w: Int, h: Int): Array[Float] = {
      val n = math.max(1, w * h)
      if (content.isEmpty) new Array[Float](n) // empty blob → zero plane
      else Array.tabulate(n)(i => (content(i % content.length) & 0xff) / 255.0f)
    }

    /** "Feature-extract": fixed-width pooled means over the plane. */
    def features(pixels: Array[Float], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < pixels.length) { out(i % dim) += pixels(i); i += 1 }
      val per = math.max(1, pixels.length / dim)
      var j = 0
      while (j < dim) { out(j) /= per; j += 1 }
      out
    }

    /** "Resize": nearest-neighbor index mapping on the fake plane. */
    def resize(pixels: Array[Float], w: Int, h: Int, w2: Int, h2: Int): Array[Float] =
      Array.tabulate(w2 * h2) { i =>
        val (x2, y2) = (i % w2, i / w2)
        val x = math.min(w - 1, x2 * w / math.max(1, w2))
        val y = math.min(h - 1, y2 * h / math.max(1, h2))
        pixels(math.min(pixels.length - 1, y * w + x))
      }

    /** "Frame-sample": deterministic byte-range slices as frames. */
    def sampleFrames(content: Array[Byte], nFrames: Int, every: Int): Seq[(Int, Array[Byte])] = {
      val step = math.max(1, every)
      if (content.isEmpty) // empty blob → empty frames, same frame ids
        return (0 until nFrames by step).map(f => (f, Array.emptyByteArray))
      (0 until nFrames by step).map { f =>
        val sz = math.max(1, content.length / math.max(1, nFrames))
        val from = math.min(content.length - 1, f * sz)
        (f, java.util.Arrays.copyOfRange(content, from, math.min(content.length, from + sz)))
      }
    }
  }

  /** Decode a media dataset: batch transform, one task per partition,
    * no shuffle.
    */
  def decode(ds: Dataset[MediaRecord]): Dataset[DecodedRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      DecodedRecord(r.media_id, r.meta,
        FakeCodec.decode(r.content, r.meta.width, r.meta.height))
    })
  }

  /** Decode → pooled feature vector, fused in one partition pass. */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 8): Dataset[FeatureRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val px = FakeCodec.decode(r.content, r.meta.width, r.meta.height)
      FeatureRecord(r.media_id, r.meta.kind, FakeCodec.features(px, dim))
    })
  }

  /** Resize into a new plane size; metadata follows the content. */
  def resize(ds: Dataset[MediaRecord], w2: Int, h2: Int): Dataset[DecodedRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val px = FakeCodec.decode(r.content, r.meta.width, r.meta.height)
      DecodedRecord(r.media_id, r.meta.copy(width = w2, height = h2),
        FakeCodec.resize(px, r.meta.width, r.meta.height, w2, h2))
    })
  }

  /** Explode videos into frame rows (1→N flatMap, still narrow). */
  def sampleFrames(ds: Dataset[MediaRecord], every: Int = 1): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      FakeCodec.sampleFrames(r.content, r.meta.nFrames, every)
        .map { case (i, bytes) => FrameRecord(r.media_id, i, bytes) }
    }
  }

  /** Build a media dataset from any DataFrame with an id and a binary
    * column plus literal metadata — the ingestion adapter.
    */
  def fromBinary(df: DataFrame, idCol: String, binCol: String,
                 kind: String, width: Int, height: Int,
                 sampleRate: Int = 0, nFrames: Int = 0): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).as("content"),
      struct(
        lit(kind).as("kind"), lit(width).as("width"), lit(height).as("height"),
        lit(sampleRate).as("sampleRate"), lit(nFrames).as("nFrames")).as("meta"))
      .as[MediaRecord]
  }
}
