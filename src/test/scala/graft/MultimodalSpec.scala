package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Multimodal

/** Multimodal plumbing: real schemas/partitioning/batch shape around a
  * stubbed codec.
  */
class MultimodalSpec extends SparkSpecBase {

  import spark.implicits._

  private def media() = {
    val df = Seq(
      (1L, "red pixel data here"),
      (2L, "another blob of image bytes")).toDF("id", "txt")
      .withColumn("blob", encode(col("txt"), "UTF-8"))
    Multimodal.fromBinary(df, "id", "blob", kind = "image", width = 4, height = 3)
  }

  test("binary + metadata schema round-trips through parquet") {
    val dir = tmpDir("mm")
    media().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType == BinaryType)
    val meta = back.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSet == Set("kind", "width", "height", "sampleRate", "nFrames"))
    assert(back.count() == 2)
  }

  test("decode produces width*height planes, deterministic") {
    val out = Multimodal.decode(media()).collect().sortBy(_.media_id)
    assert(out.forall(_.pixels.length == 12))
    val again = Multimodal.decode(media()).collect().sortBy(_.media_id)
    assert(out.map(_.pixels.toSeq).toSeq == again.map(_.pixels.toSeq).toSeq)
  }

  test("feature extraction yields fixed-dim vectors usable downstream") {
    val feats = Multimodal.extractFeatures(media(), dim = 8)
    val df = feats.toDF()
    assert(df.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    // downstream: join features with a dimension table and aggregate
    val dims = Seq(("image", "img-pipeline")).toDF("kind", "pipeline")
    val n = df.join(broadcast(dims), "kind").groupBy("pipeline").count().collect()(0)
    assert(n.getLong(1) == 2)
  }

  test("resize rewrites the plane and the metadata") {
    val out = Multimodal.resize(media(), 2, 2).collect().head
    assert(out.pixels.length == 4)
    assert(out.meta.width == 2 && out.meta.height == 2)
  }

  test("frame sampling explodes 1→N rows, partition-local") {
    val df = Seq((7L, "0123456789abcdef")).toDF("id", "txt")
      .withColumn("blob", encode(col("txt"), "UTF-8"))
    val vid = Multimodal.fromBinary(df, "id", "blob", "video", 0, 0, nFrames = 4)
    val frames = Multimodal.sampleFrames(vid, every = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames.forall(_.content.length == 4))
  }

  test("empty blobs decode and frame-sample without crashing") {
    val df = Seq((9L, "")).toDF("id", "txt")
      .withColumn("blob", encode(col("txt"), "UTF-8"))
    val m = Multimodal.fromBinary(df, "id", "blob", "image", 2, 2, nFrames = 2)
    val dec = Multimodal.decode(m).collect().head
    assert(dec.pixels.toSeq == Seq(0f, 0f, 0f, 0f))
    val frames = Multimodal.sampleFrames(m, every = 1).collect()
    assert(frames.length == 2 && frames.forall(_.content.isEmpty))
  }
}
