package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{Blob, BlobFeatures, StubDecoder}

class MultimodalSpec extends SparkSpecBase {

  test("asBlobs sniffs modality and format from magic bytes") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)),
      (2L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 3)),
      (3L, Array[Byte](0x49, 0x44, 0x33, 0x04, 5)),
      (4L, "plain text".getBytes("UTF-8"))).toDF("id", "bin")
    val blobs = Multimodal.asBlobs(rows, "id", "bin")
      .collect().map(b => b.blob_id -> ((b.modality, b.format))).toMap
    assert(blobs(1L) == (("image", "jpeg")))
    assert(blobs(2L) == (("image", "png")))
    assert(blobs(3L) == (("audio", "mp3")))
    assert(blobs(4L) == (("text", "raw")))
  }

  test("stub decoder computes exact byte statistics in partition batches") {
    val s = spark
    import s.implicits._
    val content = Array[Byte](0, 100, 200.toByte) // unsigned: 0,100,200
    val blobs = Seq(Blob(7L, "text", "raw", 3L, content)).toDS()
    val f = Multimodal.extractFeatures(blobs, StubDecoder).head()
    assert(f.byte_sum == 300L)
    assert(f.mean_byte == 100.0)
    assert(f.frames == 1)
    assert(f.vec.toSeq == Seq(1.0, 1.0, 0.0, 1.0)) // bins of 64: 0→0, 100→1, 200→3
  }

  test("resizeVec area-averages source bins into the target shape") {
    val s = spark
    import s.implicits._
    val f = Seq(
      BlobFeatures(1L, "image", 4L, 0L, 0.0, 1, Array(1.0, 3.0, 5.0, 7.0)))
      .toDS()
    // 4 -> 2: pairwise means; 4 -> 4: identity; 4 -> 1: global mean
    def resized(dim: Int) = Multimodal.resizeVec(f, dim)
      .select($"vec_resized").as[Seq[Double]].head()
    assert(resized(2) == Seq(2.0, 6.0))
    assert(resized(4) == Seq(1.0, 3.0, 5.0, 7.0))
    assert(resized(1) == Seq(4.0))
    // empty decoded vector: null, never a fabricated all-zero vector
    val empty = Seq(BlobFeatures(2L, "image", 0L, 0L, 0.0, 1, Array.empty))
      .toDS()
    assert(Multimodal.resizeVec(empty, 2).select($"vec_resized").head.isNullAt(0))
  }

  test("sampleFrames keeps every stride-th frame index") {
    val s = spark
    import s.implicits._
    val blobs = Seq(Blob(1L, "video", "raw", 5000L, new Array[Byte](5000))).toDS()
    val f = Multimodal.extractFeatures(blobs, StubDecoder) // 5000/1024+1 = 5 frames
    val sampled = Multimodal.sampleFrames(f, stride = 2)
      .select("frame_idx").as[Int].collect().sorted
    assert(sampled.toSeq == Seq(0, 2, 4))
  }
}
