package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * content travels as an opaque `binary` column plus typed metadata,
  * and decode/feature-extract runs as a partition-batched function over
  * the bytes — the Scala analogue of a vectorized Python UDF stage.
  *
  * The DECODE step is a deliberate STUB (`StubDecoder`): this
  * environment has no image/audio codec libraries, so it computes
  * deterministic byte-level features standing in for real pixel/sample
  * decoding. Everything around it — the blob schema, the pluggable
  * `Decoder` trait, the partition-batch shape, metadata derivation,
  * frame sampling — is the real production plumbing: swap `StubDecoder`
  * for a JNI/codec-backed implementation and nothing else changes.
  */
object Multimodal {

  /** One media blob: content + the typed metadata a catalog would
    * carry. `modality` ∈ image|audio|video|text; stub rows derive it
    * from magic bytes.
    */
  case class Blob(blob_id: Long, modality: String, format: String,
                  n_bytes: Long, content: Array[Byte])

  /** Decoded per-blob features. For a real image decoder `vec` would be
    * an embedding/pixel-stat vector and `frames` the decoded frame
    * count; the stub fills them from byte statistics.
    */
  case class BlobFeatures(blob_id: Long, modality: String, n_bytes: Long,
                          byte_sum: Long, mean_byte: Double, frames: Int,
                          vec: Array[Double])

  /** The decode seam. Implementations MUST be pure per-blob functions:
    * the engine calls them inside mapPartitions, one partition batch at
    * a time, so state (codec contexts, model sessions) can be hoisted
    * to once-per-partition in `open()`.
    */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(b: Blob): BlobFeatures
  }

  /** STUB: byte-histogram features in place of real decoding.
    * Deterministic: byte_sum mod 1e9+7, mean byte value, a 4-bin byte
    * histogram as the "embedding", and n_bytes/1024+1 as the "frame"
    * count. Replace with a codec-backed Decoder in production.
    */
  object StubDecoder extends Decoder {
    private val P = 1000000007L
    def decode(b: Blob): BlobFeatures = {
      var modSum = 0L
      var rawSum = 0L
      val hist = new Array[Double](4)
      b.content.foreach { byte =>
        val u = byte & 0xff
        modSum = (modSum + u) % P
        rawSum += u
        hist(u / 64) += 1
      }
      val n = b.content.length
      BlobFeatures(b.blob_id, b.modality, n.toLong, modSum,
        if (n == 0) 0.0 else rawSum.toDouble / n,
        frames = n / 1024 + 1, vec = hist)
    }
  }

  /** Wrap a (id, binary) DataFrame into typed blobs, sniffing modality
    * and format from magic bytes — pure expression work, pushes the
    * binary column through untouched.
    */
  def asBlobs(df: DataFrame, idCol: String, binCol: String): Dataset[Blob] = {
    val spark = df.sparkSession
    import spark.implicits._
    val magic = upper(hex(substring(col(binCol), 1, 4)))
    df.select(
      col(idCol).cast("long").as("blob_id"),
      when(magic.startsWith("FFD8FF"), "image")
        .when(magic.startsWith("89504E47"), "image")
        .when(magic.startsWith("494433"), "audio")
        .when(magic.startsWith("664C6143"), "audio")
        .when(magic === "00000018" || magic === "00000020", "video")
        .otherwise("text").as("modality"),
      when(magic.startsWith("FFD8FF"), "jpeg")
        .when(magic.startsWith("89504E47"), "png")
        .when(magic.startsWith("494433"), "mp3")
        .when(magic.startsWith("664C6143"), "flac")
        .otherwise("raw").as("format"),
      length(col(binCol)).cast("long").as("n_bytes"),
      col(binCol).as("content")).as[Blob]
  }

  /** The batched decode stage: one `Decoder` instance per partition,
    * streamed over the blobs — constant memory, no driver involvement,
    * embarrassingly parallel at any scale.
    */
  def extractFeatures(blobs: Dataset[Blob], decoder: Decoder): Dataset[BlobFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      decoder.open()
      it.map(decoder.decode)
    }
  }

  /** Frame sampling: keep every `stride`-th frame index of each blob —
    * the video-pipeline primitive, expressed on the stub's frame count.
    */
  def sampleFrames(features: Dataset[BlobFeatures], stride: Int): DataFrame =
    features.toDF()
      .select(col("blob_id"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize plumbing: rebin each decoded feature vector to `dim` slots
    * by averaging its source bins (area interpolation — what an image
    * resize does per channel, applied to the decoded representation).
    * Pure expression work over the materialized `vec` column; with a
    * real decoder the same stage resizes pixel rows.
    */
  def resizeVec(features: Dataset[BlobFeatures], dim: Int): DataFrame = {
    require(dim >= 1)
    val n = size(col("vec"))
    val bin = (j: org.apache.spark.sql.Column) => {
      val lo = floor(j * n / dim).cast("int")          // 0-based incl.
      val hi = floor((j + 1) * n / dim).cast("int")    // 0-based excl.
      val sliceLen = greatest(hi - lo, lit(1))
      val piece = slice(col("vec"), lo + 1, sliceLen)
      // divide by sliceLen, not size(piece): equal for n >= 1 (hi <= n
      // always) and size(piece) would re-evaluate the slice; the n = 0
      // case is handled by the null guard below
      aggregate(piece, lit(0.0), (a, v) => a + v) / sliceLen
    }
    // empty decoded vector => null resized vector (no data), never a
    // fabricated all-zero feature row
    val resized = when(n > 0, transform(sequence(lit(0), lit(dim - 1)), bin))
      .otherwise(lit(null).cast("array<double>"))
    features.toDF()
      .select(col("blob_id"), col("modality"), col("vec"),
        resized.as("vec_resized"))
  }
}
