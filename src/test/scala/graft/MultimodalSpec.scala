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

  test("ImageHeader parses real JPEG SOF0 / PNG IHDR dimensions and refuses garbage") {
    import Multimodal.ImageHeader._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val pngSig = Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    def png(w: Int, h: Int) = bytes(pngSig ++ Seq(0, 0, 0, 0x0D,
      'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff,
      8, 2, 0, 0, 0, 0, 0, 0, 0): _*)
    assert(pngDims(png(640, 480)) == Some((640, 480)))
    assert(pngDims(png(70000, 3)) == Some((70000, 3))) // >16-bit dims are legal in PNG
    assert(pngDims(png(0, 480)).isEmpty)               // zero dimension is invalid
    assert(pngDims(bytes(pngSig: _*)).isEmpty)         // truncated before IHDR
    assert(pngDims(png(1, 1).patch(12, bytes('J'.toInt), 1)).isEmpty) // wrong chunk tag

    def sof0(w: Int, h: Int) = bytes(0xFF, 0xC0, 0x00, 0x11, 0x08,
      h >> 8, h & 0xff, w >> 8, w & 0xff,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val soi = bytes(0xFF, 0xD8)
    val app0 = bytes(0xFF, 0xE0, 0x00, 0x04, 1, 2) // 4-byte APP0 to skip over
    val dht = bytes(0xFF, 0xC4, 0x00, 0x03, 9)     // C4 is DHT, NOT a frame header
    assert(jpegDims(soi ++ sof0(800, 600)) == Some((800, 600)))
    assert(jpegDims(soi ++ app0 ++ dht ++ sof0(31, 13)) == Some((31, 13)))
    // fill bytes before a marker and a standalone RST0 are walked over
    assert(jpegDims(soi ++ bytes(0xFF, 0xFF, 0xD0) ++ sof0(5, 7)) == Some((5, 7)))
    // SOS or EOI before any SOF: no dimensions, never a fabricated pair
    assert(jpegDims(soi ++ bytes(0xFF, 0xDA, 0x00, 0x02) ++ sof0(5, 7)).isEmpty)
    assert(jpegDims(soi ++ app0 ++ "payload".getBytes("UTF-8")).isEmpty) // lost sync
    assert(jpegDims(bytes(0xFF, 0xD8)).isEmpty)     // SOI alone
    assert(jpegDims("text".getBytes("UTF-8")).isEmpty)
    // dispatch honors the sniffed format
    assert(dimensions("jpeg", soi ++ sof0(2, 3)) == Some((2, 3)))
    assert(dimensions("raw", png(9, 9)).isEmpty)
  }

  test("ImageHeader parses GIF little-endian dims and BMP signed heights") {
    import Multimodal.ImageHeader._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def gif(ver: String, w: Int, h: Int) = ver.getBytes ++
      bytes(w & 0xff, w >> 8, h & 0xff, h >> 8, 0, 0, 0)
    assert(gifDims(gif("GIF89a", 640, 480)) == Some((640, 480)))
    assert(gifDims(gif("GIF87a", 3, 70)) == Some((3, 70)))
    // little-endian really: 0x0102 must decode 258, not 513
    assert(gifDims(gif("GIF89a", 0x0102, 1)) == Some((258, 1)))
    assert(gifDims(gif("GIF88a", 10, 10)).isEmpty) // bad version
    assert(gifDims("GIF89a".getBytes).isEmpty)     // ends before descriptor
    assert(gifDims(gif("GIF89a", 0, 5)).isEmpty)   // zero dim is invalid

    def le32b(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff,
      (v >> 16) & 0xff, (v >>> 24) & 0xff)
    def bmp(w: Int, h: Int, hdr: Int = 40) = "BM".getBytes ++
      le32b(26) ++ le32b(0) ++ le32b(26) ++ le32b(hdr) ++ le32b(w) ++ le32b(h)
    assert(bmpInfo(bmp(400, 250)) == Some((400, 250)))
    assert(bmpInfo(bmp(350, -200)) == Some((350, -200))) // raw signed height
    assert(bmpInfo(bmp(1, 1, hdr = 12)).isEmpty) // BITMAPCOREHEADER refused
    assert(bmpInfo("BM".getBytes ++ le32b(6)).isEmpty) // truncated
    assert(bmpInfo(bmp(0, 5)).isEmpty)
    assert(dimensions("gif", gif("GIF89a", 2, 3)) == Some((2, 3)))
    assert(dimensions("bmp", bmp(7, -9)) == Some((7, -9)))
  }

  test("imageInfo normalizes BMP orientation; gif/png carry null top_down") {
    val s = spark
    import s.implicits._
    def le32b(v: Int) = Array(v & 0xff, (v >> 8) & 0xff,
      (v >> 16) & 0xff, (v >>> 24) & 0xff).map(_.toByte)
    val topDown = "BM".getBytes ++ le32b(26) ++ le32b(0) ++ le32b(26) ++
      le32b(40) ++ le32b(11) ++ le32b(-22)
    val gif = "GIF89a".getBytes ++ Array[Byte](5, 0, 6, 0, 0, 0, 0)
    val rows = Multimodal.imageInfo(Multimodal.asBlobs(
        Seq((1L, topDown), (2L, gif)).toDF("id", "content"), "id", "content"))
      .collect().sortBy(_.blob_id)
    assert(rows(0).format == "bmp" && rows(0).width == Some(11) &&
      rows(0).height == Some(22) && rows(0).top_down == Some(true))
    assert(rows(1).format == "gif" && rows(1).width == Some(5) &&
      rows(1).height == Some(6) && rows(1).top_down.isEmpty)
  }

  test("imageDimensions runs the parse partition-batched over typed blobs") {
    val s = spark
    import s.implicits._
    val jpeg = Array[Int](0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x11, 0x08,
      0x01, 0x00, 0x02, 0x00, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      .map(_.toByte)
    val blobs = Seq(
      Blob(1L, "image", "jpeg", jpeg.length.toLong, jpeg),
      Blob(2L, "text", "raw", 4L, "text".getBytes("UTF-8"))).toDS()
    val dims = Multimodal.imageDimensions(blobs).collect()
      .map(d => d.blob_id -> ((d.width, d.height))).toMap
    assert(dims(1L) == ((Some(512), Some(256))))
    assert(dims(2L) == ((None, None)))
  }

  test("wavInfo walks the chunk chain, honoring odd-size pad bytes") {
    import graft.operators.Multimodal.AudioHeader
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    // JUNK chunk with an ODD size (5 → 1 pad byte) before fmt: a walk
    // that skips the pad lands mid-chunk and must NOT find fmt
    val wav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(5) ++ Array.fill[Byte](6)(0x11) ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16)
    assert(AudioHeader.wavInfo(wav) == Some((44100, 2)))
    // no fmt chunk at all → refuse
    assert(AudioHeader.wavInfo("RIFF".getBytes ++ le32(4) ++ "WAVE".getBytes).isEmpty)
    // fmt declared but truncated mid-field → refuse
    assert(AudioHeader.wavInfo("RIFF".getBytes ++ le32(20) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1)).isEmpty)
  }

  test("id3TagSize decodes syncsafe bytes and rejects non-syncsafe input") {
    import graft.operators.Multimodal.AudioHeader
    def hdr(b6: Int, b7: Int, b8: Int, b9: Int) =
      "ID3".getBytes ++ Array[Byte](4, 0, 0) ++
        Array(b6, b7, b8, b9).map(_.toByte)
    // 0x01 0x7f 0x7f 0x7f syncsafe = 1<<21 | 127<<14 | 127<<7 | 127
    assert(AudioHeader.id3TagSize(hdr(0x01, 0x7f, 0x7f, 0x7f)) ==
      Some((1L << 21) | (127L << 14) | (127L << 7) | 127L))
    // any size byte with the top bit set is not syncsafe → refuse
    assert(AudioHeader.id3TagSize(hdr(0x80, 0, 0, 0)).isEmpty)
    // 0xff version byte is invalid per spec → refuse
    assert(AudioHeader.id3TagSize("ID3".getBytes ++
      Array[Byte](-1, 0, 0, 1, 1, 1, 1)).isEmpty)
  }

  test("asBlobs sniffs RIFF+WAVE as wav but bare RIFF stays raw") {
    val s = spark
    import s.implicits._
    val wav = "RIFF1234WAVEx".getBytes
    val avi = "RIFF1234AVI x".getBytes
    val df = Seq((1L, wav), (2L, avi)).toDF("id", "content")
    val got = Multimodal.asBlobs(df, "id", "content").collect()
      .map(b => b.blob_id -> ((b.modality, b.format))).toMap
    assert(got(1L) == (("audio", "wav")))
    assert(got(2L) == (("text", "raw")))
  }

  test("Mp4Header walks unaligned boxes and honors both mvhd versions") {
    import graft.operators.Multimodal.Mp4Header
    def be32(v: Long) = Array(v >> 24, v >> 16, v >> 8, v).map(x => (x & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, p: Array[Byte]) = be32(8L + p.length) ++ t.getBytes ++ p
    def file(mvhd: Array[Byte]) =
      box("ftyp", "isom".getBytes ++ be32(0) ++ "isomiso2".getBytes) ++
        box("free", Array.fill[Byte](11)(0x55)) ++ // ODD size: no pad in BMFF
        box("moov", box("udta", Array.fill[Byte](7)(0x22)) ++ mvhd)
    val v0 = box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(90000) ++ be32(123456) ++ Array.fill[Byte](80)(0))
    assert(Mp4Header.mvhdInfo(file(v0)) == Some((90000L, 123456L)))
    assert(Mp4Header.majorBrand(file(v0)) == Some("isom"))
    // version 1: 64-bit duration above 2^32 — a 32-bit read wraps
    val big = (1L << 32) + 77L
    val v1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(48000) ++ be64(big) ++ Array.fill[Byte](80)(0))
    assert(Mp4Header.mvhdInfo(file(v1)) == Some((48000L, big)))
    // largesize path: moov with size==1 and a 64-bit size field
    val inner = box("udta", Array.fill[Byte](7)(0x22)) ++ v0
    val largeMoov = be32(1) ++ "moov".getBytes ++ be64(16L + inner.length) ++ inner
    assert(Mp4Header.mvhdInfo(
      box("ftyp", "isom".getBytes ++ be32(0)) ++ largeMoov) ==
      Some((90000L, 123456L)))
    // moov declares more bytes than present → refuse
    assert(Mp4Header.mvhdInfo(
      box("ftyp", "isom".getBytes ++ be32(0)) ++ be32(1000) ++ "moov".getBytes).isEmpty)
    // mvhd payload shorter than its version's layout → refuse
    val shortV1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0))
    assert(Mp4Header.mvhdInfo(
      box("ftyp", "isom".getBytes ++ be32(0)) ++ box("moov", shortV1)).isEmpty)
    // no ftyp → no brand
    assert(Mp4Header.majorBrand("plain text here".getBytes).isEmpty)
  }

  test("asBlobs sniffs ftyp as mp4 regardless of the leading box size") {
    val s = spark
    import s.implicits._
    def be32(v: Long) = Array(v >> 24, v >> 16, v >> 8, v).map(x => (x & 0xff).toByte)
    // size 0x1C is NOT one of the old heuristic's 0x18/0x20 values
    val mp4 = be32(0x1c) ++ "ftyp".getBytes ++ "isom".getBytes ++ new Array[Byte](16)
    val noFtyp = be32(0x18) ++ "blah".getBytes ++ new Array[Byte](16)
    val got = Multimodal.asBlobs(
        Seq((1L, mp4), (2L, noFtyp)).toDF("id", "content"), "id", "content")
      .collect().map(b => b.blob_id -> ((b.modality, b.format))).toMap
    assert(got(1L) == (("video", "mp4")))
    assert(got(2L) == (("text", "raw")))
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

  // ---- aHash perceptual dedup (m9) ----

  private def pairsOf(imgs: Seq[(Long, Seq[Long])],
                      maxDist: Int = 7): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Multimodal.ahashNearDupPairs(imgs.toDF("id", "px"), "id", "px", maxDist)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** In-memory aHash reference. */
  private def refBits(px: Seq[Long]): Seq[Int] = {
    val tot = px.sum
    px.map(p => if (p * px.size > tot) 1 else 0)
  }

  test("aHash is invariant under affine brightness change") {
    val rnd = new scala.util.Random(3)
    val base = Seq.fill(64)(rnd.nextInt(256).toLong)
    val brighter = base.map(_ + 40L)      // +40 brightness
    val scaled = base.map(p => p * 3 + 5) // contrast*3 + 5
    val got = pairsOf(Seq((1L, base), (2L, brighter), (3L, scaled)))
    assert(got == Seq((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }

  test("local edit lands at its exact hamming distance; far images drop") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(64)(rnd.nextInt(256).toLong)
    // flip pixels far across the mean so exactly those bits differ
    val tot = base.sum
    val edited = base.zipWithIndex.map { case (p, j) =>
      if (j < 3) { if (p * 64 > tot) 0L else 255L } else p
    }
    val unrelated = Seq.fill(64)(rnd.nextInt(256).toLong)
    val got = pairsOf(Seq((1L, base), (2L, edited), (9L, unrelated)))
    // expected distance from the reference implementation
    val expected = refBits(base).zip(refBits(edited)).count(t => t._1 != t._2)
    assert(expected >= 1 && expected <= 7) // the edit is small by design
    assert(got == Seq((1L, 2L, expected.toLong)))
  }

  test("block-LSH pair set equals brute force on seeded random corpus") {
    val rnd = new scala.util.Random(42)
    // 30 bases; each with a perturbed sibling at a random edit size, so
    // distances straddle the threshold
    val imgs = (0 until 30).flatMap { g =>
      val base = Seq.fill(64)(rnd.nextInt(256).toLong)
      val nEdit = rnd.nextInt(12)
      val pert = base.zipWithIndex.map { case (p, j) =>
        if (j < nEdit) (p + 97 + rnd.nextInt(60)) % 256 else p
      }
      Seq((g * 2L, base), (g * 2L + 1, pert))
    }
    val bits = imgs.map { case (id, px) => id -> refBits(px) }.toMap
    val brute = (for {
      a <- imgs.map(_._1); b <- imgs.map(_._1) if a < b
      d = bits(a).zip(bits(b)).count(t => t._1 != t._2) if d <= 7
    } yield (a, b, d.toLong)).sortBy(t => (t._1, t._2))
    assert(pairsOf(imgs) == brute)
  }

  test("aHash pairs survive an ANSI session (32-bit word packing never " +
    "wraps through the int64 sign bit)") {
    // Spark 4 defaults ansi=true; GraftSession pins it off, but the
    // operator must not depend on that. A 64-bit pack's fold would
    // throw ARITHMETIC_OVERFLOW here for any fingerprint whose top bit
    // is set (~half of random corpora).
    val rnd = new scala.util.Random(7)
    val imgs = (0 until 10).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextInt(256).toLong)))
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val bits = imgs.map { case (id, px) => id -> refBits(px) }.toMap
      // make sure the fixture actually exercises a set top bit
      assert(imgs.exists { case (id, _) => bits(id).head == 1 })
      val brute = (for {
        a <- imgs.map(_._1); b <- imgs.map(_._1) if a < b
        d = bits(a).zip(bits(b)).count(t => t._1 != t._2) if d <= 7
      } yield (a, b, d.toLong)).sortBy(t => (t._1, t._2))
      assert(pairsOf(imgs) == brute)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("too-short thumbnails fail loudly instead of missing pairs") {
    val short = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 4L)))
    val ex = intercept[Exception] { pairsOf(short) }
    assert(ex.getMessage != null)
  }

  test("planted hot bucket trips the predict-then-wave breaker; waved " +
    "output identical to unwaved") {
    // 0/255 pixels make bits directly controllable: with k ones (k<64),
    // bit_j = 1 iff p_j = 255. Every image shares block 0 (bit 0 set)
    // — one hot (bpos=0, bval) bucket holding ALL fingerprints — while
    // the other 56 bits are random (~28 apart pairwise), so the bucket
    // is hot with DISTINCT fingerprints: exactly the flat-region
    // failure mode the rep-collapse alone cannot absorb.
    val rnd = new scala.util.Random(19)
    val imgs = (0 until 40).map { i =>
      val tail = Seq.fill(56)(rnd.nextBoolean())
      (i.toLong,
        (Seq(true) ++ Seq.fill(7)(false) ++ tail)
          .map(b => if (b) 255L else 0L))
    }
    val s = spark
    import s.implicits._
    val bits = imgs.map { case (id, px) => id -> refBits(px) }.toMap
    val brute = (for {
      a <- imgs.map(_._1); b <- imgs.map(_._1) if a < b
      d = bits(a).zip(bits(b)).count(t => t._1 != t._2) if d <= 7
    } yield (a, b, d.toLong)).sortBy(t => (t._1, t._2))
    var wavesSeen = 0
    val waved = Multimodal.ahashNearDupPairs(imgs.toDF("id", "px"),
        "id", "px", maxDist = 7, pairWorkCeiling = 10L, maxWaves = 4,
        onWaves = wavesSeen = _)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // the hot bucket alone predicts C(40,2) = 780 pairs >> ceiling 10,
    // past maxWaves x ceiling => pinned at maxWaves
    assert(wavesSeen == 4, s"expected the breaker to trip, got $wavesSeen")
    assert(waved == brute)
    var single = 0
    val whole = pairsOf(imgs) // default ceiling: must stay one wave
    Multimodal.ahashNearDupPairs(imgs.toDF("id", "px"), "id", "px",
      maxDist = 7, onWaves = single = _).count()
    assert(single == 1)
    assert(whole == brute)
  }

  test("waved breaker without a hot bucket (bucket-class regime) is " +
    "exact too") {
    // 8 groups of 5 images share a distinct block-0 value within the
    // group (the other 56 bits random): total predicted pairs ~80 >
    // ceiling 12, but the hottest bucket's C(5,2) = 10 <= 12 — this is
    // the bucket-key wave partitioning (both sides shrink per wave),
    // vs the trip test above whose single all-rows bucket forces the
    // rep-salted fallback. Output must equal brute force either way.
    val rnd = new scala.util.Random(23)
    val imgs = (0 until 40).map { i =>
      val head = (0 until 8).map(b => ((i % 8) >> (b % 3)) % 2 == 1)
      val tail = Seq.fill(56)(rnd.nextBoolean())
      (i.toLong, (head ++ tail).map(b => if (b) 255L else 0L))
    }
    val s = spark
    import s.implicits._
    val bits = imgs.map { case (id, px) => id -> refBits(px) }.toMap
    val brute = (for {
      a <- imgs.map(_._1); b <- imgs.map(_._1) if a < b
      d = bits(a).zip(bits(b)).count(t => t._1 != t._2) if d <= 7
    } yield (a, b, d.toLong)).sortBy(t => (t._1, t._2))
    var wavesSeen = 0
    val waved = Multimodal.ahashNearDupPairs(imgs.toDF("id", "px"),
        "id", "px", maxDist = 7, pairWorkCeiling = 12L, maxWaves = 4,
        onWaves = wavesSeen = _)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(wavesSeen > 1, s"expected waving, got $wavesSeen")
    assert(waved == brute)
  }

  test("rep grain (expand=false) + deferred member-map expansion " +
    "equals the expanded form exactly") {
    // groups with identical fingerprints (sizes 1, 2, 3) plus a
    // near-dup across groups: exercises cross rows with n_a*n_b > 1,
    // the (rep, rep, 0) intra rows, and singletons
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(64)(rnd.nextInt(256).toLong)
    val tot = base.sum
    val edited = base.zipWithIndex.map { case (p, j) =>
      if (j < 3) { if (p * 64 > tot) 0L else 255L } else p
    }
    val far = Seq.fill(64)(rnd.nextInt(256).toLong)
    val imgs = Seq(
      1L -> base, 2L -> base.map(_ + 10L), 3L -> base.map(_ * 2L),  // group A x3
      4L -> edited, 5L -> edited.map(_ + 5L),                       // group B x2
      9L -> far)                                                    // singleton
    val s = spark
    import s.implicits._
    val df = imgs.toDF("id", "px")
    val expanded = Multimodal.ahashNearDupPairs(df, "id", "px", maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    val rep = Multimodal.ahashNearDupPairs(df, "id", "px", maxDist = 7,
      expand = false)
    assert(rep.columns.toSeq ==
      Seq("doc_a", "doc_b", "hamming", "n_a", "n_b"))
    val repRows = rep.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // group sizes must be carried exactly
    assert(repRows.collect {
      case (a, b, h, na, nb) if a == b => (a, h, na, nb)
    }.sorted == Seq((1L, 0L, 3L, 3L), (4L, 0L, 2L, 2L)))
    // deferred expansion: rep pairs ⋈ member map on both sides (intra
    // rows expand to within-group member pairs), normalized to a < b
    val members = Multimodal.ahashMemberMap(df, "id", "px")
      .collect().map(r => r.getLong(1) -> r.getLong(0))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val reExpanded = repRows.flatMap { case (ra, rb, h, _, _) =>
      if (ra == rb)
        for (x <- members(ra); y <- members(ra) if x < y) yield (x, y, 0L)
      else
        for (x <- members(ra); y <- members(rb))
          yield (math.min(x, y), math.max(x, y), h)
    }.sorted
    assert(reExpanded == expanded,
      s"deferred expansion diverged: ${reExpanded.size} vs ${expanded.size}")
  }

  test("aHash pair plan has no cartesian product") {
    val s = spark
    import s.implicits._
    val imgs = (0 until 8).map(i => (i.toLong, Seq.fill(64)(i.toLong)))
    val plan = Multimodal.ahashNearDupPairs(imgs.toDF("id", "px"), "id", "px")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan.take(500))
  }
}
