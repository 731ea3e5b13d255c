package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{CatalogQuery, QueryModule, Tables}
import graft.operators.Multimodal

/** Multimodal plumbing over a binary column derived from `documents`
  * (the testdata ships no media files, so text bytes stand in as the
  * blobs). The full pipeline — binary column → typed Blob → partition-
  * batched decode → features — runs for real; only the decoder itself
  * is the stub. Because the stub's features are byte arithmetic and the
  * text is ASCII (byte == codepoint), DuckDB can replay the whole
  * pipeline exactly.
  */
object MultimodalQueries extends QueryModule {

  private val features = CatalogQuery(
    "m1_multimodal_features",
    (s: SparkSession, dir: String) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      val blobs = Multimodal.asBlobs(docs, "doc_id", "content")
      Multimodal.extractFeatures(blobs, Multimodal.StubDecoder)
        .toDF()
        .select(col("blob_id"), col("modality"), col("n_bytes"),
          col("byte_sum"), round(col("mean_byte"), 4).as("mean_byte"),
          col("frames").cast("long").as("frames"))
        .orderBy(col("blob_id"))
    },
    Some("""WITH bytes AS (
           |  SELECT doc_id AS blob_id,
           |    list_transform(list_filter(string_split(text, ''), c -> c <> ''),
           |                   c -> CAST(unicode(c) AS BIGINT)) AS bs
           |  FROM documents)
           |SELECT blob_id, 'text' AS modality,
           |  CAST(len(bs) AS BIGINT) AS n_bytes,
           |  list_reduce(bs, (a, b) -> (a + b) % 1000000007) AS byte_sum,
           |  round(list_sum(bs)*1.0/len(bs), 4) AS mean_byte,
           |  CAST(len(bs)//1024 + 1 AS BIGINT) AS frames
           |FROM bytes ORDER BY blob_id""".stripMargin),
    doc = "Binary-column blob pipeline with partition-batched (stub) " +
      "decode; byte-arithmetic features replayed exactly by DuckDB")

  private def stubFeatures(s: SparkSession, dir: String) = {
    val docs = Tables(s, dir).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
    Multimodal.extractFeatures(
      Multimodal.asBlobs(docs, "doc_id", "content"), Multimodal.StubDecoder)
  }

  /** Stride-3 frame sampling — the video-pipeline keep-every-Nth
    * primitive on the stub's frame count. Row-local explode, zero
    * shuffle; the oracle replays frames = bytes/1024 + 1 and the
    * stride walk with range().
    */
  private val frameSample = CatalogQuery(
    "m2_frame_sample",
    (s: SparkSession, dir: String) =>
      Multimodal.sampleFrames(stubFeatures(s, dir), stride = 3)
        .select(col("blob_id"), col("frames").cast("long").as("frames"),
          col("frame_idx").cast("long").as("frame_idx"))
        .orderBy(col("blob_id"), col("frame_idx")),
    Some("""WITH f AS (
           |  SELECT doc_id AS blob_id,
           |    len(list_filter(string_split(text, ''), c -> c <> ''))//1024 + 1
           |      AS frames
           |  FROM documents)
           |SELECT blob_id, CAST(frames AS BIGINT) AS frames,
           |  CAST(t.i AS BIGINT) AS frame_idx
           |FROM f, unnest(range(0, frames, 3)) t(i)
           |ORDER BY blob_id, frame_idx""".stripMargin),
    doc = "Frame sampling: every 3rd frame index per blob (explode over " +
      "a stride sequence, row-local)")

  /** Area-interpolation resize of the decoded 4-bin vector to 2 bins —
    * what an image resize does per channel, on the stub's histogram.
    * Emitted as scalars (vec_r0/vec_r1): the driver's hash compare
    * cannot sort array columns. ASCII text keeps bins 2-3 empty, so
    * vec_r1 = 0 pins the high-bin path while vec_r0 carries signal.
    */
  private val resize = CatalogQuery(
    "m3_resize_vec",
    (s: SparkSession, dir: String) =>
      Multimodal.resizeVec(stubFeatures(s, dir), dim = 2)
        .select(col("blob_id"),
          round(element_at(col("vec_resized"), 1), 4).as("vec_r0"),
          round(element_at(col("vec_resized"), 2), 4).as("vec_r1"))
        .orderBy(col("blob_id")),
    Some("""WITH bytes AS (
           |  SELECT doc_id AS blob_id,
           |    list_transform(list_filter(string_split(text, ''), c -> c <> ''),
           |                   c -> CAST(unicode(c) AS BIGINT)) AS bs
           |  FROM documents),
           |hist AS (
           |  SELECT blob_id,
           |    len(list_filter(bs, b -> b//64 = 0))*1.0 AS h0,
           |    len(list_filter(bs, b -> b//64 = 1))*1.0 AS h1,
           |    len(list_filter(bs, b -> b//64 = 2))*1.0 AS h2,
           |    len(list_filter(bs, b -> b//64 = 3))*1.0 AS h3
           |  FROM bytes)
           |SELECT blob_id, round((h0+h1)/2, 4) AS vec_r0,
           |  round((h2+h3)/2, 4) AS vec_r1
           |FROM hist ORDER BY blob_id""".stripMargin),
    doc = "Resize plumbing: 4-bin decoded vector rebinned to 2 by area " +
      "interpolation, emitted as scalars")

  /** The sniff-and-route path over genuinely MIXED modalities — m1's
    * corpus is all text, so until this row the magic-byte router only
    * ran in specs. Deterministic synthesis: doc_id mod 4 picks a real
    * magic prefix (JPEG / PNG / ID3-mp3 / none) prepended to the UTF-8
    * text bytes; `asBlobs` must sniff it back. Pure expression work +
    * one 4-group aggregate — the routing fan-out a mixed-media ingest
    * runs before handing each modality to its decoder pool. (Text
    * colliding with a magic prefix would misroute — a guard inside the
    * query counts such collisions and fails loudly if the generator
    * ever produces one.)
    */
  private val routing = CatalogQuery(
    "m4_modality_routing",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val r = pmod($"doc_id", lit(4))
      val magic = when(r === 0,
          lit(Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)))
        .when(r === 1, lit(Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)))
        .when(r === 2, lit(Array(0x49, 0x44, 0x33, 0x04).map(_.toByte)))
        .otherwise(lit(Array.empty[Byte]))
      val blobs = Multimodal.asBlobs(
          Tables(s, dir).documents
            .select($"doc_id",
              concat(magic, encode($"text", "UTF-8")).as("content")),
          "doc_id", "content")
        .toDF()
      // guard the fixture invariant the oracle relies on: an unprefixed
      // (r=3) document whose TEXT happens to start with a media magic
      // string would sniff as audio/image while the oracle re-derives
      // 'text' from doc_id — fail loudly here, not as a hash mismatch
      val clash = blobs
        .filter(pmod($"blob_id", lit(4)) === 3 && $"modality" =!= "text")
        .count()
      require(clash == 0L,
        s"m4 fixture invariant broken: $clash unprefixed docs sniff as media")
      blobs
        .groupBy($"modality", $"format")
        .agg(count(lit(1)).as("n_blobs"), sum($"n_bytes").as("total_bytes"))
        .orderBy($"modality", $"format")
    },
    Some("""WITH m AS (
           |  SELECT doc_id % 4 AS r, octet_length(encode(text)) AS nb
           |  FROM documents)
           |SELECT CASE WHEN r IN (0, 1) THEN 'image' WHEN r = 2 THEN 'audio'
           |            ELSE 'text' END AS modality,
           |  CASE WHEN r = 0 THEN 'jpeg' WHEN r = 1 THEN 'png'
           |       WHEN r = 2 THEN 'mp3' ELSE 'raw' END AS format,
           |  count(*) AS n_blobs,
           |  CAST(sum(nb + CASE WHEN r = 3 THEN 0 ELSE 4 END) AS BIGINT)
           |    AS total_bytes
           |FROM m GROUP BY 1, 2 ORDER BY modality, format""".stripMargin),
    doc = "Magic-byte modality routing over a mixed jpeg/png/mp3/text " +
      "blob corpus: sniff + per-modality rollup, verified against an " +
      "independent re-derivation of the routing from doc_id")

  /** Minimal but REAL JPEG: SOI + a spec-complete APP0/JFIF segment +
    * an SOF0 frame header carrying height/width big-endian (ITU T.81
    * §B.2.2). Trailing payload after the header is arbitrary — the
    * parser never reads past SOF0.
    */
  private def jpegFixture(w: Int, h: Int): Array[Byte] =
    Array[Int](0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, 0x01, 0x01, 0x00,
      0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x11, 0x08, h >> 8, h & 0xff, w >> 8, w & 0xff,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01
    ).map(_.toByte)

  /** Real PNG prefix: 8-byte signature + IHDR with 4-byte big-endian
    * width/height (PNG spec §11.2.2); CRC left zero — the header
    * parser reads fields, it does not checksum.
    */
  private def pngFixture(w: Int, h: Int): Array[Byte] =
    Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff,
      0x08, 0x02, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00
    ).map(_.toByte)

  /** SOI + an APP0 that claims 4 bytes then runs into payload text —
    * sniffs as jpeg but carries no frame header. The parser must
    * return no dimensions, never a fabricated pair.
    */
  private val truncatedJpeg: Array[Byte] =
    Array[Int](0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46).map(_.toByte)

  /** REAL image decoding where it is pure byte arithmetic: parse
    * width/height out of JPEG SOF0 / PNG IHDR headers synthesized
    * deterministically from doc_id (different dimension formulas per
    * format, so a format mix-up fails the hash), with a truncated-JPEG
    * class proving the parser refuses to fabricate dimensions. The
    * oracle re-derives every field from doc_id alone — it never sees
    * the bytes, so only a correct parse can match. Row-local
    * mapPartitions work, zero shuffle.
    */
  private val imageDims = CatalogQuery(
    "m5_image_dimensions",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val withBytes = Tables(s, dir).documents
        .select($"doc_id", $"text").as[(Long, String)]
        .map { case (id, text) =>
          val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val content = (id % 4) match {
            case 0 => jpegFixture((id % 1000 + 16).toInt,
              (id % 777 + 16).toInt) ++ payload
            case 1 => pngFixture((id % 3000 + 32).toInt,
              (id % 2000 + 32).toInt) ++ payload
            case 2 => truncatedJpeg ++ payload
            case _ => payload
          }
          (id, content)
        }.toDF("doc_id", "content")
      Multimodal.imageDimensions(
          Multimodal.asBlobs(withBytes, "doc_id", "content"))
        .toDF()
        .select($"blob_id", $"format",
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"))
        .orderBy($"blob_id")
    },
    Some("""WITH m AS (SELECT doc_id, doc_id % 4 AS r FROM documents)
           |SELECT doc_id AS blob_id,
           |  CASE WHEN r IN (0, 2) THEN 'jpeg' WHEN r = 1 THEN 'png'
           |       ELSE 'raw' END AS format,
           |  CASE WHEN r = 0 THEN CAST(doc_id % 1000 + 16 AS BIGINT)
           |       WHEN r = 1 THEN CAST(doc_id % 3000 + 32 AS BIGINT)
           |       END AS width,
           |  CASE WHEN r = 0 THEN CAST(doc_id % 777 + 16 AS BIGINT)
           |       WHEN r = 1 THEN CAST(doc_id % 2000 + 32 AS BIGINT)
           |       END AS height
           |FROM m ORDER BY blob_id""".stripMargin),
    doc = "Real JPEG SOF0 / PNG IHDR header parsing: dimensions " +
      "synthesized from doc_id, parsed back from actual header bytes, " +
      "oracle re-derives them independently; truncated JPEGs yield NULL")

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)

  /** Spec-complete WAV header with a JUNK chunk BEFORE `fmt ` — a
    * parser that assumes the canonical 44-byte layout (fmt at offset
    * 12) reads garbage and fails the hash; only a real chunk walk
    * lands on the right offsets.
    */
  private def wavFixture(sr: Int, ch: Int): Array[Byte] =
    "RIFF".getBytes ++ le32(200) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(6) ++ Array.fill[Byte](6)(0x55.toByte) ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(sr) ++
      le32(sr * ch * 2) ++ le16(ch * 2) ++ le16(16)

  /** Sniffs as wav (RIFF+WAVE intact) but the chunk chain never
    * reaches a `fmt ` — the parser must return nulls, not invent a
    * sample rate.
    */
  private def truncatedWav: Array[Byte] =
    "RIFF".getBytes ++ le32(4) ++ "WAVE".getBytes

  /** ID3v2.4 header: the tag size rides in four SYNCSAFE bytes (7 bits
    * each) — a plain big-endian read overshoots for any size with a
    * bit above position 6 in some byte, so the formulas differ on most
    * ids and a wrong decode fails the hash.
    */
  private def id3Fixture(tag: Long): Array[Byte] =
    "ID3".getBytes ++ Array[Byte](4, 0, 0) ++
      Array(((tag >> 21) & 0x7f), ((tag >> 14) & 0x7f),
        ((tag >> 7) & 0x7f), tag & 0x7f).map(_.toByte)

  /** REAL audio header decoding, the audio twin of m5: WAV sample
    * rate / channel count out of a chunk-walked `fmt `, ID3v2 tag
    * size out of syncsafe bytes — all synthesized deterministically
    * from doc_id so the oracle re-derives every field without seeing
    * a byte, plus a truncated-WAV class proving the parser refuses to
    * fabricate. Row-local mapPartitions work, zero shuffle.
    */
  private val audioHeaders = CatalogQuery(
    "m6_audio_headers",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val withBytes = Tables(s, dir).documents
        .select($"doc_id", $"text").as[(Long, String)]
        .map { case (id, text) =>
          val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val content = (id % 4) match {
            case 0 => wavFixture((id % 48000 + 8000).toInt,
              (id % 2 + 1).toInt) ++ payload
            case 1 => id3Fixture(id % 100000) ++ payload
            case 2 => truncatedWav ++ payload
            case _ => payload
          }
          (id, content)
        }.toDF("doc_id", "content")
      val parsed = Multimodal.audioInfo(
          Multimodal.asBlobs(withBytes, "doc_id", "content"))
        .toDF()
      // guard the fixture invariants the oracle relies on (m4 house
      // style): unlike JPEG/PNG magics, "ID3" and "RIFF" are plain
      // ASCII, so an unprefixed (r=3) document could legitimately
      // START with one and sniff as audio; and the r=2 truncated-WAV
      // chunk walk continues into ASCII payload where a stray
      // walk-aligned "fmt " would fabricate a sample rate. Fail
      // loudly here, not as an opaque hash mismatch.
      val r = pmod($"blob_id", lit(4))
      val clash = parsed.filter(
          (r === 3 && $"format" =!= "raw") ||
          (r === 2 && ($"sample_rate".isNotNull || $"channels".isNotNull)))
        .count()
      require(clash == 0L,
        s"m6 fixture invariant broken: $clash docs misroute or fabricate fields")
      parsed
        .select($"blob_id", $"format",
          $"sample_rate".cast("long").as("sample_rate"),
          $"channels".cast("long").as("channels"),
          $"tag_size".cast("long").as("tag_size"))
        .orderBy($"blob_id")
    },
    Some("""WITH m AS (SELECT doc_id, doc_id % 4 AS r FROM documents)
           |SELECT doc_id AS blob_id,
           |  CASE WHEN r IN (0, 2) THEN 'wav' WHEN r = 1 THEN 'mp3'
           |       ELSE 'raw' END AS format,
           |  CASE WHEN r = 0 THEN CAST(doc_id % 48000 + 8000 AS BIGINT)
           |       END AS sample_rate,
           |  CASE WHEN r = 0 THEN CAST(doc_id % 2 + 1 AS BIGINT)
           |       END AS channels,
           |  CASE WHEN r = 1 THEN CAST(doc_id % 100000 AS BIGINT)
           |       END AS tag_size
           |FROM m ORDER BY blob_id""".stripMargin),
    doc = "Real WAV fmt-chunk / ID3v2 syncsafe header parsing: fields " +
      "synthesized from doc_id behind a JUNK chunk (forcing a true " +
      "chunk walk), parsed back from actual bytes, oracle re-derives " +
      "them independently; truncated WAVs yield NULL")

  private def be32c(v: Long): Array[Byte] =
    Array(v >> 24, v >> 16, v >> 8, v).map(x => (x & 0xff).toByte)
  private def be64c(v: Long): Array[Byte] =
    be32c(v >>> 32) ++ be32c(v & 0xffffffffL)
  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32c(8L + payload.length) ++ typ.getBytes ++ payload

  /** Spec-shaped MP4: ftyp, then an ODD-size `free` box before moov
    * (ISO-BMFF has no RIFF-style pad bytes — a parser that word-aligns
    * loses sync and fails the hash), then moov with a junk `udta`
    * child before mvhd so finding it takes a real child walk. The
    * version-1 variant carries 64-bit times; its fixture durations
    * exceed 2^32, so a 32-bit read wraps and fails the hash.
    */
  private def mp4Fixture(brand: String, v1: Boolean,
                         ts: Long, dur: Long): Array[Byte] = {
    val mvhd =
      if (v1) mp4Box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64c(0) ++
        be64c(0) ++ be32c(ts) ++ be64c(dur) ++ Array.fill[Byte](80)(0))
      else mp4Box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32c(0) ++
        be32c(0) ++ be32c(ts) ++ be32c(dur) ++ Array.fill[Byte](80)(0))
    mp4Box("ftyp", brand.getBytes ++ be32c(0x200) ++ "isomiso2".getBytes) ++
      mp4Box("free", Array.fill[Byte](11)(0x55.toByte)) ++
      mp4Box("moov", mp4Box("udta", Array.fill[Byte](7)(0x22.toByte)) ++ mvhd)
  }

  /** Sniffs as mp4 (ftyp intact, brand readable) but moov declares
    * more bytes than the input holds — the parser must refuse, not
    * walk off the end or fabricate a duration.
    */
  private def truncatedMp4: Array[Byte] =
    mp4Box("ftyp", "isom".getBytes ++ be32c(0x200) ++ "isomiso2".getBytes) ++
      be32c(1000) ++ "moov".getBytes

  /** REAL MP4 box-structure decoding — the video member completing the
    * m5 (image) / m6 (audio) family: major brand out of ftyp, movie
    * timescale + duration out of a box-walked moov/mvhd in BOTH field
    * layouts (version 0 = 32-bit times, version 1 = 64-bit — the v1
    * fixture durations exceed 2^32 so only a true 64-bit read
    * matches), all synthesized deterministically from doc_id so the
    * oracle re-derives every field without seeing a byte, plus a
    * truncated-moov class proving the parser refuses to fabricate.
    * Row-local mapPartitions work, zero shuffle.
    */
  private val videoHeaders = CatalogQuery(
    "m7_video_headers",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val withBytes = Tables(s, dir).documents
        .select($"doc_id", $"text").as[(Long, String)]
        .map { case (id, text) =>
          val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val content = (id % 4) match {
            case 0 => mp4Fixture("isom", v1 = false,
              id % 90000 + 600, id % 100000) ++ payload
            case 1 => mp4Fixture("mp42", v1 = true,
              id % 48000 + 1000, (1L << 32) + id % 100000) ++ payload
            case 2 => truncatedMp4
            case _ => payload
          }
          (id, content)
        }.toDF("doc_id", "content")
      val parsed = Multimodal.videoInfo(
          Multimodal.asBlobs(withBytes, "doc_id", "content"))
        .toDF()
      // m4/m6 house-style fixture-invariant guard: "ftyp" is plain
      // ASCII at offset 4, so an unprefixed (r=3) document could
      // sniff as video if its text cooperates — fail loudly, not as
      // a hash mismatch. (r=2 cannot fabricate fields: the truncated
      // moov carries no payload to walk into.)
      val clash = parsed.filter(
          pmod($"blob_id", lit(4)) === 3 && $"format" =!= "raw")
        .count()
      require(clash == 0L,
        s"m7 fixture invariant broken: $clash unprefixed docs sniff as video")
      parsed
        .select($"blob_id", $"format", $"brand",
          $"timescale".cast("long").as("timescale"),
          $"duration".cast("long").as("duration"))
        .orderBy($"blob_id")
    },
    Some("""WITH m AS (SELECT doc_id, doc_id % 4 AS r FROM documents)
           |SELECT doc_id AS blob_id,
           |  CASE WHEN r = 3 THEN 'raw' ELSE 'mp4' END AS format,
           |  CASE WHEN r IN (0, 2) THEN 'isom' WHEN r = 1 THEN 'mp42'
           |       END AS brand,
           |  CASE WHEN r = 0 THEN CAST(doc_id % 90000 + 600 AS BIGINT)
           |       WHEN r = 1 THEN CAST(doc_id % 48000 + 1000 AS BIGINT)
           |       END AS timescale,
           |  CASE WHEN r = 0 THEN CAST(doc_id % 100000 AS BIGINT)
           |       WHEN r = 1 THEN CAST(4294967296 + doc_id % 100000 AS BIGINT)
           |       END AS duration
           |FROM m ORDER BY blob_id""".stripMargin),
    doc = "Real MP4 ftyp/moov/mvhd box parsing: brand, timescale and " +
      "duration synthesized from doc_id behind odd-size free/udta " +
      "boxes (forcing a true unaligned box walk, both mvhd versions), " +
      "parsed back from actual bytes, oracle re-derives them " +
      "independently; truncated moov yields NULL")

  /** GIF logical-screen descriptor: version magic + LITTLE-endian
    * 16-bit dims at offsets 6/8 — PNG's endianness opposite, so a
    * byte-order bug flips the hash on almost every id.
    */
  private def gifFixture(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ le16(w) ++ le16(h) ++
      Array[Byte](0, 0, 0) // packed fields / bg / aspect

  /** BMP file header + BITMAPINFOHEADER with SIGNED height: negative
    * stored height = top-down row order (the spec's orientation bit).
    */
  private def bmpFixture(w: Int, hSigned: Int): Array[Byte] =
    "BM".getBytes ++ le32(26) ++ le32(0) ++ le32(26) ++
      le32(40) ++ le32(w) ++ le32(hSigned)

  /** Sniffs as gif (magic intact) but the blob PHYSICALLY ends before
    * the screen descriptor — unlike m5's truncated JPEG (where trailing
    * payload loses marker sync), a fixed-offset format would happily
    * read whatever bytes follow, so this class must carry no payload.
    */
  private val truncatedGif: Array[Byte] = "GIF89a".getBytes

  /** m8 completes the image-container family: GIF (little-endian
    * descriptor) and BMP (signed height = orientation) beside m5's
    * big-endian PNG / marker-walked JPEG, plus the truncated
    * refuse-to-fabricate class. Same contract as m5/m6/m7: every
    * field synthesized from doc_id, parsed back from REAL bytes,
    * oracle re-derives without seeing a byte; row-local
    * mapPartitions, zero shuffle.
    */
  private val gifBmpHeaders = CatalogQuery(
    "m8_gif_bmp_headers",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val withBytes = Tables(s, dir).documents
        .select($"doc_id", $"text").as[(Long, String)]
        .map { case (id, text) =>
          val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val content = (id % 4) match {
            case 0 => gifFixture((id % 500 + 1).toInt, (id % 300 + 1).toInt) ++
              payload
            case 1 => bmpFixture((id % 400 + 1).toInt, (id % 250 + 1).toInt) ++
              payload
            case 2 => bmpFixture((id % 350 + 1).toInt,
              -(id % 200 + 1).toInt) ++ payload
            case _ => truncatedGif
          }
          (id, content)
        }.toDF("doc_id", "content")
      Multimodal.imageInfo(
          Multimodal.asBlobs(withBytes, "doc_id", "content"))
        .toDF()
        .select($"blob_id", $"format",
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"top_down".cast("long").as("top_down"))
        .orderBy($"blob_id")
    },
    Some("""WITH m AS (SELECT doc_id, doc_id % 4 AS r FROM documents)
           |SELECT doc_id AS blob_id,
           |  CASE WHEN r IN (0, 3) THEN 'gif' ELSE 'bmp' END AS format,
           |  CASE WHEN r = 0 THEN CAST(doc_id % 500 + 1 AS BIGINT)
           |       WHEN r = 1 THEN CAST(doc_id % 400 + 1 AS BIGINT)
           |       WHEN r = 2 THEN CAST(doc_id % 350 + 1 AS BIGINT)
           |       END AS width,
           |  CASE WHEN r = 0 THEN CAST(doc_id % 300 + 1 AS BIGINT)
           |       WHEN r = 1 THEN CAST(doc_id % 250 + 1 AS BIGINT)
           |       WHEN r = 2 THEN CAST(doc_id % 200 + 1 AS BIGINT)
           |       END AS height,
           |  CASE WHEN r = 1 THEN CAST(0 AS BIGINT)
           |       WHEN r = 2 THEN CAST(1 AS BIGINT)
           |       END AS top_down
           |FROM m ORDER BY blob_id""".stripMargin),
    doc = "Real GIF screen-descriptor / BMP info-header parsing with " +
      "the signed-height orientation bit; dims synthesized from " +
      "doc_id, parsed from actual bytes, truncated GIFs yield NULL")

  /** Image near-dup by perceptual hash over deterministic 8×8
    * thumbnails synthesized from doc_id (the m4-m8 convention: the
    * oracle re-derives every pixel without seeing a byte). Planted
    * structure: docs sharing `doc_id div 3` render the same base image;
    * the `mod 3 = 1` sibling is a +17 brightness shift (aHash-invariant
    * by construction → hamming 0) and the `mod 3 = 2` sibling carries a
    * 5-pixel local edit whose distance lands ON BOTH SIDES of the
    * threshold across groups (ham 4-10 at sf0.01) — so the ≤ 7 cut is
    * exercised, not vacuous. Cross-group pairs sit at ~32 bits and must
    * never appear. Candidates come from the lossless 8-bit-block
    * hamming LSH, verified exact; the oracle is the full quadratic
    * ground truth.
    */
  private val ahashPairs = CatalogQuery(
    "m9_image_ahash_neardup",
    (s: SparkSession, dir: String) => {
      val base = "((doc_id div 3 + 13) * (j * j + 71) * " +
        "(j + doc_id div 3 + 7)) % 251"
      val thumbs = Tables(s, dir).documents.select(col("doc_id"),
        expr(s"""transform(sequence(0, 63), j ->
                |  CASE WHEN doc_id % 3 = 2 AND j < 5 THEN ($base + 128) % 251
                |       ELSE $base + IF(doc_id % 3 = 1, 17, 0)
                |  END)""".stripMargin).as("px"))
      Multimodal.ahashNearDupPairs(thumbs, "doc_id", "px", maxDist = 7)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH px AS (
           |  SELECT doc_id,
           |    list_transform(range(0,64), j ->
           |      CASE
           |        WHEN doc_id % 3 = 2 AND j < 5
           |          THEN (((doc_id//3 + 13)*(j*j + 71)*(j + doc_id//3 + 7)) % 251
           |                + 128) % 251
           |        ELSE ((doc_id//3 + 13)*(j*j + 71)*(j + doc_id//3 + 7)) % 251
           |             + CASE WHEN doc_id % 3 = 1 THEN 17 ELSE 0 END
           |      END) AS p
           |  FROM documents),
           |fp AS (
           |  SELECT doc_id,
           |    list_sum(list_transform(range(0,64), i ->
           |      CASE WHEN i < 63 AND p[i+1]*64 > list_sum(p)
           |           THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS flo,
           |    CASE WHEN p[64]*64 > list_sum(p) THEN 1 ELSE 0 END AS fhi
           |  FROM px)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  CAST(bit_count(xor(a.flo, b.flo)) + abs(a.fhi - b.fhi)
           |       AS BIGINT) AS hamming
           |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.flo, b.flo)) + abs(a.fhi - b.fhi) <= 7
           |ORDER BY doc_a, doc_b""".stripMargin),
    doc = "Perceptual-hash image dedup: exact-integer aHash over 8x8 " +
      "thumbnails, lossless 8-bit-block hamming LSH (pigeonhole: <= 7 " +
      "differing bits must leave one block intact), exact verify on " +
      "bucket collisions only; oracle is the quadratic ground truth " +
      "with the fingerprint packed into (bit63, bits0-62) integers so " +
      "per-pair hamming is bit_count(xor) — same answer, and the " +
      "all-pairs replay stays feasible at the 10x validation scale")

  /** m9 at REP GRAIN (`expand = false`): one row per fingerprint-group
    * pair carrying both group sizes, plus a (rep, rep, 0) row per
    * ≥2-member group — the survivor-sized form for corpora where the
    * expanded member-pair set IS the cost (sf10 measured m9 spending
    * its 139.9 s wall materializing 476 M expanded pairs; this form's
    * output is bounded by surviving GROUP pairs, and expansion is a
    * deferred join against [[graft.operators.Multimodal.ahashMemberMap]]).
    * The oracle re-derives groups, sizes and rep pairs from the same
    * quadratic ground truth as m9, so the grain change is hash-gated:
    * a wrong size, a lost intra group, or a rep that is not the min id
    * all flip the row red. MultimodalSpec proves the deferred
    * expansion reproduces m9's member-grain output exactly.
    */
  private val ahashPairsRepGrain = CatalogQuery(
    "m9b_ahash_neardup_repgrain",
    (s: SparkSession, dir: String) => {
      val base = "((doc_id div 3 + 13) * (j * j + 71) * " +
        "(j + doc_id div 3 + 7)) % 251"
      val thumbs = Tables(s, dir).documents.select(col("doc_id"),
        expr(s"""transform(sequence(0, 63), j ->
                |  CASE WHEN doc_id % 3 = 2 AND j < 5 THEN ($base + 128) % 251
                |       ELSE $base + IF(doc_id % 3 = 1, 17, 0)
                |  END)""".stripMargin).as("px"))
      Multimodal.ahashNearDupPairs(thumbs, "doc_id", "px", maxDist = 7,
          expand = false)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH px AS (
           |  SELECT doc_id,
           |    list_transform(range(0,64), j ->
           |      CASE
           |        WHEN doc_id % 3 = 2 AND j < 5
           |          THEN (((doc_id//3 + 13)*(j*j + 71)*(j + doc_id//3 + 7)) % 251
           |                + 128) % 251
           |        ELSE ((doc_id//3 + 13)*(j*j + 71)*(j + doc_id//3 + 7)) % 251
           |             + CASE WHEN doc_id % 3 = 1 THEN 17 ELSE 0 END
           |      END) AS p
           |  FROM documents),
           |fp AS (
           |  SELECT doc_id,
           |    list_sum(list_transform(range(0,64), i ->
           |      CASE WHEN i < 63 AND p[i+1]*64 > list_sum(p)
           |           THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS flo,
           |    CASE WHEN p[64]*64 > list_sum(p) THEN 1 ELSE 0 END AS fhi
           |  FROM px),
           |grp AS (
           |  SELECT doc_id, flo, fhi,
           |    min(doc_id) OVER (PARTITION BY flo, fhi) AS rep
           |  FROM fp),
           |sizes AS (SELECT rep, CAST(count(*) AS BIGINT) AS n
           |          FROM grp GROUP BY rep),
           |reps AS (SELECT rep AS doc_id, flo, fhi FROM grp
           |         WHERE doc_id = rep)
           |SELECT doc_a, doc_b, hamming, n_a, n_b FROM (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    CAST(bit_count(xor(a.flo, b.flo)) + abs(a.fhi - b.fhi)
           |         AS BIGINT) AS hamming,
           |    sa.n AS n_a, sb.n AS n_b
           |  FROM reps a JOIN reps b ON a.doc_id < b.doc_id
           |  JOIN sizes sa ON sa.rep = a.doc_id
           |  JOIN sizes sb ON sb.rep = b.doc_id
           |  WHERE bit_count(xor(a.flo, b.flo)) + abs(a.fhi - b.fhi) <= 7
           |  UNION ALL
           |  SELECT rep, rep, CAST(0 AS BIGINT), n, n FROM sizes
           |  WHERE n >= 2)
           |ORDER BY doc_a, doc_b""".stripMargin),
    doc = "m9's rep-grain twin (expand=false): fingerprint-group pairs " +
      "+ sizes instead of expanded member pairs — survivor-sized " +
      "output; expansion is a deferred join against the member map")

  override def queries: Seq[CatalogQuery] =
    Seq(features, frameSample, resize, routing, imageDims, audioHeaders,
      videoHeaders, gifBmpHeaders, ahashPairs, ahashPairsRepGrain)
}
