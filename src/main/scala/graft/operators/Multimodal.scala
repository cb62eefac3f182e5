package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a REAL container-header parser over the payload
  * bytes: PNG / GIF / BMP magics are recognized and their pixel dimensions
  * read straight out of the header with pure byte arithmetic (big-endian
  * IHDR for PNG, little-endian logical-screen / DIB fields for GIF / BMP
  * — the published container layouts). Payloads with no recognized magic
  * decode to magic = "bin" with zero dimensions — honest "opaque bytes",
  * never fabricated metadata. Full pixel decode / model inference would
  * slot into the same `decodeBatch` signature (partition iterator →
  * iterator, one batch per partition — the shape batched inference wants,
  * cf. the reference's implicit-embedding boundary,
  * `email_fetching.py:54-57`, made explicit here); the codec libraries
  * are not in this container, so header metadata is where the honest
  * in-repo decode stops.
  *
  * Scale: decoding is narrow (no shuffle); partition size bounds batch
  * memory. Binary payloads stay columnar in parquet; metadata columns are
  * scalar so filters on them prune without touching the blobs.
  */
object Multimodal {

  /** A media row: opaque payload + its declared kind. */
  case class MediaRow(id: Long, kind: String, bytes: Array[Byte])

  /** Typed decode output: parsed container magic + header dimensions. */
  case class MediaMeta(id: Long, kind: String, byte_len: Long,
                       magic: String, width: Long, height: Long)

  /** REAL header decode: recognize the container by its magic bytes and
    * parse width/height from the header — pure byte arithmetic, no
    * library. Unrecognized payloads yield ("bin", 0, 0). BMP biHeight is
    * a SIGNED int32 in BITMAPINFOHEADER (negative = top-down row order);
    * the decoder sign-extends and reports the magnitude, so a real
    * top-down bitmap yields its pixel height, not ~4.29e9.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
    rows.map { r =>
      val b = r.bytes
      def u(i: Int): Int = b(i) & 0xFF
      def be32(i: Int): Long =
        (u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
      def le16(i: Int): Long = (u(i) | (u(i + 1) << 8)).toLong
      def le32(i: Int): Long =
        u(i).toLong | (u(i + 1).toLong << 8) | (u(i + 2).toLong << 16) |
          (u(i + 3).toLong << 24)
      val isPng = b.length >= 24 &&
        u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
        u(4) == 0x0D && u(5) == 0x0A && u(6) == 0x1A && u(7) == 0x0A &&
        u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R'
      val isGif = b.length >= 10 &&
        u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8' &&
        (u(4) == '7' || u(4) == '9') && u(5) == 'a'
      val isBmp = b.length >= 26 && u(0) == 'B' && u(1) == 'M'
      if (isPng)      MediaMeta(r.id, r.kind, b.length.toLong, "png", be32(16), be32(20))
      else if (isGif) MediaMeta(r.id, r.kind, b.length.toLong, "gif", le16(6), le16(8))
      else if (isBmp) MediaMeta(r.id, r.kind, b.length.toLong, "bmp", le32(18),
        math.abs(le32(22).toInt.toLong))
      else            MediaMeta(r.id, r.kind, b.length.toLong, "bin", 0L, 0L)
    }

  /** Dataset pipeline: (id, kind, bytes) → decoded header metadata. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodeBatch)
  }

  /** Frame sampling over ingest-supplied container metadata: every
    * `stride`-th frame index of each (id, n_frames) row — narrow, the
    * scan stays pruned to the metadata columns (frame COUNT is container
    * metadata; extracting actual frame images needs the codec and belongs
    * to the decodeBatch boundary).
    */
  def sampleFrames(meta: DataFrame, stride: Int = 2): DataFrame =
    meta.select(col("id"), col("n_frames"),
      sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)).as("frame_idx"))

  /** Build a media Dataset from any (id, text-ish) source by treating the
    * UTF-8 bytes as the payload — the in-repo stand-in for reading real
    * blobs via `spark.read.format("binaryFile")`.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("id"), lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("bytes"))
      .as[MediaRow]
  }

  // ---- header CONSTRUCTION (Column expressions) ----------------------
  // Declarative builders for synthesizing valid container headers around
  // arbitrary payload bytes — the test/oracle side of the decode
  // contract: built with Spark SQL hex arithmetic, parsed back by the
  // independent JVM byte arithmetic above, and reproducible in any SQL
  // engine with hex/blob functions (the DuckDB oracle builds the same
  // bytes and parses them back out of the hex).

  /** 4-byte big-endian encoding of a non-negative int column. */
  def beInt32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))

  /** 2-byte little-endian encoding of a non-negative int column. */
  def leInt16(c: Column): Column = {
    val hx = lpad(hex(c), 4, "0")
    unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
  }

  /** 4-byte little-endian encoding of a non-negative int column. */
  def leInt32(c: Column): Column = {
    val hx = lpad(hex(c), 8, "0")
    unhex(concat(substring(hx, 7, 2), substring(hx, 5, 2),
      substring(hx, 3, 2), substring(hx, 1, 2)))
  }

  // PNG: signature(8) + IHDR length 13 (4, BE) + "IHDR"(4) = 16 bytes,
  // then width BE32 at 16, height BE32 at 20, then bit depth 8,
  // truecolor, default compression/filter/interlace (5) — 29-byte header.
  private val PngPrefix: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R').map(_.toByte)
  private val PngIhdrTail: Array[Byte] = Array[Byte](8, 2, 0, 0, 0)

  /** Valid 29-byte PNG header (signature + IHDR) around `payload`. */
  def pngBytes(w: Column, h: Column, payload: Column): Column =
    concat(lit(PngPrefix), beInt32(w), beInt32(h), lit(PngIhdrTail), payload)

  // GIF: "GIF89a"(6) + logical screen width LE16 at 6, height LE16 at 8,
  // GCT flags / background / aspect (3) — 13-byte header.
  private val GifTail: Array[Byte] = Array(0xF7, 0x00, 0x00).map(_.toByte)

  /** Valid 13-byte GIF89a header around `payload`. */
  def gifBytes(w: Column, h: Column, payload: Column): Column =
    concat(lit("GIF89a".getBytes("US-ASCII")), leInt16(w), leInt16(h),
      lit(GifTail), payload)

  // BMP: "BM"(2) + file size/reserved/data offset (12, zeroed) + DIB
  // header size 40 LE32 (4) = 18 bytes, then width LE32 at 18,
  // height LE32 at 22 — 26-byte header.
  private val BmpPrefix: Array[Byte] =
    "BM".getBytes("US-ASCII") ++ Array.fill[Byte](12)(0) ++
      Array[Byte](40, 0, 0, 0)

  /** Valid 26-byte BMP (BITMAPINFOHEADER) prefix around `payload`. */
  def bmpBytes(w: Column, h: Column, payload: Column): Column =
    concat(lit(BmpPrefix), leInt32(w), leInt32(h), payload)

  // FULL uncompressed 24-bpp BMP: 14-byte file header (data offset 54 at
  // bytes 10-13) + 40-byte BITMAPINFOHEADER (planes=1 @26, bpp=24 @28,
  // compression=0 @30, remaining fields zero) + raw BGR rows. This is the
  // one header layout the PIXEL decoder (graft.expressions.DHash)
  // accepts — a real, codec-free raster container.
  private val Bmp24FileHeader: Array[Byte] =
    "BM".getBytes("US-ASCII") ++ Array.fill[Byte](8)(0) ++
      Array[Byte](54, 0, 0, 0) ++ // data offset 54, LE32
      Array[Byte](40, 0, 0, 0)    // DIB header size 40, LE32
  private val Bmp24DibTail: Array[Byte] =
    Array[Byte](1, 0, 24, 0) ++   // planes=1 LE16, bpp=24 LE16
      Array.fill[Byte](24)(0)     // compression=0 + sizes/resolutions/colors

  /** Full decodable 24-bpp BMP around `payload` (the raw pixel rows:
    * bottom-up BGR, each row padded to 4 bytes — the caller builds them,
    * cf. SparkEntry's image fixtures).
    */
  def bmp24Bytes(w: Column, h: Column, payload: Column): Column =
    concat(lit(Bmp24FileHeader), leInt32(w), leInt32(h), lit(Bmp24DibTail),
      payload)

  /** 64-bit dHash perceptual fingerprint of an image byte column —
    * NULL when the payload is not an honestly-decodable uncompressed
    * 24-bpp BMP (see graft.expressions.DHash).
    */
  def dhash(bytes: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.DHash(
        org.apache.spark.sql.GraftBridge.expression(bytes)))

  /** First-channel 16-bit PCM sample array of a WAV byte column — NULL
    * when the payload is not honestly decodable (see
    * graft.expressions.WavSamples). Feature extraction over the result
    * is declarative SQL (exact integer aggregates), so only the decode
    * is native.
    */
  def wavSamples(bytes: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.WavSamples(
        org.apache.spark.sql.GraftBridge.expression(bytes)))

  /** Per-frame luma planes of a YUV4MPEG2 (.y4m) video byte column —
    * `struct(w, h, frames array<array<long>>)`, NULL when the payload
    * is not honestly decodable (see graft.expressions.Y4mLuma). Frame
    * fingerprinting over the result (dHash grids, temporal means) is
    * declarative SQL, so only the container walk is native.
    */
  def y4mLuma(bytes: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.Y4mLuma(
        org.apache.spark.sql.GraftBridge.expression(bytes)))

  /** CHUNKED variant: only frames [frameFrom, frameFrom + maxFrames)
    * materialize — bounded memory per row whatever the stream length
    * (see graft.expressions.Y4mLuma's class doc for the 100 TB shape).
    */
  def y4mLuma(bytes: Column, frameFrom: Int, maxFrames: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.Y4mLuma(
        org.apache.spark.sql.GraftBridge.expression(bytes),
        frameFrom, maxFrames))

  /** Valid YUV4MPEG2 stream around per-frame picture payloads `pics`
    * (array<binary>, each already at the colorspace `cs`'s plane size —
    * w·h for mono, w·h·3/2 for 420, the caller builds them): the ASCII
    * stream header plus a `FRAME\n` marker before every picture — the
    * layout the Y4mLuma parser accepts (the test/oracle construction
    * side of the video decode contract, like [[bmp24Bytes]] /
    * [[wav16Bytes]] for the other modalities).
    */
  def y4mBytes(w: Column, h: Column, cs: Column, pics: Column): Column =
    concat(
      encode(concat(lit("YUV4MPEG2 W"), w.cast("string"),
        lit(" H"), h.cast("string"), lit(" F25:1 Ip A1:1 C"), cs,
        lit("\n")), "US-ASCII"),
      aggregate(pics, lit(Array.emptyByteArray),
        (acc, p) => concat(acc, lit("FRAME\n".getBytes("US-ASCII")), p)))

  /** Valid mono 16-bit PCM WAV around raw little-endian sample bytes
    * `pcm` — the RIFF/fmt/data layout the WavSamples parser accepts
    * (the test/oracle construction side of the audio decode contract,
    * like [[bmp24Bytes]] for images).
    */
  def wav16Bytes(rate: Column, pcm: Column): Column =
    concat(lit("RIFF".getBytes("US-ASCII")), leInt32(length(pcm) + 36),
      lit("WAVE".getBytes("US-ASCII")),
      lit("fmt ".getBytes("US-ASCII")), leInt32(lit(16)),
      leInt16(lit(1)), leInt16(lit(1)), // PCM, mono
      leInt32(rate), leInt32(rate * 2), // sample rate, byte rate
      leInt16(lit(2)), leInt16(lit(16)), // block align, bits
      lit("data".getBytes("US-ASCII")), leInt32(length(pcm)), pcm)
}
