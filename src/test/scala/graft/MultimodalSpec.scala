package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  // Golden header bytes written out field by field from the published
  // container layouts — these pin decodeBatch to the REAL formats
  // independently of the Column-side builders (a compensating
  // endianness/offset bug in builder+parser cannot pass these).
  private val goldenPng: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D,                           // IHDR length 13
      'I', 'H', 'D', 'R',
      0x00, 0x00, 0x01, 0x00,                           // width 256 (BE)
      0x00, 0x00, 0x00, 0x47,                           // height 71 (BE)
      0x08, 0x02, 0x00, 0x00, 0x00).map(_.toByte)
  private val goldenGif: Array[Byte] =
    ("GIF89a".getBytes("US-ASCII") ++
      Array(0x2C, 0x01,                                 // width 300 (LE)
        0x47, 0x00,                                     // height 71 (LE)
        0xF7, 0x00, 0x00).map(_.toByte))
  private val goldenBmp: Array[Byte] =
    ("BM".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(0) ++
      Array[Byte](40, 0, 0, 0) ++
      Array(0x00, 0x02, 0x00, 0x00,                     // width 512 (LE)
        0x10, 0x01, 0x00, 0x00).map(_.toByte))          // height 272 (LE)

  test("decodeBatch parses golden PNG/GIF/BMP headers and flags raw bytes") {
    val out = Multimodal.decodeBatch(Iterator(
      Multimodal.MediaRow(1L, "image", goldenPng),
      Multimodal.MediaRow(2L, "image", goldenGif),
      Multimodal.MediaRow(3L, "image", goldenBmp),
      Multimodal.MediaRow(4L, "audio", Array.fill[Byte](100)(7))
    )).toSeq
    assert(out(0) == Multimodal.MediaMeta(1L, "image", 29L, "png", 256L, 71L))
    assert(out(1) == Multimodal.MediaMeta(2L, "image", 13L, "gif", 300L, 71L))
    assert(out(2) == Multimodal.MediaMeta(3L, "image", 26L, "bmp", 512L, 272L))
    assert(out(3) == Multimodal.MediaMeta(4L, "audio", 100L, "bin", 0L, 0L))
  }

  test("decodeBatch sign-extends a top-down BMP's negative biHeight") {
    // biHeight = -272 (0xFFFFFEF0 LE): a real top-down bitmap; the decoder
    // must report the 272-pixel magnitude, not the ~4.29e9 unsigned misread
    val topDownBmp: Array[Byte] =
      ("BM".getBytes("US-ASCII") ++
        Array.fill[Byte](12)(0) ++
        Array[Byte](40, 0, 0, 0) ++
        Array(0x00, 0x02, 0x00, 0x00,                   // width 512 (LE)
          0xF0, 0xFE, 0xFF, 0xFF).map(_.toByte))        // height -272 (LE)
    val out = Multimodal.decodeBatch(Iterator(
      Multimodal.MediaRow(9L, "image", topDownBmp))).toSeq
    assert(out.head == Multimodal.MediaMeta(9L, "image", 26L, "bmp", 512L, 272L))
    // Int.MinValue height (0x80000000): magnitude still exact via Long
    val extremeBmp = topDownBmp.clone()
    extremeBmp(22) = 0x00; extremeBmp(23) = 0x00
    extremeBmp(24) = 0x00; extremeBmp(25) = 0x80.toByte
    val ex = Multimodal.decodeBatch(Iterator(
      Multimodal.MediaRow(10L, "image", extremeBmp))).toSeq
    assert(ex.head.height == 2147483648L)
  }

  test("Column builders round-trip through the byte parser with payloads") {
    import spark.implicits._
    val df = Seq((1L, 640, 480, "png"), (2L, 300, 200, "gif"),
      (3L, 1920, 1080, "bmp")).toDF("id", "w", "h", "fmt")
    val payload = encode(lit("payload bytes after the header"), "UTF-8")
    val media = df.select(col("id"), lit("image").as("kind"),
        when(col("fmt") === "png", Multimodal.pngBytes(col("w"), col("h"), payload))
          .when(col("fmt") === "gif", Multimodal.gifBytes(col("w"), col("h"), payload))
          .otherwise(Multimodal.bmpBytes(col("w"), col("h"), payload)).as("bytes"))
      .as[Multimodal.MediaRow]
    val out = Multimodal.decode(media).collect().sortBy(_.id)
    assert(out.map(m => (m.id, m.magic, m.width, m.height)).toSeq ==
      Seq((1L, "png", 640L, 480L), (2L, "gif", 300L, 200L),
        (3L, "bmp", 1920L, 1080L)))
    // payload rides along: byte_len = header + 30 payload bytes
    assert(out.map(_.byte_len).toSeq == Seq(29L + 30, 13L + 30, 26L + 30))
  }

  test("sampleFrames strides over supplied frame-count metadata") {
    import spark.implicits._
    val meta = Seq((1L, 5L), (2L, 1L)).toDF("id", "n_frames")
    val out = Multimodal.sampleFrames(meta, stride = 2).collect()
      .sortBy(_.getLong(0))
    assert(out(0).getSeq[Long](2) == Seq(0L, 2L, 4L))
    assert(out(1).getSeq[Long](2) == Seq(0L))
  }

  test("fromText builds binary payloads with UTF-8 byte length") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "中")).toDF("id", "t")
    val media = Multimodal.fromText(df, "id", "t", "audio").collect().sortBy(_.id)
    assert(media(0).bytes.length == 3)
    assert(media(1).bytes.length == 3) // 中 is 3 UTF-8 bytes
    assert(media.forall(_.kind == "audio"))
  }

  // ---- dHash pixel decode ----

  /** Hand-rolled 24-bpp BMP: pixel(x, yTop) = v(x, yTop), B = G = R. */
  private def bmp24(w: Int, h: Int, topDown: Boolean)(v: (Int, Int) => Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    out(0) = 'B'; out(1) = 'M'
    def le32(i: Int, x: Int): Unit = {
      out(i) = (x & 0xFF).toByte; out(i + 1) = ((x >> 8) & 0xFF).toByte
      out(i + 2) = ((x >> 16) & 0xFF).toByte; out(i + 3) = ((x >> 24) & 0xFF).toByte
    }
    le32(10, 54); le32(14, 40); le32(18, w)
    le32(22, if (topDown) -h else h)
    out(26) = 1; out(28) = 24
    for (yTop <- 0 until h; x <- 0 until w) {
      val yFile = if (topDown) yTop else h - 1 - yTop
      val p = 54 + yFile * stride + x * 3
      val g = (v(x, yTop) & 0xFF).toByte
      out(p) = g; out(p + 1) = g; out(p + 2) = g
    }
    out
  }

  /** Reference dHash over the raw (pre-resize) value grid. */
  private def refDhash(w: Int, h: Int)(v: (Int, Int) => Int): Long = {
    val cells = Array.tabulate(8, 9) { (ty, tx) =>
      val (y0, y1) = (ty * h / 8, (ty + 1) * h / 8)
      val (x0, x1) = (tx * w / 9, (tx + 1) * w / 9)
      val sum = (for (y <- y0 until y1; x <- x0 until x1) yield v(x, y).toLong).sum
      sum / ((y1 - y0).toLong * (x1 - x0))
    }
    (for (ty <- 0 until 8; tx <- 0 until 8 if cells(ty)(tx) < cells(ty)(tx + 1))
      yield 1L << (ty * 8 + tx)).foldLeft(0L)(_ | _)
  }

  test("dhash: bottom-up and top-down BMPs of the same image agree; " +
      "resize is the integer block mean") {
    import graft.expressions.DHash
    def v(x: Int, y: Int): Int = (x * 29 + y * 17 + x * y * 3) % 256
    val up = DHash.fingerprintOrNull(bmp24(9, 8, topDown = false)(v))
    val down = DHash.fingerprintOrNull(bmp24(9, 8, topDown = true)(v))
    assert(up != null && up == down, "row storage order must not change the hash")
    assert(up.longValue == refDhash(9, 8)(v))
    // 18x16 = 2x2 block means; 27x24 = 3x3 — exercises non-identity resize
    assert(DHash.fingerprintOrNull(bmp24(18, 16, topDown = false)(v)).longValue
      == refDhash(18, 16)(v))
    assert(DHash.fingerprintOrNull(bmp24(27, 24, topDown = false)(v)).longValue
      == refDhash(27, 24)(v))
    // a near-identical image (one bumped pixel) lands within a few bits
    def v2(x: Int, y: Int): Int = if (x == 1 && y == 0) (v(x, y) + 64) % 256 else v(x, y)
    val near = DHash.fingerprintOrNull(bmp24(9, 8, topDown = false)(v2))
    assert(DHash.hamming(up, near) <= 2 && up != near)
  }

  test("dhash refuses what it cannot decode honestly (null, never garbage)") {
    import graft.expressions.DHash
    def v(x: Int, y: Int): Int = x + y
    val good = bmp24(9, 8, topDown = false)(v)
    assert(DHash.fingerprintOrNull(good) != null)
    assert(DHash.fingerprintOrNull(null) == null)
    assert(DHash.fingerprintOrNull("not a bmp at all, just text bytes xxxx"
      .getBytes("US-ASCII")) == null)
    val compressed = good.clone(); compressed(30) = 1 // BI_RLE8
    assert(DHash.fingerprintOrNull(compressed) == null)
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(DHash.fingerprintOrNull(bpp8) == null)
    val truncated = java.util.Arrays.copyOf(good, good.length - 5)
    assert(DHash.fingerprintOrNull(truncated) == null)
    assert(DHash.fingerprintOrNull(bmp24(8, 8, topDown = false)(v)) == null,
      "smaller than the 9x8 grid must refuse, not upsample")
  }

  // ---- WAV PCM decode ----

  /** Hand-rolled WAV: optional junk chunk before data, 1..2 channels. */
  private def wav(samples: Seq[Seq[Int]], junkChunk: Boolean = false,
                  fmtCode: Int = 1, bits: Int = 16): Array[Byte] = {
    val channels = samples.length
    val n = samples.head.length
    val bb = new java.io.ByteArrayOutputStream()
    def s4(t: String): Unit = bb.write(t.getBytes("US-ASCII"))
    def le16(x: Int): Unit = { bb.write(x & 0xFF); bb.write((x >> 8) & 0xFF) }
    def le32(x: Int): Unit = { le16(x & 0xFFFF); le16((x >>> 16) & 0xFFFF) }
    val dataLen = 2 * channels * n
    val junkLen = if (junkChunk) 8 + 6 else 0 // odd payload => +1 pad
    s4("RIFF"); le32(4 + 24 + junkLen + (junkLen & 1) + 8 + dataLen); s4("WAVE")
    s4("fmt "); le32(16); le16(fmtCode); le16(channels); le32(8000)
    le32(8000 * 2 * channels); le16(2 * channels); le16(bits)
    if (junkChunk) { s4("LIST"); le32(5); bb.write(Array[Byte](1, 2, 3, 4, 5)); bb.write(0) }
    s4("data"); le32(dataLen)
    for (i <- 0 until n; c <- 0 until channels) le16(samples(c)(i) & 0xFFFF)
    bb.toByteArray
  }

  test("wav_samples: chunk walk, sign extension, first channel of stereo") {
    import graft.expressions.WavSamples
    val mono = Seq(Seq(0, 100, -100, 32767, -32768, 7))
    def arr(b: Array[Byte]): Seq[Long] = {
      val a = WavSamples.samplesOrNull(b)
      assert(a != null); a.toLongArray().toSeq
    }
    assert(arr(wav(mono)) == Seq(0L, 100L, -100L, 32767L, -32768L, 7L))
    // a LIST chunk between fmt and data must be walked over, not tripped on
    assert(arr(wav(mono, junkChunk = true)) == arr(wav(mono)))
    // stereo: the deterministic mono projection is channel 0
    val stereo = Seq(Seq(1, 2, 3), Seq(-9, -9, -9))
    assert(arr(wav(stereo)) == Seq(1L, 2L, 3L))
  }

  test("wav_samples refuses what it cannot decode honestly") {
    import graft.expressions.WavSamples
    val good = wav(Seq(Seq(1, 2, 3)))
    assert(WavSamples.samplesOrNull(good) != null)
    assert(WavSamples.samplesOrNull(null) == null)
    assert(WavSamples.samplesOrNull("RIFFnot a wave at all............"
      .getBytes("US-ASCII")) == null)
    assert(WavSamples.samplesOrNull(wav(Seq(Seq(1, 2, 3)), fmtCode = 3)) == null,
      "float PCM needs a float decoder — refuse")
    assert(WavSamples.samplesOrNull(wav(Seq(Seq(1, 2, 3)), bits = 8)) == null)
    assert(WavSamples.samplesOrNull(
      java.util.Arrays.copyOf(good, good.length - 3)) == null,
      "truncated data chunk must refuse, not mis-read")
  }

  test("dhash Column expression matches the JVM function and is null for non-BMP") {
    import spark.implicits._
    import graft.expressions.DHash
    def v(x: Int, y: Int): Int = (x * 29 + y * 17) % 256
    val good = bmp24(9, 8, topDown = false)(v)
    val rows = Seq((1L, good), (2L, "junk".getBytes("US-ASCII")))
      .toDF("id", "bytes")
      .select($"id", Multimodal.dhash($"bytes").as("fp"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(1) == DHash.fingerprintOrNull(good).longValue)
    assert(rows(1).isNullAt(1))
  }

  // Assemble a Y4M stream field by field: an ASCII header line, then per
  // frame an ASCII `FRAME<params>\n` marker and the raw planar picture.
  private def y4m(header: String,
                  frames: Seq[Array[Byte]],
                  frameParams: String = ""): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(header.getBytes("US-ASCII"))
    for (f <- frames) {
      bb.write(("FRAME" + frameParams + "\n").getBytes("US-ASCII"))
      bb.write(f)
    }
    bb.toByteArray
  }

  test("y4m_luma: header token walk, mono vs 420 strides, per-frame luma") {
    import graft.expressions.Y4mLuma
    // C420 4x2: picture = 8 luma bytes + 2 * (2*1) chroma = 12 bytes
    val luma1 = (0 until 8).map(i => (i * 10).toByte).toArray
    val luma2 = (0 until 8).map(i => (200 + i).toByte).toArray
    val chroma = Array.fill(4)(99.toByte)
    val r420 = Y4mLuma.lumaOrNull(y4m(
      "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n", // F/I/A tags skipped
      Seq(luma1 ++ chroma, luma2 ++ chroma)))
    assert(r420 != null)
    assert(r420.getInt(0) == 4 && r420.getInt(1) == 2)
    val fr = r420.getArray(2)
    assert(fr.numElements() == 2)
    assert(fr.getArray(0).toLongArray().toSeq == (0 until 8).map(_ * 10L))
    assert(fr.getArray(1).toLongArray().toSeq == (0 until 8).map(200L + _))
    // mono: same luma bytes, NO chroma in the picture — identical planes
    // out of a different stride proves the chroma skip is real
    val rMono = Y4mLuma.lumaOrNull(
      y4m("YUV4MPEG2 W4 H2 Cmono\n", Seq(luma1, luma2)))
    assert(rMono != null)
    assert(rMono.getArray(2).getArray(1).toLongArray().toSeq ==
      fr.getArray(1).toLongArray().toSeq)
    // C444 stride: luma + two FULL chroma planes
    val r444 = Y4mLuma.lumaOrNull(y4m("YUV4MPEG2 W4 H2 C444\n",
      Seq(luma1 ++ Array.fill(16)(7.toByte))))
    assert(r444 != null && r444.getArray(2).numElements() == 1)
    // per-frame parameters up to the newline are legal and skipped
    val rParam = Y4mLuma.lumaOrNull(y4m("YUV4MPEG2 W4 H2 Cmono\n",
      Seq(luma1), frameParams = " Xcustom I1"))
    assert(rParam != null &&
      rParam.getArray(2).getArray(0).toLongArray().toSeq ==
        (0 until 8).map(_ * 10L))
    // default colorspace with no C tag is 420
    val rDflt = Y4mLuma.lumaOrNull(
      y4m("YUV4MPEG2 W4 H2\n", Seq(luma1 ++ chroma)))
    assert(rDflt != null && rDflt.getArray(2).numElements() == 1)
  }

  test("y4m_luma refuses what it cannot decode honestly (null, never throw)") {
    import graft.expressions.Y4mLuma
    def n(s: String): Unit =
      assert(Y4mLuma.lumaOrNull(s.getBytes("US-ASCII")) == null, s)
    val luma = (0 until 8).map(_.toByte).toArray
    assert(Y4mLuma.lumaOrNull(null) == null)
    n("YUV4MPEG3 W4 H2 Cmono\n" + "x" * 8)          // wrong magic
    n("YUV4MPEG2 ")                                  // bare-space header end
    n("YUV4MPEG2 W4 H2")                             // header never \n-closed
    n("YUV4MPEG2 H2 Cmono\n")                        // missing W
    n("YUV4MPEG2 W4 Hx Cmono\n")                     // non-numeric H
    n("YUV4MPEG2 W0 H2 Cmono\n")                     // non-positive W
    n("YUV4MPEG2 W3 H3 C420\n")                      // odd dims under 4:2:0
    assert(Y4mLuma.lumaOrNull(y4m("YUV4MPEG2 W4 H2 C422\n",
      Seq(luma ++ Array.fill(8)(0.toByte)))) == null,
      "C422 has no stride rule here — refuse, never mis-slice")
    // truncated picture: every prefix of a good 1-frame stream refuses
    val good = y4m("YUV4MPEG2 W4 H2 Cmono\n", Seq(luma))
    assert(Y4mLuma.lumaOrNull(good) != null)
    assert(Y4mLuma.lumaOrNull(
      java.util.Arrays.copyOf(good, good.length - 1)) == null)
    // malformed frame marker
    n("YUV4MPEG2 W4 H2 Cmono\nFRUME\n" + "x" * 8)
    // frame marker line never newline-terminated
    n("YUV4MPEG2 W4 H2 Cmono\nFRAME Xtag")
    // crafted Int-overflow dimensions WITH a picture: refuse (the r15
    // negative-allocation crash), and a plane no JVM array can hold
    // refuses even header-only
    assert(Y4mLuma.lumaOrNull(y4m("YUV4MPEG2 W65536 H32768 Cmono\n",
      Seq(Array.fill(64)(0.toByte)))) == null)
    n("YUV4MPEG2 W1000000 H1000000 Cmono\n")
  }

  test("y4m_luma: legal header-only (zero-frame) stream decodes to " +
      "(w, h, []) even with large declared dimensions") {
    import graft.expressions.Y4mLuma
    // 65536 * 32766 = 2 147 352 576 fits an Int; no picture follows, so
    // nothing is truncated — the guard must not conflate 'picture cannot
    // fit this stream' with 'no pictures present'
    val r = Y4mLuma.lumaOrNull(
      "YUV4MPEG2 W65536 H32766 Cmono\n".getBytes("US-ASCII"))
    assert(r != null)
    assert(r.getInt(0) == 65536 && r.getInt(1) == 32766)
    assert(r.getArray(2).numElements() == 0)
    // small header-only stream, both strides
    for (cs <- Seq("Cmono", "C420", "C444")) {
      val s = Y4mLuma.lumaOrNull(s"YUV4MPEG2 W4 H2 $cs\n".getBytes("US-ASCII"))
      assert(s != null && s.getArray(2).numElements() == 0, cs)
    }
  }

  test("y4m_luma chunked window: equals the slice of the full decode; " +
      "skipped frames validated but unread bytes past the window ignored") {
    import graft.expressions.Y4mLuma
    val planes = (0 until 4).map(t =>
      (0 until 8).map(i => (t * 40 + i).toByte).toArray)
    val full = y4m("YUV4MPEG2 W4 H2 Cmono\n", planes)
    val all = Y4mLuma.lumaOrNull(full)
    val win = Y4mLuma.lumaOrNull(full, 1, 2)
    assert(win != null && win.getArray(2).numElements() == 2)
    for (k <- 0 until 2)
      assert(win.getArray(2).getArray(k).toLongArray().toSeq ==
        all.getArray(2).getArray(k + 1).toLongArray().toSeq)
    // window entirely past the stream: zero frames, not a refusal
    assert(Y4mLuma.lumaOrNull(full, 9, 5).getArray(2).numElements() == 0)
    // bytes PAST the window belong to another chunk's decode: trailing
    // garbage refuses the FULL decode but not a [0, 2) window
    val dirty = full ++ "JUNK".getBytes("US-ASCII")
    assert(Y4mLuma.lumaOrNull(dirty) == null)
    val w2 = Y4mLuma.lumaOrNull(dirty, 0, 2)
    assert(w2 != null && w2.getArray(2).numElements() == 2)
    // a truncated frame INSIDE the walk refuses even when it would only
    // be skipped — skips are validated marker-and-length
    val cut = java.util.Arrays.copyOf(full, full.length - 2)
    assert(Y4mLuma.lumaOrNull(cut, 9, 1) == null)
  }

  test("audio near-dup: every planted sample-perturbed twin surfaces by band") {
    val pairs = SparkEntry.queries("q_audio_neardup")(spark, sf0001).collect()
    val planted = pairs.filter(r => r.getLong(1) == r.getLong(0) + 100000L)
    assert(planted.length == 10,
      s"expected all 10 planted twins, found ${planted.length}")
    assert(planted.forall(_.getLong(2) <= 3),
      "every planted twin must sit within the Hamming tolerance")
  }
}
