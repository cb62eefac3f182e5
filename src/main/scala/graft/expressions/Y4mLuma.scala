package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-frame luma-plane decode of a YUV4MPEG2 (.y4m) video stream as a
  * native Catalyst expression — the video third of the multimodal decode
  * surface (images: [[DHash]]'s BMP pixel parse, audio: [[WavSamples]]'
  * PCM chunk walk). Y4M is the one mainstream video container decodable
  * with pure byte arithmetic: an ASCII stream header
  * `YUV4MPEG2 W<w> H<h> <params>\n` followed by frames, each an ASCII
  * `FRAME<params>\n` marker and a raw planar picture whose size is fixed
  * by the header's colorspace tag — no entropy coding anywhere (it is
  * the standard uncompressed interchange format of ffmpeg/x264/
  * mjpegtools; the reference pipeline's multimodal boundary is the same
  * header-metadata-vs-codec split, cf. rag.py's text-only ingest).
  *
  * The parser WALKS the real layout: verifies the magic, scans the
  * space-separated header tokens for W/H/C (unknown tags like F/I/A/X
  * are legal and skipped), then iterates `FRAME` markers — honoring
  * optional per-frame parameters up to the newline — and slices each
  * picture at the colorspace-determined stride, returning the FIRST
  * (luma) plane of every frame: C420* pictures carry w·h luma then two
  * half-resolution chroma planes (w·h·3/2 total), C444 three full
  * planes, Cmono luma only. It REFUSES (returns NULL) anything it
  * cannot decode honestly — wrong magic, missing/non-positive W or H,
  * odd dimensions under 4:2:0 subsampling, a colorspace it has no
  * stride rule for (e.g. C422, C410), a malformed frame marker, or a
  * truncated picture.
  *
  * Output is `struct(w, h, frames array<array<long>>)` — row-major
  * 0-255 luma values — so fingerprinting (per-frame dHash grids,
  * temporal means) is DECLARATIVE Spark SQL over the arrays, exact
  * integer arithmetic that replays in any engine; only the byte walk is
  * native. O(bytes) per row, narrow, no shuffle — scan-bound at any
  * corpus size.
  */
/** `frameFrom`/`maxFrames` are the CHUNKED-decode window (defaults =
  * whole stream): frames before `frameFrom` are walked marker-by-marker
  * but never materialized (an O(bytes) pointer skip, zero allocation),
  * and decoding STOPS after `maxFrames` planes — so one row's decode
  * holds at most `maxFrames` frames in memory whatever the stream
  * length, the shape a long video needs at 100 TB (frame ranges fan out
  * as (vid, chunk) rows and each task decodes only its window; bytes
  * past the window are deliberately not validated — they belong to
  * another chunk's decode).
  */
case class Y4mLuma(child: Expression, frameFrom: Int = 0,
                   maxFrames: Int = Int.MaxValue) extends UnaryExpression {
  require(frameFrom >= 0 && maxFrames >= 0,
    s"y4m_luma frame window must be non-negative, got [$frameFrom, +$maxFrames)")

  override def dataType: DataType = Y4mLuma.OutType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"y4m_luma expects BINARY, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Y4mLuma.lumaOrNull(input.asInstanceOf[Array[Byte]], frameFrom, maxFrames)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.InternalRow yv =
         |  graft.expressions.Y4mLuma$$.MODULE$$.lumaOrNull($c, $frameFrom, $maxFrames);
         |if (yv == null) { ${ev.isNull} = true; } else { ${ev.value} = yv; }
         |""".stripMargin)

  override def prettyName: String = "y4m_luma"
  override protected def withNewChildInternal(newChild: Expression): Y4mLuma =
    copy(child = newChild)
}

object Y4mLuma {

  val OutType: StructType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("frames",
      ArrayType(ArrayType(LongType, containsNull = false),
        containsNull = false), nullable = false)))

  private val Magic = "YUV4MPEG2"

  /** Whole-stream decode (every frame). */
  def lumaOrNull(b: Array[Byte]): InternalRow =
    lumaOrNull(b, 0, Int.MaxValue)

  /** (w, h, luma planes of frames [frameFrom, frameFrom + maxFrames)),
    * or null if not honestly decodable. Skipped frames are validated
    * marker-and-length but never materialized; decoding stops — and
    * later bytes go unread — once the window is full (see the class
    * doc for why that is the contract, not a shortcut).
    */
  def lumaOrNull(b: Array[Byte], frameFrom: Int,
                 maxFrames: Int): InternalRow = {
    if (b == null || b.length < Magic.length + 1) return null
    def u(i: Int): Int = b(i) & 0xFF
    var i = 0
    while (i < Magic.length) {
      if (u(i) != Magic.charAt(i)) return null
      i += 1
    }
    // header: space-separated <tag><value> tokens up to '\n'
    var w = -1
    var h = -1
    var cs = "420" // the Y4M default colorspace when no C tag is present
    var off = Magic.length
    while (off < b.length && u(off) != '\n') {
      if (u(off) != ' ') return null // tokens are single-space separated
      off += 1
      val tag = if (off < b.length) u(off) else -1
      if (tag == -1) return null // header ends in a bare space: malformed
      val start = off + 1
      while (off < b.length && u(off) != ' ' && u(off) != '\n') off += 1
      val v = new String(b, start, off - start, "US-ASCII")
      tag match {
        case 'W' => w = parseIntOr(v, -1)
        case 'H' => h = parseIntOr(v, -1)
        case 'C' => cs = v
        case _ => () // F/I/A/X...: legal, irrelevant to the byte layout
      }
    }
    if (off >= b.length || w <= 0 || h <= 0) return null
    off += 1 // consume header '\n'
    // plane sizes in Long: a crafted header like 'W65536 H32768' must
    // refuse, not overflow Int into a negative allocation (cf. the same
    // .toLong guard in DHash). The only STATIC refusal is a plane no JVM
    // array can hold; "picture larger than the remaining stream" is
    // decided per frame in the loop below, so a legal header-only
    // (zero-frame) stream with large declared dimensions still decodes
    // to (w, h, []).
    val lumaL = w.toLong * h
    if (lumaL > Int.MaxValue) return null
    val luma = lumaL.toInt
    // picture size per frame, from the colorspace's published plane layout
    val frameBytesL: Long =
      if (cs == "mono") lumaL
      else if (cs.startsWith("420")) {
        if ((w & 1) != 0 || (h & 1) != 0) return null
        lumaL + 2L * ((w / 2).toLong * (h / 2))
      } else if (cs == "444") lumaL * 3
      else return null // C422/C411/C410…: no stride rule here — refuse
    if (frameBytesL > Int.MaxValue) return null
    val frameBytes = frameBytesL.toInt
    val frames = scala.collection.mutable.ArrayBuffer.empty[GenericArrayData]
    var idx = 0 // frame index in the stream; [frameFrom, +maxFrames) emit
    while (off < b.length && frames.length < maxFrames) {
      // FRAME marker with optional parameters, newline-terminated
      if (off + 5 > b.length) return null
      var k = 0
      while (k < 5) {
        if (u(off + k) != "FRAME".charAt(k)) return null
        k += 1
      }
      off += 5
      while (off < b.length && u(off) != '\n') {
        if (u(off) != ' ') return null
        off += 1
        while (off < b.length && u(off) != ' ' && u(off) != '\n') off += 1
      }
      if (off >= b.length) return null
      off += 1 // consume marker '\n'
      // truncated picture (Long compare: off + frameBytes can exceed Int)
      if (off.toLong + frameBytes > b.length) return null
      if (idx >= frameFrom) {
        val plane = new Array[Long](luma)
        var p = 0
        while (p < luma) {
          plane(p) = u(off + p).toLong
          p += 1
        }
        frames += new GenericArrayData(plane)
      }
      off += frameBytes
      idx += 1
    }
    new GenericInternalRow(Array[Any](w, h,
      new GenericArrayData(frames.toArray[Any])))
  }

  private def parseIntOr(s: String, dflt: Int): Int =
    try s.toInt
    catch { case _: NumberFormatException => dflt }
}
