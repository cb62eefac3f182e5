package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** PCM sample decode of a WAV payload as a native Catalyst expression —
  * the audio half of the multimodal decode surface (images:
  * [[DHash]]'s BMP pixel parse). Uncompressed 16-bit PCM WAV is the one
  * mainstream audio container decodable with pure byte arithmetic — the
  * published RIFF layout: "RIFF" + size + "WAVE", then chunks; the
  * `fmt ` chunk carries audio format (1 = PCM), channel count, sample
  * rate and bit depth; the `data` chunk carries the little-endian
  * two's-complement samples. The parser WALKS the chunk list (extra
  * chunks like LIST/fact are legal and skipped), REFUSES (returns NULL)
  * anything it cannot decode honestly — wrong magic, non-PCM, bit depth
  * ≠ 16, truncated data — and for multi-channel audio returns the FIRST
  * channel (the deterministic mono projection feature extraction wants).
  *
  * The output is a LongType array of the raw sample values, so feature
  * extraction (RMS energy, zero crossings, peak, per-frame energies) is
  * DECLARATIVE Spark SQL over the array — exact integer aggregates that
  * replay in any engine — rather than more native code. O(bytes) per
  * row, narrow, no shuffle.
  */
case class WavSamples(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wav_samples expects BINARY, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WavSamples.samplesOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData wv =
         |  graft.expressions.WavSamples$$.MODULE$$.samplesOrNull($c);
         |if (wv == null) { ${ev.isNull} = true; } else { ${ev.value} = wv; }
         |""".stripMargin)

  override def prettyName: String = "wav_samples"
  override protected def withNewChildInternal(newChild: Expression): WavSamples =
    copy(child = newChild)
}

object WavSamples {

  /** First-channel 16-bit PCM samples, or null if not honestly decodable. */
  def samplesOrNull(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 44) return null
    def u(i: Int): Int = b(i) & 0xFF
    def tag(i: Int, s: String): Boolean =
      s.indices.forall(k => u(i + k) == s.charAt(k))
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      u(i).toLong | (u(i + 1).toLong << 8) | (u(i + 2).toLong << 16) |
        (u(i + 3).toLong << 24)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return null
    // chunk walk: [id(4) size(4) payload(size, even-padded)]*
    var off = 12
    var channels = -1
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val sz = le32(off + 4)
      if (sz < 0 || off + 8 + sz > b.length) return null
      if (tag(off, "fmt ")) {
        if (sz < 16) return null
        val fmt = le16(off + 8)
        channels = le16(off + 10)
        val bits = le16(off + 22)
        if (fmt != 1 || bits != 16 || channels < 1) return null
      } else if (tag(off, "data")) {
        dataOff = off + 8
        dataLen = sz
      }
      off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (channels < 1 || dataOff < 0) return null
    val frameBytes = 2 * channels
    val n = (dataLen / frameBytes).toInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val p = dataOff + i * frameBytes // channel 0 of frame i
      out(i) = ((u(p) | (u(p + 1) << 8)).toShort).toLong // sign-extend
      i += 1
    }
    new GenericArrayData(out)
  }
}
