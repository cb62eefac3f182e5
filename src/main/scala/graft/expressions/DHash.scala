package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit dHash (difference hash) image fingerprint as a native Catalyst
  * expression over raw image bytes — the perceptual-hash half of image
  * near-dup dedup (fingerprints within a small Hamming distance =
  * near-identical images; banded join mines the pairs, cf.
  * Dedup.dhashPairs).
  *
  * The decode is REAL pixel parsing, not a stub: uncompressed 24-bpp BMP
  * (BITMAPINFOHEADER) is fully decodable with pure byte arithmetic — the
  * one mainstream raster container that needs no codec library. The
  * parser honors the data-offset field, row stride padding (rows pad to
  * 4 bytes), bottom-up vs top-down row order (signed biHeight), and
  * REFUSES (returns NULL) anything it cannot decode honestly:
  * non-BMP magic, bpp ≠ 24, compressed, truncated pixel data, or images
  * smaller than the 9×8 sample grid. PNG/GIF payloads decode to NULL
  * here — inflating them needs zlib/LZW, which is the codec boundary
  * (cf. Multimodal.decodeBatch's header-only contract for those).
  *
  * dHash proper: grayscale each pixel (integer (r+g+b) DIV 3),
  * area-average down to a 9-wide × 8-high grid (integer block sums DIV
  * block size — cell (tx,ty) covers source x ∈ [tx·W DIV 9,
  * (tx+1)·W DIV 9), same for y), then bit (ty·8+tx) = 1 iff
  * cell(tx,ty) < cell(tx+1,ty) — 64 horizontal-gradient bits. All
  * integer, so fingerprints are engine-replayable from the pixel values.
  *
  * O(pixels) per row, narrow, no shuffle — scan-bound at any corpus size.
  */
case class DHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dhash expects BINARY, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    DHash.fingerprintOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long dh = graft.expressions.DHash$$.MODULE$$.fingerprintOrNull($c);
         |if (dh == null) { ${ev.isNull} = true; } else { ${ev.value} = dh.longValue(); }
         |""".stripMargin)

  override def prettyName: String = "dhash"
  override protected def withNewChildInternal(newChild: Expression): DHash =
    copy(child = newChild)
}

object DHash {
  /** Target sample grid: 9 columns × 8 rows → 8×8 horizontal gradients. */
  val GridW = 9
  val GridH = 8

  /** dHash of an uncompressed 24-bpp BMP, or null if the payload is not
    * honestly decodable (see class doc for the refusal list).
    */
  def fingerprintOrNull(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    def u(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Int =
      u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    val off = le32(10)
    val dibSize = le32(14)
    val w = le32(18)
    val hRaw = le32(22) // SIGNED: negative = top-down row order
    val topDown = hRaw < 0
    val h = math.abs(hRaw.toLong).toInt
    if (dibSize < 40 || b.length < 14 + dibSize) return null
    val bpp = le16(28)
    val comp = le32(30)
    if (bpp != 24 || comp != 0) return null
    if (w < GridW || h < GridH) return null // too small to sample honestly
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > b.length) return null
    // integer grayscale of source pixel (x, yTop) with yTop = 0 at the
    // image TOP regardless of storage order
    def gray(x: Int, yTop: Int): Long = {
      val yFile = if (topDown) yTop else h - 1 - yTop
      val p = off + yFile * stride + x * 3
      ((u(p) + u(p + 1) + u(p + 2)) / 3).toLong
    }
    // area-average downsample to GridW × GridH (integer block mean)
    val cells = Array.ofDim[Long](GridH, GridW)
    var ty = 0
    while (ty < GridH) {
      val y0 = ty * h / GridH
      val y1 = (ty + 1) * h / GridH
      var tx = 0
      while (tx < GridW) {
        val x0 = tx * w / GridW
        val x1 = (tx + 1) * w / GridW
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(x, y); x += 1 }
          y += 1
        }
        cells(ty)(tx) = sum / ((y1 - y0).toLong * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    var fp = 0L
    ty = 0
    while (ty < GridH) {
      var tx = 0
      while (tx < GridW - 1) {
        if (cells(ty)(tx) < cells(ty)(tx + 1)) fp |= 1L << (ty * 8 + tx)
        tx += 1
      }
      ty += 1
    }
    java.lang.Long.valueOf(fp)
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
