package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature as a native Catalyst expression.
  *
  * Semantics identical to the composed-builtin formulation
  * (Dedup.minhashSignature — tokens → word n-gram shingles → md5 hex per
  * shingle → slot i = lexicographic min of the 4·i-hex-rotated digests),
  * but one imperative pass per row: the interpreted higher-order-function
  * chain measured ~12 ms/row at sf0.1 (inlined 8× by projection collapse);
  * this evaluates in ~0.1 ms/row.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // SQL-registered (graft.GraftFunctions), so reject non-STRING args at
  // analysis time instead of a ClassCastException at execution time.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.evalUTF8(input.asInstanceOf[UTF8String], numHashes, shingleN)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashSig$$.MODULE$$.evalUTF8($c, $numHashes, $shingleN);")

  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Entry point shared by interpreted eval and generated code. */
  def evalUTF8(s: UTF8String, numHashes: Int, shingleN: Int): GenericArrayData =
    new GenericArrayData(
      signature(s.toString, numHashes, shingleN).map(UTF8String.fromString))

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val md = HashEmbed.threadMd5.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def shingles(text: String, n: Int): Array[String] = {
    val toks = HashEmbed.tokens(text)
    if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toArray
    else Array(toks.mkString(" "))
  }

  /** Rotation shift for slot i: (4·i + i/8) mod 32 — 32 distinct shifts,
    * identical to the original 4·i for i ≤ 7 (oracle stability).
    */
  def shift(i: Int): Int = (4 * i + i / 8) % 32

  def rotHex(h: String, i: Int): String = {
    val s = shift(i)
    if (s == 0) h else h.substring(s) + h.substring(0, s)
  }

  /** Compare rotation-by-s of `h` against `min` without materializing the
    * rotated string — the rotated candidate is only allocated when it
    * becomes the new minimum.
    */
  private def cmpRot(h: String, s: Int, min: String): Int = {
    var k = 0
    while (k < 32) {
      val c = h.charAt((s + k) % 32) - min.charAt(k)
      if (c != 0) return c
      k += 1
    }
    0
  }

  def signature(text: String, numHashes: Int, shingleN: Int): Array[String] = {
    require(numHashes >= 1 && numHashes <= 32,
      s"numHashes must be in [1, 32] (32 distinct hex rotations of one md5), got $numHashes")
    val hs = shingles(text, shingleN).map(md5hex)
    Array.tabulate(numHashes) { i =>
      val s = shift(i)
      var min: String = null
      var j = 0
      while (j < hs.length) {
        if (min == null || cmpRot(hs(j), s, min) < 0) min = rotHex(hs(j), i)
        j += 1
      }
      min
    }
  }
}
