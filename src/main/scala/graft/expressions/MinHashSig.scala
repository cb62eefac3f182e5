package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val sig = MinHashSig.signature(
      input.asInstanceOf[UTF8String].toString, numHashes, shingleN)
    new GenericArrayData(sig.map(UTF8String.fromString))
  }

  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def shingles(text: String, n: Int): Array[String] = {
    val toks = HashEmbed.tokens(text)
    if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toArray
    else Array(toks.mkString(" "))
  }

  def rotHex(h: String, i: Int): String =
    if (i == 0) h else h.substring(4 * i) + h.substring(0, 4 * i)

  def signature(text: String, numHashes: Int, shingleN: Int): Array[String] = {
    val hs = shingles(text, shingleN).map(md5hex)
    Array.tabulate(numHashes) { i =>
      var min: String = null
      var j = 0
      while (j < hs.length) {
        val r = rotHex(hs(j), i)
        if (min == null || r.compareTo(min) < 0) min = r
        j += 1
      }
      min
    }
  }
}
