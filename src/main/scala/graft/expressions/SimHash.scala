package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash document fingerprint as a native Catalyst expression.
  *
  * Near-duplicate documents get fingerprints within a small Hamming
  * distance — the classic web-dedup sketch (Charikar similarity hashing,
  * as used for near-dup detection in large crawl corpora).
  *
  * token hash h(t) = first 8 hex chars of md5(t) as uint32 (same md5
  * source as HashEmbed, so the oracle reuses the machinery). For each bit
  * k: sum +1/-1 over tokens by bit k of h(t); fingerprint bit k = 1 iff
  * the sum is positive. All-integer → bit-identical across engines.
  *
  * O(tokens) per row, narrow, no shuffle.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // SQL-registered (graft.GraftFunctions), so reject non-STRING args at
  // analysis time instead of a ClassCastException at execution time.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash expects STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash.fingerprint(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash$$.MODULE$$.fingerprint($c.toString());")

  override def prettyName: String = "simhash"
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  val Bits = 32

  /** uint32 from the first 8 hex chars of md5(token). */
  def tokenHash(token: String): Long = {
    val md = HashEmbed.threadMd5.get()
    md.reset()
    val d = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def fingerprint(text: String): Long = {
    val toks = HashEmbed.tokens(text)
    val sums = new Array[Long](Bits)
    toks.foreach { t =>
      val h = tokenHash(t)
      var k = 0
      while (k < Bits) {
        sums(k) += (if (((h >> k) & 1L) == 1L) 1L else -1L)
        k += 1
      }
    }
    var fp = 0L
    var k = 0
    while (k < Bits) {
      if (sums(k) > 0L) fp |= (1L << k)
      k += 1
    }
    fp
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
