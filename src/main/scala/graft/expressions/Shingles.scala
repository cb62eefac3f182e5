package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a native single-pass expression.
  *
  * Same semantics as the composed form (Dedup.shingles: tokens → sliding
  * n-grams joined with spaces, whole-text fallback below n tokens;
  * `distinct = true` additionally keeps first occurrences only, like
  * `array_distinct`), but one imperative pass per row — Spark's
  * higher-order functions (transform/sequence lambdas) evaluate
  * interpreted, which measured ~8 s on a 5k-doc corpus where this runs
  * in a few hundred ms.
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles expects STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Shingles.evalUTF8(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Shingles$$.MODULE$$.evalUTF8($c, $n, $distinct);")

  override def prettyName: String = "shingles"
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  def evalUTF8(s: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val sh = MinHashSig.shingles(s.toString, n)
    val out =
      if (!distinct) sh
      else {
        // first-occurrence order, like array_distinct
        val seen = new java.util.LinkedHashSet[String]()
        sh.foreach(seen.add)
        seen.toArray(new Array[String](seen.size()))
      }
    new GenericArrayData(out.map(UTF8String.fromString(_): AnyRef))
  }
}

/** Intra-document repetition ratio — fraction of duplicate word n-gram
  * shingles, `1 - distinct/total` (the C4/Gopher repetition quality
  * rule) — in one pass. Arithmetic matches the SQL oracle's
  * `1.0 - CAST(d AS DOUBLE) / CAST(t AS DOUBLE)` exactly.
  */
case class RepetitionRatio(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_ratio expects STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    RepetitionRatio.eval(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RepetitionRatio$$.MODULE$$.eval($c.toString(), $n);")

  override def prettyName: String = "repetition_ratio"
  override protected def withNewChildInternal(newChild: Expression): RepetitionRatio =
    copy(child = newChild)
}

object RepetitionRatio {
  def eval(text: String, n: Int): Double = {
    val sh = MinHashSig.shingles(text, n)
    val seen = new java.util.HashSet[String]()
    sh.foreach(seen.add)
    1.0 - seen.size().toDouble / sh.length.toDouble
  }
}
