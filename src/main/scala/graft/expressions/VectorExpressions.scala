package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused, whole-stage-codegen vector kernels over ARRAY<FLOAT>/ARRAY<DOUBLE>.
  *
  * The composed `zip_with` + `aggregate` forms (VectorFunctions) are
  * correct but interpreted (higher-order functions don't codegen) and
  * allocate an intermediate array per row; these expressions generate a
  * tight primitive loop instead — the SURVEY.md §4 "promote to Expression
  * with doGenCode when bench demands" path (bench: 79s → sub-second on the
  * 2M-pair cosine join).
  *
  * Numeric contract: identical results to the composed forms — elements
  * are widened to double and accumulated left-to-right, so the DuckDB
  * oracle's left-associated sum chains still match bit-for-bit.
  * Length mismatch or null element → null result.
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  protected def get(a: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  protected def getterJava(arr: String, i: String, dt: DataType): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  /** Per-element accumulation statement(s); acc0..acc2 available. */
  protected def accumulate(x: Double, y: Double, acc: Array[Double]): Unit
  protected def finish(acc: Array[Double]): Double
  protected def accumulateJava(x: String, y: String, acc: Seq[String]): String
  protected def finishJava(acc: Seq[String]): String
  protected def numAccumulators: Int = 1

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    val acc = new Array[Double](numAccumulators)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      accumulate(get(a, i, lt), get(b, i, rt), acc)
      i += 1
    }
    finish(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lt = elemType(left); val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val accs = (0 until numAccumulators).map(k => ctx.freshName(s"acc$k"))
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val accDecl = accs.map(v => s"double $v = 0.0;").mkString(" ")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $accDecl
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${getterJava(a, i, lt)};
         |    final double $y = ${getterJava(b, i, rt)};
         |    ${accumulateJava(x, y, accs)}
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = ${finishJava(accs)}; }
         |}
       """.stripMargin
    })
  }
}

/** Single-pass L2 normalization: v / ‖v‖ (zero vector stays zero). The
  * composed `transform(a, x => x / norm(a))` form re-evaluates the O(d)
  * norm inside the per-element lambda — O(d²) per row; this is O(d).
  */
case class NormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // nullSafeEval returns null for arrays containing null elements, even
  // when the child column itself is non-nullable — so this node is always
  // nullable regardless of the child.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize expects ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    NormalizeExpr.eval(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // eval returns null on null elements — propagate into isNull
      s"""${ev.value} = graft.expressions.NormalizeExpr$$.MODULE$$.eval($c, $isFloat);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override def prettyName: String = "l2_normalize"
  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

object NormalizeExpr {

  /** Shared by interpreted eval and generated code; null on null elements. */
  def eval(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val vals = new Array[Double](n)
    var i = 0
    var norm2 = 0.0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      vals(i) = x
      norm2 += x * x
      i += 1
    }
    if (norm2 != 0.0) {
      val norm = math.sqrt(norm2)
      i = 0
      while (i < n) { vals(i) = vals(i) / norm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
  }
}

/** Σ (x-y)² then sqrt — L2 distance (pgvector `<->`). */
case class L2DistanceExpr(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"
  protected def accumulate(x: Double, y: Double, acc: Array[Double]): Unit =
    acc(0) += (x - y) * (x - y)
  protected def finish(acc: Array[Double]): Double = math.sqrt(acc(0))
  protected def accumulateJava(x: String, y: String, acc: Seq[String]): String =
    s"${acc(0)} += ($x - $y) * ($x - $y);"
  protected def finishJava(acc: Seq[String]): String = s"java.lang.Math.sqrt(${acc(0)})"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Σ x·y — inner product (pgvector `<#>` analogue). */
case class DotProductExpr(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  protected def accumulate(x: Double, y: Double, acc: Array[Double]): Unit =
    acc(0) += x * y
  protected def finish(acc: Array[Double]): Double = acc(0)
  protected def accumulateJava(x: String, y: String, acc: Seq[String]): String =
    s"${acc(0)} += $x * $y;"
  protected def finishJava(acc: Seq[String]): String = acc(0)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** dot/(‖a‖·‖b‖) in one fused pass — cosine similarity (pgvector `<=>` is
  * 1 − this). Three independent left-to-right accumulators ≡ three separate
  * folds, so results equal the composed form exactly.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"
  override protected def numAccumulators: Int = 3
  protected def accumulate(x: Double, y: Double, acc: Array[Double]): Unit = {
    acc(0) += x * y; acc(1) += x * x; acc(2) += y * y
  }
  protected def finish(acc: Array[Double]): Double =
    acc(0) / (math.sqrt(acc(1)) * math.sqrt(acc(2)))
  protected def accumulateJava(x: String, y: String, acc: Seq[String]): String =
    s"${acc(0)} += $x * $y; ${acc(1)} += $x * $x; ${acc(2)} += $y * $y;"
  protected def finishJava(acc: Seq[String]): String =
    s"${acc(0)} / (java.lang.Math.sqrt(${acc(1)}) * java.lang.Math.sqrt(${acc(2)}))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
