package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Point lookup into a serialized count-min sketch (the binary produced by
  * Spark's `count_min_sketch` aggregate): estimated count of `key`.
  *
  * Closes the loop on the CMS heavy-hitter pattern: the sketch aggregates
  * distributively (mergeable partial state — one tiny binary per
  * partition crosses the shuffle, never per-key rows), and this
  * expression reads estimates back inside the engine so the whole
  * heavy-hitters pipeline stays declarative. The CMS guarantee
  * (estimate ≥ true count, ≤ true count + ε·N at the configured
  * confidence) is what q_heavy_hitters' bound flag asserts.
  *
  * The deserialized sketch is cached per-expression-instance keyed on the
  * binary's identity — the sketch side is a single aggregated row
  * broadcast into the probe, so in practice it deserializes once per
  * task, not once per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate expects (BINARY sketch, BIGINT key), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketchBytes: Any, key: Any): Any =
    CmsEstimate.estimate(sketchBytes.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = graft.expressions.CmsEstimate$$.MODULE$$.estimate($s, $k);")

  override def prettyName: String = "cms_estimate"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  // tiny identity-keyed cache: the sketch binary is the same object for
  // every row of a task once the aggregated row is broadcast/reused
  private val last =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  def estimate(bytes: Array[Byte], key: Long): Long = {
    val cached = last.get()
    val cms =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val c = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
        last.set((bytes, c))
        c
      }
    cms.estimateCount(java.lang.Long.valueOf(key))
  }
}
