package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

import graft.expressions.{CosineSimExpr, DotProductExpr, L2DistanceExpr, NormalizeExpr, VectorSumFp}

/** Vector distance / similarity column functions over `ARRAY<FLOAT>` /
  * `ARRAY<DOUBLE>` columns.
  *
  * Spark-native analogue of pgvector's distance operators used by the
  * reference: `<->` L2 (reference `rag.py:78`), plus the `<=>` cosine and
  * `<#>` inner-product analogues the reference's stack supports.
  *
  * Primary forms are fused codegen Catalyst expressions (tight primitive
  * loop inside whole-stage codegen — see graft.expressions); the
  * `*Composed` twins are the built-in `zip_with`+`aggregate` formulations
  * kept for cross-checking. Both accumulate left-to-right in double, so
  * results are bit-identical to each other and to the SQL oracle's
  * left-associated sum chains.
  *
  * Scale note: narrow per-row expressions — no shuffle, perfectly
  * distributed; at 100 TB the cost is a single scan.
  */
object VectorFunctions {

  private def bridge2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                          org.apache.spark.sql.catalyst.expressions.Expression) =>
                          org.apache.spark.sql.catalyst.expressions.Expression)
                     (a: Column, b: Column): Column =
    GraftBridge.column(f(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Euclidean (L2) distance — pgvector `<->` (reference `rag.py:78`). */
  def l2(a: Column, b: Column): Column = bridge2(L2DistanceExpr)(a, b)

  /** Inner product — pgvector `<#>` analogue (negated there; plain dot here). */
  def dot(a: Column, b: Column): Column = bridge2(DotProductExpr)(a, b)

  /** Cosine similarity — pgvector `<=>` is `1 - cosine`; we expose similarity. */
  def cosine(a: Column, b: Column): Column = bridge2(CosineSimExpr)(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine distance (pgvector `<=>` semantics). */
  def cosineDistance(a: Column, b: Column): Column = lit(1.0) - cosine(a, b)

  // ---- composed (built-in HOF) twins, for cross-checks and reference ----

  private def d(c: Column): Column = c.cast("double")

  private def zipSum(a: Column, b: Column, f: (Column, Column) => Column): Column =
    aggregate(zip_with(a, b, (x, y) => f(d(x), d(y))), lit(0.0), (acc, v) => acc + v)

  def l2SqComposed(a: Column, b: Column): Column =
    zipSum(a, b, (x, y) => (x - y) * (x - y))

  def l2Composed(a: Column, b: Column): Column = sqrt(l2SqComposed(a, b))

  def dotComposed(a: Column, b: Column): Column = zipSum(a, b, (x, y) => x * y)

  def cosineComposed(a: Column, b: Column): Column =
    dotComposed(a, b) / (sqrt(dotComposed(a, a)) * sqrt(dotComposed(b, b)))

  /** L2-normalize a vector to unit length (elements widened to double;
    * zero vector stays zero). Single-pass expression — the composed
    * `transform(a, _ / norm(a))` form is O(d²) per row.
    */
  def normalize(a: Column): Column =
    GraftBridge.column(NormalizeExpr(GraftBridge.expression(a)))

  /** Dimension guard: Spark has no fixed-length vector type (SURVEY.md §1.4
    * hard part (a)) — enforce via predicate, e.g. `df.filter(dimIs(col, 384))`.
    */
  def dimIs(a: Column, dim: Int): Column = size(a) === lit(dim)

  /** Element-wise vector sum aggregate in 1e-12 fixed point — the custom
    * UDAF (TypedImperativeAggregate) surface; order/partitioning-exact.
    */
  def vectorSumFp(a: Column, dim: Int): Column =
    GraftBridge.column(
      VectorSumFp(GraftBridge.expression(a), dim).toAggregateExpression())
}
