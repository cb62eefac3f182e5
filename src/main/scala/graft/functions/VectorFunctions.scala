package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / similarity column functions over `ARRAY<FLOAT>` columns.
  *
  * Spark-native analogue of pgvector's distance operators used by the
  * reference: `<->` L2 (reference `rag.py:78`), plus the `<=>` cosine and
  * `<#>` inner-product analogues the reference's stack supports.
  *
  * Built from codegen'd built-ins (`zip_with` + `aggregate`), so the whole
  * computation stays inside whole-stage codegen — no UDF serialization, no
  * Python boundary. Summation is a strict left-to-right fold (`aggregate`
  * folds elements in array order, and `0.0 + t1 == t1` exactly in IEEE 754),
  * which makes results bit-reproducible and oracle-checkable against a SQL
  * engine evaluating the same left-associated sum chain.
  *
  * Scale note: these are narrow per-row expressions — no shuffle, perfectly
  * distributed; at 100 TB the cost is a single scan.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Sum of `f(a_i, b_i)` over zipped elements, left-to-right. */
  private def zipSum(a: Column, b: Column, f: (Column, Column) => Column): Column =
    aggregate(zip_with(a, b, (x, y) => f(d(x), d(y))), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    zipSum(a, b, (x, y) => (x - y) * (x - y))

  /** Euclidean (L2) distance — pgvector `<->` (reference `rag.py:78`). */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Inner product — pgvector `<#>` analogue (negated there; plain dot here). */
  def dot(a: Column, b: Column): Column =
    zipSum(a, b, (x, y) => x * y)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — pgvector `<=>` is `1 - cosine`; we expose similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine distance (pgvector `<=>` semantics). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosine(a, b)

  /** L2-normalize a vector to unit length (float elements preserved as double). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => d(x) / n)
  }

  /** Dimension guard: Spark has no fixed-length vector type (SURVEY.md §1.4
    * hard part (a)) — enforce via predicate, e.g. `df.filter(dimIs(col, 384))`.
    */
  def dimIs(a: Column, dim: Int): Column = size(a) === lit(dim)
}
