package graft.oracle

/** Generators for DuckDB oracle SQL that is *bit-identical* to the Spark
  * side. Strategy (SURVEY.md §7 hard part (b)):
  *
  *  - distances: expand the vector math into an explicit left-associated
  *    sum chain `t1 + t2 + ... + tD`. Spark's `aggregate` fold computes
  *    `((0.0 + t1) + t2) + ...` — identical under IEEE 754 since every
  *    term is non-negative or the same first term. Element access is
  *    1-based in DuckDB (`v[1]`), 0-based in Spark.
  *  - query vectors: never inline computed doubles; inline the *formula*
  *    with integer literals so both engines derive the same double.
  */
object OracleGen {

  /** Deterministic synthetic query vector, shared by Spark and SQL sides:
    * q(i) = ((i*37) % 100)/100.0 - 0.5, i = 0-based index.
    */
  object QueryVec {
    val dim = 64
    def value(i: Int): Double = ((i * 37) % 100) / 100.0 - 0.5
    val values: Seq[Double] = (0 until dim).map(value)
    /** SQL term producing the identical double, k = 1-based position. */
    def sqlTerm(k: Int): String = {
      val m = ((k - 1) * 37) % 100
      s"($m/100.0 - 0.5)"
    }
  }

  private def elem(vecCol: String, k: Int): String =
    s"CAST($vecCol[$k] AS DOUBLE)"

  /** Left-associated sum chain of per-element terms. */
  private def chain(dim: Int, term: Int => String): String =
    (1 to dim).map(term).mkString(" + ")

  /** L2 distance between a FLOAT[] column and the QueryVec, as DuckDB SQL. */
  def l2ToQuery(vecCol: String, dim: Int = QueryVec.dim): String =
    "sqrt(" + chain(dim, k => {
      val e = elem(vecCol, k); val q = QueryVec.sqlTerm(k)
      s"($e - $q) * ($e - $q)"
    }) + ")"

  /** Dot product between a FLOAT[] column and the QueryVec. */
  def dotToQuery(vecCol: String, dim: Int = QueryVec.dim): String =
    chain(dim, k => s"${elem(vecCol, k)} * ${QueryVec.sqlTerm(k)}")

  /** Squared L2 norm of a FLOAT[] column. */
  def normSq(vecCol: String, dim: Int = QueryVec.dim): String =
    chain(dim, k => s"${elem(vecCol, k)} * ${elem(vecCol, k)}")

  /** Squared L2 norm of the QueryVec itself. */
  def queryNormSq(dim: Int = QueryVec.dim): String =
    chain(dim, k => s"${QueryVec.sqlTerm(k)} * ${QueryVec.sqlTerm(k)}")

  /** Cosine similarity between a FLOAT[] column and the QueryVec. */
  def cosineToQuery(vecCol: String, dim: Int = QueryVec.dim): String =
    s"(${dotToQuery(vecCol, dim)}) / (sqrt(${normSq(vecCol, dim)}) * sqrt(${queryNormSq(dim)}))"

  /** Dot product between two FLOAT[] columns (for pairwise similarity). */
  def dotCols(a: String, b: String, dim: Int = QueryVec.dim): String =
    chain(dim, k => s"${elem(a, k)} * ${elem(b, k)}")

  /** Cosine similarity between two FLOAT[] columns. */
  def cosineCols(a: String, b: String, dim: Int = QueryVec.dim): String =
    s"(${dotCols(a, b, dim)}) / (sqrt(${normSq(a, dim)}) * sqrt(${normSq(b, dim)}))"
}
