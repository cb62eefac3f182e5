package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 symmetric quantization of embedding columns.
  *
  * Each vector is scaled by its own max-|x| to the int8 range [-127, 127]:
  *   q_i = round(x_i * 127 / maxabs)        (zero vector → all zeros)
  * and similarity is computed in integer arithmetic, dequantized by the
  * two scale factors:
  *   dot(a, b) ≈ qdot(qa, qb) * (maxabs_a/127) * (maxabs_b/127)
  *
  * At 100 TB this is the memory/bandwidth lever: 4× smaller vectors than
  * float32, integer dot products (order-independent — no float association
  * concerns in the shuffle), and the scale factor rides along as one
  * double per vector. Exactness: quantized codes and integer dot are
  * engine-independent; the dequantized score is a fixed left-associated
  * double product, so it oracle-matches bit-for-bit.
  */
object Quantize {

  /** max |x_i| of a FLOAT[]/DOUBLE[] column, as DOUBLE. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Int8 codes as BIGINT[] (zero vector stays all-zero). */
  def int8(vec: Column, maxAbsCol: Column): Column =
    transform(vec, x =>
      when(maxAbsCol === 0.0, lit(0L))
        .otherwise(round(x.cast("double") * 127.0 / maxAbsCol).cast("long")))

  /** Integer dot product of a quantized column with literal query codes. */
  def qdot(qv: Column, queryCodes: Seq[Long]): Column =
    aggregate(zip_with(qv, typedlit(queryCodes), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)

  /** Driver-side int8 codes of a query vector (HALF_UP, matching the
    * column op's `round`).
    */
  def quantizeQuery(q: Seq[Double]): (Seq[Long], Double) = {
    val maxabs = q.map(math.abs).max
    val codes =
      if (maxabs == 0.0) q.map(_ => 0L)
      else q.map(x => BigDecimal(x * 127.0 / maxabs)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    (codes, maxabs)
  }

  /** Quantized top-k by dequantized dot-product score (descending). */
  def knnQuantized(df: DataFrame, vecCol: Column, idCol: Column,
                   query: Seq[Double], k: Int): DataFrame = {
    val (codes, qMaxAbs) = quantizeQuery(query)
    df.withColumn("maxabs", maxAbs(vecCol))
      .withColumn("qdot", qdot(int8(vecCol, col("maxabs")), codes))
      .withColumn("score",
        col("qdot").cast("double") * (col("maxabs") / lit(127.0)) * (lit(qMaxAbs) / lit(127.0)))
      .orderBy(col("score").desc, idCol.asc)
      .limit(k)
  }
}
