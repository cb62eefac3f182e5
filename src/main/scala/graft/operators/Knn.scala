package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Exact brute-force K-nearest-neighbour — the reference's flagship operator
  * (pgvector `ORDER BY embedding <-> q LIMIT k`, reference `rag.py:77-82`,
  * which with no index is a sequential scan + top-k sort inside Postgres).
  *
  * Spark-native shape: a narrow distance projection followed by
  * `orderBy(...).limit(k)`, which Catalyst plans as
  * `TakeOrderedAndProjectExec` — a per-partition bounded heap with a driver
  * merge of k-element heaps. That is exactly the 100 TB-safe formulation:
  * no global sort, no shuffle of the full table, O(k) driver memory.
  *
  * Ties are stabilized with a secondary sort on the id column so results
  * (and their hashes) are reproducible (SURVEY.md §7 hard part (d)).
  */
object Knn {

  sealed trait Metric
  case object L2 extends Metric
  case object Cosine extends Metric   // similarity, descending
  case object Dot extends Metric     // inner product, descending

  /** Top-k rows of `df` nearest to `query` under `metric`.
    * Output: original columns + `distance` (L2) or `score` (cosine/dot).
    */
  def knn(df: DataFrame, vecCol: Column, idCol: Column, query: Seq[Double], k: Int,
          metric: Metric = L2): DataFrame = {
    val q = typedlit(query)
    metric match {
      case L2 =>
        df.withColumn("distance", l2(vecCol, q))
          .orderBy(col("distance").asc, idCol.asc)
          .limit(k)
      case Cosine =>
        df.withColumn("score", cosine(vecCol, q))
          .orderBy(col("score").desc, idCol.asc)
          .limit(k)
      case Dot =>
        df.withColumn("score", dot(vecCol, q))
          .orderBy(col("score").desc, idCol.asc)
          .limit(k)
    }
  }

  /** Per-group top-k (e.g., k nearest within each category) — window variant.
    * `row_number` over a distance-ordered window; one shuffle on the group key.
    */
  def knnPerGroup(df: DataFrame, groupCol: Column, vecCol: Column, idCol: Column,
                  query: Seq[Double], k: Int): DataFrame = {
    val q = typedlit(query)
    val withDist = df.withColumn("distance", l2(vecCol, q))
    val w = Window.partitionBy(groupCol).orderBy(col("distance").asc, idCol.asc)
    withDist
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }
}
