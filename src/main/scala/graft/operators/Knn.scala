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

  /** Batch KNN join: top-k nearest corpus rows for EVERY query row (the
    * reference's per-query retrieval loop done as one set operation).
    *
    * Shape: the query set broadcasts (it is the small side by
    * construction); every corpus partition computes its distances
    * locally. Top-k selection is a two-level tournament so the window
    * sort never shuffles the whole corpus onto |queries| hot keys:
    * level 1 takes the top-k per (query, salt-of-corpus-id) — a window
    * over |queries|·salts well-spread keys; level 2 re-selects the true
    * top-k per query from the k·salts survivors (a tiny relation). The
    * salt is derived from the corpus id, so level 1 is a deterministic
    * superset of the answer and the final result is salt-invariant.
    * Output: (q_id, c_id, distance, rn), rn = 1..k per query.
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame,
              qIdCol: Column, qVecCol: Column,
              cIdCol: Column, cVecCol: Column,
              k: Int, salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0, "k and salts must be positive")
    val q = queries.select(qIdCol.as("q_id"), qVecCol.as("q_vec"))
    val c = corpus.select(cIdCol.as("c_id"), cVecCol.as("c_vec"))
    val dists = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"), l2(col("c_vec"), col("q_vec")).as("distance"),
        pmod(crc32(col("c_id").cast("string")), lit(salts)).as("salt"))
    val w1 = Window.partitionBy(col("q_id"), col("salt"))
      .orderBy(col("distance").asc, col("c_id").asc)
    val survivors = dists.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
    val w2 = Window.partitionBy(col("q_id"))
      .orderBy(col("distance").asc, col("c_id").asc)
    survivors.withColumn("rn", row_number().over(w2).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("distance"), col("rn"))
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
