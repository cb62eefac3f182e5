package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components
  * (Dedup.connectedComponents): PageRank-style link analysis — the
  * standard importance prior for training-data source weighting (rank a
  * crawl graph, weight documents by hub quality) and for catalog
  * analytics (which parts/suppliers anchor the supply graph).
  *
  * Scale shape per iteration: one equi-join of the edge relation with the
  * current rank vector (shuffle on src), one aggregation on dst — the
  * textbook message-passing round. Rank state is one row per node, edges
  * never materialize on the driver, and lineage is truncated per round so
  * plans stay constant-size. `iters` is a fixed unroll (power iteration
  * converges geometrically; fixed-round runs are how production PageRank
  * is operated).
  *
  * Determinism contract: per-edge contributions are truncated to 1e-15
  * fixed-point BEFORE the aggregation, so the sum is an exact integer in
  * any partitioning/order; the per-node update is then a fixed chain of
  * exactly-rounded double ops on identical operands. Every iteration is
  * therefore bit-identical to the SQL oracle's unrolled CTE replay.
  */
object Graph {

  val ContribScale = 1e15

  /** PageRank over a directed edge list (cols `src`, `dst`; pre-deduped).
    * Every node must have out-degree ≥ 1 (true for symmetrized graphs —
    * the caller's responsibility otherwise; dangling mass is not
    * redistributed). Returns (id, r) after `iters` rounds from the
    * uniform start, r' = (1−d)/N + d·Σ_in trunc(r/odeg).
    *
    * The edge/degree/node relations materialize once; rank iterations
    * compose LAZILY (each round's relations are consumed exactly once, so
    * the chained DAG does each round's work once — no re-execution) with a
    * lineage cut every `checkpointEvery` rounds to keep adversarially long
    * runs' plans bounded. Typical fixed-round runs (≤ 8) execute as one
    * job after the three setup materializations.
    */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               checkpointEvery: Int = 8): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("id")).distinct().localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg")).localCheckpoint()
    val nRel = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    var ranks = nodes.crossJoin(nRel)
      .select(col("id"), (lit(1.0) / col("n_nodes")).as("r"))
    for (i <- 0 until iters) {
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"),
          floor(col("r") / col("odeg") * lit(ContribScale)).cast("long").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("sum_c"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .crossJoin(nRel)
        .select(col("id"),
          (lit(1 - damping) / col("n_nodes") +
            lit(damping) * (coalesce(col("sum_c"), lit(0L)).cast("double") /
              lit(ContribScale))).as("r"))
      if ((i + 1) % checkpointEvery == 0 && i + 1 < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
