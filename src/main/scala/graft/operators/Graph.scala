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
    * The node set is src ∪ dst, so sink pages (out-degree 0) are ranked
    * too, and their mass is redistributed: each round aggregates the
    * dangling nodes' rank to one fixed-point scalar (broadcast — never a
    * shuffle of the rank relation) and every node receives an equal
    * d·(Σ_dangling trunc(r))/N share on top of its in-edge contributions:
    * r' = (1−d)/N + d·(Σ_in trunc(r/odeg) + trunc-Σ_dangling(r)/N).
    *
    * The edge/degree/node/dangling relations materialize once. On graphs
    * with no dangling nodes (e.g. symmetrized ones) the per-round scalar
    * is skipped entirely and rank iterations compose LAZILY (each round's
    * relations are consumed exactly once, so the chained DAG does each
    * round's work once — no re-execution) with a lineage cut every
    * `checkpointEvery` rounds to keep adversarially long runs' plans
    * bounded. With dangling nodes each round's rank relation is consumed
    * twice (contributions + dangling scalar), so it is materialized per
    * round — the Pregel superstep discipline — instead of chained.
    *
    * Determinism holds in both paths: the dangling sum truncates each
    * rank to 1e-15 fixed point before summing, so it is an exact integer
    * in any partitioning, like the per-edge contributions.
    *
    * All materializations go through `stage`: [[Stage.Local]] (default,
    * executor-memory) for local/fixed-round runs, [[Stage.Parquet]] for
    * the cluster path — durable, restartable mid-iteration, identical
    * results (asserted in GraphSpec).
    */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               checkpointEvery: Int = 8,
               stage: Stage = Stage.Local): DataFrame = {
    // pre-partitioned on the per-round join key once: the executor-memory
    // cut preserves outputPartitioning, so EVERY round's edge⋈rank join
    // reuses this exchange instead of re-shuffling the full edge relation
    // (the connectedComponents discipline; Stage.Parquet trades it for
    // durability, as documented there)
    val e = stage.cut(edges.select(col("src"), col("dst"))
      .repartition(col("src")), "pr_edges")
    val nodes = stage.cut(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct(), "pr_nodes")
    val deg = stage.cut(
      e.groupBy(col("src")).agg(count(lit(1)).as("odeg")), "pr_deg")
    val dangling = stage.cut(
      nodes.join(deg, nodes("id") === deg("src"), "left_anti"), "pr_dangling")
    val hasDangling = dangling.limit(1).count() > 0
    val nRel = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    var ranks = nodes.crossJoin(nRel)
      .select(col("id"), (lit(1.0) / col("n_nodes")).as("r"))
    for (i <- 0 until iters) {
      val cur = if (hasDangling && i > 0) stage.cut(ranks, s"pr_ranks_$i")
                else ranks
      val contribs = e.join(cur, e("src") === cur("id"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"),
          floor(col("r") / col("odeg") * lit(ContribScale)).cast("long").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("sum_c"))
      val base = nodes.join(contribs, Seq("id"), "left").crossJoin(nRel)
      ranks =
        if (hasDangling) {
          val dsum = broadcast(cur.join(dangling, Seq("id"), "left_semi")
            .agg(coalesce(sum(floor(col("r") * lit(ContribScale)).cast("long")),
              lit(0L)).as("sum_d")))
          base.crossJoin(dsum)
            .select(col("id"),
              (lit(1 - damping) / col("n_nodes") +
                lit(damping) * (coalesce(col("sum_c"), lit(0L)).cast("double") /
                  lit(ContribScale) +
                  col("sum_d").cast("double") / lit(ContribScale) /
                    col("n_nodes"))).as("r"))
        } else {
          base.select(col("id"),
            (lit(1 - damping) / col("n_nodes") +
              lit(damping) * (coalesce(col("sum_c"), lit(0L)).cast("double") /
                lit(ContribScale))).as("r"))
        }
      if (!hasDangling && (i + 1) % checkpointEvery == 0 && i + 1 < iters)
        ranks = stage.cut(ranks, s"pr_ranks_cut_${i + 1}")
    }
    ranks
  }

  /** Convergence-stopped PageRank: same per-round message-passing shape
    * and determinism contract as [[pagerank]], but instead of a fixed
    * unroll it stops when the EXACT fixed-point L1 delta
    * Σ_nodes |trunc(r'·1e15) − trunc(r·1e15)| drops to ≤ `tolFp`, or at
    * `maxIters`. The delta is an integer sum of per-node integers, so the
    * stop decision is bit-identical in any partitioning/order — the SQL
    * oracle replays the SAME decision by unrolling maxIters rounds and
    * selecting the first iteration whose delta meets tolFp. The rounds
    * actually run are emitted as an `iters_run` column so the stop count
    * itself is part of the checked result.
    *
    * Convergence checking inherently needs the delta per round, so every
    * round materializes through `stage` (the Pregel superstep discipline;
    * no lazy chaining) and runs one extra keyed join+agg over the two
    * rank vectors — one row per node, never the edge relation.
    */
  def pagerankConverged(edges: DataFrame, maxIters: Int, tolFp: Long,
                        damping: Double = 0.85,
                        stage: Stage = Stage.Local): DataFrame = {
    require(maxIters > 0, "pagerankConverged: maxIters must be positive")
    require(tolFp >= 0L, "pagerankConverged: tolFp must be non-negative")
    val e = stage.cut(edges.select(col("src"), col("dst"))
      .repartition(col("src")), "prc_edges")
    val nodes = stage.cut(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct(), "prc_nodes")
    val deg = stage.cut(
      e.groupBy(col("src")).agg(count(lit(1)).as("odeg")), "prc_deg")
    val dangling = stage.cut(
      nodes.join(deg, nodes("id") === deg("src"), "left_anti"), "prc_dangling")
    val hasDangling = dangling.limit(1).count() > 0
    val nRel = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    var ranks = stage.cut(nodes.crossJoin(nRel)
      .select(col("id"), (lit(1.0) / col("n_nodes")).as("r")), "prc_ranks_0")
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      val cur = ranks
      val contribs = e.join(cur, e("src") === cur("id"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"),
          floor(col("r") / col("odeg") * lit(ContribScale)).cast("long").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("sum_c"))
      val base = nodes.join(contribs, Seq("id"), "left").crossJoin(nRel)
      val next0 =
        if (hasDangling) {
          val dsum = broadcast(cur.join(dangling, Seq("id"), "left_semi")
            .agg(coalesce(sum(floor(col("r") * lit(ContribScale)).cast("long")),
              lit(0L)).as("sum_d")))
          base.crossJoin(dsum)
            .select(col("id"),
              (lit(1 - damping) / col("n_nodes") +
                lit(damping) * (coalesce(col("sum_c"), lit(0L)).cast("double") /
                  lit(ContribScale) +
                  col("sum_d").cast("double") / lit(ContribScale) /
                    col("n_nodes"))).as("r"))
        } else {
          base.select(col("id"),
            (lit(1 - damping) / col("n_nodes") +
              lit(damping) * (coalesce(col("sum_c"), lit(0L)).cast("double") /
                lit(ContribScale))).as("r"))
        }
      val next = stage.cut(next0, s"prc_ranks_${i + 1}")
      val delta = next.alias("a").join(cur.alias("b"), col("a.id") === col("b.id"))
        .agg(coalesce(sum(abs(
          floor(col("a.r") * lit(ContribScale)).cast("long") -
            floor(col("b.r") * lit(ContribScale)).cast("long"))),
          lit(0L)).as("d"))
        .head().getLong(0)
      ranks = next
      i += 1
      if (delta <= tolFp) converged = true
    }
    ranks.withColumn("iters_run", lit(i))
  }

  /** Personalized PageRank: teleport mass goes ONLY to the `seeds` node
    * set (uniformly), so rank concentrates in the seeds' neighbourhood —
    * the seed-expansion / related-items primitive (grow a labeled set,
    * rank documents around a topic seed, recommend by graph proximity).
    * r' = (1−d)·[id ∈ S]/|S| + d·Σ_in trunc(r/odeg), r0 uniform over S.
    *
    * Same per-iteration shape and determinism contract as [[pagerank]]
    * (one edge⋈rank join + one dst aggregation, 1e-15 fixed-point
    * contributions); the seed set broadcasts (it is small by
    * definition — a query's labeled examples, not the corpus). Callers
    * pass a dangling-free graph (symmetrized), as seeded walks are
    * usually run on mutualized similarity graphs.
    *
    * Lineage discipline matches [[pagerank]]: every `checkpointEvery`
    * rounds the rank relation goes through `stage.cut`, so the plan
    * stays bounded at any iteration count (GraphSpec asserts the cut
    * path is bit-identical). Requires a non-empty effective seed set
    * (seeds ∩ nodes) — an empty one has no teleport distribution and
    * would silently yield all-NaN ranks.
    */
  def pagerankPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                           damping: Double = 0.85,
                           checkpointEvery: Int = 8,
                           stage: Stage = Stage.Local): DataFrame = {
    val e = stage.cut(edges.select(col("src"), col("dst"))
      .repartition(col("src")), "ppr_edges")
    val nodes = stage.cut(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct(), "ppr_nodes")
    val deg = stage.cut(
      e.groupBy(col("src")).agg(count(lit(1)).as("odeg")), "ppr_deg")
    val seedSet = stage.cut(
      nodes.join(seeds.select(col("id")), Seq("id"), "left_semi"), "ppr_seeds")
    require(seedSet.limit(1).count() > 0,
      "pagerankPersonalized: seed set is empty or disjoint from the graph's nodes")
    val nSeeds = broadcast(seedSet.agg(count(lit(1)).as("n_seeds")))
    val seedMark = broadcast(seedSet.withColumn("_seed", lit(1)))
    var ranks = nodes.join(seedMark, Seq("id"), "left").crossJoin(nSeeds)
      .select(col("id"),
        when(col("_seed").isNotNull, lit(1.0) / col("n_seeds"))
          .otherwise(lit(0.0)).as("r"))
    for (i <- 0 until iters) {
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"),
          floor(col("r") / col("odeg") * lit(ContribScale)).cast("long").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("sum_c"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .join(seedMark, Seq("id"), "left").crossJoin(nSeeds)
        .select(col("id"),
          (when(col("_seed").isNotNull, lit(1 - damping) / col("n_seeds"))
            .otherwise(lit(0.0)) +
            lit(damping) * (coalesce(col("sum_c"), lit(0L)).cast("double") /
              lit(ContribScale))).as("r"))
      if ((i + 1) % checkpointEvery == 0 && i + 1 < iters)
        ranks = stage.cut(ranks, s"ppr_ranks_cut_${i + 1}")
    }
    ranks
  }

  /** Exact triangle counting by degree orientation — the clustering /
    * community-density statistic of a co-occurrence graph, computed in
    * the shape that survives 100 TB of edges.
    *
    * `edges` is an undirected edge list; it is canonicalized
    * ((least, greatest), distinct, loops dropped) first. Each edge is
    * then ORIENTED from its (degree, id)-smaller endpoint to the larger
    * one. The classic bound: every out-degree under this orientation is
    * O(√m), so the wedge join (pairs of out-neighbors of one node) emits
    * O(m^1.5) candidates worst-case — the optimum for exact counting —
    * instead of the Σ deg² a random orientation risks on a power-law
    * graph (one celebrity node would otherwise generate quadratic
    * wedges). Each triangle is counted exactly once: under a total
    * order, exactly one of its three nodes has out-edges to both others.
    * Shuffles: canonical distinct, one degree aggregation, two keyed
    * joins on the wedge apex, one keyed join closing the wedge. No
    * cartesian anywhere; everything integer-exact.
    *
    * Output: one row (n_edges, n_wedges, n_triangles).
    */
  def triangleCount(edges: DataFrame, stage: Stage = Stage.Local): DataFrame = {
    // The canonical edge list is consumed three times (degree agg, wedge
    // build, wedge closure) and the oriented list twice (both sides of
    // the wedge self-join); without a lineage cut each consumer
    // recomputes the whole upstream plan — at sf0.1 that re-ran the
    // co-occurrence self-join four times and the O(m^1.5) wedge join
    // twice. Cut both once.
    val und = stage.cut(edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct(), "tri_und")
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val dir = stage.cut(withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("v")), "tri_dir")
    val x = dir.select(col("u"), col("v").as("p"))
    val y = dir.select(col("u"), col("v").as("q"))
    val wedges = x.join(y, Seq("u")).filter(col("p") < col("q"))
    // one pass over the wedges: a left join against the (distinct)
    // canonical edges marks each wedge closed/open, and a single
    // aggregate produces both counts — the former left_semi + two
    // separate counts ran the wedge join twice for the same numbers
    val closed = wedges.join(
      und.select(col("a").as("p"), col("b").as("q"), lit(1).as("_closed")),
      Seq("p", "q"), "left")
    val wt = closed.agg(count(lit(1)).as("n_wedges"),
      count(col("_closed")).as("n_triangles"))
    und.agg(count(lit(1)).as("n_edges")).crossJoin(broadcast(wt))
  }

  /** Label-propagation community detection (Raghavan et al. 2007), the
    * modularity-free community operator that complements connected
    * components (Dedup.connectedComponents finds REACHABILITY classes;
    * LPA finds DENSITY classes inside one component): every node starts
    * as its own label, and each synchronous round adopts the most
    * frequent label among its neighbors plus its own current label (the
    * self-vote damps the 2-cycle oscillation synchronous LPA exhibits on
    * bipartite graphs), ties to the SMALLEST label — which makes every
    * round, and therefore the fixed-round result, fully deterministic in
    * any partitioning (plain integer counts, integer tie-break; the SQL
    * oracle replays rounds verbatim).
    *
    * Scale shape per round: one equi-join of the edge relation with the
    * n-row label relation (shuffle on src), one (id, label) count, one
    * per-id argmax — the same message-passing round as [[pagerank]],
    * with the label relation cut per round (it feeds both the join and
    * the self-vote union, so it would otherwise be computed twice).
    *
    * Input cols `src`, `dst` (directed; symmetrize first for undirected
    * semantics). Output: (id, label) after `iters` rounds.
    */
  def labelPropagation(edges: DataFrame, iters: Int,
                       stage: Stage = Stage.Local): DataFrame = {
    require(iters >= 1, "labelPropagation needs at least one round")
    val e = stage.cut(edges.select(col("src"), col("dst"))
      .repartition(col("src")), "lpa_edges")
    var labels = stage.cut(
      e.select(col("src").as("id")).unionAll(e.select(col("dst").as("id")))
        .distinct().select(col("id"), col("id").as("lbl")), "lpa_l0")
    for (it <- 1 to iters) {
      val votes = e.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lbl"))
        .unionAll(labels)
      val next = votes.groupBy(col("id"), col("lbl"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("id"))
        .agg(max(struct(col("n"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("id"), (-col("m.neg")).as("lbl"))
      labels = stage.cut(next, s"lpa_l$it")
    }
    labels
  }
}
