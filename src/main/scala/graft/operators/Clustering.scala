package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deterministic k-means (Lloyd) over an embedding column — the
  * unsupervised counterpart of the per-label centroid operators
  * (q_centroid / q_centroid_assign): cluster discovery for corpus
  * organization, topic bucketing, and IVF coarse-quantizer training
  * (Ann.annIvf's centroid formula is the static stand-in this replaces
  * when trained on real data).
  *
  * Determinism contract (what makes every step oracle-checkable):
  * seeds are the k lowest-id vectors (no RNG); the assignment argmin
  * breaks distance ties by lowest centroid id; centroid updates go
  * through the same 1e-12 fixed-point integer sums as q_centroid, so
  * the new centroids are bit-identical doubles in any engine and any
  * partitioning. Iterations compose exactly: distances on identical
  * doubles give identical comparisons, hence identical memberships.
  *
  * Scale shape per iteration: one broadcast of k small centroid rows,
  * one narrow per-row argmin over the broadcast set (no shuffle of the
  * embedding relation), one (cid × dim)-keyed aggregation for the
  * update — the exact shape that holds at 10⁹ vectors. Nothing iterates
  * on the driver; `iters` is a fixed unroll.
  */
object Clustering {

  val Scale = 1000000000000.0 // 1e-12 fixed point, shared with q_centroid

  /** Deterministic seeds: the k lowest-id vectors, cid = 0..k-1 in id
    * order. k rows — the window's single-partition sort is k items.
    */
  def seeds(emb: DataFrame, idCol: Column, vecCol: Column, k: Int): DataFrame =
    emb.orderBy(idCol).limit(k)
      .select((row_number().over(Window.orderBy(idCol)) - 1).as("cid"),
        transform(vecCol, x => x.cast("double")).as("cvec"))

  /** Assignment step: nearest centroid per vector (argmin = min over
    * (dist, cid) structs — deterministic tie-break by lowest cid).
    * Output (id, vec, cid). The centroid set broadcasts; the embedding
    * relation is scanned once, narrow.
    */
  def assign(emb: DataFrame, cents: DataFrame, idCol: Column,
             vecCol: Column): DataFrame =
    emb.select(idCol.as("id"), vecCol.as("vec"))
      .crossJoin(broadcast(cents))
      .withColumn("dist", VectorFunctions.l2Composed(col("vec"), col("cvec")))
      .groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"),
        first(col("vec")).as("vec"))
      .select(col("id"), col("vec"), col("m").getField("cid").as("cid"))

  /** Update step: per-cluster mean via exact fixed-point integer sums
    * (VectorSumFp merge-able buffers — the shuffle carries one
    * long[dim] buffer per (cid × partition), never rows). Clusters that
    * lost all members drop out, deterministically.
    */
  def update(assigned: DataFrame, dim: Int): DataFrame =
    assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"),
        VectorFunctions.vectorSumFp(col("vec"), dim).as("sums"))
      .select(col("cid"),
        transform(col("sums"),
          x => x.cast("double") / lit(Scale) / col("n")).as("cvec"))

  /** Cluster-separation audit over a finished assignment — the eval loop
    * of the clustering family (is this k / these iterations good enough
    * to key an IVF layout on?). Per point: distance to its OWN centroid
    * (intra) and to the NEAREST OTHER centroid (inter), truncated to
    * 1e-6 fixed point; per cluster: member count, both distance sums,
    * and the separation verdict sum_inter > sum_intra (a simplified
    * silhouette — the exact silhouette's pairwise a(i) term is O(n²) and
    * never worth it at scale; centroid distances are the standard
    * surrogate). Shape: one narrow cross join against the ≤ k broadcast
    * centroids (the assign shape), one per-point conditional
    * aggregation, one per-cluster aggregation — no all-pairs path.
    * Output: (cid, n, sum_intra_fp, sum_inter_fp, separated).
    */
  def clusterQuality(asg: DataFrame, cents: DataFrame): DataFrame = {
    val cl = cents.select(col("cid").as("ccid"), col("cvec"))
    val d = asg.crossJoin(broadcast(cl))
      .withColumn("dist_fp",
        floor(VectorFunctions.l2Composed(col("vec"), col("cvec")) *
          lit(1000000.0)).cast("long"))
    d.groupBy(col("id"), col("cid"))
      .agg(
        sum(when(col("ccid") === col("cid"), col("dist_fp"))).as("intra_fp"),
        min(when(col("ccid") =!= col("cid"), col("dist_fp"))).as("inter_fp"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"),
        sum(col("intra_fp")).as("sum_intra_fp"),
        sum(col("inter_fp")).as("sum_inter_fp"))
      .withColumn("separated", col("sum_inter_fp") > col("sum_intra_fp"))
      .orderBy(col("cid"))
  }

  /** Full Lloyd run, `iters` unrolled assign+update rounds from the
    * deterministic seeds. Returns (assignments (id, vec, cid) of the
    * LAST assignment, centroids (cid, cvec) of the LAST update).
    *
    * Same lineage discipline as the other iterative operators
    * (Graph.pagerank, Dedup.connectedComponents): every `checkpointEvery`
    * rounds the centroid relation — k rows, the only thing that threads
    * between iterations — goes through `stage.cut`, so the composed plan
    * stays bounded at any iteration count and [[Stage.Parquet]] gives the
    * durable restart point on a cluster (cutting k rows costs nothing).
    */
  def lloyd(emb: DataFrame, idCol: Column, vecCol: Column, k: Int,
            iters: Int, dim: Int, checkpointEvery: Int = 8,
            stage: Stage = Stage.Local): (DataFrame, DataFrame) = {
    require(iters >= 1, "lloyd needs at least one iteration")
    var cents = seeds(emb, idCol, vecCol, k)
    var asg: DataFrame = null
    for (i <- 0 until iters) {
      asg = assign(emb, cents, idCol, vecCol)
      cents = update(asg, dim)
      if ((i + 1) % checkpointEvery == 0 && i + 1 < iters)
        cents = stage.cut(cents, s"km_cents_cut_${i + 1}")
    }
    (asg, cents)
  }

  /** Convergence-stopped Lloyd (the [[graft.operators.Graph.pagerankConverged]]
    * pattern): rounds run until the centroids stop moving — the EXACT
    * fixed-point L1 drift Σ_cid Σ_dim |trunc(c'·1e6) − trunc(c·1e6)|
    * drops to ≤ `tolFp` — or until `maxIters`. The drift is an integer
    * sum of per-slot integers over bit-identical doubles, so the stop
    * round is deterministic in any partitioning and an unrolled SQL
    * replay re-derives the SAME round from the data; a round whose
    * cluster set changed (a centroid dropped out) never counts as
    * converged. Returns (last assignment, last centroids, rounds run) —
    * identical to `lloyd(iters = roundsRun)` by construction.
    *
    * Cost of the stop decision: the k-row centroid relation materializes
    * per round (it is the only thing that threads between rounds; k rows
    * cost nothing at any scale) plus one k-row join + aggregate.
    */
  def lloydConverged(emb: DataFrame, idCol: Column, vecCol: Column, k: Int,
                     maxIters: Int, tolFp: Long, dim: Int,
                     stage: Stage = Stage.Local): (DataFrame, DataFrame, Int) = {
    require(maxIters >= 1, "lloydConverged: maxIters must be positive")
    require(tolFp >= 0L, "lloydConverged: tolFp must be non-negative")
    val DriftScale = 1000000.0
    var cents = stage.cut(seeds(emb, idCol, vecCol, k), "kmc_cents_0")
    var asg: DataFrame = null
    var i = 0
    var converged = false
    var prevN = cents.count()
    while (i < maxIters && !converged) {
      asg = assign(emb, cents, idCol, vecCol)
      val next = stage.cut(update(asg, dim), s"kmc_cents_${i + 1}")
      val nextN = next.count()
      val m = next.alias("a").join(cents.alias("b"), col("a.cid") === col("b.cid"))
        .select(aggregate(
          zip_with(col("a.cvec"), col("b.cvec"),
            (x, y) => abs(floor(x * lit(DriftScale)).cast("long") -
              floor(y * lit(DriftScale)).cast("long"))),
          lit(0L), (acc, v) => acc + v).as("d"))
        .agg(coalesce(sum(col("d")), lit(0L)).as("drift"),
          count(lit(1)).as("n_pairs"))
        .head()
      if (nextN == prevN && m.getLong(1) == prevN && m.getLong(0) <= tolFp)
        converged = true
      cents = next
      prevN = nextN
      i += 1
    }
    (asg, cents, i)
  }
}
