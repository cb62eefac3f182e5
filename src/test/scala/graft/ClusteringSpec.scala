package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.tables.Tables

class ClusteringSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("seeds are the k lowest ids with 0-based cids, cast to double") {
    val s = Clustering.seeds(emb, col("vec_id"), col("embedding"), 3).collect()
    assert(s.map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2))
    assert(s.forall(_.getSeq[Double](1).length == 64))
  }

  test("assignment is total and ties break to lowest cid") {
    import spark.implicits._
    val vecs = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.5f, 0.0f))) // equidistant from both centroids
      .toDF("id", "v")
    val cents = Seq((0, Array(0.0, 0.0)), (1, Array(1.0, 0.0))).toDF("cid", "cvec")
    val a = Clustering.assign(vecs, cents, col("id"), col("v"))
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(a.toSeq == Seq((1L, 0), (2L, 1), (3L, 0))) // tie -> cid 0
  }

  test("update means match the direct per-cluster average") {
    import spark.implicits._
    val asg = Seq((1L, Array(1.0f, 3.0f), 0), (2L, Array(3.0f, 5.0f), 0),
      (3L, Array(10.0f, 10.0f), 1)).toDF("id", "vec", "cid")
    val c = Clustering.update(asg, 2).orderBy(col("cid")).collect()
    assert(c(0).getSeq[Double](1) == Seq(2.0, 4.0))
    assert(c(1).getSeq[Double](1) == Seq(10.0, 10.0))
  }

  test("lloyd converges to a stable partition on the fixture corpus") {
    val (asg2, _) = Clustering.lloyd(emb, col("vec_id"), col("embedding"),
      k = 4, iters = 2, dim = 64)
    val (asg3, _) = Clustering.lloyd(emb, col("vec_id"), col("embedding"),
      k = 4, iters = 3, dim = 64)
    val n = emb.count()
    assert(asg2.count() == n) // assignment is total — every vector clustered
    // determinism: the same run twice is identical row-for-row
    val a = asg2.select("id", "cid").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Clustering.lloyd(emb, col("vec_id"), col("embedding"), 4, 2, 64)
      ._1.select("id", "cid").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
    // Lloyd monotonicity sanity: extra iteration moves few points
    val c = asg3.select("id", "cid").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val moved = a.count { case (id, cid) => c(id) != cid }
    assert(moved <= n / 4, s"iteration 3 moved $moved of $n points")
  }

  test("lloyd lineage cut is bit-identical, including the parquet stage") {
    import graft.operators.Stage
    def run(ce: Int, st: Stage) =
      Clustering.lloyd(emb, col("vec_id"), col("embedding"), 4, 4, 64,
          checkpointEvery = ce, stage = st)
        ._1.select("id", "cid").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
    val uncut = run(100, Stage.Local)
    assert(run(2, Stage.Local) == uncut)
    val dir = java.nio.file.Files.createTempDirectory("km_stage").toString
    assert(run(2, Stage.Parquet(dir)) == uncut)
  }

  test("clusterQuality: planted tight clusters are separated, counts total") {
    import spark.implicits._
    // two tight blobs far apart in 64-dim: cluster 0 near origin,
    // cluster 1 near (10,10,...); with k=2 Lloyd converges in one round
    // and every point sits far closer to its own centroid
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array.fill(64)(base + (i % 5) * 0.01f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (asg, cents) = Clustering.lloyd(df, col("vec_id"), col("embedding"),
      k = 2, iters = 2, dim = 64)
    val q = Clustering.clusterQuality(asg, cents).collect()
    assert(q.map(_.getLong(1)).sum == 20, "every point audited exactly once")
    assert(q.forall(_.getBoolean(4)),
      "planted far-apart blobs must report separated=true")
    assert(q.forall(r => r.getLong(3) > r.getLong(2)),
      "inter sum strictly above intra sum per cluster")
  }

  test("converged lloyd stops early and equals the fixed-round run") {
    import spark.implicits._
    // two tight planted blobs: drift collapses after round 1, so a loose
    // tolerance stops well before the cap
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array.fill(64)(base + (i % 5) * 0.01f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (asg, cents, k) = Clustering.lloydConverged(df, col("vec_id"),
      col("embedding"), k = 2, maxIters = 10, tolFp = 1000L, dim = 64)
    assert(k > 0 && k < 10, s"early stop expected, ran $k")
    val (asgF, centsF) = Clustering.lloyd(df, col("vec_id"), col("embedding"),
      k = 2, iters = k, dim = 64)
    def cmap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    def amap(d: org.apache.spark.sql.DataFrame) = d.select($"id", $"cid")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cmap(cents) == cmap(centsF) && amap(asg) == amap(asgF))
    // exact integer drift → the stop round is partitioning-stable
    val (_, _, k2) = Clustering.lloydConverged(df.repartition(7), col("vec_id"),
      col("embedding"), k = 2, maxIters = 10, tolFp = 1000L, dim = 64)
    assert(k2 == k)
  }

  test("assignment plan broadcasts centroids and never shuffles vectors") {
    val cents = Clustering.seeds(emb, col("vec_id"), col("embedding"), 4)
    val plan = Clustering.assign(emb, cents, col("vec_id"), col("embedding"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }
}
