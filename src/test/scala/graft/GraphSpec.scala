package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {

  test("pagerank on a symmetric triangle is uniform") {
    import spark.implicits._
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val edges = e0.unionAll(e0.select($"dst".as("src"), $"src".as("dst")))
    val r = Graph.pagerank(edges, iters = 3).collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r.size == 3)
    // fully symmetric graph: all nodes identical rank ≈ 1/3
    assert(r.values.toSet.size == 1)
    assert(math.abs(r(1L) - 1.0 / 3) < 1e-9)
  }

  test("pagerank ranks a star center above its leaves") {
    import spark.implicits._
    val e0 = (2L to 6L).map(i => (1L, i)).toDF("src", "dst")
    val edges = e0.unionAll(e0.select($"dst".as("src"), $"src".as("dst")))
    val r = Graph.pagerank(edges, iters = 3).collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert((2L to 6L).forall(i => r(1L) > r(i)))
    // leaves are symmetric — identical ranks
    assert((2L to 6L).map(r).toSet.size == 1)
  }

  test("pagerank mass is conserved up to truncation loss") {
    import spark.implicits._
    val e0 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val edges = e0.unionAll(e0.select($"dst".as("src"), $"src".as("dst")))
    val total = Graph.pagerank(edges, iters = 3)
      .agg(sum($"r")).head().getDouble(0)
    // each per-edge truncation loses < 1e-15 of mass per round
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("pagerank is deterministic across repartitionings") {
    import spark.implicits._
    val e0 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val edges = e0.unionAll(e0.select($"dst".as("src"), $"src".as("dst")))
    def run(parts: Int) = Graph.pagerank(edges.repartition(parts), iters = 3)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(run(1) == run(7)) // bit-identical, not just approximately equal
  }
}
